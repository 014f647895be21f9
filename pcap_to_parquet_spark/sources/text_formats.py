"""CSV / JSON utility scans (SURVEY §2 Part B, sources table).

Always explicit-schema (never inferSchema — a schema-inference pass
reads the data twice and guesses types; at 100 TB both are
disqualifying). Parquet remains the lake format; these are the
ingest/interchange edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pcap_to_parquet_spark.schema import TESTDATA_SCHEMAS
from pcap_to_parquet_spark.session import tune


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    tune(spark)
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    tune(spark)
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan (built-in columnar alternative; same predicate-pushdown
    and column-pruning behavior as parquet). Schema optional: ORC files
    carry their types, so there is no inference pass to pay for."""
    tune(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("compression", "zstd").orc(path)


def table_schema(name: str) -> StructType:
    """Explicit schema for a testdata table (for CSV/JSON round-trips)."""
    return TESTDATA_SCHEMAS[name]
