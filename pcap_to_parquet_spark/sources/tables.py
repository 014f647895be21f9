"""Parquet table loaders for the driver testdata layout.

Kept deliberately thin: ``spark.read.parquet`` gives the vectorized
reader, predicate pushdown, and column pruning for free — the engine's
job is to NOT get in Catalyst's way (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_to_parquet_spark.schema import TESTDATA_SCHEMAS
from pcap_to_parquet_spark.session import tune

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan → pushdown-friendly.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright; read it as a long (legacy conf) and truncate
    ns → µs exactly like DuckDB does, so both engines see identical
    microsecond timestamps.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    tune(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load several tables at once: ``l, o = load_tables(s, d, "lineitem", "orders")``."""
    return tuple(load_table(spark, sf_dir, n) for n in names)
