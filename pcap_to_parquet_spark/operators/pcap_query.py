"""q_pcap_pipeline: the reference capability end-to-end as a query.

Rows-only check (DuckDB has no pcap reader, SURVEY §2 Part B): the
golden fixture pcap → packets DataFrame. Value-level correctness is
covered by the hand-computed golden rows in tests/test_pcap.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources.pcap import read_pcap
from pcap_to_parquet_spark.sources.pcap_fixtures import golden_pcap_bytes


def _fixture_path() -> str:
    path = os.path.join(tempfile.gettempdir(), "pcap_to_parquet_spark_golden.pcap")
    data = golden_pcap_bytes()
    if not (os.path.exists(path) and os.path.getsize(path) == len(data)):
        with open(path, "wb") as f:
            f.write(data)
    return path


@query("q_pcap_pipeline")  # rows-only: no pcap in DuckDB
def pcap_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_pcap(spark, _fixture_path())
    return df.orderBy(F.col("len"), F.col("src_ip").asc_nulls_first(), F.col("mm_id").asc_nulls_first())
