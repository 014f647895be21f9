"""Packet-capture analytics demo: the reference's one capability
(pcap -> parquet) and everything this engine adds downstream of it.

Run: python examples/pcap_analytics_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pcap_to_parquet_spark.session import get_spark
import pcap_to_parquet_spark.operators  # noqa: F401
from pcap_to_parquet_spark.operators.pcap_query import _fixture_path
from pcap_to_parquet_spark.registry import QUERIES
from pcap_to_parquet_spark.sources.pcap import convert_pcap, read_pcap


def main() -> None:
    spark = get_spark("pcap-demo")
    spark.sparkContext.setLogLevel("ERROR")
    fixture = _fixture_path()

    # 1. the reference's contract: pcap -> zstd parquet, DuckDB-readable
    out = os.path.join(tempfile.mkdtemp(), "packets")
    convert_pcap(spark, fixture, out)
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{out}/*.parquet'").fetchone()[0]
    print(f"converted golden capture -> {n} parquet rows (DuckDB-verified)")

    # 2. the same decode as a queryable DataFrame / SQL view
    read_pcap(spark, fixture).createOrReplaceTempView("packets")
    print(spark.sql(
        "SELECT protocol, COUNT(*) AS n, SUM(len) AS bytes "
        "FROM packets GROUP BY protocol ORDER BY n DESC"
    )._jdf.showString(10, 0, False))

    # 3. downstream analytics the reference delegates away
    for title, name in [
        ("NetFlow-style 5-tuple flows", "q_pcap_flows"),
        ("Metamako trailer stack (UDTF)", "q_pcap_trailers"),
        ("capture round-trip (write + re-decode)", "q_pcap_roundtrip"),
    ]:
        print(f"{title:45s} -> {QUERIES[name](spark, '/root/testdata/sf0.001').count()} rows")


if __name__ == "__main__":
    main()
