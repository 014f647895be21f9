"""Spark pcap pipeline: golden fixture → DataFrame → zstd parquet → DuckDB.

The DuckDB readback IS the reference's contract: "write standard
Parquet; query it with any SQL engine" (reference README.md:20-40).
"""

from __future__ import annotations

import duckdb
import pytest

from pcap_to_parquet_spark.operators.pcap_query import _fixture_path
from pcap_to_parquet_spark.schema import PACKET_SCHEMA
from pcap_to_parquet_spark.sources.pcap import convert_pcap, read_pcap
from pcap_to_parquet_spark.sources.pcap_fixtures import BASE_TS, fixture_packets


def test_read_pcap_schema_and_rowcount(spark):
    df = read_pcap(spark, _fixture_path())
    assert df.schema == PACKET_SCHEMA
    assert df.count() == len(fixture_packets())  # one row per packet, always


def test_read_pcap_exact_int64_timestamps(spark):
    # ns-scale int64 must survive the Arrow/pandas batch exactly
    # (plain pandas int-with-None columns silently become float64)
    rows = {r.mm_id: r for r in read_pcap(spark, _fixture_path()).collect() if r.mm_id}
    assert rows[9].mm_ts == (BASE_TS - 5) * 10**9 + 777_777_777
    assert rows[1].mm_ts == (BASE_TS - 3) * 10**9 + 111_111_111


def test_convert_pcap_duckdb_readback(spark, tmp_path):
    out = str(tmp_path / "packets")
    convert_pcap(spark, _fixture_path(), out)
    con = duckdb.connect()
    n, n_udp, mm_max = con.execute(
        f"""SELECT COUNT(*), COUNT(*) FILTER (protocol = 'UDP'),
                   MAX(mm_ts) FROM '{out}/*.parquet'"""
    ).fetchone()
    assert n == len(fixture_packets())
    assert n_udp >= 4  # udp_plain, vlan_udp, mm_* carriers
    assert mm_max == (BASE_TS - 2) * 10**9 + 500_000_123  # exact, not float-rounded
    # codec parity with the reference (main.rs:72-75)
    comp = con.execute(
        f"SELECT DISTINCT compression FROM parquet_metadata('{out}/*.parquet')"
    ).fetchall()
    assert all("ZSTD" in c[0].upper() for c in comp)


def test_convert_pcap_partitioned_pruning(spark, tmp_path):
    out = str(tmp_path / "packets_by_proto")
    convert_pcap(spark, _fixture_path(), out, partition_cols=["protocol"])
    df = spark.read.parquet(out).filter("protocol = 'UDP'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must become a PartitionFilter (directory pruning),
    # not a post-scan predicate
    assert "PartitionFilters: [isnotnull(protocol" in plan
    assert df.count() >= 4
    # round-trip values survive the partition column moving into the path
    back = {(r.src_ip, r.src_port) for r in df.collect()}
    assert ("10.0.0.1", 1234) in back


def test_read_pcap_rejects_non_pcap(spark, tmp_path):
    bad = tmp_path / "bad.pcap"
    bad.write_bytes(b"\x0a\x0d\x0d\x0a" + b"\x00" * 100)  # pcapng
    with pytest.raises(Exception, match="(?i)pcap"):
        read_pcap(spark, str(bad)).collect()
