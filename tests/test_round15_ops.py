"""Round-15 operator tests.

Covers (per the round-14 verdict's next-round items):
- the live talkers census twin (q_pcap_stream_talkers): batch-equality
  pin against an independent Spark gaps-and-islands closed set, plus a
  hand trace on the dual-stack biflow fixture;
- (later this round) the three-way dedup method agreement and the
  winnowing-band survivors x filter-attribution composition.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import pytest  # noqa: E402

import pcap_to_parquet_spark.operators  # noqa: E402,F401  (registers queries)
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pcap_to_parquet_spark.sources.pcap import read_pcap  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def _closed_flows_land(spark) -> str:
    from pcap_to_parquet_spark.operators.pcap_query import _biflow_fixture_path
    from pcap_to_parquet_spark.sources.pcap_datasource import register_pcap_source

    register_pcap_source(spark)
    src = _biflow_fixture_path()
    land = tempfile.mkdtemp()
    shutil.copy(src, os.path.join(land, "biflow.pcap"))
    return land


def _batch_closed_flows(spark):
    """The batch statement of the closed-flow emission contract:
    gaps-and-islands per 5-tuple over the timed dual-stack fixture,
    clipped to flows whose (last + gap) precedes the watermark horizon
    — computed with plain window functions, independent of both the
    streaming path and the DuckDB oracle."""
    from pcap_to_parquet_spark.operators.pcap_query import (
        FLOW_GAP_SECONDS,
        FLOW_WATERMARK_SECONDS,
        _biflow_fixture_path,
    )

    gap_us = FLOW_GAP_SECONDS * 1_000_000
    pkts = (
        read_pcap(spark, _biflow_fixture_path(), ipv6=True)
        .filter("mm_ts IS NOT NULL")
        .withColumn("evt_us", F.expr("mm_ts div 1000"))
    )
    key = ["src_ip", "dst_ip", "protocol", "src_port", "dst_port"]
    w = Window.partitionBy(*key).orderBy("evt_us")
    seq = pkts.withColumn(
        "brk",
        F.when(F.col("evt_us") - F.lag("evt_us").over(w) >= gap_us, 1).otherwise(0),
    ).withColumn("sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    agg = seq.groupBy(*key, "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_packets"),
        F.sum("len").cast("long").alias("n_bytes"),
        (F.max("evt_us") + gap_us).alias("flow_end"),
    )
    wm = pkts.agg(
        (F.max("evt_us") - FLOW_WATERMARK_SECONDS * 1_000_000).alias("wm")
    )
    return agg.join(F.broadcast(wm)).where(F.col("flow_end") <= F.col("wm"))


def test_stream_talkers_equals_batch_census_on_closed(spark):
    """The live talkers census must equal the shared census kernel run
    over the INDEPENDENT batch statement of the closed set — the
    stream changes when flows emit, never what the census says."""
    from pcap_to_parquet_spark.operators.pcap_query import (
        pcap_stream_talkers,
        talkers_census_from_flows,
    )

    live = {
        r["endpoint_ip"]: r for r in pcap_stream_talkers(spark, SF0001).collect()
    }
    batch = {
        r["endpoint_ip"]: r
        for r in talkers_census_from_flows(_batch_closed_flows(spark)).collect()
    }
    assert set(live) == set(batch) and live
    for k, r in live.items():
        b = batch[k]
        for c in (
            "out_packets", "out_bytes", "in_packets", "in_bytes",
            "n_peers", "n_flows", "io_byte_ratio",
        ):
            assert r[c] == b[c], (k, c, r[c], b[c])


def test_stream_talkers_hand_trace(spark):
    """Dual-stack hand trace: the fixture's closed set is the v6
    conversation (both directions) plus one v4 flow, so the census has
    exactly the four endpoints involved, the v6 pair see each other as
    their single peer with traffic BOTH ways, and each byte total is
    the flow-record roll of the closed packets."""
    from pcap_to_parquet_spark.operators.pcap_query import pcap_stream_talkers

    rows = {r["endpoint_ip"]: r for r in pcap_stream_talkers(spark, SF0001).collect()}
    assert len(rows) == 4
    a1, b1 = rows["2001:db8::a1"], rows["2001:db8::b1"]
    # a biflow conversation: each side sends and receives, one peer
    assert a1["n_peers"] == 1 and b1["n_peers"] == 1
    assert a1["out_packets"] > 0 and a1["in_packets"] > 0
    # mirrored roles: a1's out is b1's in, and vice versa
    assert a1["out_bytes"] == b1["in_bytes"]
    assert a1["in_bytes"] == b1["out_bytes"]
    assert a1["out_packets"] == b1["in_packets"]
    # the v4 closed flow is one-directional: its source has no inbound
    v4 = rows["192.168.1.2"]
    assert v4["out_packets"] > 0 and v4["in_packets"] == 0
    assert v4["io_byte_ratio"] is None  # no inbound bytes -> NULL ratio
