"""UDTF (packet → per-trailer rows) and grouped pandas UDAF."""

from __future__ import annotations

from pcap_to_parquet_spark.operators.udtf_udaf import enumerate_trailers
from pcap_to_parquet_spark.registry import QUERIES
from pcap_to_parquet_spark.sources.pcap_fixtures import BASE_TS, fixture_packets


def test_enumerate_trailers_stacked():
    ts, origlen, data = fixture_packets()["mm_stacked"]
    got = enumerate_trailers(data, ts, origlen)
    # outermost (device 2, last-appended) first, then innermost (device 1)
    assert [(t["mm_id"], t["mm_port"]) for t in got] == [(2, 2), (1, 1)]
    assert got[1]["mm_ts"] == (BASE_TS - 3) * 10**9 + 111_111_111


def test_enumerate_trailers_fcs_and_reject():
    ts, origlen, data = fixture_packets()["mm_fcs"]
    assert [t["mm_id"] for t in enumerate_trailers(data, ts, origlen)] == [9]
    ts, origlen, data = fixture_packets()["mm_reject"]
    assert enumerate_trailers(data, ts, origlen) == []


def test_udtf_lateral_rows(spark):
    rows = [tuple(r) for r in QUERIES["q_pcap_trailers"](spark, "").collect()]
    stacked = [r for r in rows if r[0] == fixture_packets()["mm_stacked"][1]]
    # (origlen, trailer_idx, mm_ts, mm_id, mm_port), outermost first
    assert stacked == [
        (82, 0, (BASE_TS - 1) * 10**9 + 222_222_222, 2, 2),
        (82, 1, (BASE_TS - 3) * 10**9 + 111_111_111, 1, 1),
    ]


def test_udaf_robust_stats_matches_pandas(spark):
    from tests.conftest import SF0001

    rows = {r.user_id: r for r in QUERIES["q_udaf_robust_stats"](spark, SF0001).collect()}
    import duckdb

    exp = duckdb.sql(
        f"""SELECT user_id, COUNT(*) n, ROUND(median(value),4) m, ROUND(mad(value),4) d
            FROM '{SF0001}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    for uid, n, m, d in exp:
        r = rows[uid]
        assert (r.n_events, r.median_value, r.mad_value) == (n, m, d)
