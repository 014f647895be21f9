"""pcap Python DataSource: parity with read_pcap, chunked partitions,
streaming directory tail."""

from __future__ import annotations

import os

import pytest

from pcap_to_parquet_spark.sources.pcap import read_pcap
from pcap_to_parquet_spark.sources.pcap_datasource import register_pcap_source
from pcap_to_parquet_spark.sources.pcap_fixtures import (
    BASE_TS,
    eth,
    golden_pcap_bytes,
    ipv4,
    mm_trailer,
    pcap_file,
    tcp,
    udp,
)


def _key(r):
    return tuple((v is None, v) for v in r)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=_key)


def _mixed_pcap(n: int) -> bytes:
    udp_f = eth(ipv4(17, "10.0.0.1", "10.0.0.2", udp(1234, 5678)))
    tcp_f = eth(ipv4(6, "192.168.1.10", "192.168.1.20", tcp(80, 443)))
    mm_f = udp_f + mm_trailer(BASE_TS - 2, 500_000_123, 7, 3)
    mix = [udp_f, tcp_f, mm_f]
    return pcap_file([(BASE_TS, len(mix[i % 3]), mix[i % 3]) for i in range(n)])


@pytest.mark.slow  # >=5s: deselected from the default driver-verify run
def test_datasource_matches_read_pcap_on_golden(spark, tmp_path):
    register_pcap_source(spark)
    p = tmp_path / "golden.pcap"
    p.write_bytes(golden_pcap_bytes())
    got = _rows(spark.read.format("pcap").load(str(p)))
    want = _rows(read_pcap(spark, str(p)))
    assert got == want and len(got) == 13


def test_datasource_chunked_partitions_equal_whole(spark, tmp_path):
    """chunk_mb splits one capture into many input partitions; the
    union of partition outputs equals the unchunked read."""
    register_pcap_source(spark)
    p = tmp_path / "mix.pcap"
    p.write_bytes(_mixed_pcap(2000))
    whole = spark.read.format("pcap").option("chunk_mb", "0").load(str(p))
    chunked = spark.read.format("pcap").option("chunk_mb", "1").load(str(p))
    # below the 1 MiB chunk floor this still may be 1 partition; force
    # the partition count check only if the file crosses the size
    assert _rows(chunked) == _rows(whole)
    assert whole.count() == 2000


@pytest.mark.slow  # >=5s: deselected from the default driver-verify run
def test_datasource_streaming_tails_directory(spark, tmp_path):
    """Each availableNow pass picks up exactly the files that arrived
    since the last committed offset."""
    register_pcap_source(spark)
    land = tmp_path / "landing"
    land.mkdir()
    ck = str(tmp_path / "ck")
    out_rows = []

    def drain():
        q = (
            spark.readStream.format("pcap")
            .load(str(land))
            .writeStream.foreachBatch(
                lambda df, _id: out_rows.extend(df.collect())
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    (land / "a.pcap").write_bytes(golden_pcap_bytes())
    drain()
    assert len(out_rows) == 13
    (land / "b.pcap").write_bytes(_mixed_pcap(30))
    drain()
    assert len(out_rows) == 43  # only the NEW file decoded


@pytest.mark.slow  # >=5s: deselected from the default driver-verify run
def test_datasource_filter_pushdown_parity_and_residual(spark, tmp_path):
    """Pushed filters (ports/len/protocol) return exactly what the
    plain reader + Spark-side filter returns — incl. SQL null
    semantics (a NULL port never matches a comparison) — and
    unsupported filters are yielded back as residuals."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, IsNotNull, StringStartsWith

    register_pcap_source(spark)
    p = tmp_path / "golden.pcap"
    p.write_bytes(golden_pcap_bytes())
    ds = spark.read.format("pcap").load(str(p))
    plain = read_pcap(spark, str(p))

    cases = [
        F.col("protocol") == "TCP",
        F.col("protocol").isin("TCP", "UDP"),
        (F.col("src_port") > 1000) & (F.col("len") <= 100),
        F.col("dst_port").isNotNull(),
        F.col("protocol").isNotNull(),  # GRE packet: proto number, no name
    ]
    for cond in cases:
        got = _rows(ds.filter(cond))
        want = _rows(plain.filter(cond))
        assert got == want, str(cond)
    # fully-pushed equality leaves no post-scan Filter node
    plan = ds.filter(F.col("protocol") == "TCP")._jdf.queryExecution()
    # no Filter OPERATOR above the scan ("RuntimeFilters: []" in the
    # BatchScan line is scan metadata, not an operator)
    assert "Filter (" not in plan.executedPlan().toString()

    # unit: the reader keeps supported filters, yields back the rest
    from pcap_to_parquet_spark.sources.pcap_datasource import PcapBatchReader

    r = PcapBatchReader({"path": str(p)})
    residual = list(
        r.pushFilters(
            [
                EqualTo(("src_port",), 80),
                IsNotNull(("src_ip",)),  # not a pushdown column
                StringStartsWith(("protocol",), "T"),  # unsupported type
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["IsNotNull", "StringStartsWith"]
    assert [type(f).__name__ for f in r.pushed] == ["EqualTo"]


@pytest.mark.slow  # >=5s: deselected from the default driver-verify run
def test_writer_roundtrip_and_filtered_export(spark, tmp_path):
    """df.write.format('pcap') renders frames that re-decode to exactly
    the written rows (trailers, undecodable rows, reported lengths) —
    and a FILTERED write exports a valid capture of just the matching
    traffic."""
    from pyspark.sql import functions as F

    register_pcap_source(spark)
    p = tmp_path / "golden.pcap"
    p.write_bytes(golden_pcap_bytes())
    df = spark.read.format("pcap").load(str(p))

    full = tmp_path / "full"
    df.write.format("pcap").mode("append").save(str(full))
    back = spark.read.format("pcap").load(str(full / "*.pcap"))
    assert _rows(back) == _rows(df)

    flt = tmp_path / "udp_only"
    df.filter(F.col("protocol") == "UDP").write.format("pcap").mode("append").save(str(flt))
    udp_back = spark.read.format("pcap").load(str(flt / "*.pcap"))
    assert _rows(udp_back) == _rows(df.filter(F.col("protocol") == "UDP"))
    assert udp_back.count() == 7


def test_writer_render_roundtrips_arbitrary_rows():
    """Property fuzz (no Spark needed): any decoder-image row renders
    to a frame whose scalar re-decode returns exactly the row. IPs are
    drawn outside the ±300 s trailer-second window around the writer's
    fixed capture second, mirroring the decoder's documented heuristic
    domain (an IP that happens to encode ~1.7e9 can fake a trailer on
    ANY capture — reference semantics, not a writer defect)."""
    from types import SimpleNamespace

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pcap_to_parquet_spark.sources.pcap import decode_packet
    from pcap_to_parquet_spark.sources.pcap_datasource import render_packet_record

    ip = st.tuples(
        st.sampled_from([10, 192]),
        st.integers(0, 255),
        st.integers(0, 255),
        st.integers(0, 255),
    ).map(lambda t: ".".join(map(str, t)))
    port = st.integers(0, 65535)
    # trailer seconds drawn ABOVE every 10.x.y.z u32 (~1.8e8) and below
    # 2^31: a trailer second within ±300 of any embedded big-endian u32
    # (e.g. an IP address) lets the stacked-trailer slide accept a fake
    # inner trailer — the reference heuristic's documented false
    # positive (hypothesis found the collision at sec≈ip_u32), not a
    # writer defect; 192.x reads as a negative i32 and can never match
    mm = st.one_of(
        st.none(),
        st.tuples(
            st.integers(1_000_000_000, 2_000_000_000),  # trailer seconds (i32)
            st.integers(0, 999_999_999),
            st.integers(0, 65535),
            st.integers(0, 255),
        ),
    )

    def build(kind, src, dst, sport, dport, extra_len, mm_t):
        base = {
            "TCP": 54, "UDP": 54, "ICMP": 38, "IGMP": 38, "GRE": 38, "NONIP": 16,
        }[kind]
        length = base + (16 if mm_t else 0) + extra_len
        return SimpleNamespace(
            src_ip=None if kind == "NONIP" else src,
            dst_ip=None if kind == "NONIP" else dst,
            len=length,
            protocol=kind if kind in ("TCP", "UDP", "ICMP", "IGMP") else None,
            src_port=sport if kind in ("TCP", "UDP") else None,
            dst_port=dport if kind in ("TCP", "UDP") else None,
            mm_ts=(mm_t[0] * 10**9 + mm_t[1]) if mm_t else None,
            mm_id=mm_t[2] if mm_t else None,
            mm_port=mm_t[3] if mm_t else None,
        )

    @settings(max_examples=300, deadline=None)
    @given(
        kind=st.sampled_from(["TCP", "UDP", "ICMP", "IGMP", "GRE", "NONIP"]),
        src=ip, dst=ip, sport=port, dport=port,
        extra_len=st.integers(0, 120),
        mm_t=mm,
    )
    def check(kind, src, dst, sport, dport, extra_len, mm_t):
        row = build(kind, src, dst, sport, dport, extra_len, mm_t)
        ts_sec, origlen, data = render_packet_record(row)
        got = decode_packet(data, ts_sec, origlen)
        want = {
            "src_ip": row.src_ip, "dst_ip": row.dst_ip, "len": row.len,
            "protocol": row.protocol, "src_port": row.src_port,
            "dst_port": row.dst_port, "mm_ts": row.mm_ts,
            "mm_id": row.mm_id, "mm_port": row.mm_port,
        }
        assert got == want, (got, want)

    check()
