"""pcapng reader: hand-built block fixtures, decode parity with the
legacy container (same frames → same rows)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

settings_deco = lambda f: settings(max_examples=150, deadline=None)(given(st.data())(f))  # noqa: E731
PCAPNG_MAGIC_BYTES = b"\x0a\x0d\x0d\x0a"

from pcap_to_parquet_spark.sources.pcap import PcapFormatError, decode_pcap_bytes
from pcap_to_parquet_spark.sources.pcap_fixtures import (
    BASE_TS,
    eth,
    fixture_packets,
    ipv4,
    pcap_file,
    udp,
)
from pcap_to_parquet_spark.sources.pcapng import (
    decode_pcapng_bytes,
    read_pcapng,
    split_pcapng_records,
)


def _block(btype: int, body: bytes, order: str = "<") -> bytes:
    total = 12 + len(body) + (-len(body) % 4)
    pad = b"\x00" * (-len(body) % 4)
    return struct.pack(f"{order}II", btype, total) + body + pad + struct.pack(f"{order}I", total)


def shb(order: str = "<") -> bytes:
    bom = 0x1A2B3C4D
    body = struct.pack(f"{order}IHHq", bom, 1, 0, -1)
    return _block(0x0A0D0D0A, body, order)


def idb(tsresol: int | None = None, snaplen: int = 65535, order: str = "<") -> bytes:
    body = struct.pack(f"{order}HHI", 1, 0, snaplen)  # linktype=EN10MB
    if tsresol is not None:
        body += struct.pack(f"{order}HH", 9, 1) + bytes([tsresol]) + b"\x00" * 3
        body += struct.pack(f"{order}HH", 0, 0)
    return _block(0x00000001, body, order)


def epb(ts_ticks: int, data: bytes, origlen: int | None = None, if_id: int = 0, order: str = "<") -> bytes:
    body = struct.pack(
        f"{order}IIIII", if_id, ts_ticks >> 32, ts_ticks & 0xFFFFFFFF, len(data),
        origlen if origlen is not None else len(data),
    ) + data
    return _block(0x00000006, body, order)


def spb(data: bytes, origlen: int, order: str = "<") -> bytes:
    return _block(0x00000003, struct.pack(f"{order}I", origlen) + data, order)


UDP_FRAME = eth(ipv4(17, "10.0.0.1", "10.0.0.2", udp(1234, 5678)))


def test_epb_microsecond_default():
    buf = shb() + idb() + epb(BASE_TS * 10**6 + 123456, UDP_FRAME)
    recs = list(split_pcapng_records(buf))
    assert recs == [(BASE_TS, 123456, len(UDP_FRAME), UDP_FRAME)]


def test_epb_nanosecond_tsresol():
    buf = shb() + idb(tsresol=9) + epb(BASE_TS * 10**9 + 987, UDP_FRAME)
    (ts, sub, orig, data), = split_pcapng_records(buf)
    assert (ts, sub) == (BASE_TS, 987)


def test_decode_parity_with_legacy_container():
    """Same frames through pcapng and legacy pcap → identical rows
    (including Metamako trailers, which need the EPB seconds)."""
    recs = list(fixture_packets().values())
    legacy = pcap_file(recs)
    ng = shb() + idb()
    for ts_sec, origlen, data in recs:
        ng += epb(ts_sec * 10**6, data, origlen=origlen)
    assert decode_pcapng_bytes(ng) == decode_pcap_bytes(legacy)


def test_big_endian_section():
    buf = shb(">") + idb(order=">") + epb(BASE_TS * 10**6, UDP_FRAME, order=">")
    (ts, _sub, orig, data), = split_pcapng_records(buf)
    assert ts == BASE_TS and data == UDP_FRAME


def test_multi_section_and_unknown_blocks():
    unknown = _block(0x0BAD, b"\x01\x02\x03")
    buf = (
        shb() + idb() + epb(BASE_TS * 10**6, UDP_FRAME)
        + unknown
        + shb(">") + idb(order=">") + epb((BASE_TS + 1) * 10**6, UDP_FRAME, order=">")
    )
    recs = list(split_pcapng_records(buf))
    assert [r[0] for r in recs] == [BASE_TS, BASE_TS + 1]


def test_spb_and_truncated_tail():
    buf = shb() + idb(snaplen=60) + spb(UDP_FRAME[:50], origlen=len(UDP_FRAME))
    (ts, _sub, orig, data), = split_pcapng_records(buf)
    assert (ts, orig, data) == (0, len(UDP_FRAME), UDP_FRAME[:50])
    # truncated tail: a half-written EPB terminates cleanly
    buf2 = shb() + idb() + epb(BASE_TS * 10**6, UDP_FRAME)
    partial = epb(BASE_TS * 10**6, UDP_FRAME)[:20]
    assert len(list(split_pcapng_records(buf2 + partial))) == 1


def test_rejects_non_pcapng():
    with pytest.raises(PcapFormatError):
        list(split_pcapng_records(pcap_file([(BASE_TS, 4, b"abcd")])))
    with pytest.raises(PcapFormatError):
        list(split_pcapng_records(b"\x0a\x0d\x0d\x0a" + b"\x00" * 20))  # bad BOM


def test_spark_read_pcapng(spark, tmp_path):
    recs = list(fixture_packets().values())
    ng = shb() + idb()
    for ts_sec, origlen, data in recs:
        ng += epb(ts_sec * 10**6, data, origlen=origlen)
    p = tmp_path / "cap.pcapng"
    p.write_bytes(ng)
    rows = sorted((tuple(r) for r in read_pcapng(spark, str(p)).collect()), key=repr)
    want = sorted((tuple(r.values()) for r in decode_pcap_bytes(pcap_file(recs))), key=repr)
    assert rows == want


@settings_deco
def test_pcapng_never_crashes(data):
    """Random bytes after a valid SHB must never raise — truncated or
    garbage blocks terminate the stream cleanly. Fuzzes all the way
    through reframe_legacy + the vectorized decoder (the read_pcapng
    task path), not just the splitter: a garbage EPB timestamp once
    raised struct.error inside the re-framing repack."""
    from pcap_to_parquet_spark.sources.pcap_vec import decode_pcap_arrays
    from pcap_to_parquet_spark.sources.pcapng import reframe_legacy

    junk = data.draw(st.binary(max_size=300))
    try:
        decode_pcap_arrays(reframe_legacy(shb() + junk))
    except PcapFormatError:
        pass  # acceptable only for malformed FIRST block; junk appended
        # after a valid SHB must not produce it
        raise


def test_far_future_epb_timestamp_masked():
    """An EPB whose seconds exceed u32 (garbage or year-38k) must not
    raise in the re-framing path: seconds wrap to u32, the packet
    survives with its data intact (malformed input never raises)."""
    from pcap_to_parquet_spark.sources.pcap_vec import decode_pcap_arrays
    from pcap_to_parquet_spark.sources.pcapng import reframe_legacy

    huge = (1 << 40) * 10**6  # seconds = 2^40 > u32
    buf = shb() + idb() + epb(huge, UDP_FRAME)
    (ts, _sub, orig, data), = split_pcapng_records(buf)
    assert ts == (1 << 40) & 0xFFFFFFFF and data == UDP_FRAME
    arrays = decode_pcap_arrays(reframe_legacy(buf))  # must not raise
    assert len(arrays["len"]) == 1


def test_malformed_idb_keeps_interface_alignment():
    """A malformed IDB (body < 8 bytes) still owns its interface id:
    the NEXT interface's tsresol must not shift down by one."""
    bad_idb = _block(0x00000001, b"\x01\x00")  # 2-byte body
    buf = (
        shb()
        + bad_idb  # if_id 0 (malformed -> default micro resolution)
        + idb(tsresol=9)  # if_id 1: nanosecond
        + epb(BASE_TS * 10**9 + 987, UDP_FRAME, if_id=1)
    )
    (ts, sub, _orig, _data), = split_pcapng_records(buf)
    assert (ts, sub) == (BASE_TS, 987)  # ns divisor applied, not 10^6


@settings_deco
def test_pcapng_garbage_prefix_rejected(data):
    junk = data.draw(st.binary(min_size=0, max_size=64))
    if junk[:4] == PCAPNG_MAGIC_BYTES:
        return
    with pytest.raises(PcapFormatError):
        list(split_pcapng_records(junk))
