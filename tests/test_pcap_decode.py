"""Pure-Python decoder unit tests — no Spark.

Each case is keyed to the reference lines it reproduces
(/root/reference/src/main.rs); fixtures are hand-assembled byte
strings from pcap_to_parquet_spark.sources.pcap_fixtures.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pcap_to_parquet_spark.sources.pcap import (
    PcapFormatError,
    _parse_metamako_trailer,
    decode_packet,
    decode_pcap_bytes,
    split_pcap_records,
)
from pcap_to_parquet_spark.sources.pcap_fixtures import (
    BASE_TS,
    eth,
    fixture_packets,
    ipv4,
    mm_trailer,
    pcap_file,
    udp,
)

FIX = fixture_packets()


def decode(name: str) -> dict:
    ts, origlen, data = FIX[name]
    return decode_packet(data, ts, origlen)


# ---------------------------------------------------------------------------
# golden decode paths (main.rs:185-252 dispatch table)


def test_udp_plain():
    r = decode("udp_plain")
    assert r == {
        "src_ip": "10.0.0.1",
        "dst_ip": "10.0.0.2",
        "len": FIX["udp_plain"][1],
        "protocol": "UDP",
        "src_port": 1234,
        "dst_port": 5678,
        "mm_ts": None,
        "mm_id": None,
        "mm_port": None,
    }


def test_tcp_plain():
    r = decode("tcp_plain")
    assert (r["protocol"], r["src_port"], r["dst_port"]) == ("TCP", 80, 443)
    assert (r["src_ip"], r["dst_ip"]) == ("192.168.1.10", "192.168.1.20")


def test_icmp_igmp_no_ports():
    # protocol named, ports never parsed (main.rs:199-202)
    for name, proto in [("icmp", "ICMP"), ("igmp", "IGMP")]:
        r = decode(name)
        assert r["protocol"] == proto
        assert r["src_port"] is None and r["dst_port"] is None


def test_proto_other_null_protocol():
    # GRE(47) → protocol NULL but IPs still set (main.rs:203-210 catch-all)
    r = decode("proto_other")
    assert r["protocol"] is None
    assert r["src_ip"] == "10.3.3.1" and r["dst_ip"] == "10.3.3.2"


def test_vlan_udp():
    # 802.1Q → inner ethertype at 16-17, IPv4 at 18 (main.rs:243-250)
    r = decode("vlan_udp")
    assert (r["src_ip"], r["dst_ip"]) == ("172.16.0.1", "172.16.0.2")
    assert (r["protocol"], r["src_port"], r["dst_port"]) == ("UDP", 53, 5353)


def test_non_ip_all_null_but_len():
    # ARP ethertype ignored (main.rs:251: catch-all does nothing)
    r = decode("non_ip")
    assert r["len"] == FIX["non_ip"][1]
    assert all(
        r[k] is None
        for k in ("src_ip", "dst_ip", "protocol", "src_port", "dst_port", "mm_ts")
    )


def test_short_frame_null_not_panic():
    # reference panics on <14-byte frames (main.rs:237); engine yields NULLs
    r = decode("short_frame")
    assert r["len"] == 10
    assert r["src_ip"] is None and r["protocol"] is None


def test_truncated_capture_null_not_panic():
    # caplen < origlen: reference would index past the buffer (main.rs:93-98)
    r = decode("truncated")
    assert r["len"] == FIX["truncated"][1]  # len = origlen, not caplen (main.rs:90)
    assert r["src_ip"] == "10.9.9.1" and r["protocol"] == "UDP"


# ---------------------------------------------------------------------------
# Metamako trailer semantics (main.rs:128-183, SURVEY §2.1)


def test_mm_single():
    r = decode("mm_single")
    assert r["mm_ts"] == (BASE_TS - 2) * 10**9 + 500_000_123
    assert (r["mm_id"], r["mm_port"]) == (7, 3)
    # L3/L4 decode unaffected by the trailer bytes
    assert (r["protocol"], r["src_port"]) == ("UDP", 1234)


def test_mm_stacked_innermost_wins():
    # overwrite semantics: last successful (innermost = first-appended)
    # parse wins (main.rs:124-127, 175-177)
    r = decode("mm_stacked")
    assert r["mm_ts"] == (BASE_TS - 3) * 10**9 + 111_111_111
    assert (r["mm_id"], r["mm_port"]) == (1, 1)


def test_mm_fcs_fallback():
    # no trailer at the very end → retry at len-4 (main.rs:141-146)
    r = decode("mm_fcs")
    assert r["mm_ts"] == (BASE_TS - 5) * 10**9 + 777_777_777
    assert (r["mm_id"], r["mm_port"]) == (9, 4)


def test_mm_reject_time_window():
    # |pcap_ts - mm_s| >= 300 s → trailer rejected (main.rs:174)
    r = decode("mm_reject")
    assert r["mm_ts"] is None and r["mm_id"] is None and r["mm_port"] is None


@pytest.mark.parametrize(
    "d_sec,ns,accept",
    [
        (299, 1, True),  # boundary: strict < 300 (main.rs:174)
        (300, 1, False),
        (-299, 1, True),  # abs() both sides
        (0, 999_999_999, True),  # boundary: strict < 1e9
        (0, 1_000_000_000, False),
        (0, -5, True),  # signed i32 compare: negative ns passes (main.rs:174)
    ],
)
def test_trailer_acceptance_bounds(d_sec, ns, accept):
    data = b"\x00" * 8 + mm_trailer(BASE_TS + d_sec, ns, 42, 9)
    fields: dict = {}
    got = _parse_metamako_trailer(data, fields, BASE_TS, len(data))
    assert (got == 16) is accept
    if accept:
        assert fields["mm_id"] == 42 and fields["mm_port"] == 9
        assert fields["mm_ts"] == (BASE_TS + d_sec) * 10**9 + ns
    else:
        assert fields == {}


def test_trailer_out_of_range_returns_none():
    assert _parse_metamako_trailer(b"\x00" * 4, {}, BASE_TS, 16) is None
    assert _parse_metamako_trailer(b"\x00" * 20, {}, BASE_TS, 11) is None


# ---------------------------------------------------------------------------
# pcap framing (split_pcap_records)


def test_split_roundtrip():
    recs = [(BASE_TS, 50, b"\xab" * 50), (BASE_TS + 1, 200, b"\xcd" * 60)]
    got = list(split_pcap_records(pcap_file(recs)))
    assert [(t, o, d) for t, _s, o, d in got] == recs


def test_split_rejects_pcapng_and_garbage():
    with pytest.raises(PcapFormatError):
        list(split_pcap_records(b"\x0a\x0d\x0d\x0a" + b"\x00" * 40))  # pcapng magic
    with pytest.raises(PcapFormatError):
        list(split_pcap_records(b"not a pcap at all, nope"))
    with pytest.raises(PcapFormatError):
        list(split_pcap_records(b"\x00" * 10))  # shorter than global header


def test_split_drops_truncated_tail():
    buf = pcap_file([(BASE_TS, 8, b"\x01" * 8)])
    buf += b"\xff" * 10  # half a record header
    assert len(list(split_pcap_records(buf))) == 1


def test_big_endian_pcap():
    import struct

    hdr = struct.pack(">IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    rec = struct.pack(">IIII", BASE_TS, 0, 4, 4) + b"\xaa\xbb\xcc\xdd"
    got = list(split_pcap_records(hdr + rec))
    assert got == [(BASE_TS, 0, 4, b"\xaa\xbb\xcc\xdd")]


# ---------------------------------------------------------------------------
# properties: never raise, one row per packet (main.rs:88-107 invariant)


@settings(max_examples=200, deadline=None)
@given(data=st.binary(max_size=120), origlen=st.integers(0, 1 << 31))
def test_decode_never_raises(data, origlen):
    r = decode_packet(data, BASE_TS, origlen)
    assert set(r) == {
        "src_ip", "dst_ip", "len", "protocol",
        "src_port", "dst_port", "mm_ts", "mm_id", "mm_port",
    }
    assert r["len"] == origlen


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(max_size=80), max_size=8))
def test_one_row_per_packet(datas):
    recs = [(BASE_TS, len(d), d) for d in datas]
    assert len(decode_pcap_bytes(pcap_file(recs))) == len(recs)


def test_decode_roundtrip_wellformed():
    # decode(encode(fields)) == fields for a constructed UDP packet
    frame = eth(ipv4(17, "1.2.3.4", "5.6.7.8", udp(111, 222)))
    r = decode_packet(frame, BASE_TS, len(frame))
    assert (r["src_ip"], r["dst_ip"], r["src_port"], r["dst_port"]) == (
        "1.2.3.4", "5.6.7.8", 111, 222,
    )
