"""pcap as a first-class Spark data source: ``spark.read.format("pcap")``.

The Spark 4 Python Data Source API gives the reference capability its
idiomatic connector form (reference CLI: /root/reference/src/main.rs:59-61):

- **batch**: ``spark.read.format("pcap").load(path)`` — one input
  partition per chunk of each capture (``chunk_specs``), so a single
  large file parallelizes across the cluster exactly like the chunked
  reader; small files get one partition each. Partitions decode with
  the same vectorized numpy kernels as ``read_pcap`` and yield Arrow
  record batches (zero row-at-a-time Python).
- **streaming**: ``spark.readStream.format("pcap").load(dir)`` — a
  landing-directory tail: each micro-batch decodes the files that
  arrived since the last committed offset (offset = sorted seen-file
  list), giving the capture-directory → packets table pipeline a
  Structured Streaming front end.

Options: ``chunk_mb`` (0 = one partition per file; default auto:
chunked over 64 MiB), ``ts_tol_hours`` (resync anchor, chunked mode).

``read_pcap`` / ``read_pcap_chunked`` remain the plain-API fast path;
the connector is the same decode behind the standard source interface.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

PACKET_DDL = (
    "src_ip string, dst_ip string, len bigint, protocol string, "
    "src_port int, dst_port int, mm_ts bigint, mm_id int, mm_port smallint"
)

_PROTOCOL_NAMES = {1: "ICMP", 2: "IGMP", 6: "TCP", 17: "UDP"}


class PcapPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, ts_tol: int) -> None:
        self.path = path
        self.start = start
        self.end = end
        self.ts_tol = ts_tol


_PROTOCOL_NUMS = {v: k for k, v in _PROTOCOL_NAMES.items()}

# pushdown-eligible columns → the decoded array carrying them and its
# validity array (None = always valid)
_PUSH_COLS = {
    "len": ("len", None),
    "src_port": ("src_port", "ports_valid"),
    "dst_port": ("dst_port", "ports_valid"),
    "protocol": ("proto", "proto_valid"),
}


def _filter_mask(a, filters, ipv6=False):  # type: ignore[no-untyped-def]
    """AND of pushed filters as one numpy mask over the decoded arrays
    (SQL semantics: a NULL column value never satisfies a comparison).
    In ipv6 mode protocol filters compare NAMES (the v6 next-header
    names live in the proto6 string array, not the v4 number space);
    the shared port arrays already carry v6 ports, so port/len filters
    work unchanged."""
    import numpy as np

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        LessThan,
        LessThanOrEqual,
    )

    proto_names = None
    if ipv6:
        proto_names = np.array(
            [
                a["proto6"][i]
                if a["proto6"][i] is not None
                else (_PROTOCOL_NAMES.get(int(a["proto"][i])) if a["proto_valid"][i] else None)
                for i in range(len(a["len"]))
            ],
            dtype=object,
        )
        proto_valid6 = np.array([x is not None for x in proto_names], dtype=bool)
        proto_names = np.where(proto_valid6, proto_names, "")

    mask = np.ones(len(a["len"]), dtype=bool)
    for f in filters:
        (col,) = f.attribute
        arr_name, valid_name = _PUSH_COLS[col]
        arr = a[arr_name]
        valid = a[valid_name] if valid_name else np.ones(len(arr), dtype=bool)
        if col == "protocol" and ipv6:
            arr, valid = proto_names, proto_valid6
        if isinstance(f, IsNotNull):
            mask &= valid
            continue
        if col == "protocol":
            if ipv6:
                conv = str
            else:
                # filter values arrive as names; compare on the raw number
                conv = lambda v: _PROTOCOL_NUMS.get(v, -1)  # noqa: E731
        else:
            conv = int
        if isinstance(f, EqualTo):
            mask &= valid & (arr == conv(f.value))
        elif isinstance(f, In):
            mask &= valid & np.isin(arr, [conv(v) for v in f.value])
        elif isinstance(f, GreaterThan):
            mask &= valid & (arr > conv(f.value))
        elif isinstance(f, GreaterThanOrEqual):
            mask &= valid & (arr >= conv(f.value))
        elif isinstance(f, LessThan):
            mask &= valid & (arr < conv(f.value))
        elif isinstance(f, LessThanOrEqual):
            mask &= valid & (arr <= conv(f.value))
        else:  # pragma: no cover - pushFilters admitted it, must handle
            raise AssertionError(f"unhandled pushed filter {f!r}")
    return mask


def _decode_to_arrow(buf: bytes, filters=(), ipv6=False):  # type: ignore[no-untyped-def]
    """One in-memory capture → one Arrow RecordBatch (PACKET_DDL).

    The numeric decode is the shared vectorized kernel; only the
    dotted-quad/protocol-name formatting happens here (the connector
    yields final strings; read_pcap defers that to JVM codegen).
    Pushed filters apply as a numpy mask BETWEEN decode and string
    formatting — pruned packets never materialize Python strings and
    never cross the Arrow boundary. ``ipv6`` merges the v6 text
    columns into the same output fields (same opt-in as read_pcap)."""
    import numpy as np
    import pyarrow as pa

    from pcap_to_parquet_spark.sources.pcap_vec import decode_pcap_arrays

    a = decode_pcap_arrays(buf, ipv6)
    if filters:
        keep = _filter_mask(a, filters, ipv6)
        a = {k: v[keep] for k, v in a.items()}
    n = len(a["len"])

    def dotted(u32: np.ndarray, valid: np.ndarray) -> list:
        out: list = [None] * n
        for i in np.flatnonzero(valid):
            v = int(u32[i])
            out[i] = f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"
        return out

    proto: list = [None] * n
    for i in np.flatnonzero(a["proto_valid"]):
        proto[i] = _PROTOCOL_NAMES.get(int(a["proto"][i]))
    src, dst = dotted(a["src_u32"], a["ip_valid"]), dotted(a["dst_u32"], a["ip_valid"])
    if ipv6:
        for i in range(n):
            if a["src6"][i] is not None:
                src[i], dst[i] = a["src6"][i], a["dst6"][i]
            if a["proto6"][i] is not None:
                proto[i] = a["proto6"][i]

    return pa.record_batch(
        [
            pa.array(src, type=pa.string()),
            pa.array(dst, type=pa.string()),
            pa.array(a["len"].astype("int64")),
            pa.array(proto, type=pa.string()),
            pa.array(
                [int(a["src_port"][i]) if a["ports_valid"][i] else None for i in range(n)],
                type=pa.int32(),
            ),
            pa.array(
                [int(a["dst_port"][i]) if a["ports_valid"][i] else None for i in range(n)],
                type=pa.int32(),
            ),
            pa.array(
                [int(a["mm_ts"][i]) if a["mm_valid"][i] else None for i in range(n)],
                type=pa.int64(),
            ),
            pa.array(
                [int(a["mm_id"][i]) if a["mm_valid"][i] else None for i in range(n)],
                type=pa.int32(),
            ),
            pa.array(
                [int(a["mm_port"][i]) if a["mm_valid"][i] else None for i in range(n)],
                type=pa.int16(),
            ),
        ],
        names=[
            "src_ip",
            "dst_ip",
            "len",
            "protocol",
            "src_port",
            "dst_port",
            "mm_ts",
            "mm_id",
            "mm_port",
        ],
    )


class PcapBatchReader(DataSourceReader):
    def __init__(self, options) -> None:  # type: ignore[no-untyped-def]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pcap source requires a path: .load('<file-or-glob>')")
        chunk_mb = options.get("chunk_mb")
        self.chunk_mb = int(chunk_mb) if chunk_mb is not None else None
        tol_h = options.get("ts_tol_hours")
        from pcap_to_parquet_spark.sources.pcap_chunked import _TS_TOL

        self.ts_tol = int(float(tol_h) * 3600) if tol_h is not None else _TS_TOL
        self.ipv6 = str(options.get("ipv6", "false")).lower() == "true"
        self.pushed: list = []

    def pushFilters(self, filters):  # type: ignore[no-untyped-def]
        """Accept equality/range/membership filters on the decoded
        numeric columns (len, ports, protocol). Accepted filters run as
        a vectorized numpy mask inside the decode kernel, so pruned
        packets never become Python strings or Arrow rows; everything
        else stays with Spark. Each accepted filter is implemented
        EXACTLY (SQL null semantics included), so nothing accepted is
        re-yielded for re-evaluation."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        supported = (
            EqualTo, In, IsNotNull,
            GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
        )
        for f in filters:
            if (
                isinstance(f, supported)
                and len(f.attribute) == 1
                and f.attribute[0] in _PUSH_COLS
            ):
                self.pushed.append(f)
            else:
                yield f

    def partitions(self) -> Sequence[PcapPartition]:
        from pcap_to_parquet_spark.sources.pcap import _AUTO_CHUNK_THRESHOLD
        from pcap_to_parquet_spark.sources.pcap_chunked import chunk_specs

        if self.chunk_mb == 0:
            chunk_bytes = 1 << 62  # one partition per file
        elif self.chunk_mb is None:
            chunk_bytes = _AUTO_CHUNK_THRESHOLD  # auto: big files split
        else:
            chunk_bytes = self.chunk_mb << 20
        return [
            PcapPartition(p, s, e, self.ts_tol)
            for p, s, e in chunk_specs(self.path, chunk_bytes)
        ]

    def read(self, partition: PcapPartition) -> Iterator:  # type: ignore[override]
        from pcap_to_parquet_spark.sources.pcap_chunked import decode_chunk

        size = os.path.getsize(partition.path)
        if partition.start == 0 and partition.end >= size:
            with open(partition.path, "rb") as f:
                buf = f.read()
        else:
            buf = decode_chunk(
                partition.path, partition.start, partition.end, partition.ts_tol
            )
        yield _decode_to_arrow(buf, self.pushed, self.ipv6)


class PcapStreamReader(DataSourceStreamReader):
    """Landing-directory tail: offset = the sorted list of files already
    committed; each planned batch covers the newly arrived files (one
    partition per file — arriving captures are the parallelism unit)."""

    def __init__(self, options) -> None:  # type: ignore[no-untyped-def]
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("pcap stream source requires a directory path")
        self.ipv6 = str(options.get("ipv6", "false")).lower() == "true"

    def _list(self) -> list[str]:
        import glob

        return sorted(glob.glob(os.path.join(self.dir, "*.pcap")))

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": self._list()}

    def partitions(self, start: dict, end: dict) -> Sequence[PcapPartition]:
        from pcap_to_parquet_spark.sources.pcap_chunked import _TS_TOL

        new = [f for f in end["files"] if f not in set(start["files"])]
        if not new:
            # NO-DATA batch (same offset both ends): the engine plans
            # these to advance the watermark and evict/emit closed
            # state (e.g. session-window flows). An empty partition
            # list aborts the batch before the stateful operators run,
            # so yield one sentinel partition that decodes to 0 rows.
            return [PcapPartition("", 0, 0, _TS_TOL)]
        return [PcapPartition(f, 0, 1 << 62, _TS_TOL) for f in new]

    def read(self, partition: PcapPartition) -> Iterator:  # type: ignore[override]
        if not partition.path:  # no-data sentinel: header-only capture
            from pcap_to_parquet_spark.sources.pcap_fixtures import pcap_file

            yield _decode_to_arrow(pcap_file([]), ipv6=self.ipv6)
            return
        with open(partition.path, "rb") as f:
            yield _decode_to_arrow(f.read(), ipv6=self.ipv6)

    def commit(self, end: dict) -> None:
        pass  # offsets are checkpointed by the engine; nothing to clean


def render_packet_record(r):  # type: ignore[no-untyped-def]
    """One PACKET_DDL row → a (ts_sec, origlen, frame_bytes) pcap
    record whose re-decode returns exactly the row.

    The decoder anchors trailers at ORIGLEN (main.rs:92,138): render
    exactly origlen bytes, trailer flush at the end, zero padding
    between body and trailer (a zero sec field can never pass the
    ±300 s accept test, so padding is trailer-scan-inert). Rows whose
    len is smaller than the canonical encoding re-decode best-effort
    as truncated. Property-fuzzed in tests/test_pcap_datasource.py."""
    from pcap_to_parquet_spark.sources.pcap_fixtures import (
        eth,
        ipv4,
        mm_trailer,
        tcp,
        udp,
    )

    proto_l4 = {
        "TCP": (6, lambda r: tcp(r.src_port or 0, r.dst_port or 0)),
        "UDP": (17, lambda r: udp(r.src_port or 0, r.dst_port or 0)),
        "ICMP": (1, lambda r: b"\x08\x00\x00\x00"),
        "IGMP": (2, lambda r: b"\x11\x00\x00\x00"),
    }
    origlen = int(r.len)
    if r.mm_ts is not None:
        sec, ns = divmod(int(r.mm_ts), 1_000_000_000)
        tail = mm_trailer(sec, ns, int(r.mm_id or 0), int(r.mm_port or 0))
        ts_sec = sec  # anchor inside the ±300 s heuristic window
    else:
        tail, ts_sec = b"", 1_700_000_000
    if r.src_ip is None:
        body = eth(b"\x00" * 28, ethertype=0x0806)  # non-IP frame
    else:
        num, l4 = proto_l4.get(r.protocol, (47, lambda r: b"\x00\x00\x08\x00"))
        body = eth(ipv4(num, r.src_ip, r.dst_ip, l4(r)))
    room = origlen - len(tail)
    body = body[:room] if len(body) > room else body + b"\x00" * (room - len(body))
    return ts_sec, origlen, body + tail


class PcapWriter(DataSourceWriter):
    """Rows → legacy pcap: the reverse direction the reference never
    had. Each partition renders its rows as minimal Ethernet/IPv4
    frames (UDP/TCP ports, ICMP/IGMP markers, GRE for ip-but-no-name
    protocols, non-IP ethertype for undecodable rows; a Metamako
    trailer is appended when mm_* fields are set, with the capture
    second anchored to the trailer second so re-decode accepts it) and
    writes one .pcap per non-empty partition. ``origlen`` is the row's
    ``len``, so the reported length survives even though the rendered
    frame is canonical rather than byte-original. Round-trip contract
    (re-decode returns exactly the written rows) is pinned by
    q_pcap_roundtrip and tests/test_pcap_datasource.py."""

    def __init__(self, options, overwrite: bool) -> None:  # type: ignore[no-untyped-def]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pcap sink requires a path: .save('<dir>')")
        self.overwrite = overwrite

    def write(self, rows) -> WriterCommitMessage:  # type: ignore[no-untyped-def]
        import uuid

        from pcap_to_parquet_spark.sources.pcap_fixtures import pcap_file

        records = [render_packet_record(r) for r in rows]
        if records:
            os.makedirs(self.path, exist_ok=True)
            name = os.path.join(self.path, f"part-{uuid.uuid4().hex}.pcap")
            with open(name, "wb") as f:
                f.write(pcap_file(records))
        return WriterCommitMessage()

    def commit(self, messages) -> None:  # type: ignore[no-untyped-def]
        pass  # files are final on write; nothing to publish

    def abort(self, messages) -> None:  # type: ignore[no-untyped-def]
        pass


class PcapDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pcap"

    def schema(self) -> str:
        return PACKET_DDL

    def reader(self, schema) -> PcapBatchReader:  # type: ignore[no-untyped-def]
        return PcapBatchReader(self.options)

    def streamReader(self, schema) -> PcapStreamReader:  # type: ignore[no-untyped-def]
        return PcapStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> PcapWriter:  # type: ignore[no-untyped-def]
        return PcapWriter(self.options, overwrite)


def register_pcap_source(spark) -> None:  # type: ignore[no-untyped-def]
    """Idempotent ``spark.dataSource.register`` of the pcap format.

    Also applies the runtime confs: the reader implements pushFilters,
    and Spark refuses to initialize such readers unless
    spark.sql.python.filterPushdown.enabled is on (set by tune())."""
    from pcap_to_parquet_spark.session import tune

    tune(spark)
    spark.dataSource.register(PcapDataSource)
