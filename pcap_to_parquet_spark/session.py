"""SparkSession construction and runtime tuning.

Two paths:
- :func:`get_spark` builds a local session (tests, bench.py).
- :func:`tune` applies the runtime-settable knobs to a session we did
  NOT build (the driver passes its own session into ``entry()`` /
  ``queries()``), so correctness-critical settings (UTC timezone,
  AQE) hold regardless of who built the session.

Scale notes (100 TB target): everything here is also valid on a real
cluster — AQE handles skew/coalescing at runtime, shuffle partitions
are a starting hint that AQE re-plans, and zstd matches the
reference's output codec (/root/reference/src/main.rs:72-75).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session that runs our queries.
RUNTIME_CONF: dict[str, str] = {
    # Deterministic timestamp semantics vs the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join splitting, broadcast promotion.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Reference writes ZSTD parquet (main.rs:72-75); we match on every sink.
    "spark.sql.parquet.compression.codec": "zstd",
    # Wide aggregates (128 MinHash minima) must stay in whole-stage
    # codegen; the default cutoff (100 fields) silently drops to
    # interpreted mode — measured 1.3x slower on the signature stage.
    "spark.sql.codegen.maxFields": "256",
    # Python data sources may implement pushFilters (the pcap source
    # prunes packets inside the decode kernel); without this the
    # planner refuses to initialize such readers.
    "spark.sql.python.filterPushdown.enabled": "true",
}

# Build-time confs (only honored when *we* construct the session).
BUILD_CONF: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": "24g",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


_BYTE_SUFFIX = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def parse_byte_conf(raw: str) -> int:
    """A Spark byte-conf value in bytes, accepting the same unit
    suffixes the JVM does ('10MB', '64m', '10485760b', bare digits).
    Unparseable or disabled (negative) values return 0, which callers
    read as "never broadcast" — the always-correct shuffled fallback."""
    try:
        s = str(raw).strip().lower()
        for suf in sorted(_BYTE_SUFFIX, key=len, reverse=True):
            if s.endswith(suf):
                return max(int(float(s[: -len(suf)])) * _BYTE_SUFFIX[suf], 0)
        return max(int(s), 0)
    except Exception:  # noqa: BLE001 - any exotic value means "don't broadcast"
        return 0


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` in bytes. Driver-
    provided sessions can legally carry unit-suffixed values (tune()
    never sets this key), so a bare int() would crash the
    scale-adaptive join planners in q_triangle_count / q_pagerank."""
    return parse_byte_conf(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "67108864")
    )


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable correctness/perf confs; safe on any session."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this session build; defaults are close
    return spark


def get_spark(app_name: str = "pcap-to-parquet-spark", cpus: int | None = None) -> SparkSession:
    """Local session for tests and bench; cluster deploys pass their own."""
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    b = SparkSession.builder.appName(app_name).master(f"local[{n}]")
    for k, v in {**BUILD_CONF, **RUNTIME_CONF}.items():
        b = b.config(k, v)
    return tune(b.getOrCreate())
