"""Parquet table loaders for the driver testdata layout.

Kept deliberately thin: ``spark.read.parquet`` gives the vectorized
reader, predicate pushdown, and column pruning for free — the engine's
job is to NOT get in Catalyst's way (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_to_parquet_spark.schema import TESTDATA_SCHEMAS
from pcap_to_parquet_spark.session import tune

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan → pushdown-friendly.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright; read it as a long (legacy conf) and truncate
    ns → µs exactly like DuckDB does, so both engines see identical
    microsecond timestamps.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    tune(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load several tables at once: ``l, o = load_tables(s, d, "lineitem", "orders")``."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Give a CPU-dense map stage at least ``defaultParallelism`` tasks.

    A small parquet file arrives as ONE scan split, so per-row-heavy
    work (shingling, hashing, vector math) runs on a single core while
    31 idle — measured 4× end-to-end on the MinHash pipeline at sf0.1.
    A 100-TB table arrives with thousands of splits, in which case this
    is a no-op: the repartition fires only when the plan's partitioning
    is below the floor, so it never adds a shuffle at scale.
    """
    sc = df.sparkSession.sparkContext
    floor = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(floor)
    return df


def keyed_tmp_dirs(kind: str, src: str, logic_version: str, *suffixes: str) -> list[str]:
    """Staleness-keyed tempdir paths for derived artifacts (stream
    sinks, partitioned-lake rewrites): valid only for the exact input
    bytes and logic that produced them.

    The name carries two keys: a SOURCE family key (md5 of the input
    path) and a VALIDITY key (md5 of path + mtime + size + logic
    version). Superseded dirs are swept per source family only — runs
    against a different input (another sf_dir) never delete each
    other's still-valid caches, and a concurrent run on another input
    can't lose its live checkpoint mid-query."""
    import glob
    import hashlib
    import os
    import shutil
    import tempfile

    st = os.stat(src)
    family = hashlib.md5(src.encode()).hexdigest()[:8]
    key = f"{src}|{st.st_mtime_ns}|{st.st_size}|{logic_version}"
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    tmp = tempfile.gettempdir()
    for stale in glob.glob(os.path.join(tmp, f"{kind}_*_{family}_*")):
        if not stale.endswith(tag):
            shutil.rmtree(stale, ignore_errors=True)
    return [os.path.join(tmp, f"{kind}_{s}_{family}_{tag}") for s in suffixes]
