"""Lake maintenance: compaction file counts, sorted-write data skipping."""

from __future__ import annotations

import duckdb

from pcap_to_parquet_spark.sources.lake import compact_parquet, write_sorted
from pcap_to_parquet_spark.sources.tables import load_table
from tests.conftest import SF001


def _parquet_files(d: str):
    import glob

    return glob.glob(f"{d}/*.parquet")


def test_compact_small_files(spark, tmp_path):
    li = load_table(spark, SF001, "lineitem")
    fragmented = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(fragmented)  # the small-file disease
    assert len(_parquet_files(fragmented)) == 64
    compacted = str(tmp_path / "compacted")
    compact_parquet(spark, fragmented, compacted, target_mb=256)
    assert len(_parquet_files(compacted)) <= 2
    # content survives
    a = spark.read.parquet(fragmented).count()
    b = spark.read.parquet(compacted).count()
    assert a == b


def test_write_sorted_rowgroup_stats(spark, tmp_path):
    li = load_table(spark, SF001, "lineitem")
    dst = str(tmp_path / "sorted")
    write_sorted(li.select("l_orderkey", "l_quantity", "l_shipdate"), dst, ["l_orderkey"], files=4)
    # per-file key ranges must be (nearly) non-overlapping and row-group
    # min/max tight: total min..max span across row groups ≈ domain,
    # while each row group covers a narrow slice
    meta = duckdb.sql(
        f"""SELECT file_name,
                   stats_min_value::BIGINT AS mn, stats_max_value::BIGINT AS mx
            FROM parquet_metadata('{dst}/*.parquet')
            WHERE path_in_schema = 'l_orderkey'"""
    ).fetchall()
    assert len(meta) >= 4
    domain = max(m[2] for m in meta) - min(m[1] for m in meta)
    avg_span = sum(m[2] - m[1] for m in meta) / len(meta)
    assert avg_span < domain / 2  # each row group covers a narrow slice
    # file-level ranges: non-overlapping (range partitioner guarantee)
    per_file: dict = {}
    for f, mn, mx in meta:
        lo, hi = per_file.get(f, (mn, mx))
        per_file[f] = (min(lo, mn), max(hi, mx))
    ranges = sorted(per_file.values())
    assert all(ranges[i][1] <= ranges[i + 1][0] for i in range(len(ranges) - 1))
