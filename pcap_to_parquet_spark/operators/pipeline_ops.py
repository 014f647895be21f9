"""Warehouse / lakehouse pipeline operators: SCD2 dimension build,
gaps-and-islands, z-score anomaly detection, exact percentiles,
arg-extrema aggregates, balanced stratified sampling.

These are the table-maintenance and data-profiling shapes a curation
pipeline runs around the core engine. Scale discipline, per operator:

- SCD2 and islands are single-shuffle window compositions (one
  Exchange on the partition key, every window reuses the sort);
- anomaly z-score uses aggregate + broadcast-join, NOT a window: the
  per-group stats frame is group-count-sized, so it broadcasts, and
  the detector stays map-side — a window would re-sort the whole
  fact table for 5 groups;
- exact percentiles use Spark's built-in ``percentile`` (exact,
  interpolated — a sort-based agg, the right tool below ~1e8 rows per
  group; at true 100 TB swap in approx_percentile and the oracle
  becomes rows-only);
- balanced sampling ranks within strata by a content-addressed md5
  key, so the sample is reproducible across engines, re-runs, and
  repartitioning (same argument as q_train_test_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table

# ---------------------------------------------------------------------------
# SCD2 dimension build (CDC stream -> effective-dated dimension rows)

# epoch micros for 9999-01-01T00:00:00Z — the open-ended "current row"
# sentinel (identical literal in both engines; NULL would break the
# driver hash's null ordering)
_SCD2_OPEN_END = 253_370_764_800_000_000

SCD2_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER w AS prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
    SELECT user_id, ts, event_id, event_type
    FROM ordered
    WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type AS state,
       epoch_us(ts) AS eff_from,
       COALESCE(epoch_us(LEAD(ts) OVER w), {_SCD2_OPEN_END}) AS eff_to,
       CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("q_scd2_dimension", SCD2_ORACLE)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a CDC-shaped event
    stream: collapse consecutive duplicate states, then effective-date
    each state run (eff_from = change ts, eff_to = next change ts,
    open-ended sentinel for the current row).

    One shuffle on user_id; the lag (dedup) and lead (dating) windows
    share the same partitioning + sort, so Spark plans a single
    Exchange and sorts once. This is the standard dimension-table
    maintenance op a warehouse runs on every CDC batch."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .select("user_id", "ts", "event_id", "event_type")
    )
    # the lead pass reuses the SAME window spec — identical partitioning
    # + sort is what lets Spark plan one Exchange for both windows
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("eff_from"),
        F.coalesce(F.unix_micros(nxt), F.lit(_SCD2_OPEN_END)).alias("eff_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# gaps and islands: consecutive active-day runs per user

_US_PER_DAY = 86_400_000_000

ISLANDS_ORACLE = f"""
WITH days AS (
    SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
    FROM events
),
grp AS (
    SELECT user_id, day,
           day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS g
    FROM days
)
SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end,
       COUNT(*) AS n_days
FROM grp
GROUP BY user_id, g
"""


@query("q_sequence_islands", ISLANDS_ORACLE)
def sequence_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of consecutive
    active days (the streak / retention primitive). The classic
    day - row_number() grouping key — all-integer arithmetic, so the
    oracle comparison is exact.

    distinct + window + groupBy all key on user_id: AQE coalesces
    them onto one Exchange chain; nothing is corpus-wide."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.floor(F.unix_micros("ts") / _US_PER_DAY).cast("bigint").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("g", F.col("day") - F.row_number().over(w))
    return grp.groupBy("user_id", "g").agg(
        F.min("day").alias("island_start"),
        F.max("day").alias("island_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("g")


# ---------------------------------------------------------------------------
# z-score anomaly detection (aggregate + broadcast join, not a window)

_Z_CUT = 2.5

ANOMALY_ORACLE = f"""
WITH stats AS (
    SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, ROUND(e.value, 4) AS value,
       ROUND((e.value - s.mu) / s.sd, 4) AS zscore
FROM events e JOIN stats s USING (event_type)
WHERE s.sd > 0 AND ABS((e.value - s.mu) / s.sd) > {_Z_CUT}
"""


@query("q_anomaly_zscore", ANOMALY_ORACLE)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers (|z| > 2.5): the metric-monitoring /
    data-quality gate shape.

    Deliberately NOT a window function: group stats are one row per
    event_type (a handful), so they broadcast and the detector is a
    map-side join — a window would shuffle+sort the whole fact table
    into 5 giant skewed partitions. This agg-then-broadcast-join is
    the scale-correct pattern for low-cardinality group stats."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) > _Z_CUT))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# exact interpolated percentiles per group

PERCENTILE_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_percentile_exact", PERCENTILE_ORACLE)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the same
    definition (h = (n-1)p between order statistics), so the values
    match to the ulp and the driver hash is checked on ROUND(…, 4).

    ``percentile`` buffers each group's values (a sort-based agg):
    right up to ~1e8 rows per group. Past that, switch to
    approx_percentile (t-digest, mergeable, bounded memory) — the
    q_stats_agg query demonstrates that path."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = [0.25, 0.50, 0.75, 0.90]
    aggs = [
        F.round(F.expr(f"percentile(l_extendedprice, {p})"), 4).alias(a)
        for p, a in zip(pct, ["p25", "p50", "p75", "p90"])
    ]
    return li.groupBy("l_returnflag").agg(*aggs)


# ---------------------------------------------------------------------------
# arg-extrema aggregates (max_by / min_by)

MINMAX_BY_ORACLE = """
SELECT n.n_name,
       arg_max(c.c_name, c.c_acctbal) AS richest,
       arg_min(c.c_name, c.c_acctbal) AS poorest,
       ROUND(MAX(c.c_acctbal), 2) AS max_bal,
       ROUND(MIN(c.c_acctbal), 2) AS min_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("q_minmax_by", MINMAX_BY_ORACLE)
def minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extrema per group: the customer holding each nation's
    max/min balance in ONE aggregation pass (max_by/min_by ==
    DuckDB's arg_max/arg_min) — no self-join back to the fact table,
    no window, which is what makes this the scale shape for
    "row achieving the group extreme". Balances are continuous
    doubles read from the same parquet by both engines, so the
    extremes are tie-free and the arg values deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr("max_by(c_name, c_acctbal)").alias("richest"),
            F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
    )


# ---------------------------------------------------------------------------
# balanced stratified sample: exactly k = min-stratum-size docs per lang

BALANCED_SAMPLE_ORACLE = """
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
),
target AS (
    SELECT MIN(cnt) AS k
    FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)
)
SELECT r.doc_id, r.lang
FROM ranked r, target t
WHERE r.rn <= t.k
"""


@query("q_balanced_sample", BALANCED_SAMPLE_ORACLE)
def balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced stratified sampling: every language stratum is
    down-sampled to exactly k = |smallest stratum| docs, selected by
    rank over a content-addressed md5 key — deterministic across
    engines, re-runs, and repartitioning (randomSplit/sampleBy are
    neither), and exact-k where a rate gate (q_data_mixing) is only
    exact in expectation.

    The rank window partitions BY STRATUM, so each sort is
    stratum-local; the k scalar is a one-row broadcast. At 100 TB,
    exact-k ranking of a giant stratum costs a per-stratum sort —
    if approximate k suffices, gate on the md5 value against
    k/|stratum| instead (map-only, the q_data_mixing shape)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
    k = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("k"))
    )
    return ranked.join(F.broadcast(k), ranked.rn <= k.k).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# time-series resample with gap fill

RESAMPLE_ORACLE = f"""
WITH b AS (
    SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day, value FROM events
),
span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
    SELECT t.event_type, unnest(generate_series(s.lo, s.hi)) AS day
    FROM types t CROSS JOIN span s
),
agg AS (
    SELECT event_type, day, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM b GROUP BY event_type, day
)
SELECT g.event_type, g.day,
       COALESCE(a.n, 0) AS n_events,
       COALESCE(a.total, 0.0) AS total_value
FROM grid g LEFT JOIN agg a USING (event_type, day)
"""


@query("q_resample", RESAMPLE_ORACLE)
def resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a dense daily grid: aggregate per
    (series, day), then LEFT-join onto the full series × day grid so
    silent days appear as explicit zeros — the gap-fill step that must
    precede any rolling-window or forecasting computation (a missing
    row is not a zero to a window frame).

    Scale shape: the aggregate is partial+final on (series, day); the
    grid is |series| × |days| — calendar-sized, built from a one-row
    span scalar and the distinct series keys (broadcast), never from
    the fact table. The gap-fill join is grid-sized on the left of a
    left join, so the fact table is touched exactly once."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.floor(F.unix_micros("ts") / _US_PER_DAY).cast("bigint").alias("day"),
        "value",
    )
    span = b.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = b.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(span)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    agg = b.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    return grid.join(agg, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("total", F.lit(0.0)).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# multi-granularity time rollup (hypertable-style continuous aggregate)

_US_PER_HOUR = 3_600_000_000

TIME_ROLLUP_ORACLE = f"""
WITH b AS (
    SELECT epoch_us(ts) // {_US_PER_HOUR} * {_US_PER_HOUR} AS hour_b,
           epoch_us(ts) // {_US_PER_DAY} * {_US_PER_DAY} AS day_b,
           epoch_us(date_trunc('month', ts)) AS month_b,
           value
    FROM events
)
SELECT CASE WHEN hour_b IS NOT NULL THEN 'hour'
            WHEN day_b IS NOT NULL THEN 'day'
            ELSE 'month' END AS grain,
       COALESCE(hour_b, day_b, month_b) AS bucket_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM b
GROUP BY GROUPING SETS ((hour_b), (day_b), (month_b))
"""


@query("q_time_rollup", TIME_ROLLUP_ORACLE)
def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup: hour, day, and month aggregates
    of the same stream in ONE scan via GROUPING SETS — the
    hypertable / continuous-aggregate materialization shape (three
    separate queries would scan the fact table three times; at 100 TB
    the scan IS the cost, so grain fan-out must ride one pass).

    Spark expands grouping sets BEFORE the partial aggregate, so
    map-side combine still applies per grain and the shuffle carries
    (grain × bucket) skeleton rows only. Fixed-width grains are
    integer epoch arithmetic; the calendar grain (month) uses
    date_trunc, identical in both engines under the session's UTC
    timezone."""
    e = load_table(spark, sf_dir, "events")
    e.select(
        (F.floor(F.unix_micros("ts") / _US_PER_HOUR) * _US_PER_HOUR)
        .cast("bigint")
        .alias("hour_b"),
        (F.floor(F.unix_micros("ts") / _US_PER_DAY) * _US_PER_DAY)
        .cast("bigint")
        .alias("day_b"),
        F.unix_micros(F.date_trunc("month", "ts")).alias("month_b"),
        "value",
    ).createOrReplaceTempView("pq_events_rollup")
    return spark.sql(
        """
        SELECT CASE WHEN hour_b IS NOT NULL THEN 'hour'
                    WHEN day_b IS NOT NULL THEN 'day'
                    ELSE 'month' END AS grain,
               COALESCE(hour_b, day_b, month_b) AS bucket_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM pq_events_rollup
        GROUP BY GROUPING SETS ((hour_b), (day_b), (month_b))
        """
    )


# ---------------------------------------------------------------------------
# deterministic per-group mode

MODE_ORACLE = """
WITH c AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
),
r AS (
    SELECT user_id, event_type, n,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
    FROM c
)
SELECT user_id, event_type AS mode_value, n AS mode_count
FROM r WHERE rn = 1
"""


@query("q_mode_per_group", MODE_ORACLE)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie-break (count desc, value
    asc) — built-in ``mode()`` returns an arbitrary modal value on ties
    in both engines, which would flake the value hash; the count-then-
    rank composition pins it.

    Scale shape: the (group, value) aggregation collapses the fact
    table map-side; the rank rides WindowGroupLimit (per-partition
    top-1 heap below the shuffle), so post-agg data movement is
    skeleton-sized."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_value"),
            F.col("n").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# table profiling (the ANALYZE / statistics pass)

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_totalprice")

TABLE_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE), 4) AS min_val,
       ROUND(CAST(MAX({c}) AS DOUBLE), 4) AS max_val
FROM orders"""
    for c in _PROFILE_COLS
)


@query("q_table_profile", TABLE_PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column statistics profile (the ANALYZE pass a lakehouse runs to
    feed the optimizer and data-quality checks): per column — row
    count, null count, exact distinct count, min/max. One aggregation
    job; Spark plans the multiple DISTINCTs via Expand (one row
    replica per distinct-column), which is the exact formulation. The
    100 TB variant swaps COUNT(DISTINCT) for approx_count_distinct /
    HLL sketches (q_hll_rollup) — same query shape, bounded state."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__mn"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__mx"),
        ]
    wide = o.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_val"),
            F.col(f"{c}__mx").alias("max_val"),
        )
        for c in _PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# snapshot reconciliation (data diff) via the cogroup API

COGROUP_DIFF_ORACLE = """
WITH old_snap AS (
    SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS s
    FROM events
    WHERE user_id % 13 <> 3
      AND (event_id % 7 <> 0 OR user_id % 3 <> 0)
    GROUP BY user_id
),
new_snap AS (
    SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS s
    FROM events
    WHERE user_id % 13 <> 7
    GROUP BY user_id
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       o.n AS old_n, n.n AS new_n,
       o.s AS old_sum, n.s AS new_sum,
       CASE WHEN o.user_id IS NULL THEN 'only_new'
            WHEN n.user_id IS NULL THEN 'only_old'
            WHEN o.n = n.n AND o.s = n.s THEN 'match'
            ELSE 'drift' END AS status
FROM old_snap o
FULL OUTER JOIN new_snap n ON o.user_id = n.user_id
"""


@query("q_cogroup_diff", COGROUP_DIFF_ORACLE)
def cogroup_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the data-diff every pipeline migration
    needs) via ``groupBy().cogroup().applyInPandas``: two extracts of
    the events table — an "old" one missing some users and some rows,
    a "new" one missing different users — are cogrouped on user_id and
    each key's two row sets land in ONE pandas function that emits the
    per-user verdict: match / drift / only_old / only_new.

    Why cogroup and not a full outer join (the oracle's formulation):
    the pandas function sees BOTH sides' raw rows per key, so the same
    shape extends to checks a join can't express — sequence alignment,
    per-key tolerance rules, order-sensitive diffs. The exchange is
    identical to the join's (both sides hash-partition on the key);
    Arrow moves each group's rows in columnar batches, and no key's
    data ever leaves its partition. Nulls are emitted through pandas
    nullable Int64/Float64 arrays so absent sides are true SQL NULLs,
    not NaN (NaN would hash-mismatch the oracle's NULL).

    Each side's payload column is aliased DISTINCTLY (old_value /
    new_value) before the cogroup: with both sides projecting the same
    attribute from the same scan, a downstream projection (e.g.
    ``.groupBy("status")``) pruned the shared column out of one side's
    Arrow batch and the pandas function crashed on the missing key —
    distinct names keep each side's requirement independently alive
    (pinned in tests/test_pipeline_ops.py)."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    old_snap = ev.filter(
        (F.col("user_id") % 13 != 3)
        & ((F.col("event_id") % 7 != 0) | (F.col("user_id") % 3 != 0))
    ).select("user_id", F.col("value").alias("old_value"))
    new_snap = ev.filter(F.col("user_id") % 13 != 7).select(
        "user_id", F.col("value").alias("new_value")
    )

    def diff(key, old_pdf, new_pdf):  # type: ignore[no-untyped-def]
        (uid,) = key
        has_old, has_new = len(old_pdf) > 0, len(new_pdf) > 0
        old_n = len(old_pdf) if has_old else None
        new_n = len(new_pdf) if has_new else None
        old_sum = round(float(old_pdf["old_value"].sum()), 4) if has_old else None
        new_sum = round(float(new_pdf["new_value"].sum()), 4) if has_new else None
        if not has_old:
            status = "only_new"
        elif not has_new:
            status = "only_old"
        elif old_n == new_n and old_sum == new_sum:
            status = "match"
        else:
            status = "drift"
        return pd.DataFrame(
            {
                "user_id": pd.array([uid], dtype="Int64"),
                "old_n": pd.array([old_n], dtype="Int64"),
                "new_n": pd.array([new_n], dtype="Int64"),
                "old_sum": pd.array([old_sum], dtype="Float64"),
                "new_sum": pd.array([new_sum], dtype="Float64"),
                "status": [status],
            }
        )

    return (
        old_snap.groupBy("user_id")
        .cogroup(new_snap.groupBy("user_id"))
        .applyInPandas(
            diff,
            "user_id long, old_n long, new_n long, "
            "old_sum double, new_sum double, status string",
        )
    )


# ---------------------------------------------------------------------------
# equal-frequency feature binning (quantile bucketize): train boundaries,
# apply as a broadcast

_BIN_QS = [i / 8 for i in range(1, 8)]

QUANTILE_BUCKETIZE_ORACLE = f"""
WITH b AS (
    SELECT quantile_cont(l_extendedprice, {_BIN_QS}) AS qs FROM lineitem
)
SELECT len(list_filter(b.qs, q -> l.l_extendedprice > q)) AS bin,
       COUNT(*) AS n_items,
       ROUND(MIN(l.l_extendedprice), 2) AS lo,
       ROUND(MAX(l.l_extendedprice), 2) AS hi
FROM lineitem l CROSS JOIN b
GROUP BY bin
ORDER BY bin
"""


@query("q_quantile_bucketize", QUANTILE_BUCKETIZE_ORACLE)
def quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning, the train/apply featurization
    pattern: learn 7 exact octile boundaries of l_extendedprice in one
    aggregation, broadcast the 7-double boundary row, assign each row
    its bin as |{q : price > q}| (strict >, identical on both engines),
    summarize per bin. Bin populations come out near-equal by
    construction — the property equal-WIDTH binning can't give skewed
    features.

    The apply side is the scale shape: boundaries are a 1-row
    broadcast, assignment is map-side column algebra over a 7-element
    array, and the only shuffle is the final 8-group aggregate. The
    train side uses exact interpolated ``percentile`` (parity with
    DuckDB ``quantile_cont`` established by q_percentile_exact); on a
    100 TB column swap in ``approx_percentile`` — same plan shape,
    sketch-mergeable train pass, and the boundary row stays 7 doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = li.agg(
        F.expr(
            f"percentile(l_extendedprice, array({', '.join(map(str, _BIN_QS))}))"
        ).alias("qs")
    )
    return (
        li.crossJoin(F.broadcast(qs))
        .select(
            F.expr("size(filter(qs, q -> l_extendedprice > q))").cast("long").alias("bin"),
            "l_extendedprice",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# SCD2 as-of lookup: facts joined to the dimension state valid at event
# time (the temporal-join every star schema with SCD2 dims needs)

SCD2_LOOKUP_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER w AS prev
    FROM events
    WHERE event_type IN ('view', 'error', 'signup')
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
    SELECT user_id, ts, event_id, event_type
    FROM ordered
    WHERE prev IS NULL OR event_type <> prev
),
scd AS (
    SELECT user_id, event_type AS state,
           epoch_us(ts) AS eff_from,
           COALESCE(epoch_us(LEAD(ts) OVER w), {2**62}) AS eff_to
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pur AS (
    SELECT user_id, epoch_us(ts) AS uts, value
    FROM events WHERE event_type = 'purchase'
)
SELECT s.state, COUNT(*) AS n_purchases, ROUND(SUM(p.value), 4) AS total_value
FROM pur p
JOIN scd s
  ON p.user_id = s.user_id AND p.uts >= s.eff_from AND p.uts < s.eff_to
GROUP BY s.state
ORDER BY s.state
"""


@query("q_scd2_lookup", SCD2_LOOKUP_ORACLE)
def scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup: each purchase fact joins to the SCD2
    state row VALID AT ITS EVENT TIME (eff_from <= ts < eff_to) — the
    as-of join every star schema with type-2 dimensions runs on every
    fact load. The dimension here is the user's browsing state
    (view/error/signup runs, effective-dated as in q_scd2_dimension);
    purchases made during lapses before any state exist match nothing
    and drop out, exactly as in the oracle's inner join.

    Scale shape: the join is EQUI on user_id with the interval test as
    a residual — both sides co-partition on the user key (one shuffle
    each), and the per-user dim rows a fact scans are that user's few
    state runs, never a cross product. This is the safe formulation of
    a range join when a natural partition key exists; q_range_join /
    q_binned_range_join cover the keyless case."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.filter(F.col("event_type").isin("view", "error", "signup"))
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .select("user_id", "ts", "event_id", "event_type")
    )
    scd = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("eff_from"),
        F.coalesce(F.unix_micros(F.lead("ts").over(w)), F.lit(2**62)).alias("eff_to"),
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("uts"), "value"
    )
    # both sides descend from the same scan: alias to disambiguate the
    # self-join keys (a bare pur.user_id == scd.user_id resolves to a
    # trivially-true predicate)
    p, s = pur.alias("p"), scd.alias("s")
    return (
        p.join(
            s,
            (F.col("p.user_id") == F.col("s.user_id"))
            & (F.col("p.uts") >= F.col("s.eff_from"))
            & (F.col("p.uts") < F.col("s.eff_to")),
        )
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# permissive ingestion: malformed-record quarantine on a messy JSONL feed

PERMISSIVE_INGEST_ORACLE = """
SELECT CASE WHEN doc_id % 13 = 0 THEN '_corrupt' ELSE lang END AS lang_key,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END)
            AS BIGINT) AS total_chars
FROM documents
GROUP BY lang_key
ORDER BY lang_key
"""


@query("q_permissive_ingest", PERMISSIVE_INGEST_ORACLE)
def permissive_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy-feed ingestion end-to-end: a JSONL export of documents
    with every 13th record truncated mid-object (generated
    DISTRIBUTED — the corruption is a deterministic substr in the
    write job, no driver-side loop), read back in PERMISSIVE mode
    with an explicit schema carrying ``_corrupt_record``. Malformed
    lines parse to all-null data columns plus the raw line in the
    quarantine column; the summary buckets them under '_corrupt'
    (their char sum is NULL — nothing was parsed, and the oracle
    agrees) while healthy lines aggregate per language.

    This is the ingestion contract at 100 TB: a bad producer can't
    fail the pipeline (FAILFAST) or silently vanish rows (DROPMALFORMED)
    — every input line lands exactly once, either parsed or
    quarantined with its original bytes for replay. The write is
    staleness-keyed like every derived artifact (sources.tables.
    keyed_tmp_dirs)."""
    import os

    from pcap_to_parquet_spark.sources import keyed_tmp_dirs

    d = load_table(spark, sf_dir, "documents")
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    (feed,) = keyed_tmp_dirs("messyjson", src, "v1-trunc-13", "feed")
    if not os.path.exists(os.path.join(feed, "_SUCCESS")):
        messy = d.select(
            "doc_id", F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("js")
        ).select(
            F.when(
                F.col("doc_id") % 13 == 0,
                F.expr("substr(js, 1, length(js) - 5)"),
            )
            .otherwise(F.col("js"))
            .alias("value")
        )
        messy.write.mode("overwrite").text(feed)
    parsed = spark.read.schema(
        "doc_id long, lang string, n_chars long, _corrupt_record string"
    ).json(feed)
    return (
        parsed.select(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("lang"))
            .alias("lang_key"),
            "n_chars",
        )
        .groupBy("lang_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang_key")
    )


# ---------------------------------------------------------------------------
# order-independent table checksums: cross-engine data-equality proof

_CK = "('0x' || substr(md5({expr}), 1, 12))::BIGINT"

TABLE_CHECKSUM_ORACLE = f"""
SELECT 'documents' AS tbl, COUNT(*) AS n_rows,
       CAST(SUM({_CK.format(expr="CAST(doc_id AS VARCHAR) || '|' || COALESCE(text, '')")})
            AS BIGINT) AS checksum
FROM documents
UNION ALL
SELECT 'events', COUNT(*),
       CAST(SUM({_CK.format(expr="CAST(event_id AS VARCHAR) || '|' || COALESCE(event_type, '')")})
            AS BIGINT)
FROM events
UNION ALL
SELECT 'lineitem', COUNT(*),
       CAST(SUM({_CK.format(expr="CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")})
            AS BIGINT)
FROM lineitem
ORDER BY tbl
"""


@query("q_table_checksum", TABLE_CHECKSUM_ORACLE)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksums — the cheap data-equality
    proof for migrations and replicas: md5 each row's key columns,
    take 48 bits, SUM. Any engine (this query IS its own DuckDB twin)
    computes the same number from the same rows in any order, so a
    copy, a re-partition, or a different engine entirely can be
    certified row-identical with one scan and a constant-size result —
    no sort, no row-by-row diff. A mismatch then narrows by
    partition/day with the same formula (checksums are additive).

    Only integer/string columns feed the hash: float formatting is
    engine-specific, so doubles would make the checksum engine-bound
    (use q_cogroup_diff for value-level reconciliation). Map-side
    partial SUM means the exchange carries 3 longs per partition."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    def ck(df, name, key_expr):  # noqa: ANN001
        h = (
            F.conv(F.substring(F.md5(key_expr), 1, 12), 16, 10)
            .cast("long")
        )
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum(h).alias("checksum")
        ).select(F.lit(name).alias("tbl"), "n_rows", "checksum")

    return (
        ck(d, "documents", F.concat(F.col("doc_id").cast("string"), F.lit("|"),
                                    F.coalesce("text", F.lit(""))))
        .unionByName(
            ck(e, "events", F.concat(F.col("event_id").cast("string"), F.lit("|"),
                                     F.coalesce("event_type", F.lit(""))))
        )
        .unionByName(
            ck(li, "lineitem", F.concat(F.col("l_orderkey").cast("string"), F.lit("|"),
                                        F.col("l_linenumber").cast("string")))
        )
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# 2D skyline (Pareto frontier): the O(n log n) sweep vs the O(n^2) spec

SKYLINE_ORACLE = """
SELECT p1.p_partkey, p1.p_size, p1.p_retailprice
FROM part p1
WHERE NOT EXISTS (
    SELECT 1 FROM part p2
    WHERE p2.p_size <= p1.p_size
      AND p2.p_retailprice >= p1.p_retailprice
      AND (p2.p_size < p1.p_size OR p2.p_retailprice > p1.p_retailprice)
)
ORDER BY p1.p_size, p1.p_partkey
"""


@query("q_skyline", SKYLINE_ORACLE)
def skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline / Pareto frontier: parts not dominated by any other
    part (dominator: no larger size, no smaller price, strictly better
    in one). The ORACLE is the O(n²) NOT-EXISTS specification; the
    implementation is the O(n log n) sweep a 100 TB table needs:

    a point survives iff (a) its price strictly exceeds the best price
    at any STRICTLY smaller size and (b) it ties the best price AT its
    own size. Both bests reduce per-size first — one map-combined
    aggregate to |distinct sizes| rows — then a running max over that
    tiny table (the single-partition Window touches |sizes| rows, not
    the corpus — same pattern as q_pct_change) broadcasts back to the
    full table for a map-side verdict. The n² pair space is never
    materialized; equal (size, price) duplicates all survive, as in
    the spec."""
    p = load_table(spark, sf_dir, "part")
    per_size = p.groupBy("p_size").agg(F.max("p_retailprice").alias("best_here"))
    w = Window.orderBy("p_size").rowsBetween(Window.unboundedPreceding, -1)
    frontier = per_size.select(
        "p_size",
        "best_here",
        F.max("best_here").over(w).alias("best_smaller"),
    )
    return (
        p.join(F.broadcast(frontier), "p_size")
        .filter(
            (F.col("best_smaller").isNull() | (F.col("p_retailprice") > F.col("best_smaller")))
            & (F.col("p_retailprice") == F.col("best_here"))
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    )


# ---------------------------------------------------------------------------
# in-pass data-quality metrics via the Observation API

OBSERVED_LOAD_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
WHERE value > 0
GROUP BY event_type
ORDER BY event_type
"""


@query("q_observed_load", OBSERVED_LOAD_ORACLE)
def observed_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production load pattern: business aggregate AND data-quality
    metrics from ONE scan via ``df.observe`` — row count, null keys,
    negative/zero values, value bounds ride along as accumulator-style
    metrics on the same pass instead of a second quality scan (at
    100 TB the second scan is the entire cost of naive DQ checks).

    The returned DataFrame is the aggregate (oracle-checked); the
    observation metrics are read after the action completes —
    tests/test_pipeline_ops.py pins that they equal independently
    computed values. On streaming use the same API per micro-batch."""
    from pyspark.sql import Observation

    e = load_table(spark, sf_dir, "events")
    obs = Observation("load_dq")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_users"),
        F.sum((F.col("value") <= 0).cast("long")).alias("nonpos_values"),
        F.round(F.max("value"), 4).alias("max_value"),
    )
    out = (
        observed.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )
    # stash the Observation for callers that want the metrics (tests);
    # reading obs.get blocks until an action has run on `out`
    out.observation = obs  # type: ignore[attr-defined]
    return out


# ---------------------------------------------------------------------------
# XML ingestion: the third text format (after csv/json) through the
# same engine surface, with entity-escaping round-trip proven

XML_INGEST_ORACLE = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source NULLS LAST
"""


@query("q_xml_ingest", XML_INGEST_ORACLE)
def xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip: documents written with the built-in XML WRITER
    (one well-formed document per partition file — rootTag wrapping and
    entity escaping of &/</> are the writer's job, proven by the
    value-equal read-back), read with the Spark 4 built-in XML source
    (``rowTag``), aggregated per source. The oracle
    runs on the original table, so every row surviving the round-trip
    byte-correct is what makes this PASS.

    XML is the enterprise feed format (SEC filings, PubMed, legal
    corpora are XML) — a training-data engine that can't scan it
    leaves those sources on the floor. Same scale shape as any text
    source: line-splittable record framing, schema projection at the
    scan, one aggregate exchange."""
    import os

    from pcap_to_parquet_spark.sources import keyed_tmp_dirs

    d = load_table(spark, sf_dir, "documents")
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    (feed,) = keyed_tmp_dirs("xmlfeed", src, "v2-xml-writer", "feed")
    if not os.path.exists(os.path.join(feed, "_SUCCESS")):
        (
            d.select("doc_id", "lang", "source", "n_chars", "text")
            .write.format("xml")
            .option("rowTag", "doc")
            .option("rootTag", "docs")
            .mode("overwrite")
            .save(feed)
        )
    docs = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, source string, n_chars long, text string")
        .load(feed)
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        # Spark ASC is NULLS FIRST, DuckDB's is NULLS LAST — pin the
        # oracle's convention (same fix as q_fairness_audit).
        .orderBy(F.col("source").asc_nulls_last())
    )


# ---------------------------------------------------------------------------
# CIDR longest-prefix-match enrichment (the packet-enrichment join,
# expressed as a broadcast lookup chain — no range join, no explode)

# (label, dotted_prefix_as_u32, prefix_len) — literal routing table
_SUBNETS = [
    ("rack-5", (10 << 24) | (16 << 16) | (5 << 8), 24),
    ("dc-east-core", (10 << 24) | (16 << 16), 16),
    ("dc-east", (10 << 24) | (16 << 16), 12),
    ("corp", 10 << 24, 8),
]

_IP_SQL = (
    "(10 * 16777216 + (user_id % 32) * 65536 "
    "+ (event_id % 256) * 256 + (event_id // 256) % 256)"
)

_CIDR_ORACLE_JOINS = "\n".join(
    f"LEFT JOIN sn{ln} ON (ip // {1 << (32 - ln)}) = {pfx >> (32 - ln)}"
    for _, pfx, ln in _SUBNETS
)

CIDR_ENRICH_ORACLE = f"""
WITH ev AS (SELECT user_id, {_IP_SQL} AS ip FROM events),
{", ".join(f"sn{ln} AS (SELECT '{lbl}' AS label{ln})" for lbl, _, ln in _SUBNETS)},
matched AS (
    SELECT ev.user_id,
           COALESCE({", ".join(f"label{ln}" for _, _, ln in _SUBNETS)}) AS label
    FROM ev
    {_CIDR_ORACLE_JOINS}
)
SELECT label, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM matched
GROUP BY label
ORDER BY label
"""


@query("q_cidr_enrich", CIDR_ENRICH_ORACLE)
def cidr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match IP enrichment — the packet-to-subnet join
    every network-analytics pipeline runs (the reference's packets
    would feed this directly; here the IP derives deterministically
    from events so the oracle can see it). The classic formulations
    are a range join (interval containment — quadratic risk) or an
    explode-by-prefix-length; with the routing table's prefix lengths
    known, LPM collapses to a PRIORITY CHAIN OF BROADCAST LOOKUPS:
    mask the IP to each length (longest first), left-join each tiny
    prefix table, COALESCE in priority order. Zero shuffles before the
    final aggregate; each join is a map-side broadcast hash probe —
    the shape that holds at a billion packets with a real routing
    table (group prefixes by length; Internet tables have ~30 distinct
    lengths)."""
    e = load_table(spark, sf_dir, "events")
    ip = (
        F.lit(10 * (1 << 24))
        + (F.col("user_id") % 32) * (1 << 16)
        + (F.col("event_id") % 256) * 256
        + (F.col("event_id") / 256).cast("long") % 256
    ).alias("ip")
    ev = e.select("user_id", ip)
    out = ev
    labels = []
    for lbl, pfx, ln in _SUBNETS:  # longest prefix first
        sn = spark.createDataFrame(
            [(pfx >> (32 - ln), lbl)], f"key{ln} long, label{ln} string"
        )
        out = out.join(
            F.broadcast(sn),
            (F.col("ip") / (1 << (32 - ln))).cast("long") == F.col(f"key{ln}"),
            "left",
        )
        labels.append(f"label{ln}")
    return (
        out.select("user_id", F.coalesce(*labels).alias("label"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# DP-style noisy count release: seeded Laplace noise, replayable

_DP_EPS = 1.0
_DP_SEED = "dp1"

DP_COUNTS_ORACLE = f"""
WITH c AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw FROM documents
    GROUP BY source
),
u AS (  -- 24-bit md5 uniform in (-0.5, 0.5), zero excluded by +0.5 offset
    SELECT source, n_raw,
           (('0x' || substr(md5('{_DP_SEED}:' || source), 1, 6))::INT + 0.5)
               / 16777216.0 - 0.5 AS v
    FROM c
)
SELECT source, n_raw,
       ROUND(n_raw - (1.0 / {_DP_EPS})
             * CASE WHEN v < 0 THEN -1 ELSE 1 END
             * LN(1.0 - 2.0 * ABS(v)), 4) AS n_noisy
FROM u
ORDER BY source NULLS LAST
"""


@query("q_dp_counts", DP_COUNTS_ORACLE)
def dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-style count release: per-source document
    counts plus Laplace(1/ε) noise (ε = {eps}), the noise drawn by
    INVERSE-CDF from a seeded md5 uniform — so the "random" release
    is bit-replayable by the oracle and by auditors, the property a
    testable DP pipeline needs (swap the seed for a real CSPRNG draw
    in production; the sensitivity-1 count query and the noise shape
    are the real mechanism). Completes the privacy family next to
    q_k_anonymity (quasi-identifier census) and q_pii_scrub
    (redaction). Raw counts are emitted alongside ONLY because this
    is the verification surface — a production release would drop
    them. [engine — not in reference]

    Scale design: one groupBy; noise is per-GROUP column algebra on
    the |sources|-bounded aggregate."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    v = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_DP_SEED + ":"), F.col("source"))), 1, 6
            ),
            16,
            10,
        ).cast("int")
        + F.lit(0.5)
    ) / F.lit(16777216.0) - F.lit(0.5)
    noise = (
        F.lit(1.0 / _DP_EPS)
        * F.when(v < 0, -1).otherwise(1)
        * F.log(F.lit(1.0) - 2.0 * F.abs(v))
    )
    return c.select(
        "source",
        "n_raw",
        F.round(F.col("n_raw") - noise, 4).alias("n_noisy"),
        # NULLS LAST pins DuckDB's ASC convention (q_fairness_audit fix)
    ).orderBy(F.col("source").asc_nulls_last())


dp_counts.__doc__ = dp_counts.__doc__.format(eps=_DP_EPS)


# ---------------------------------------------------------------------------
# referential-integrity audit: FK orphan census across the star schema

_RI_EDGES = [
    # (label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

REFERENTIAL_INTEGRITY_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS fk,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(COALESCE(SUM(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_orphan,
       CAST(COUNT(DISTINCT CASE WHEN p.{pkey} IS NULL THEN c.{ckey} END)
           AS BIGINT) AS n_orphan_keys,
       (SELECT CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT)
        FROM (SELECT COUNT(*) AS cnt FROM {parent} GROUP BY {pkey}) pc
       ) AS n_dup_parent_keys
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}) p ON c.{ckey} = p.{pkey}"""
    for label, child, ckey, parent, pkey in _RI_EDGES
) + "\nORDER BY fk"


@query("q_referential_integrity", REFERENTIAL_INTEGRITY_ORACLE)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the warehouse's FK graph: for
    each of the 7 foreign-key edges of the TPC-H star schema, count
    child rows, orphan rows (child key with no parent), distinct
    orphan key values, and duplicated parent primary keys — the first
    data-quality gate any ingest pipeline runs before joining, because
    a silently-broken FK turns every downstream inner join into a
    row-dropper and a duplicated parent PK turns it into a
    row-multiplier. [engine — not in reference]

    Scale design: each edge is ONE join against the parent's primary
    key summarized to a single row — nothing but the 7-row census
    leaves the executors. The parent side is DEDUPED (group-by PK)
    before the join, so a broken parent with duplicate PKs cannot fan
    the join out and inflate n_child/n_orphan; instead the duplication
    itself is surfaced as n_dup_parent_keys (count of PK values
    appearing more than once), computed from the same parent census
    and broadcast onto the 1-row result. Small dimensions (nation,
    region) broadcast and the fact-table edges shuffle on the join key
    exactly once. The parent census is DELIBERATELY evaluated twice
    per edge (once column-pruned for the join keys, once for the dup
    count) rather than checkpointed: both consumers prune to the PK
    column, so the cost is two columnar PK-only scans — cheaper at
    lake scale than materializing a |parent|-sized census, whose
    storage would rival the table itself. At lake scale the same
    audit runs per-partition incrementally; the full-scan form here
    is the backfill shape."""
    out = None
    for label, child, ckey, parent, pkey in _RI_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ckey).alias("ck"))
        pc = (
            load_table(spark, sf_dir, parent)
            .groupBy(F.col(pkey).alias("pk"))
            .agg(F.count(F.lit(1)).alias("pn"))
        )
        dup = pc.agg(
            F.coalesce(
                F.sum(F.when(F.col("pn") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_dup_parent_keys")
        )
        row = (
            c.join(pc.select("pk"), F.col("ck") == F.col("pk"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.coalesce(
                    F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias("n_orphan"),
                F.countDistinct(
                    F.when(F.col("pk").isNull(), F.col("ck"))
                ).alias("n_orphan_keys"),
            )
            .crossJoin(F.broadcast(dup))
            .select(
                F.lit(label).alias("fk"),
                "n_child",
                "n_orphan",
                "n_orphan_keys",
                "n_dup_parent_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk")


# ---------------------------------------------------------------------------
# weighted median: quantity-weighted price medians per return flag

WEIGHTED_MEDIAN_ORACLE = """
WITH census AS (
    SELECT l_returnflag, l_extendedprice AS v,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS w
    FROM lineitem GROUP BY l_returnflag, l_extendedprice
),
tot AS (
    SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS tw
    FROM census GROUP BY l_returnflag
),
cum AS (
    SELECT c.l_returnflag, c.v, c.w, t.tw,
           SUM(c.w) OVER (PARTITION BY c.l_returnflag ORDER BY c.v
                          ROWS UNBOUNDED PRECEDING) AS cw
    FROM census c JOIN tot t ON t.l_returnflag = c.l_returnflag
)
SELECT l_returnflag,
       CAST(ANY_VALUE(tw) AS BIGINT) AS total_weight,
       MIN(v) AS weighted_median
FROM cum WHERE 2 * cw >= tw
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_weighted_median", WEIGHTED_MEDIAN_ORACLE)
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of the extended price per return flag
    — the lower weighted median (smallest value whose cumulative
    weight reaches half the total), the estimator a curation pipeline
    uses when rows carry importance weights (sample weights, token
    counts, dollar volume) and the unweighted median would be wrong.
    Defined as an exact order statistic — no interpolation — so the
    decision is pure integer comparison in both engines. Weights are
    FLOORed before the bigint cast in BOTH engines: a bare
    double->bigint cast truncates in Spark but rounds half-away in
    DuckDB, so without the explicit floor fractional weights would
    silently diverge (testdata quantities happen to be integral, which
    masked it). [engine — not in reference]

    Scale design: one (group, value) census groupBy (value-grid
    bounded — 2dp prices), one per-group total, a cumulative-weight
    window over the per-group census ordered by value, and a MIN over
    the qualifying suffix. Nothing row-sized survives the first
    aggregate; all comparisons are exact integers (2*cw >= tw)."""
    li = load_table(spark, sf_dir, "lineitem")
    census = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.floor("l_quantity").cast("bigint")).cast("long").alias("w"))
    tot = census.groupBy("l_returnflag").agg(
        F.sum("w").cast("long").alias("tw")
    )
    w_cum = Window.partitionBy("l_returnflag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = census.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag",
        "v",
        "tw",
        F.sum("w").over(w_cum).alias("cw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.first("tw").cast("long").alias("total_weight"),
            F.min("v").alias("weighted_median"),
        )
        .orderBy("l_returnflag")
    )
