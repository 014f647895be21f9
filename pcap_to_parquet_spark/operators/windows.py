"""Window functions: ranking, frames, lag/lead, top-k per group.

Window ordering always includes a unique tiebreak key (orderkey /
event_id) so running aggregates and row_number are deterministic —
both for the DuckDB oracle and for re-runs at scale (SURVEY §5.2).
A window = one shuffle on partitionBy keys + per-partition sort; at
100 TB the partition key must be high-cardinality (user_id, orderkey),
which all of these are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table


@query(
    "q_window_rank",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK() OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS bal_rownum
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w_unique = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.row_number().over(w_unique).cast("bigint").alias("bal_rownum"),
    )


@query(
    "q_window_frame",
    """
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_value,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg3
    FROM events
    """,
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and sliding ROWS frames over a total (unique-keyed) order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4
        ).alias("running_value"),
        F.round(F.avg("value").over(w.rowsBetween(-2, Window.currentRow)), 4).alias(
            "moving_avg3"
        ),
    )


@query(
    "q_lag_lead",
    """
    SELECT user_id, event_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           FIRST_VALUE(event_id) OVER w AS first_event,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS micros_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_id").over(w).alias("first_event"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
    )


@query(
    "q_topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number ≤ k. Spark ≥3.5 rewrites this to a
    WindowGroupLimit (per-partition top-k heap BEFORE the shuffle), so
    only k rows per group per partition move — the at-scale pattern."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


@query(
    "q_window_dist",
    """
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    over a GLOBAL ordering, computed in the scale-safe shape: a naive
    ``Window.orderBy(...)`` (no partitionBy) sorts the whole table in
    ONE task — the canonical 100 TB killer. Instead:

    1. sample ~32 approx-quantile bounds of o_totalprice (same
       sampling a RangePartitioner does; one tiny column-pruned job);
    2. map each row to a range bucket (pure column algebra, bucket is
       a function of the value, so it is globally order-consistent);
    3. count rows per bucket (<= 33 rows to the driver) and turn the
       counts into cumulative offsets + total n;
    4. global rank = bucket offset + row_number within the bucket
       (windows now partitioned by bucket — every task owns ~1/32 of
       the sort, and the shape holds at any scale by raising the
       bucket count);
    5. ntile/percent_rank/cume_dist are closed-form in (rank, n)
       because the order key (o_totalprice, o_orderkey) is unique:
       every row is its own peer group, rank == row_number.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_buckets = 32
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(o.stat.approxQuantile("o_totalprice", probs, 0.01)))

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col("o_totalprice") > F.lit(b)).cast("int")
    bucketed = o.withColumn("bucket", bucket)

    counts = {
        r["bucket"]: r["cnt"]
        for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # bounded driver collect: one row per bucket, never corpus data
    assert len(counts) <= n_buckets + 1, len(counts)
    n = sum(counts.values())
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_map = F.create_map(
        *[F.lit(x) for b in offsets for x in (b, offsets[b])]
    )

    w = Window.partitionBy("bucket").orderBy("o_totalprice", "o_orderkey")
    rank = (F.element_at(offset_map, F.col("bucket")) + F.row_number().over(w)).cast(
        "bigint"
    )

    # exact NTILE(4): first n%4 tiles get ceil(n/4) rows, the rest floor(n/4)
    qsz, rem = divmod(n, 4)
    cap = rem * (qsz + 1)
    tile = (
        F.when(rank <= cap, F.floor((rank - 1) / (qsz + 1)) + 1)
        .otherwise(F.floor((rank - 1 - cap) / max(qsz, 1)) + rem + 1)
        .cast("bigint")
    )
    return bucketed.select(
        "o_orderkey",
        tile.alias("quartile"),
        F.round((rank - 1) / max(n - 1, 1), 6).alias("pct_rank"),
        F.round(rank / max(n, 1), 6).alias("cume"),
    )


@query(
    "q_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER w AS n_near,
           ROUND(SUM(o_totalprice) OVER w, 2) AS near_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
    """,
)
def range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, not row-based): per customer, how
    many of their other orders price within ±1000 of each order, and
    that neighborhood's total. RANGE frames are peer-inclusive — ties
    enter the frame together — which ROWS frames cannot express. Same
    one-shuffle-per-partition-key cost as any window."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("near_total"),
    )


NTH_IGNORE_NULLS_ORACLE = """
SELECT event_id, user_id,
       ROUND(last_value(CASE WHEN value > 600 THEN value END IGNORE NULLS)
           OVER w, 4) AS last_big,
       ROUND(nth_value(value, 3) OVER w, 4) AS third_value,
       ROUND(first_value(value) OVER w, 4) AS first_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("q_window_nth", NTH_IGNORE_NULLS_ORACLE)
def window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value and IGNORE NULLS analytics: the forward-fill /
    last-observation-carried-forward primitive (last_value IGNORE NULLS
    over a running frame propagates each user's most recent qualifying
    observation — how gaps get filled in sensor/price series), plus
    nth_value's fixed-position lookup. One shuffle on user_id; all
    three functions share the frame and sort."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    big = F.when(F.col("value") > 600, F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.round(F.last(big, ignorenulls=True).over(w), 4).alias("last_big"),
        F.round(F.nth_value("value", 3).over(w), 4).alias("third_value"),
        F.round(F.first("value").over(w), 4).alias("first_value"),
    )
