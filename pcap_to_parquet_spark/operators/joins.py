"""Join operators: equi (shuffle + broadcast), outer, semi/anti,
range (theta), as-of, and self joins.

Strategy notes (100 TB): equi joins on fact tables shuffle once on the
join key — AQE picks SMJ vs shuffled-hash and splits skewed partitions;
bounded dims are explicitly `F.broadcast(...)` so the fact side never
shuffles; the range join keeps the *bands* side broadcast (a tiny
nested-loop probe per row, never a cartesian shuffle); the as-of join
is a bounded-window composition, not a per-row lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table, load_tables


@query(
    "q_inner_join",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = load_tables(spark, sf_dir, "orders", "customer")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "q_broadcast_join",
    """
    SELECT p.p_brand, COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the part dim: the lineitem side never
    shuffles for the join; only the tiny post-agg exchange remains."""
    li, p = load_tables(spark, sf_dir, "lineitem", "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "q_outer_join",
    """
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER preserving customers with zero orders (COUNT(col) skips
    the NULL-extended rows, so they count 0)."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_full_outer_join",
    """
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c FULL OUTER JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with an extra join-side predicate: unmatched rows on
    BOTH sides survive NULL-extended."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    return c.join(
        o, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000), "full"
    ).select("c_custkey", "o_orderkey")


@query(
    "q_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: existence check, never duplicates the left side."""
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 300000), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


PRICE_BANDS = [
    ("low", 0.0, 100000.0),
    ("mid", 100000.0, 300000.0),
    ("high", 300000.0, 1e18),
]


@query(
    "q_range_join",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 100000.0),
               ('mid', 100000.0, 300000.0),
               ('high', 300000.0, 1e18)
    )
    SELECT b.band, COUNT(*) AS n_orders,
           ROUND(AVG(o.o_totalprice), 4) AS avg_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (interval containment) join. The band table is tiny →
    BroadcastNestedLoopJoin, which is the *right* physical plan: each
    orders row probes 3 broadcast rows; the fact side streams."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "q_asof_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT c.event_id
        FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC
        LIMIT 1
    ) c ON TRUE
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it by
    the same user. Implemented as a union + single window pass — ONE
    shuffle on user_id, no per-row subquery, no range explosion. This is
    the 100-TB-safe as-of pattern (a join+filter+row_number would shuffle
    the same data but materialize every candidate pair first)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    unioned = purchases.select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_purchase"), F.lit(None).cast("long").alias("click_id")
    ).unionByName(
        clicks.select(
            "user_id", "ts", "event_id", F.lit(0).alias("is_purchase"), F.col("event_id").alias("click_id")
        )
    )
    # Order clicks before purchases at identical ts so "at-or-before" includes ties;
    # within equal (ts, kind), later click event_id wins — matches the oracle's
    # ORDER BY ts DESC, event_id DESC tiebreak.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_purchase"), F.col("click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_click_id",
        )
    )


@query(
    "q_self_join",
    """
    SELECT a.event_id AS first_id, b.event_id AS next_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND b.event_id = a.event_id + 1
    WHERE a.event_type = 'error'
    """,
)
def self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi-join via aliases (consecutive event ids per user)."""
    e = load_table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.filter(F.col("a.event_type") == "error")
        .join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.event_id") == F.col("a.event_id") + 1),
        )
        .select(
            F.col("a.event_id").alias("first_id"),
            F.col("b.event_id").alias("next_id"),
            F.col("a.user_id").alias("user_id"),
        )
    )


BINNED_RANGE_ORACLE = """
SELECT o.o_orderkey, COUNT(*) AS n_shipments
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAYS
GROUP BY o.o_orderkey
"""


@query("q_binned_range_join", BINNED_RANGE_ORACLE)
def binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-to-big interval join via bin replication — the shape that
    survives when NEITHER side broadcasts (a raw non-equi join between
    two fact tables degenerates to a nested-loop cartesian).

    Each order's 60-day window is exploded into the ~3 monthly bins it
    overlaps; lineitem rows map to their single bin. The join is then
    a plain EQUI join on (orderkey, bin) — hash-partitionable, AQE-
    skew-splittable — with the exact interval predicate applied as a
    post-filter. Replication factor = ceil(window/bin)+1, a constant;
    at 100 TB this is a normal shuffle join, not an O(n²) probe.

    (Here the orderkey equi-key alone would suffice; the bin key is
    what remains when the join has no natural equi-key — e.g. joining
    events to time windows across streams. The bin column algebra is
    the point being exercised and checked.)"""
    o, li = load_tables(spark, sf_dir, "orders", "lineitem")
    window_days = 60
    bin_expr_l = F.months_between(F.col("l_shipdate"), F.lit("1990-01-01")).cast("int")
    lo_bin = F.months_between(F.col("o_orderdate"), F.lit("1990-01-01")).cast("int")
    n_bins = window_days // 30 + 2  # window may straddle up to 4 month bins
    o_binned = o.select(
        "o_orderkey", "o_orderdate", F.explode(
            F.array(*[(lo_bin + i).alias(f"b{i}") for i in range(n_bins)])
        ).alias("bin"),
    )
    l_binned = li.select("l_orderkey", "l_shipdate", bin_expr_l.alias("bin"))
    joined = o_binned.join(
        l_binned,
        (o_binned.o_orderkey == l_binned.l_orderkey) & (o_binned.bin == l_binned.bin),
    ).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.date_add("o_orderdate", window_days))
    )
    return joined.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipments"))


# ---------------------------------------------------------------------------
# fuzzy string join: edit-distance pairing inside attribute blocks

FUZZY_JOIN_ORACLE = """
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM part a
JOIN part b
  ON a.p_type = b.p_type AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@query("q_fuzzy_join", FUZZY_JOIN_ORACLE)
def fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: part pairs whose names are within edit
    distance 2, candidate-generated ONLY inside equal structured
    attributes (type, size). The blocked self-join is the honest scale
    shape for string-similarity joins: the equi-keys shuffle-partition
    both sides identically, the O(block²) edit-distance work is
    bounded per block, and an unblocked n² comparison never exists in
    the plan (plan-pinned: no cartesian). Blocks too hot to square
    get the same DF-cap treatment as ngram_jaccard — at this schema
    the (type, size) blocks are |parts|/300-sized.

    ``levenshtein`` is the classic unit-cost edit distance in both
    engines, so parity is exact."""
    p = load_table(spark, sf_dir, "part")
    a = p.select("p_partkey", "p_name", "p_type", "p_size").alias("a")
    b = p.select("p_partkey", "p_name", "p_type", "p_size").alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_type") == F.col("b.p_type"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    # bigint: Spark's levenshtein is int32, DuckDB's is int64 — the
    # driver's value hash is representation-sensitive
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("bigint")
    return pairs.filter(dist <= 2).select(
        F.col("a.p_partkey").alias("part_a"),
        F.col("b.p_partkey").alias("part_b"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        dist.alias("dist"),
    )
