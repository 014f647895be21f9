"""Projection, filter, predicates, sort/limit, distinct, set operations.

Pure column algebra — every expression stays JVM-side inside
whole-stage codegen, and filters/projections reach the parquet scan as
PushedFilters/ReadSchema (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table, load_tables


@query(
    "q_filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity + 1.0 AS qty_plus
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ+π with arithmetic: both predicate and projection push to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") + 1.0).alias("qty_plus"),
    )


@query(
    "q_case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection — the reference's dispatch idiom
    (/root/reference/src/main.rs:198-210) as column algebra."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
    )


@query(
    "q_null_semantics",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'was-open') AS coalesced,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS null_safe_eq_null
    FROM orders
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF / COALESCE / IS NULL / null-safe equality (<=>)."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("was-open")).alias("coalesced"),
        status_or_null.isNull().alias("is_open"),
        status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("null_safe_eq_null"),
    )


@query(
    "q_sort_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — no full sort, no
    single-node shuffle of the whole table; per-partition heaps then a
    driver merge of N·parts rows. Unique tiebreak key keeps it deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@query(
    "q_distinct",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
)
def distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = groupBy on all columns; partial aggregation map-side."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_union",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — no shuffle at all; partitions are concatenated."""
    c, s = load_tables(spark, sf_dir, "customer", "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")).unionByName(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    )


@query(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = load_tables(spark, sf_dir, "customer", "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = load_tables(spark, sf_dir, "customer", "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_pivot",
    """
    SELECT c_mktsegment,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 2)
               AS urgent,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 0), 2)
               AS high,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 0), 2)
               AS medium
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy + pivot with an EXPLICIT value list: naming the
    pivot values keeps the plan single-pass (unnamed pivot first runs a
    distinct scan to discover columns — a full extra job at scale)."""
    o, c = load_tables(spark, sf_dir, "orders", "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    p = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(F.sum("o_totalprice"))
    )
    return p.select(
        "c_mktsegment",
        F.round(F.coalesce(F.col("1-URGENT"), F.lit(0.0)), 2).alias("urgent"),
        F.round(F.coalesce(F.col("2-HIGH"), F.lit(0.0)), 2).alias("high"),
        F.round(F.coalesce(F.col("3-MEDIUM"), F.lit(0.0)), 2).alias("medium"),
    )


@query(
    "q_unpivot",
    """
    SELECT p_partkey, metric, value
    FROM (SELECT p_partkey,
                 CAST(p_size AS DOUBLE) AS size,
                 p_retailprice AS retailprice
          FROM part)
    UNPIVOT (value FOR metric IN (size, retailprice))
    """,
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): map-only Expand, no shuffle."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@query(
    "q_subquery_scalar",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: Catalyst plans the aggregate once
    and broadcasts the scalar into the filter (no per-row re-execution)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM v_orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM v_orders)
        """
    )


@query(
    "q_subquery_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: Catalyst decorrelates it into a left-semi
    join on the correlation key — per-row subquery loops never run."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("v_customer")
    o.createOrReplaceTempView("v_orders2")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders2 o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """
    )


# ---------------------------------------------------------------------------
# MERGE / upsert (CDC apply), as a full-outer-join composition

MERGE_ORACLE = """
WITH base AS (
    SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 1000
),
chg AS (
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS delta
    FROM orders GROUP BY o_custkey
)
SELECT COALESCE(b.c_custkey, c.o_custkey) AS custkey,
       ROUND(COALESCE(b.c_acctbal, 0) + COALESCE(c.delta, 0), 2) AS balance,
       CASE WHEN b.c_custkey IS NULL THEN 'inserted'
            WHEN c.o_custkey IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM base b
FULL OUTER JOIN chg c ON b.c_custkey = c.o_custkey
"""


@query("q_merge_upsert", MERGE_ORACLE)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert / CDC apply) without a table format: the
    change set (per-customer order totals) merged into a base dim —
    matched rows update, source-only rows insert, target-only rows
    pass through unchanged. One FULL OUTER shuffle join on the merge
    key expresses the entire statement; at scale this is exactly what
    Delta/Iceberg MERGE lowers to (plus file rewrites), and a small
    change set becomes a broadcast join under AQE. The merge_action
    column is the audit trail a CDC pipeline keeps."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    base = c.filter(F.col("c_custkey") <= 1000).select("c_custkey", "c_acctbal")
    chg = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("delta"))
    j = base.join(chg, base.c_custkey == chg.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.round(
            F.coalesce("c_acctbal", F.lit(0.0)) + F.coalesce("delta", F.lit(0.0)), 2
        ).alias("balance"),
        F.when(F.col("c_custkey").isNull(), "inserted")
        .when(F.col("o_custkey").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )
