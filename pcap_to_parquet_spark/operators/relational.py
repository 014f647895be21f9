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
