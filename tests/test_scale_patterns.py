"""Salted and bucketed joins: result parity + physical-plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

import pcap_to_parquet_spark.operators  # noqa: F401  (registers queries)
from pcap_to_parquet_spark.registry import QUERIES
from pcap_to_parquet_spark.sources import load_tables
from tests.conftest import SF0001


def test_salted_join_matches_plain(spark):
    salted = {
        r.s_name: (r.n_items, r.total_qty)
        for r in QUERIES["q_salted_join"](spark, SF0001).collect()
    }
    li, s = load_tables(spark, SF0001, "lineitem", "supplier")
    plain = {
        r.s_name: (r.n_items, r.total_qty)
        for r in li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_under_real_skew(spark):
    """One hot key carrying 100× the median volume: salting must both
    spread it (every salt bucket populated for the hot key) and return
    exactly the plain join's aggregates."""
    from pyspark.sql import functions as Fn

    from pcap_to_parquet_spark.operators.scale_patterns import SALT_BUCKETS

    hot = spark.range(20_000).select(
        Fn.lit(7).alias("k"), (Fn.col("id") % 100).alias("v")
    )
    cold = spark.range(2_000).select(
        (Fn.col("id") % 50 + 100).alias("k"), Fn.lit(1).alias("v")
    )
    fact = hot.union(cold)
    dim = spark.range(200).select(
        Fn.col("id").alias("k"), Fn.concat(Fn.lit("d"), Fn.col("id")).alias("name")
    )

    salted_fact = fact.withColumn(
        "salt", Fn.pmod(Fn.xxhash64("k", "v", Fn.monotonically_increasing_id()), Fn.lit(SALT_BUCKETS))
    )
    salted_dim = dim.withColumn(
        "salt", Fn.explode(Fn.array(*[Fn.lit(i) for i in range(SALT_BUCKETS)]))
    )
    got = {
        (r.name, r.n, r.s)
        for r in salted_fact.join(
            salted_dim,
            (salted_fact.k == salted_dim.k) & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("name")
        .agg(Fn.count(Fn.lit(1)).alias("n"), Fn.sum("v").alias("s"))
        .collect()
    }
    want = {
        (r.name, r.n, r.s)
        for r in fact.join(dim, "k")
        .groupBy("name")
        .agg(Fn.count(Fn.lit(1)).alias("n"), Fn.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    # the hot key's rows really spread across all salt buckets
    spread = (
        salted_fact.filter("k = 7").select("salt").distinct().count()
    )
    assert spread == SALT_BUCKETS


def test_window_dist_matches_builtin_window(spark):
    """The distributed closed-form ntile/percent_rank/cume_dist must
    equal Spark's own single-partition window built-ins row-for-row —
    cross-engine oracle parity alone could hide a shared misreading of
    NTILE's front-loaded remainder rule."""
    from pyspark.sql import Window

    q = QUERIES["q_window_dist"](spark, SF0001)
    o = load_tables(spark, SF0001, "orders")[0]
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ref = o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    got = {r.o_orderkey: (r.quartile, r.pct_rank, r.cume) for r in q.collect()}
    want = {r.o_orderkey: (r.quartile, r.pct_rank, r.cume) for r in ref.collect()}
    assert got == want


def test_two_stage_distinct_null_semantics(spark):
    """NULL user_ids must not count as users (COUNT DISTINCT ignores
    NULL) but must not drop their event_type group either."""
    from pcap_to_parquet_spark.operators import scale_patterns as sp

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None)],
        "event_type string, user_id long",
    )
    pairs = df.select("event_type", "user_id", (F.col("user_id") % 10).alias("cohort"))
    stage1 = pairs.groupBy("event_type", "user_id").agg(F.first("cohort").alias("cohort"))
    got = {
        r.event_type: (r.n_users, r.n_cohorts)
        for r in stage1.groupBy("event_type")
        .agg(
            F.count(F.col("user_id")).alias("n_users"),
            F.countDistinct("cohort").alias("n_cohorts"),
        )
        .collect()
    }
    assert got == {"a": (1, 1), "b": (0, 0)}  # SQL COUNT(DISTINCT) semantics
    assert sp  # imported for provenance: mirrors two_stage_distinct's aggregation


def test_bucketed_join_no_join_shuffle(spark):
    df = QUERIES["q_bucketed_join"](spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the only exchange is the post-aggregation one on c_mktsegment;
    # the join itself reads co-located buckets shuffle-free
    assert len(re.findall(r"Exchange", plan)) == 1
    assert df.count() > 0
