"""Salted and bucketed joins: result parity + physical-plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

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


def test_bucketed_join_no_join_shuffle(spark):
    df = QUERIES["q_bucketed_join"](spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the only exchange is the post-aggregation one on c_mktsegment;
    # the join itself reads co-located buckets shuffle-free
    assert len(re.findall(r"Exchange", plan)) == 1
    assert df.count() > 0
