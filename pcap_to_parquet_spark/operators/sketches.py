"""Mergeable sketches (Apache DataSketches via Spark SQL built-ins):
HLL distinct counting, KLL quantiles, Theta set algebra.

THE 100 TB aggregation pattern: sketch each partition/day/shard cheaply
(bounded memory, one pass), persist the small sketch blobs, and MERGE
them for any rollup — re-aggregating a year of distincts/quantiles
touches 365 sketches, not 100 TB of raw rows. Exact re-computation
cannot do this (distinct and quantiles don't decompose); sketches make
the rollup associative at a known, bounded error.

All three queries are rows-only for the driver (DuckDB's estimators
are different implementations, so values can't hash-match); their
error CONTRACTS are asserted against exact answers in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table

_US_PER_DAY = 86_400_000_000


@query("q_hll_rollup")  # rows-only: estimator-specific values
def hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day AND overall from ONE pass: daily HLL
    sketches, then `hll_union_agg` merges the daily blobs into the
    total — the distinct-counting rollup that never revisits raw data.
    Output: one row per day plus a 'total' row whose estimate comes
    from merging the daily sketches (not from re-scanning)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / _US_PER_DAY).cast("bigint").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    per_day = daily.select(
        F.col("day").cast("string").alias("key"),
        F.hll_sketch_estimate("sk").alias("est_distinct"),
    )
    total = daily.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("total").alias("key"),
        F.hll_sketch_estimate("sk").alias("est_distinct"),
    )
    return per_day.unionByName(total)


@query("q_kll_quantiles")  # rows-only: estimator-specific values
def kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from merged KLL sketches: sketch l_extendedprice per
    return-flag group, merge the group sketches, and read p50/p90/p99
    off both the groups and the merged total. The merge step is what
    approx_percentile hides — here the intermediate sketch is a value
    you can persist per partition/day and roll up later."""
    li = load_table(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk")
    )
    per_group = grp.select(
        F.col("l_returnflag").alias("key"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 2).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 2).alias("p99"),
    )
    total = grp.agg(F.kll_merge_agg_double("sk").alias("sk")).select(
        F.lit("total").alias("key"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 2).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 2).alias("p99"),
    )
    return per_group.unionByName(total)


@query("q_theta_audience_overlap")  # rows-only: estimator-specific values
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra WITHOUT materializing the sets: theta
    sketches of the viewer and purchaser user sets support union,
    intersection, and difference on the sketch blobs — |viewers|,
    |purchasers|, |both|, |viewers only|, |either| from two small
    sketches. The exact equivalent is a self-join per question; at
    100 TB the sketches are per-segment metadata you combine freely."""
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy().agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("viewers"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("purchasers"),
    )
    return sk.select(
        F.round(F.theta_sketch_estimate("viewers"), 1).alias("viewers"),
        F.round(F.theta_sketch_estimate("purchasers"), 1).alias("purchasers"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("viewers", "purchasers")), 1
        ).alias("both"),
        F.round(
            F.theta_sketch_estimate(F.theta_difference("viewers", "purchasers")), 1
        ).alias("viewers_only"),
        F.round(
            F.theta_sketch_estimate(F.theta_union("viewers", "purchasers")), 1
        ).alias("either"),
    )
