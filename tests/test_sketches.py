"""Sketch error contracts vs exact answers (the rows-only driver check
can't see accuracy; these pin it)."""

from __future__ import annotations

import os

import pcap_to_parquet_spark.operators  # noqa: F401
from pyspark.sql import functions as F

import pytest

from pcap_to_parquet_spark.registry import QUERIES
from pcap_to_parquet_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"

# the estimator contracts hold at EVERY scale the driver regenerates —
# parameterized so a data regeneration can't silently degrade a sketch
# at the bench SF while the sf0.01 pin stays green. The 100× rehearsal
# set (tools/make_scale.py sf0.1 -> /tmp/sf10 100) joins the sweep when
# present, so a distribution shift from regenerated data can't silently
# degrade the sketches at scale either; skipped (not failed) when the
# rehearsal set hasn't been built on this host.
_SF10 = "/tmp/sf10"
SFS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    pytest.param(
        _SF10,
        marks=pytest.mark.skipif(
            not os.path.isdir(_SF10), reason="100x rehearsal set not built"
        ),
    ),
]


@pytest.mark.parametrize("sf", SFS)
def test_hll_rollup_accuracy(spark, sf):
    SF = sf
    rows = {r.key: r.est_distinct for r in QUERIES["q_hll_rollup"](spark, SF).collect()}
    e = load_table(spark, SF, "events")
    exact_total = e.select(F.countDistinct("user_id")).first()[0]
    # default lgK=12 → rse ~1.6%/sqrt; allow 5%
    assert abs(rows["total"] - exact_total) <= max(3, 0.05 * exact_total)
    # merged total must dominate any single day and be <= sum of days
    days = [v for k, v in rows.items() if k != "total"]
    assert rows["total"] >= max(days) - 1
    assert rows["total"] <= sum(days) + 1


@pytest.mark.parametrize("sf", SFS)
@pytest.mark.slow  # >=5s: deselected from the default driver-verify run
def test_kll_quantiles_accuracy(spark, sf):
    SF = sf
    got = {r.key: r for r in QUERIES["q_kll_quantiles"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
    ).first()
    n = li.count()
    # KLL default k=200 → rank error ~1.65%; check the VALUE via rank:
    # the sketch's p50 must sit within ±3.5% of n in exact rank terms
    for p, val in ((0.5, got["total"].p50), (0.9, got["total"].p90)):
        rank = li.filter(F.col("l_extendedprice") <= val).count() / n
        assert abs(rank - p) <= 0.035, (p, val, rank)
    # sanity: monotone quantiles
    for r in got.values():
        assert r.p50 <= r.p90 <= r.p99


@pytest.mark.parametrize("sf", SFS)
def test_theta_set_algebra_consistency(spark, sf):
    SF = sf
    r = QUERIES["q_theta_audience_overlap"](spark, SF).first()
    e = load_table(spark, SF, "events")
    viewers = {x.user_id for x in e.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    buyers = {x.user_id for x in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    def close(est, exact):
        return abs(est - exact) <= max(3, 0.05 * exact)
    assert close(r.viewers, len(viewers))
    assert close(r.purchasers, len(buyers))
    assert close(r.both, len(viewers & buyers))
    assert close(r.viewers_only, len(viewers - buyers))
    assert close(r.either, len(viewers | buyers))
    # inclusion-exclusion must hold on the estimates themselves (~eps)
    assert abs((r.viewers + r.purchasers - r.both) - r.either) <= 0.05 * r.either + 3


def test_countmin_never_undercounts_and_finds_true_heavies(spark):
    """Count-min contract: est >= exact for every reported token, and
    the estimate-ranked top tokens are the exact heavy hitters (at this
    corpus size, collisions in a 1024-wide row add far less than the
    gap between heavy and typical tokens)."""
    from collections import Counter

    got = {r.token: r.est_n for r in QUERIES["q_countmin_topk"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").select("text").collect()
    exact = Counter(t for r in docs for t in r.text.split() if t)
    for tok, est in got.items():
        assert est >= exact[tok], (tok, est, exact[tok])
        # overcount bounded: eps*N with eps=e/w, generous constant
        assert est - exact[tok] <= 3 * sum(exact.values()) / 1024, tok
    top_exact = {t for t, _ in exact.most_common(10)}
    assert top_exact <= set(got)
