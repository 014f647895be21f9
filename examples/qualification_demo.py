"""Statistical-qualification demo: the audit loop a pipeline runs
BEFORE shipping a dataset or trusting a filter model.

Chains the round-7 qualification operators the way a data-quality
review would: distribution audits (chi-square, Benford, ANOVA) ->
model qualification (AUC, calibration/ECE, naive-Bayes confusion) ->
uncertainty (conformal intervals, jackknife + bootstrap CIs) ->
privacy gate (l-diversity). Each stage is a registered query (so each
is independently oracle-verified); this script shows how they compose
into a qualification report.

Run: python examples/qualification_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcap_to_parquet_spark.session import get_spark
import pcap_to_parquet_spark.operators  # noqa: F401
from pcap_to_parquet_spark.registry import QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("qualification-demo")
    spark.sparkContext.setLogLevel("ERROR")

    sections = [
        ("is the language mix confounded with the source?", "q_chi2_test"),
        ("do the order amounts look organic (Benford)?", "q_benford"),
        ("does event value differ across event types?", "q_anova_f"),
        ("is the quality heuristic discriminative (AUC)?", "q_auc_eval"),
        ("are its scores calibrated (reliability bins)?", "q_calibration_ece"),
        ("supervised language-id confusion (naive Bayes)", "q_naive_bayes"),
        ("distribution-free intervals (Mondrian conformal)", "q_conformal_intervals"),
        ("revenue-per-unit uncertainty (jackknife)", "q_jackknife_ci"),
        ("daily-mean uncertainty (LCG bootstrap)", "q_bootstrap_ci"),
        ("counterfactual policy value (IPS/SNIPS)", "q_ips_eval"),
        ("attribute-disclosure gate (l-diversity)", "q_l_diversity"),
        # round 8: deeper audits on the same report
        ("are the spreads even comparable (Brown-Forsythe)?", "q_levene_test"),
        ("monotone association, outlier-robust (Spearman)", "q_spearman_corr"),
        ("rank-sum shift test (Mann-Whitney)", "q_mann_whitney"),
        ("detector-vs-label agreement beyond chance (kappa)", "q_cohens_kappa"),
        ("score quality decomposed (Brier/Murphy)", "q_brier_decomposition"),
        ("monotone score calibration (isotonic/PAV)", "q_isotonic_calibration"),
        ("retrieval quality: first hit / all hits (MRR+MAP)", "q_mrr_eval"),
        ("mislabeled examples by neighborhood vote", "q_label_noise"),
        ("sensitive-distribution distance gate (t-closeness)", "q_t_closeness"),
        ("FK orphan census before any join", "q_referential_integrity"),
        ("how heavy is the revenue tail (Hill)?", "q_hill_tail"),
        ("does aggregation flip the story (Simpson)?", "q_simpson_paradox"),
    ]
    for title, name in sections:
        print(f"\n== {title} [{name}] ==")
        QUERIES[name](spark, sf_dir).show(10, truncate=False)


if __name__ == "__main__":
    main()
