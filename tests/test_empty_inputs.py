"""Empty-input robustness: every operator must return an empty (or
sensible constant) result on 0-row tables, never crash.

At 100 TB emptiness is routine — a fresh partition, an aggressive
filter, a replay from the epoch boundary — and an operator that throws
on it takes the whole pipeline run down.
"""

from __future__ import annotations

import pcap_to_parquet_spark.operators  # noqa: F401  (registers queries)
import pytest

from pcap_to_parquet_spark.registry import QUERIES
from pcap_to_parquet_spark.schema import TESTDATA_SCHEMAS
from pyspark.sql.types import LongType, StructField, StructType

# empty-lake robustness fuzz over every query (~4 min) - full-suite/release gate, r16
pytestmark = pytest.mark.slow

# queries whose plan is driven purely by the batch tables; streaming and
# iterative-sampling queries (kmeans needs k seed rows) are exercised
# separately or are documented to need data
EMPTY_SAFE = [
    "q_flagship_revenue",
    "q_hash_agg",
    "q_window_rank",
    "q_window_frame",
    "q_window_dist",
    "q_range_frame",
    "q_topk_per_group",
    "q_sessionize",
    "q_dedup_exact",
    "q_ngram_jaccard",
    "q_dedup_clusters",
    "q_decontaminate",
    "q_tfidf_top_terms",
    "q_repetition_score",
    "q_vocab_build",
    "q_token_count",
    "q_curation_pipeline",
    "q_merge_upsert",
    "q_corr_stats",
    "q_media_resize",
    "q_multimodal_features",
    "q_similarity_topk",
    "q_embed_neardup",
    "q_sql_shipping_priority",
    "q_sql_returned_items",
    "q_train_test_split",
    "q_data_mixing",
    # round 3
    "q_scd2_dimension",
    "q_sequence_islands",
    "q_anomaly_zscore",
    "q_percentile_exact",
    "q_minmax_by",
    "q_balanced_sample",
    "q_bm25",
    "q_pii_scrub",
    "q_url_extract",
    "q_length_histogram",
    "q_embed_quantize",
    "q_video_frames",
    "q_sql_pricing_summary",
    "q_sql_top_supplier",
    "q_partitioned_lake",
    "q_incremental_dedup",
    "q_list_agg",
    "q_resample",
    "q_time_rollup",
    "q_mode_per_group",
    "q_stream_upsert",
    "q_sql_local_volume",
    "q_window_nth",
    "q_lake_compact",
    "q_retention_cohort",
    "q_rolling_median",
    "q_heavy_hitters",
    "q_zorder_lake",
    "q_stream_static_join",
    "q_rolling_distinct",
    "q_peak_concurrency",
    "q_cdc_apply",
    "q_orc_lake",
    "q_markov_transitions",
    "q_basket_pairs",
    "q_ab_ttest",
    "q_pct_change",
    "q_stream_left_outer",
    "q_fuzzy_join",
    "q_sql_lateral",
    "q_variant_shred",
    "q_dynamic_overwrite",
    "q_cow_delete",
    # round 4
    "q_sql_small_qty",
    "q_sql_waiting_supplier",
    "q_ngram_lm_score",
    "q_cogroup_diff",
    "q_quantile_bucketize",
    "q_countmin_topk",
    "q_scd2_lookup",
    "q_permissive_ingest",
    "q_embed_pool",
    "q_session_window",
    "q_skyline",
    "q_observed_load",
    "q_xml_ingest",
    "q_cidr_enrich",
    "q_image_dhash",
    "q_sql_custdist",
    "q_sql_big_orders",
    "q_sql_idle_customers",
    "q_sequence_pack",
    "q_ngram_containment",
    "q_dedup_survivors",
    "q_try_arithmetic",
    # round 4b
    "q_doc_chunks",
    "q_minhash_exact",
    "q_pagerank",
    "q_sql_late_orders",
    "q_sql_nation_volume",
    "q_sql_market_share",
    "q_sql_product_profit",
    "q_sql_parts_suppliers",
    "q_stream_funnel",
    "q_stream_topk",
    "q_knn_join",
    "q_stream_kmv",
    "q_mmr_diversify",
    "q_attribution",
    "q_components_star",
    "q_weighted_sample",
    "q_stream_decontaminate",
    "q_forecast_eval",
    "q_sql_min_cost_supplier",
    "q_sql_excess_supplier",
    "q_sql_important_stock",
    "q_sql_shipmode_priority",
    "q_density_clusters",
    "q_text_source",
    "q_kmv_window",
    "q_lpa_communities",
    "q_winsorized_mean",
    "q_sentence_chunks",
    "q_numeric_histogram",
    "q_cusum_drift",
    "q_rfm_segments",
    "q_char_entropy",
    "q_rolling_corr",
    "q_top_paths",
    "q_mad_outliers",
    "q_lorenz_deciles",
    "q_new_vs_returning",
    # round 4
    "q_dup_span_coverage",
    "q_pmi_bigrams",
    "q_dup_span_removal",
    "q_temperature_mix",
    "q_quality_classifier",
    "q_ewma",
    "q_dpp_join",
    "q_bpe_merges",
    "q_bpe_encode",
    "q_holt_forecast",
    "q_multi_regression",
    "q_dsir_weights",
    "q_semdedup",
    "q_rrf_fusion",
    "q_hard_negatives",
    "q_image_neardup",
    "q_audio_neardup",
    "q_video_neardup",
    "q_adamic_adar",
    "q_shard_assign",
    "q_rake_keywords",
    "q_ks_drift",
    "q_ngram_novelty",
    "q_embed_outliers",
    "q_unigram_lm",
    "q_srp_lsh",
    "q_changepoint",
    "q_mutual_nn",
    "q_winnowing",
    "q_srp_recall",
    "q_coreset",
    "q_span_mask",
    "q_dp_counts",
    "q_auc_eval",
    # round 7
    "q_calibration_ece",
    "q_seasonal_decompose",
    "q_conformal_intervals",
    "q_naive_bayes",
    "q_benford",
    "q_bootstrap_ci",
    # round 8
    "q_isotonic_calibration",
    "q_readability",
    "q_brier_decomposition",
    "q_label_noise",
    "q_kaplan_meier",
    "q_js_divergence",
    "q_burstiness",
    "q_weighted_median",
    "q_simpson_paradox",
    # round 9
    "q_embed_decontaminate",
    "q_fairness_audit",
    # round 11
    "q_token_fertility",
    "q_split_balance",
    "q_dedup_bias",
    "q_cluster_size_census",
    "q_dedup_source_census",
    "q_ivf_probe_curve",
    # round 12
    "q_session_quality",
    "q_session_transitions",
    "q_fulfillment_latency",
    "q_repeat_cadence",
    # round 13
    "q_supplier_fulfillment",
    "q_winnowing_band",
    "q_winnowing_band_members",
    "q_winnowing_band_clusters",
    "q_winnowing_band_survivors",
    "q_dedup_simhash_clusters",
    "q_dedup_simhash_survivors",
    "q_dedup_agreement_by_source",
    # cube over empty input: Spark's Expand emits nothing; the oracle
    # carries HAVING COUNT(*) > 0 so DuckDB matches (round-13 find)
    "q_fulfillment_matrix",
]

# (q_winnowing_band_curve returns its |bands| grid rows with zero
# counts on empty documents — CONSTANT_ON_EMPTY below)

# global aggregates return one constant row on empty input (their
# DuckDB oracles do the same) — "sensible constant", not zero rows
CONSTANT_ON_EMPTY = {
    "q_winnowing_band_curve": 3,  # one row per band count, zero counts
    "q_dedup_method_agreement": 1,  # one census row of zeros / NULL ratio
    "q_dedup_method_agreement3": 1,  # one 2x2x2 census row of zeros / NULLs
    "q_band_filter_attribution": 4,  # rule rows: zero counts, NULL share
    "q_table_profile": 3,  # one profile row per profiled column
    "q_schema_evolution": 1,  # one summary row of zero counts
    "q_funnel": 3,  # one row per stage, all counts zero
    "q_funnel_bounded": 3,  # one row per stage, all counts zero
    "q_time_travel": 2,  # both snapshot summaries, zero counts
    "q_sql_disjunctive": 1,  # global aggregate: one row of zero/NULL
    "q_sql_recursive": 1,  # the recursion anchor row survives
    "q_table_checksum": 3,  # one checksum row per audited table
    "q_triangle_count": 1,  # global graph census row of zeros
    "q_bitmap_distinct": 1,  # the merged-total row survives (zero count)
    "q_triangle_cap": 1,  # global graph census row of zeros
    "q_sql_promo_share": 1,  # global ratio aggregate: one NULL row
    "q_kmv_distinct": 1,  # the merged sketch row survives (exact 0)
    "q_sql_forecast_revenue": 1,  # global aggregate: one NULL row
    "q_k_anonymity": 1,  # census summary row of zeros
    "q_ndcg_eval": 1,  # the metric row survives, all NULL
    "q_gini": 1,  # global concentration summary row
    "q_zipf_fit": 1,  # the OLS aggregate row survives, all NULL
    "q_kcore": 1,  # graph census row of zeros, converged=true
    "q_degree_powerlaw": 1,  # census aggregate row, zero count + NULLs
    "q_lsh_recall": 1,  # audit counts row of zeros, recall 0.0
    "q_psi_drift": 1,  # aggregate row: zero counts, NULL psi
    "q_chi2_test": 1,  # global test row: n_total 0, NULL statistic
    "q_l_diversity": 1,  # census summary row: n_groups 0
    "q_acf": 7,  # one row per lag, NULL acf
    "q_jackknife_ci": 1,  # global estimator row: n 0, NULLs
    "q_anova_f": 1,  # global test row, NULL sums of squares
    "q_ips_eval": 1,  # global estimator row: n 0, n_matched 0
    # round 8
    "q_spearman_corr": 1,  # global correlation row: n_days 0, NULLs
    "q_kendall_tau": 1,  # global concordance row: zero counts, NULL tau
    "q_mann_whitney": 1,  # global test row: zero counts, NULL u/z
    "q_t_closeness": 1,  # census summary row: n_groups 0
    "q_pacf": 4,  # one row per lag, NULL pacf
    "q_mrr_eval": 1,  # metric row: n_queries 0, NULL mrr
    "q_map_eval": 1,  # metric row: n_queries 0, NULL map
    "q_referential_integrity": 7,  # one row per FK edge, zero counts
    "q_levene_test": 1,  # global test row, NULL statistic
    "q_cohens_kappa": 1,  # agreement row: n_docs 0, NULL kappa
    "q_matryoshka_recall": 1,  # metric row: n_queries 0, NULL recall
    "q_mcnemar_test": 1,  # paired-test row: zero counts, NULL chi2
    "q_hill_tail": 1,  # estimator row: k 0, NULL alpha
    # round 10
    "q_pack_planner": 1,  # packing census row: zero counts, NULL rates
    "q_lsh_precision": 1,  # audit counts row of zeros, ratios 0.0
    # round 11
    "q_dedup_threshold_curve": 9,  # tau grid rows: zero counts, NULL frac
    "q_filter_attribution": 4,  # rule rows: zero counts, NULL share
    "q_vocab_coverage": 5,  # top_k grid rows: zero counts, NULL coverage
    "q_lsh_planner": 5,  # geometry grid rows: literals, NULL exp mass
    "q_filter_dedup_overlap": 1,  # ordering census row: zero counts, NULL ratio
    "q_context_fit": 5,  # window grid rows: zero counts, NULL shares
    "q_minhash_perm_sensitivity": 4,  # budget grid rows: zero count, NULL errs
    # round 12
    "q_skew_planner": 7,  # one row per audited (table, key), zero counts
}


@pytest.fixture(scope="module")
def empty_lake(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_lake")
    for name, schema in TESTDATA_SCHEMAS.items():
        if name == "events":
            # on disk events.ts is int64 nanoseconds (loader converts)
            schema = StructType(
                [
                    f if f.name != "ts" else StructField("ts", LongType())
                    for f in schema.fields
                ]
            )
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_query_survives_empty_lake(spark, empty_lake, name):
    df = QUERIES[name](spark, empty_lake)
    assert df.count() == 0, name


@pytest.mark.parametrize("name", sorted(CONSTANT_ON_EMPTY))
def test_constant_queries_on_empty_lake(spark, empty_lake, name):
    rows = QUERIES[name](spark, empty_lake).collect()
    assert len(rows) == CONSTANT_ON_EMPTY[name], name
    for r in rows:  # every count in the constant row must be zero
        for col, v in r.asDict().items():
            if col.startswith("n_"):
                assert v == 0, (name, col, v)
