"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``pcap_to_parquet_spark`` package; this
module is a thin adapter over its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pcap_to_parquet_spark.operators  # noqa: F401  (registers all queries)
from pcap_to_parquet_spark.operators.flagship import revenue_by_nation
from pcap_to_parquet_spark.registry import ORACLES, QUERIES

SF0001_DIR = "/root/testdata/sf0.001"

# The driver's correctness gate verifies the first 50 entries of queries()
# in iteration order.  With 89 registered queries the order is rotated per
# round so every query earns a driver CORRECTNESS row across rounds:
# round 1 checked the plain registration order (its first 50); round 2
# fronts the 25 queries round 1 never reached, then every query whose
# code or oracle changed this round, then all round-2 additions, then
# the rest (r1-green and unchanged) in registration order. Union of the
# r1 + r2 windows covers all 89 (pinned by test_gate_front_names_exist).
_GATE_FRONT = [
    # never checked in CORRECTNESS_r01.json (registration indices 50-74)
    "q_subquery_exists",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_json_funcs",
    "q_array_funcs",
    "q_explode",
    "q_map_funcs",
    "q_hash_funcs",
    "q_salted_join",
    "q_bucketed_join",
    "q_sessionize",
    "q_pcap_trailers",
    "q_udaf_robust_stats",
    "q_window_rank",
    "q_window_frame",
    "q_lag_lead",
    "q_topk_per_group",
    "q_window_dist",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_watermark",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_stateful",
    # changed this round (re-verify against the driver)
    "q_curation_pipeline",
    "q_ngram_jaccard",
    "q_dedup_clusters",
    "q_flagship_revenue",
    "q_multimodal_features",
    "q_token_count",  # output ints widened to BIGINT since its r1 green row
    # new in round 2 (never driver-checked)
    "q_media_resize",
    "q_audio_features",
    "q_decontaminate",
    "q_tfidf_top_terms",
    "q_repetition_score",
    "q_vocab_build",
    "q_stream_stream_join",
    "q_sql_shipping_priority",
    "q_sql_returned_items",
    "q_merge_upsert",
    "q_corr_stats",
    "q_range_frame",
    "q_two_stage_distinct",
    "q_stream_parquet_sink",
]


def _gate_ordered(mapping: dict) -> dict:
    """Reorder ``mapping`` so _GATE_FRONT entries come first."""
    front = {n: mapping[n] for n in _GATE_FRONT if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in front}
    return {**front, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _gate_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return _gate_ordered(ORACLES)
