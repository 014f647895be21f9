"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver collect bottleneck). One warmup pass of the flagship query
amortizes JVM/codegen startup out of the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pcap_to_parquet_spark.operators  # noqa: F401
from pcap_to_parquet_spark.registry import QUERIES
from pcap_to_parquet_spark.session import get_spark

HEADLINE = [
    "q_flagship_revenue",   # 4-table join + agg + top-n
    "q_hash_agg",           # TPC-H Q1 shape
    "q_broadcast_join",     # dim broadcast + agg
    "q_window_frame",       # running/sliding frames
    "q_topk_per_group",     # WindowGroupLimit path
    "q_sessionize",         # two-window sessionization
    "q_dedup_exact",        # content-hash dedup
    "q_dedup_minhash",      # MinHash + LSH near-dedup
    "q_similarity_topk",    # brute-force cosine top-k
    "q_text_stats",         # tokenize + agg
    "q_pcap_pipeline",      # reference capability end-to-end
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("q_flagship_revenue")  # warmup (JVM + codegen + parquet footer cache)

    timings = {name: round(run(name), 3) for name in HEADLINE}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
