"""End-to-end LLM training-data curation demo over the testdata corpus.

Chains the engine's curation operators the way a pre-training pipeline
would: quality gates -> exact + fuzzy dedup -> decontamination -> RAG
chunking -> length-weighted sampling. Each stage is one of the
registered queries (so each is independently oracle-verified); this
script shows how they compose.

Run: python examples/llm_curation_demo.py [sf_dir]
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
    spark = get_spark("curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    stages = [
        ("quality scores (length/punct/stopword gates)", "q_quality_score"),
        ("trained quality classifier (distributed LR)", "q_quality_classifier"),
        ("character entropy (junk/base64 flags)", "q_char_entropy"),
        ("exact dedup (content-hash groups)", "q_dedup_exact"),
        ("near-dup pairs (MinHash+LSH, exact-oracle twin)", "q_minhash_exact"),
        ("near-dup clusters (star contraction)", "q_components_star"),
        ("survivor selection (keep-longest per cluster)", "q_dedup_survivors"),
        ("duplicated-span coverage (exact-substring meter)", "q_dup_span_coverage"),
        ("duplicated-span removal (boilerplate strip)", "q_dup_span_removal"),
        ("benchmark decontamination (shared 3-grams)", "q_decontaminate"),
        ("RAG chunks (200-char windows, 50 overlap)", "q_doc_chunks"),
        ("BPE merge training (word-frequency rounds)", "q_bpe_merges"),
        ("BPE encode (vocabulary-level merge apply)", "q_bpe_encode"),
        ("length-weighted sample (one-pass E-S)", "q_weighted_sample"),
        ("temperature-rebalanced language mix (alpha=0.5)", "q_temperature_mix"),
        ("train/test split + mixing weights", "q_data_mixing"),
        # round 5: target-domain selection, semantic + multimodal dedup,
        # hybrid retrieval and its evaluation
        ("DSIR importance weights (target-likeness)", "q_dsir_weights"),
        ("semantic dedup keep-decision (SemDeDup)", "q_semdedup"),
        ("image near-dup (banded dHash Hamming)", "q_image_neardup"),
        ("audio near-dup (energy-delta fingerprints)", "q_audio_neardup"),
        ("video near-dup (frame-aligned fingerprints)", "q_video_neardup"),
        ("hybrid retrieval fusion (BM25 + cosine RRF)", "q_rrf_fusion"),
        ("retrieval quality (nDCG@10)", "q_ndcg_eval"),
        ("contrastive hard negatives (per anchor)", "q_hard_negatives"),
        # round 5b: corpus diagnostics, the second tokenizer family,
        # fingerprint/coreset curation and the ANN qualification loop
        ("n-gram novelty curve (first-occurrence share)", "q_ngram_novelty"),
        ("embedding outliers (centroid-distance z)", "q_embed_outliers"),
        ("winnowing fingerprints (shared-print pairs)", "q_winnowing"),
        ("unigram-LM tokenizer (EM-trained pieces)", "q_unigram_lm"),
        ("deterministic epoch shuffle (shard, pos)", "q_shard_assign"),
        ("SRP cosine sketches (bucket census)", "q_srp_lsh"),
        ("ANN recall@5 vs brute force (sampled)", "q_srp_recall"),
        ("k-center coreset (farthest-first picks)", "q_coreset"),
        ("mutual nearest neighbors (bitext kernel)", "q_mutual_nn"),
        ("Zipf slope + KS drift + lang/source MI",
         "q_zipf_fit"),
    ]
    for title, name in stages:
        n = QUERIES[name](spark, sf_dir).count()
        print(f"{title:55s} -> {n:6d} rows   ({name})")
    print("\nEvery stage above is a registered query, value-checked against"
          "\na DuckDB oracle (iterative kernels carry invariant tests"
          "\ninstead — see __spark_entry__.py); compose them freely.")


if __name__ == "__main__":
    main()
