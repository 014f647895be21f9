"""Behavioral invariants for the round-4 additions: duplicated-span
coverage on a planted corpus, PMI parity with the DuckDB oracle, and
PQ-ANN recall against exact L2 search."""

from __future__ import annotations

import numpy as np

import pcap_to_parquet_spark.operators  # noqa: F401  (registers queries)

from pcap_to_parquet_spark.registry import ORACLES, QUERIES
from tests.conftest import SF0001


def test_dup_span_coverage_planted(spark, tiny_docs_dir):
    """Exact duplicates cover 1.0; the one-word-changed doc loses only
    the token whose every 5-gram span straddles the edit; unrelated and
    sub-span docs sit at zero."""
    rows = {r.doc_id: r for r in QUERIES["q_dup_span_coverage"](spark, tiny_docs_dir).collect()}
    assert rows[0].dup_frac == 1.0 and rows[0].dup_tokens == 30
    assert rows[1].dup_frac == 1.0
    # doc 2: token 7 (0-based) changed; spans starting 3..7 break, so
    # tokens 0-6 and 8-29 stay covered → 29 of 30
    assert rows[2].dup_tokens == 29
    assert abs(rows[2].dup_frac - round(29 / 30, 4)) < 1e-9
    assert rows[3].dup_tokens == 0 and rows[3].dup_frac == 0.0
    assert rows[4].n_tokens == 2 and rows[4].dup_tokens == 0


def test_pmi_bigrams_matches_oracle(spark):
    """Set-level parity with the DuckDB oracle at sf0.001 (the driver
    checks sf0.01; this pins the other fixture): same bigrams, same
    counts, PMI within float tolerance."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF0001}/documents.parquet')"
    )
    want = {r[0]: (r[1], r[2]) for r in con.execute(ORACLES["q_pmi_bigrams"]).fetchall()}
    got = {r.bigram: (r.n_ab, r.pmi) for r in QUERIES["q_pmi_bigrams"](spark, SF0001).collect()}
    assert set(got) == set(want)
    for bg, (n_ab, pmi) in got.items():
        assert n_ab == want[bg][0], bg
        assert abs(pmi - want[bg][1]) < 1e-6, bg


def test_pq_ann_recall_vs_exact(spark):
    """The ADC-shortlist + exact-rerank pipeline must recover most of
    the true L2 top-10 (0.8 at sf0.01; ≥0.5 asserted for slack across
    fixtures) and return exact distances in ascending order."""
    from pcap_to_parquet_spark.sources import load_table

    rows = QUERIES["q_pq_ann"](spark, SF0001).collect()
    assert len(rows) == 10
    dists = [r.l2_dist for r in rows]
    assert dists == sorted(dists)

    em = load_table(spark, SF0001, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in em}
    q = vecs[0]
    exact = sorted((float(np.sum((v - q) ** 2)), k) for k, v in vecs.items() if k != 0)[:10]
    exact_ids = {k for _, k in exact}
    got_ids = {r.vec_id for r in rows}
    assert len(exact_ids & got_ids) / 10 >= 0.5
    # reranked distances are EXACT for the vectors returned
    for r in rows:
        true_d = float(np.sqrt(np.sum((vecs[r.vec_id] - q) ** 2)))
        assert abs(r.l2_dist - round(true_d, 4)) < 1e-9, r
