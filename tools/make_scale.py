"""Scale-rehearsal table builder: replicate an sf directory K× with
key-offsets, preserving referential integrity.

The small-SF parquet verifies correctness; this builds the load-test
set the 100-TB design claims are rehearsed against (bounded collects,
banded LSH, blocked ANN: all plan-audited shapes whose failure mode is
super-linear blowup, which only shows up under scale). Replica i
offsets every entity key by i*STRIDE so foreign keys stay valid and
every join keeps its selectivity; region/nation stay fixed (TPC-H
dims are constant across SF). Text/embedding payloads repeat, which
deliberately stresses the dedup family with a known 10× duplication
plant.

Usage: python tools/make_scale.py [src_sf_dir] [dst_dir] [factor] [--vocab-growth]
       python tools/make_scale.py /root/testdata/sf0.1 /tmp/sf1 10

--vocab-growth (round 12): verbatim text replication adds ZERO new
vocabulary, so "vocabulary-bounded" scale claims were never stressed
on the axis they actually grow on — Heaps' law (a 100-TB web corpus
has ~1e8-1e9 distinct whitespace tokens, dominated by typos/URLs/ids).
With this flag, replica i > 0 suffixes '_r{i}' onto the ~20% of tokens
whose hash lands in bucket 0, so the distinct vocabulary grows
~(1 + 0.2*(factor-1))x — at factor 100 a ~21x vocabulary under the
same 100x corpus — and the vocabulary-keyed family (bpe encode,
fertility, tfidf, pmi, unigram/ngram LMs, vocab build/coverage) gets
measured against vocabulary growth, not just corpus growth.
documents.n_chars is recomputed so the metadata stays consistent.
"""

from __future__ import annotations

import os
import sys

import duckdb

K_STRIDE = 1_000_000       # entity keys (cust/supp/part/user/doc/vec)
O_STRIDE = 10_000_000      # order/event ids (larger key spaces)

# table -> {column: stride}; replica i adds i*stride to the column
OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": K_STRIDE},
    "supplier": {"s_suppkey": K_STRIDE},
    "part": {"p_partkey": K_STRIDE},
    "orders": {"o_orderkey": O_STRIDE, "o_custkey": K_STRIDE},
    "lineitem": {
        "l_orderkey": O_STRIDE,
        "l_partkey": K_STRIDE,
        "l_suppkey": K_STRIDE,
    },
    "events": {"event_id": O_STRIDE, "user_id": K_STRIDE},
    "documents": {"doc_id": K_STRIDE},
    "embeddings": {"vec_id": K_STRIDE},
}
FIXED = ["region", "nation"]


def build(src: str, dst: str, factor: int, vocab_growth: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT parquet, COMPRESSION zstd)"
        )
        print(f"{t}: copied")
    # replica i > 0 renames ~20% of the vocabulary (hash bucket 0) so
    # distinct tokens grow with the factor instead of staying constant
    grown_text = (
        "list_aggregate(list_transform(regexp_split_to_array(text, '\\s+'), "
        "t -> CASE WHEN i > 0 AND hash(t) % 5 = 0 THEN t || '_r' || i "
        "ELSE t END), 'string_agg', ' ')"
    )
    for t, offs in OFFSETS.items():
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {offs[c]} AS {c}" if c in offs else c for c in cols
        )
        if vocab_growth and t == "documents":
            sel = ", ".join(
                f"{c} + i * {offs[c]} AS {c}"
                if c in offs
                else (
                    f"{grown_text} AS text"
                    if c == "text"
                    else (f"length({grown_text}) AS n_chars" if c == "n_chars" else c)
                )
                for c in cols
            )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"(SELECT unnest(range({factor})) AS i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet, COMPRESSION zstd)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--vocab-growth"]
    vocab_growth = "--vocab-growth" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/tmp/sf1"
    factor = int(args[2]) if len(args) > 2 else 10
    build(src, dst, factor, vocab_growth)
