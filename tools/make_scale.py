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

Usage: python tools/make_scale.py [src_sf_dir] [dst_dir] [factor]
       python tools/make_scale.py /root/testdata/sf0.1 /tmp/sf1 10
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


def build(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT parquet, COMPRESSION zstd)"
        )
        print(f"{t}: copied")
    for t, offs in OFFSETS.items():
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {offs[c]} AS {c}" if c in offs else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"(SELECT unnest(range({factor})) AS i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet, COMPRESSION zstd)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, factor)
