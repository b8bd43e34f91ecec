"""Upscale the driver testdata to a larger scale factor for local scale
audits (PERF.md): ``python scripts/make_sf.py SRC DST FACTOR``.

Writes FACTOR stacked copies of every table with key columns offset by
copy_index * STRIDE, preserving referential integrity (an order's
customer copy is the copy the order belongs to) and key-pattern
invariants (STRIDE is a multiple of 20 so ``doc_id % 20``-style planted
fixtures scale linearly).  Copy 0 is byte-identical to the source.
Region/nation are dimensions and copy once.  Document text and embedding
vectors are perturbed per copy (a copy suffix token / +i*1e-3 per
component) so the upscaled corpus does not contain factor-way exact
duplicates that would quadratically blow up text-equality oracles.

Timestamps are NOT shifted: a 10x scale-up multiplies rows per
date/window group, which is exactly what aggregation/window scale tests
should see.
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 100_000_000  # > any source key; multiple of 20

#: key columns to offset per table (copy i adds i*STRIDE)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def upscale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + i * {STRIDE} AS {c}")
            elif t == "documents" and c == "text":
                # keep copy 0 pristine; suffix later copies so the corpus
                # has no factor-way exact-duplicate texts
                sel.append(
                    "CASE WHEN i = 0 THEN text "
                    "ELSE text || ' copytok' || i END AS text")
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN i = 0 THEN embedding ELSE "
                    "list_transform(embedding, x -> CAST(x + i * 0.001 AS REAL)) "
                    "END AS embedding")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{src}/{t}.parquet'), range({factor}) r(i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upscale(src, dst, factor)
