"""Deterministic ×N upscale of an sf testdata dir — MEASUREMENT ONLY.

The driver's round-end bench may run at a larger, driver-generated scale
factor than the local /root/testdata tree provides (BENCH_r05.json ran at
sf=1.0). This tool builds an sf1.0-*like* directory from sf0.1 so
optimizations can be validated at that scale locally: every table is
unioned N times with key columns shifted per copy (foreign keys shifted
consistently, dimension tables nation/region copied as-is), so join
cardinalities and group sizes scale the way a real ×N would.

Caveats (why this is not the driver's data): document texts get a short
per-copy suffix, so each sf0.1 doc yields N near-identical variants —
near-dup candidate structure is *harsher* than driver data (dup groups
×N); embeddings get a tiny per-copy deterministic perturbation. Numbers
from this dir are for before/after comparison of OUR code only, never
comparable row-for-row with driver BENCH numbers.

Usage: python tools/make_scaled_sf.py [N] [SRC] [DST]
       defaults: N=10, SRC=/root/testdata/sf0.1, DST=/tmp/scaled/sf1.0
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_SHIFTS = {
    # table -> columns shifted by copy_i * stride (stride = global, so FK
    # relations stay consistent across tables)
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]
STRIDE = 10_000_000  # > every key in sf0.1


def scale_table(src: str, dst: str, name: str, n: int) -> None:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    shifts = KEY_SHIFTS.get(name, [])
    copies = []
    for i in range(n):
        c = t
        for col in shifts:
            idx = c.schema.get_field_index(col)
            typ = c.schema.field(idx).type
            shifted = pc.add(c.column(idx), pa.scalar(i * STRIDE, type=typ))
            c = c.set_column(idx, c.schema.field(idx), shifted)
        if name == "documents" and i > 0:
            # near-identical variant, not an exact dup: append a short
            # copy marker so exact-dedup structure isn't degenerate
            idx = c.schema.get_field_index("text")
            txt = pc.binary_join_element_wise(
                c.column(idx).cast(pa.string()), f" v{i}", ""
            )
            c = c.set_column(idx, c.schema.field(idx), txt)
        if name == "embeddings" and i > 0:
            idx = c.schema.get_field_index("embedding")
            emb = c.column(idx).combine_chunks()
            # perturb every float by a tiny copy-specific epsilon so
            # copies are near- but not exact-duplicates
            eps = 1e-4 * i
            flat = pc.add(emb.values, pa.scalar(eps, type=pa.float32()))
            if isinstance(emb, pa.ListArray):
                emb2 = pa.ListArray.from_arrays(emb.offsets, flat)
                c = c.set_column(idx, c.schema.field(idx), emb2)
        copies.append(c)
    out = pa.concat_tables(copies)
    # multiple row groups so scans parallelize the way driver data would
    pq.write_table(
        out, os.path.join(dst, f"{name}.parquet"), row_group_size=200_000
    )
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scaled/sf1.0"
    os.makedirs(dst, exist_ok=True)
    for name in COPY_AS_IS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows} rows")
    for name in KEY_SHIFTS:
        scale_table(src, dst, name, n)
    open(os.path.join(dst, "_DONE"), "w").write("ok\n")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
