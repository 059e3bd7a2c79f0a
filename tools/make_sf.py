"""Synthesize a larger gate SF from an existing testdata dir by
FK-consistent key-shifted replication (deterministic, seed-free).

    python tools/make_sf.py [--src /root/testdata/sf0.1] [--factor 10] \
        [--out /tmp/testdata_sf1]

Fact tables replicate ``factor`` times with copy c's keys shifted by
``c * SHIFT`` (SHIFT = 2e8, above every source key; keys are int64 —
asserted).  FK consistency: lineitem.l_orderkey and orders.o_orderkey
shift TOGETHER so copy c of lineitem joins copy c of orders;
o_custkey / l_partkey / l_suppkey stay unshifted so dimension joins
(customer / part / supplier, copied 1:1) keep working.  events shift
both event_id and user_id — segment/user semantics derive from
user_id arithmetic, and an unshifted user_id would interleave factor
duplicate (user, ts) timelines, creating window-order ties neither
engine pins.

Two content transforms keep replication from distorting the operators
the gate exercises (same rationale as bench._nodes_big_sf):
- documents copy c>0 gets a deterministic per-copy word permutation —
  token statistics survive, but the copies stop being near-duplicates,
  so MinHash/SimHash dedup doesn't collapse into factor-cliques;
- embeddings copy c>0 get a deterministic per-(copy, dim) perturbation
  (range ±0.005) — cosine ties between identical copies would
  otherwise make every top-k ordering ambiguous.

Everything is written ONCE to parquet; engine and DuckDB oracle read
the same bytes, so any deterministic transform is gate-safe by
construction.  One FILE per table (row-group 64k) — DuckDB views use
read_parquet('{dir}/{tbl}.parquet') verbatim, and Ray splits on row
groups.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 200_000_000
FACT_SHIFTS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIM_TABLES = ("customer", "supplier", "part", "nation", "region")


def _permute_words(texts, copy: int):
    rng = np.random.RandomState(1000 + copy)
    out = []
    for tx in texts:
        w = (tx or "").split()
        rng.shuffle(w)
        out.append(" ".join(w))
    return out


def _perturb_embeddings(col: pa.ChunkedArray, copy: int) -> pa.Array:
    """flat values + deterministic per-(copy, position) noise; list
    offsets preserved."""
    arrs = []
    for chunk in col.chunks:
        flat = chunk.values.to_numpy(zero_copy_only=False).astype(np.float32)
        rng = np.random.RandomState(7000 + copy)
        noise = ((rng.randint(0, 1001, size=len(flat)) - 500)
                 .astype(np.float32)) * np.float32(1e-5)
        vals = pa.array(flat + noise, pa.float32())
        arrs.append(pa.ListArray.from_arrays(chunk.offsets, vals))
    return pa.chunked_array(arrs)


def make_sf(src: str, out: str, factor: int) -> str:
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for tbl in DIM_TABLES:
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
        pq.write_table(t, os.path.join(out, f"{tbl}.parquet"))
    for tbl, cols in FACT_SHIFTS.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
        copies = []
        for c in range(factor):
            tc = t
            for col in cols:
                idx = tc.schema.get_field_index(col)
                assert tc.schema.field(col).type == pa.int64(), (tbl, col)
                tc = tc.set_column(idx, col, pc.add(
                    tc[col], pa.scalar(c * SHIFT, pa.int64())))
            if c > 0 and tbl == "documents":
                ti = tc.schema.get_field_index("text")
                tc = tc.set_column(
                    ti, "text",
                    pa.array(_permute_words(tc["text"].to_pylist(), c),
                             pa.string()))
            if c > 0 and tbl == "embeddings":
                ei = tc.schema.get_field_index("embedding")
                tc = tc.set_column(ei, "embedding",
                                   _perturb_embeddings(tc["embedding"], c))
            copies.append(tc)
        big = pa.concat_tables(copies)
        pq.write_table(big, os.path.join(out, f"{tbl}.parquet"),
                       row_group_size=65536)
        print(f"{tbl}: {len(t)} x {factor} -> {len(big)} rows")
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/testdata_sf1")
    a = ap.parse_args()
    print(make_sf(a.src, a.out, a.factor))


if __name__ == "__main__":
    main()
