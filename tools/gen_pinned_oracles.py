"""Generate the pinned expected table for non-SQL-expressible per-doc
functions (simhash, winnowing fingerprint count).

These functions use seeded polars/rolling hashes DuckDB cannot reproduce, so
their driver oracle is a PINNED EXPECTED TABLE (VERDICT r1 #8's "precomputed
expected table" option): values computed once by this script, committed at
tests/pinned/doc_expected.parquet, and joined in oracle SQL on sha256(text)
so any corpus whose texts are covered (sf0.001 + sf0.01 testdata) validates.
This is a REGRESSION oracle — it pins today's deterministic outputs against
future drift, not an independent derivation (the pytest oracles cover the
semantics).

Rerun only when the algorithm intentionally changes:
    python tools/gen_pinned_oracles.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_intel_web_scraper_ray.functions.fingerprint import fingerprint  # noqa: E402
from ai_intel_web_scraper_ray.functions.simhash import simhash_batch  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "pinned", "doc_expected.parquet")


def main() -> None:
    rows = {}
    for sf in ("sf0.001", "sf0.01"):
        t = pq.read_table(f"/root/testdata/{sf}/documents.parquet", columns=["text"])
        texts = t["text"].to_pylist()
        sims = simhash_batch([x or "" for x in texts])
        for text, sim in zip(texts, sims):
            sha = hashlib.sha256((text or "").encode()).hexdigest()
            rows[sha] = (int(sim), len(fingerprint(text or "")))
    shas = sorted(rows)
    out = pa.table({
        "text_sha": pa.array(shas, pa.string()),
        "simhash": pa.array([rows[s][0] for s in shas], pa.uint64()),
        "n_fingerprints": pa.array([rows[s][1] for s in shas], pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(out, OUT)
    print(f"wrote {len(out)} pinned rows -> {OUT}")


if __name__ == "__main__":
    main()
