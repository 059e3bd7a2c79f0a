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

# (label, dir) corpora to pin: the three driver testdata SFs plus any
# extra dirs passed on argv (e.g. a synthesized /tmp/testdata_sf1 from
# tools/make_sf.py) — every per-SF generator iterates this list, so a new
# scale factor gets pinned rows by re-running this script with its dir.
def sf_dirs():
    dirs = [(sf, f"/root/testdata/{sf}")
            for sf in ("sf0.001", "sf0.01", "sf0.1")]
    dirs += [(os.path.basename(os.path.normpath(d)), d)
             for d in sys.argv[1:] if not d.startswith("-")]
    return dirs


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


CRAWL_LINEAGE_OUT = os.path.join(os.path.dirname(OUT),
                                 "crawl_lineage_expected.parquet")


def gen_crawl_lineage_expected() -> None:
    """Pin per-shard frontier lineage counters for the fixture crawl from
    the independent sequential walk (tests/oracle.py:oracle_crawl_lineage):
    offered with duplicate multiplicity, distinct seen/admitted, and
    emitted == admitted for a drained unbudgeted robots-off crawl."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracle import oracle_crawl_lineage

    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = {p["url"]: p for p in make_web_graph()}
    rows = oracle_crawl_lineage(pages, "https://docs.hot.example/p0",
                                num_shards=4,
                                exclude_patterns=("/excluded/",))
    t = pa.table({
        "shard": pa.array([r["shard"] for r in rows], pa.int64()),
        "offered": pa.array([r["offered"] for r in rows], pa.int64()),
        "seen": pa.array([r["seen"] for r in rows], pa.int64()),
        "admitted": pa.array([r["admitted"] for r in rows], pa.int64()),
        "emitted": pa.array([r["emitted"] for r in rows], pa.int64()),
    })
    pq.write_table(t, CRAWL_LINEAGE_OUT)
    print(f"wrote {len(t)} lineage rows -> {CRAWL_LINEAGE_OUT}")


CRAWL_INTERLEAVED_OUT = os.path.join(os.path.dirname(OUT),
                                     "crawl_interleaved_expected.parquet")


def gen_crawl_interleaved_expected() -> None:
    """Pin the span-level interleaved archival table for the fixture crawl:
    the same independent sequential BFS as gen_crawl_expected, but each
    fetched page also captures its same-domain non-html anchors
    (extract_page collect_media) and is encoded through the codec's
    record_to_spans — one flat row per span.  The engine twin
    (crawl_interleaved_fixture) must reproduce this through the FULL
    distributed path: streamed worker fragments → load_crawl_records
    (dedup + rank) → map_batches interleave → partitioned write → read →
    flatten."""
    from collections import deque

    from ai_intel_web_scraper_ray.functions.htmlx import extract_page
    from ai_intel_web_scraper_ray.functions.urls import (
        is_same_domain,
        normalize_url,
        record_id,
    )
    from ai_intel_web_scraper_ray.sources.interleaved import record_to_spans
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = {p["url"]: p for p in make_web_graph()}
    base_url = "https://docs.hot.example/p0"
    exclude = ("/excluded/",)
    max_depth, selector = 3, "article"

    visited, rows = set(), []
    start = normalize_url(base_url)
    queue = deque([(start, 0)])
    visited.add(start)
    while queue:
        url, depth = queue.popleft()
        if any(p in url for p in exclude):
            continue
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        title, text, links, media = extract_page(
            page["html"], selector, url,
            collect_links=depth < max_depth, collect_media=True)
        if not text.strip():
            continue
        doc_id = record_id("crawl", "official_docs", url)
        spans = record_to_spans(
            {"title": title, "text": text, "media_refs": media})
        for s in spans:
            rows.append((doc_id, s["offset"], s["kind"], s["text"],
                         s["media_ref"]))
        if depth < max_depth:
            for link in links:
                norm = normalize_url(link)
                if norm not in visited and is_same_domain(norm, base_url) \
                        and not any(p in norm for p in exclude):
                    visited.add(norm)
                    queue.append((norm, depth + 1))

    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "span_offset": pa.array([r[1] for r in rows], pa.int64()),
        "kind": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "media_ref": pa.array([r[4] for r in rows], pa.string()),
    })
    pq.write_table(t, CRAWL_INTERLEAVED_OUT)
    print(f"wrote {len(t)} interleaved span rows -> {CRAWL_INTERLEAVED_OUT}")


DEDUP_OUT = os.path.join(os.path.dirname(OUT), "dedup_expected.parquet")


def _greedy_survivors(n_docs: int, doc_ids, edges) -> list:
    """Sequential keep-first replay (independent reimplementation of the
    reference's LSH query-then-insert loop): in ascending doc_id order,
    drop a doc iff some KEPT smaller-id doc is its neighbor."""
    from collections import defaultdict as _dd

    adj = _dd(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    kept = set()
    out = []
    for d in sorted(doc_ids):
        if any(nb in kept for nb in adj[d]):
            continue
        kept.add(d)
        out.append(d)
    return out


def _minhash_edges(doc_ids, texts, threshold: float = 0.7) -> list:
    """Candidate pairs sharing >=1 LSH band, verified est_jaccard >=
    threshold — banded-candidate semantics replayed with a plain
    dict-of-buckets, then vectorized signature comparison per pair."""
    import numpy as np

    from ai_intel_web_scraper_ray.functions import minhash as mh

    sigs = {d: mh.signature(t or "") for d, t in zip(doc_ids, texts)}
    buckets: dict = {}
    cand = set()
    for d in doc_ids:
        for off, b in enumerate(mh.band_hashes(sigs[d]).tolist()):
            key = (off, b)
            for other in buckets.get(key, ()):
                cand.add((other, d) if other < d else (d, other))
            buckets.setdefault(key, []).append(d)
    edges = []
    for a, b in cand:
        if float((sigs[a] == sigs[b]).mean()) >= threshold:
            edges.append((a, b))
    return edges


def _simhash_edges(doc_ids, texts, max_hamming: int = 3) -> list:
    """Candidate pairs within hamming <= max_hamming of each other's
    64-bit simhash.  Pigeonhole: any pair at distance <= 3 agrees exactly
    on >=1 of 4 disjoint 16-bit chunks, so chunk-bucket candidates have
    exact recall; verify with a true popcount."""
    import numpy as np

    from ai_intel_web_scraper_ray.functions.simhash import simhash_batch

    sims = simhash_batch([t or "" for t in texts]).astype(np.uint64)
    by_id = dict(zip(doc_ids, sims.tolist()))
    buckets: dict = {}
    cand = set()
    for d, s in zip(doc_ids, sims.tolist()):
        for c in range(4):
            key = (c, (s >> (16 * c)) & 0xFFFF)
            for other in buckets.get(key, ()):
                cand.add((other, d) if other < d else (d, other))
            buckets.setdefault(key, []).append(d)
    edges = []
    for a, b in cand:
        if bin(by_id[a] ^ by_id[b]).count("1") <= max_hamming:
            edges.append((a, b))
    return edges


def gen_dedup_expected() -> None:
    """Pin the minhash / simhash near-dup SURVIVOR sets per test corpus,
    keyed by the corpus' MIN(sha256(text)) — content-derived, distinct
    across sf levels (sf0.001 and sf0.01 both hold 500 docs, so a count
    key would collide) and computable in DuckDB — so the driver can
    hash-check the two dedup queries it cannot express in SQL.
    Candidate generation + greedy resolution here are independent
    sequential reimplementations; the signature/simhash VALUES reuse the
    production kernels (those are pinned separately in doc_expected /
    validated by pytest oracles)."""
    frames = []
    for sf, sf_dir in sf_dirs():
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        doc_ids = [int(x) for x in t["doc_id"].to_pylist()]
        texts = t["text"].to_pylist()
        n = len(doc_ids)
        corpus_key = min(hashlib.sha256(x.encode()).hexdigest()
                         for x in texts if x is not None)
        edges_min = _minhash_edges(doc_ids, texts)
        edges_sim = _simhash_edges(doc_ids, texts)
        for algo, edges in (("minhash", edges_min),
                            ("simhash", edges_sim),
                            # ensemble = union of candidates, ONE greedy
                            # replay (adjacency is a set, so the concat
                            # self-dedups)
                            ("ensemble", edges_min + edges_sim)):
            survivors = _greedy_survivors(n, doc_ids, edges)
            frames.append(pa.table({
                "corpus_min_sha": pa.array([corpus_key] * len(survivors),
                                           pa.string()),
                "algo": pa.array([algo] * len(survivors), pa.string()),
                "doc_id": pa.array(survivors, pa.int64()),
            }))
            print(f"{sf} {algo}: {len(survivors)}/{n} survive")
    out = pa.concat_tables(frames)
    pq.write_table(out, DEDUP_OUT)
    print(f"wrote {len(out)} dedup rows -> {DEDUP_OUT}")


CRAWL_MULTI_OUT = os.path.join(os.path.dirname(OUT),
                               "crawl_multi_expected.parquet")
CRAWL_MULTI_ORDERED_OUT = os.path.join(
    os.path.dirname(OUT), "crawl_multi_ordered_expected.parquet")

# the fixture plan mirrored by __ray_entry__._crawl_multi_fixture_query
CRAWL_MULTI_CONFIGS = [
    {"name": "alpha", "base_url": "https://docs.hot.example/p0",
     "rate_limit_seconds": 0.01, "exclude_patterns": ["/p3"],
     "max_depth": 9},
    {"name": "beta", "base_url": "https://docs.cold1.example/p0",
     "max_depth": 9},
]


def gen_crawl_multi_expected() -> None:
    """Pin the multi-source crawl's record SET + min-depths from an
    INDEPENDENT per-host sequential BFS (per-host excludes applied at
    dequeue AND enqueue, same as the reference loop).  crawl_scalable's
    per-shard BFS gives no global order, but the set and the monotone
    min-depths are deterministic — those are what the driver hashes."""
    from collections import deque

    from ai_intel_web_scraper_ray.functions.htmlx import extract_content, extract_links
    from ai_intel_web_scraper_ray.functions.urls import is_same_domain, normalize_url
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = {p["url"]: p for p in make_web_graph(
        hosts=["docs.hot.example", "docs.cold1.example"],
        pages_per_host={0: 20, 1: 20}, error_sprinkle=False)}
    records = []
    for cfg in CRAWL_MULTI_CONFIGS:
        base_url = normalize_url(cfg["base_url"])
        exclude = tuple(cfg.get("exclude_patterns", ()))
        visited = {base_url}
        queue = deque([(base_url, 0)])
        while queue:
            url, depth = queue.popleft()
            if any(p in url for p in exclude):
                continue
            page = pages.get(url)
            if page is None or page["status"] != 200:
                continue
            title, text = extract_content(page["html"], "article", url)
            if not text.strip():
                continue
            records.append({"url": url, "depth": depth, "title": title})
            if depth < cfg["max_depth"]:
                for link in extract_links(page["html"], url, "article"):
                    norm = normalize_url(link)
                    if norm not in visited \
                            and is_same_domain(norm, base_url) \
                            and not any(p in norm for p in exclude):
                        visited.add(norm)
                        queue.append((norm, depth + 1))
    # ORDERED twin first: records are already in concatenated per-source
    # BFS order (the reference scrapes sources one at a time)
    t_ord = pa.table({
        "url": pa.array([r["url"] for r in records], pa.string()),
        "depth": pa.array([r["depth"] for r in records], pa.int64()),
        "crawl_rank": pa.array(range(len(records)), pa.int64()),
        "title": pa.array([r["title"] for r in records], pa.string()),
    })
    pq.write_table(t_ord, CRAWL_MULTI_ORDERED_OUT)
    print(f"wrote {len(t_ord)} ordered multi-crawl rows -> "
          f"{CRAWL_MULTI_ORDERED_OUT}")
    records.sort(key=lambda r: r["url"])
    t = pa.table({
        "url": pa.array([r["url"] for r in records], pa.string()),
        "depth": pa.array([r["depth"] for r in records], pa.int64()),
        "title": pa.array([r["title"] for r in records], pa.string()),
    })
    pq.write_table(t, CRAWL_MULTI_OUT)
    print(f"wrote {len(t)} multi-crawl rows -> {CRAWL_MULTI_OUT}")


MST_OUT = os.path.join(os.path.dirname(OUT), "mst_expected.parquet")


def gen_mst_expected() -> None:
    """Pin the minimum spanning forest of each test corpus's weighted
    co-order graph via an INDEPENDENT sequential KRUSKAL (sort edges by
    the total order (w, u, v), union-find) — the engine runs BORŮVKA, so
    agreement validates the algorithm, not a shared code path.  Keyed by
    (corpus_n, corpus_sum) of the lineitem table so sf levels can't
    collide."""
    import duckdb

    frames = []
    for sf, sf_dir in sf_dirs():
        path = f"{sf_dir}/lineitem.parquet"
        con = duckdb.connect()
        edges = con.execute(f"""
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM read_parquet('{path}')),
            e AS (SELECT a.l_partkey AS u, c.l_partkey AS v,
                         COUNT(*) AS n
                  FROM b a JOIN b c USING (l_orderkey)
                  WHERE a.l_partkey < c.l_partkey
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT u, v, 1000000 // n AS w FROM e
        """).fetchall()
        key = con.execute(f"""
            SELECT COUNT(*), SUM(l_orderkey + 3 * l_partkey)
            FROM read_parquet('{path}')
        """).fetchone()
        con.close()
        corpus_n, corpus_sum = int(key[0]), int(key[1])

        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        mst = []
        for w, u, v in sorted((int(w), int(u), int(v))
                              for u, v, w in edges):
            ru, rv = find(u), find(v)
            if ru != rv:
                lo2, hi2 = (ru, rv) if ru < rv else (rv, ru)
                parent[hi2] = lo2
                mst.append((u, v, w))
        mst.sort()
        frames.append(pa.table({
            "corpus_n": pa.array([corpus_n] * len(mst), pa.int64()),
            "corpus_sum": pa.array([corpus_sum] * len(mst), pa.int64()),
            "u": pa.array([m[0] for m in mst], pa.int64()),
            "v": pa.array([m[1] for m in mst], pa.int64()),
            "w": pa.array([m[2] for m in mst], pa.int64()),
        }))
        print(f"{sf}: {len(mst)} MSF edges from {len(edges)} edges")
    out = pa.concat_tables(frames)
    pq.write_table(out, MST_OUT)
    print(f"wrote {len(out)} MST rows -> {MST_OUT}")


STRESS_OUT = os.path.join(os.path.dirname(OUT), "stress_expected.parquet")


def gen_stress_expected() -> None:
    """Pin sampled-source stress centrality via an INDEPENDENT sequential
    Brandes-stress (adjacency dicts, deque BFS with path counts, g
    accumulated over nodes grouped by descending distance) — the engine
    runs simultaneous vectorized level-synchronous edge scans, so
    agreement validates the integer sigma*g decomposition, not a shared
    code path.  Keyed by (corpus_n, corpus_sum) like the MST pin."""
    from collections import deque

    import duckdb

    frames = []
    for sf, sf_dir in sf_dirs():
        path = f"{sf_dir}/lineitem.parquet"
        con = duckdb.connect()
        edges = con.execute(f"""
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM read_parquet('{path}')),
            e AS (SELECT a.l_partkey AS u, c.l_partkey AS v
                  FROM b a JOIN b c USING (l_orderkey)
                  WHERE a.l_partkey < c.l_partkey
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT u, v FROM e
        """).fetchall()
        key = con.execute(f"""
            SELECT COUNT(*), SUM(l_orderkey + 3 * l_partkey)
            FROM read_parquet('{path}')
        """).fetchone()
        con.close()
        corpus_n, corpus_sum = int(key[0]), int(key[1])

        adj: dict = {}
        for u, v in edges:
            adj.setdefault(int(u), set()).add(int(v))
            adj.setdefault(int(v), set()).add(int(u))
        nodes = sorted(adj)
        stress = {n: 0 for n in nodes}
        for s_node in nodes[:4]:
            dist = {s_node: 0}
            sig = {s_node: 1}
            dq = deque([s_node])
            order = []
            while dq:
                u = dq.popleft()
                order.append(u)
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        sig[w] = 0
                        dq.append(w)
                    if dist[w] == dist[u] + 1:
                        sig[w] += sig[u]
            g = {n: 0 for n in dist}
            for u in reversed(order):
                for w in adj[u]:
                    if dist.get(w, -1) == dist[u] + 1:
                        g[u] += 1 + g[w]
            for v in dist:
                if v != s_node:
                    stress[v] += sig[v] * g[v]
        ranked = sorted(nodes, key=lambda n: (-stress[n], n))[:20]
        frames.append(pa.table({
            "corpus_n": pa.array([corpus_n] * len(ranked), pa.int64()),
            "corpus_sum": pa.array([corpus_sum] * len(ranked), pa.int64()),
            "part_id": pa.array(ranked, pa.int64()),
            "stress": pa.array([stress[n] for n in ranked], pa.int64()),
        }))
        print(f"{sf}: top stress {stress[ranked[0]] if ranked else 0}")
    out = pa.concat_tables(frames)
    pq.write_table(out, STRESS_OUT)
    print(f"wrote {len(out)} stress rows -> {STRESS_OUT}")


MIS_OUT = os.path.join(os.path.dirname(OUT), "mis_expected.parquet")


def gen_mis_expected() -> None:
    """Pin the maximal independent set of each test corpus's co-order
    graph (support ≥ 2) via an INDEPENDENT sequential greedy by ascending
    node id (select a node iff no smaller selected neighbor) — the engine
    runs Luby-style parallel min-id rounds, so agreement validates the
    algorithm, not a shared code path.  Keyed by (corpus_n, corpus_sum)
    of the lineitem table like the MST pin."""
    import duckdb

    frames = []
    for sf, sf_dir in sf_dirs():
        path = f"{sf_dir}/lineitem.parquet"
        con = duckdb.connect()
        edges = con.execute(f"""
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM read_parquet('{path}')),
            e AS (SELECT a.l_partkey AS u, c.l_partkey AS v
                  FROM b a JOIN b c USING (l_orderkey)
                  WHERE a.l_partkey < c.l_partkey
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT u, v FROM e
        """).fetchall()
        key = con.execute(f"""
            SELECT COUNT(*), SUM(l_orderkey + 3 * l_partkey)
            FROM read_parquet('{path}')
        """).fetchone()
        con.close()
        corpus_n, corpus_sum = int(key[0]), int(key[1])

        adj: dict = {}
        for u, v in edges:
            adj.setdefault(int(u), set()).add(int(v))
            adj.setdefault(int(v), set()).add(int(u))
        selected: set = set()
        for node in sorted(adj):
            if not any(nb in selected for nb in adj[node]):
                selected.add(node)
        nodes = sorted(adj)
        frames.append(pa.table({
            "corpus_n": pa.array([corpus_n] * len(nodes), pa.int64()),
            "corpus_sum": pa.array([corpus_sum] * len(nodes), pa.int64()),
            "part": pa.array(nodes, pa.int64()),
            "in_mis": pa.array([1 if n in selected else 0 for n in nodes],
                               pa.int64()),
        }))
        print(f"{sf}: {len(selected)} MIS nodes of {len(nodes)}")
    out = pa.concat_tables(frames)
    pq.write_table(out, MIS_OUT)
    print(f"wrote {len(out)} MIS rows -> {MIS_OUT}")




CRAWL_ROBOTS_OUT = os.path.join(os.path.dirname(OUT),
                                "crawl_robots_expected.parquet")

# the fixture robots mirrored by __ray_entry__._crawl_robots_fixture_query:
# Disallow /p7 and /p12 prune two interior subtrees on the hot host
# (prefix semantics: /p12 also gates nothing else at n=40); cold hosts
# have no robots.txt (allowed)
CRAWL_ROBOTS_TEXTS = {
    "docs.hot.example": "User-agent: *\nDisallow: /p7\nDisallow: /p12\n",
}


def gen_crawl_robots_expected() -> None:
    """Pin the robots-gated fixture crawl (record set + BFS min-depths)
    from the independent sequential walk
    (tests/oracle.py:oracle_crawl_robots)."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from oracle import oracle_crawl_robots

    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = {p["url"]: p for p in make_web_graph()}
    rows = oracle_crawl_robots(pages, "https://docs.hot.example/p0",
                               CRAWL_ROBOTS_TEXTS,
                               exclude_patterns=("/excluded/",))
    rows = sorted(rows, key=lambda r: r["url"])
    t = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "depth": pa.array([r["depth"] for r in rows], pa.int64()),
        "title": pa.array([r["title"] for r in rows], pa.string()),
    })
    pq.write_table(t, CRAWL_ROBOTS_OUT)
    print(f"wrote {len(t)} robots-crawl rows -> {CRAWL_ROBOTS_OUT}")




MEDIA_DECODE_OUT = os.path.join(os.path.dirname(OUT),
                                "media_decode_expected.parquet")


def gen_media_decode_expected() -> None:
    """Pin the deterministic fake-decode features for every media ref the
    testdata can produce (refs depend only on doc_id; pixel stats depend
    only on the ref) — replayed here in a sequential loop so the driver
    hash-checks the actor-pool decode stage end to end.  The ref range
    is DERIVED from the shipped documents tables (max doc_id over every
    SF) so a new scale factor can never silently truncate the pin."""
    from ai_intel_web_scraper_ray.stages.multimodal import (
        _decode_fake,
        synthesize_media_table,
    )

    # actual distinct doc_ids (not a dense range: key-shifted synthetic
    # SFs have ids near 2e9, and only real ids ever become refs)
    ids = set()
    for sf, sf_dir in sf_dirs():
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
        ids.update(int(x) for x in t["doc_id"].to_pylist())
    assert ids, "no documents found in any pinned corpus"
    refs = [f"media://img/{d}" for d in sorted(ids)]
    t = synthesize_media_table(refs)
    means, stds = [], []
    for payload, w, h in zip(t["payload"].to_pylist(),
                             t["width"].to_pylist(),
                             t["height"].to_pylist()):
        img = _decode_fake(payload, w or 64, h or 48)
        means.append(float(img.mean()))
        stds.append(float(img.std()))
    out = pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "pixel_mean": pa.array(means, pa.float64()),
        "pixel_std": pa.array(stds, pa.float64()),
        "decode_ok": pa.array([True] * len(refs), pa.bool_()),
    })
    pq.write_table(out, MEDIA_DECODE_OUT)
    print(f"wrote {len(out)} media-decode rows -> {MEDIA_DECODE_OUT}")


def main() -> None:
    rows = {}
    for sf, sf_dir in sf_dirs():
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
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
    gen_crawl_lineage_expected()
    gen_crawl_interleaved_expected()
    gen_crawl_multi_expected()
    gen_crawl_robots_expected()
    gen_media_decode_expected()
    gen_dedup_expected()
    gen_mst_expected()
    gen_stress_expected()
    gen_mis_expected()


if __name__ == "__main__":
    main()
