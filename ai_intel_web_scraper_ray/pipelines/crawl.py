"""Distributed crawl: sharded frontier + parallel fetch/extract rounds.

Reproduces the reference's sequential BFS crawler
(reference: competitive-intel/scrapers/docs_scraper.py:107-169) with:
- seen-at-enqueue via sharded check-and-insert (state/frontier.py),
- budget counting *successful extracts* (docs_scraper.py:126),
- exclude-pattern checks at dequeue AND enqueue (docs_scraper.py:129, :161),
- depth cutoff before link expansion (docs_scraper.py:154),
- link order pinned to first-occurrence in document order (SURVEY.md §7.5).

Two modes:

``crawl_strict``  — bit-exact crawl-order + seen-set equality with the
  sequential reference semantics (tests/oracle.py:oracle_crawl).  The driver
  keeps the global BFS order list; each round over-fetches the next K queued
  URLs in parallel (raw Ray tasks over vectorized chunks — the iterative
  round loop is the one place the Dataset API can't express the feedback
  edge), then replays budget accounting and link discovery in order, doing
  the seen-set check-and-insert as ordered batches on the frontier shards.
  Over-fetched pages beyond a budget cut are discarded, never enqueued —
  the reference's stop-at-budget semantics.

``crawl_scalable`` — per-shard BFS with politeness-scheduled leases
  (`FrontierShard.take`), no global order barrier: every shard progresses
  independently, which is the 10^10-URL shape.  The final seen SET equals
  strict mode's whenever the budget is not the binding constraint (every
  reachable page extracted); crawl ORDER is per-shard BFS, documented.

The fetcher here is the deterministic mock over the synthetic web-graph
table (FIXTURES.md §2) — a real HTTP fetcher drops into `_fetch_one` with
retry/backoff exactly as reference utils.py:43-85.

Checkpoint/resume: `CrawlCheckpoint` persists the driver order list +
per-shard snapshots (seen set, heap, politeness, counters) as JSON +
parquet-able lists; `crawl_strict(..., checkpoint_dir=, resume=True)`
continues mid-crawl and produces identical results (tested).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import ray

from ..functions.htmlx import extract_content, extract_links
from ..functions.urls import is_same_domain, normalize_url
from ..state.frontier import host_shard_of, make_shards, shard_of


def _excluded(url: str, patterns: Sequence[str]) -> bool:
    return any(p in url for p in patterns)


@ray.remote
def fetch_extract_chunk(
    pages: Dict[str, dict],
    items: List[Tuple[str, int]],
    content_selector: str,
    exclude_patterns: List[str],
    max_depth: int,
) -> List[dict]:
    """Fetch+extract a chunk of (url, depth) items against the mock web
    graph.  ``pages`` arrives as a shared object-store ref (ray.put once,
    zero-copy reads per task).  Returns one result dict per item, order
    preserved."""
    out = []
    for url, depth in items:
        res = {"url": url, "depth": depth, "ok": False, "title": "", "text": "", "links": []}
        if _excluded(url, exclude_patterns):
            res["skipped"] = "excluded"
            out.append(res)
            continue
        page = pages.get(url)
        if page is None or page.get("status") != 200:
            res["skipped"] = "fetch_failed"
            out.append(res)
            continue
        html = page["html"]
        title, text = extract_content(html, content_selector, url)
        if not text.strip():
            res["skipped"] = "empty"
            out.append(res)
            continue
        res.update(ok=True, title=title, text=text)
        if depth < max_depth:
            res["links"] = extract_links(html, url, content_selector)
        out.append(res)
    return out


def _round_fetch(
    pages_ref,
    items: List[Tuple[str, int]],
    content_selector: str,
    exclude_patterns: List[str],
    max_depth: int,
    chunk_size: int = 32,
) -> List[dict]:
    futures = []
    for i in range(0, len(items), chunk_size):
        futures.append(
            fetch_extract_chunk.remote(
                pages_ref, items[i : i + chunk_size], content_selector,
                list(exclude_patterns), max_depth,
            )
        )
    out: List[dict] = []
    for f in ray.get(futures):
        out.extend(f)
    return out


class CrawlCheckpoint:
    def __init__(self, path: str):
        self.path = path

    def save(self, driver_state: dict, shard_states: List[dict]) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "_tmp_ckpt.json")
        with open(tmp, "w") as f:
            json.dump({"driver": driver_state, "shards": shard_states}, f)
        os.replace(tmp, os.path.join(self.path, "ckpt.json"))

    def load(self) -> Optional[dict]:
        p = os.path.join(self.path, "ckpt.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


def crawl_strict(
    pages: List[dict],
    base_url: str,
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 200,
    exclude_patterns: Sequence[str] = (),
    num_shards: int = 4,
    round_size: int = 64,
    chunk_size: int = 32,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every_rounds: int = 0,
    resume: bool = False,
    stop_after_rounds: Optional[int] = None,
    pages_ref=None,
) -> dict:
    """Returns {"records": [...], "order": [urls], "seen": set, "stats": ...}
    bit-equal to the sequential reference semantics."""
    if pages_ref is None:
        pages_ref = ray.put({p["url"]: {"status": p["status"], "html": p["html"]} for p in pages})
    shards = make_shards(num_shards)

    ckpt = CrawlCheckpoint(checkpoint_dir) if checkpoint_dir else None
    state = ckpt.load() if (ckpt and resume) else None

    if state:
        d = state["driver"]
        order: List[Tuple[str, int]] = [tuple(x) for x in d["order"]]
        pop = d["pop"]
        records: List[dict] = d["records"]
        ray.get([s.restore.remote(st) for s, st in zip(shards, state["shards"])])
    else:
        start = normalize_url(base_url)
        order = [(start, 0)]
        pop = 0
        records = []
        ray.get(shards[shard_of(start, num_shards)].offer.remote([(start, 0)], False))

    rounds = 0
    while pop < len(order) and len(records) < max_pages:
        if stop_after_rounds is not None and rounds >= stop_after_rounds:
            break
        round_items = order[pop : pop + round_size]
        results = _round_fetch(
            pages_ref, round_items, content_selector, list(exclude_patterns), max_depth, chunk_size
        )

        # sequential replay: budget accounting + ordered link discovery
        link_batch: List[Tuple[int, int, str, int]] = []  # (page_i, link_j, url, depth)
        for i, res in enumerate(results):
            if len(records) >= max_pages:
                break
            pop += 1
            if not res["ok"]:
                continue
            records.append(
                {
                    "url": res["url"],
                    "depth": res["depth"],
                    "title": res["title"],
                    "text": res["text"],
                    "crawl_rank": len(records),
                }
            )
            for j, link in enumerate(res["links"]):
                norm = normalize_url(link)
                if is_same_domain(norm, base_url) and not _excluded(norm, exclude_patterns):
                    link_batch.append((i, j, norm, res["depth"] + 1))

        # ordered, sharded check-and-insert
        by_shard: Dict[int, List[Tuple[int, int, str, int]]] = defaultdict(list)
        for t in link_batch:
            by_shard[shard_of(t[2], num_shards)].append(t)
        futs = {
            sid: shards[sid].offer.remote([(t[2], t[3]) for t in items], False)
            for sid, items in by_shard.items()
        }
        new_links: List[Tuple[int, int, str, int]] = []
        for sid, items in by_shard.items():
            flags = ray.get(futs[sid])
            new_links.extend(t for t, is_new in zip(items, flags) if is_new)
        new_links.sort(key=lambda t: (t[0], t[1]))
        order.extend((t[2], t[3]) for t in new_links)

        rounds += 1
        if ckpt and checkpoint_every_rounds and rounds % checkpoint_every_rounds == 0:
            shard_states = ray.get([s.checkpoint.remote() for s in shards])
            ckpt.save({"order": order, "pop": pop, "records": records}, shard_states)

    seen: set = set()
    for snap in ray.get([s.seen_snapshot.remote() for s in shards]):
        seen.update(snap)
    seen.add(normalize_url(base_url))
    stats = ray.get([s.stats.remote() for s in shards])

    if ckpt:
        shard_states = ray.get([s.checkpoint.remote() for s in shards])
        ckpt.save({"order": order, "pop": pop, "records": records}, shard_states)

    for s in shards:
        ray.kill(s)
    return {"records": records, "order": [r["url"] for r in records], "seen": seen, "stats": stats}


def crawl_scalable(
    pages: List[dict],
    seeds: Sequence[str],
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 10**9,
    exclude_patterns: Sequence[str] = (),
    num_shards: int = 8,
    lease_per_shard: int = 128,
    chunk_size: int = 64,
    min_delay: float = 0.0,
    respect_robots: bool = False,
    robots_texts: Optional[Dict[str, str]] = None,
    pages_ref=None,
) -> dict:
    """Throughput-shaped crawl: all shards lease politeness-scheduled work
    each round; no global order barrier.  Virtual clock (no sleeping)."""
    if pages_ref is None:
        pages_ref = ray.put({p["url"]: {"status": p["status"], "html": p["html"]} for p in pages})
    shards = make_shards(num_shards, min_delay, respect_robots, robots_texts)

    def admit(items: List[Tuple[str, int]]) -> None:
        """check-and-insert on the URL-hash shard; enqueue admitted URLs on
        the HOST-hash shard (single politeness bucket per host)."""
        by_url_shard: Dict[int, List[Tuple[str, int]]] = defaultdict(list)
        for it in items:
            by_url_shard[shard_of(it[0], num_shards)].append(it)
        futs = {
            sid: shards[sid].offer.remote(batch, False)
            for sid, batch in by_url_shard.items()
        }
        by_host_shard: Dict[int, List[Tuple[str, int]]] = defaultdict(list)
        for sid, batch in by_url_shard.items():
            flags = ray.get(futs[sid])
            for it, is_new in zip(batch, flags):
                if is_new:
                    by_host_shard[host_shard_of(it[0], num_shards)].append(it)
        if by_host_shard:
            ray.get([shards[sid].push.remote(b) for sid, b in by_host_shard.items()])

    admit([(normalize_url(s), 0) for s in seeds])

    records: List[dict] = []
    now = 0.0
    while len(records) < max_pages:
        leases = ray.get([s.take.remote(lease_per_shard, now) for s in shards])
        flat: List[Tuple[str, int]] = []
        sched_max = now
        for lease in leases:
            for url, depth, t in lease:
                flat.append((url, depth))
                sched_max = max(sched_max, t)
        if not flat:
            break
        now = sched_max
        results = _round_fetch(
            pages_ref, flat, content_selector, list(exclude_patterns), max_depth, chunk_size
        )
        discovered: List[Tuple[str, int]] = []
        for res in results:
            if not res["ok"]:
                continue
            if len(records) < max_pages:
                records.append(
                    {"url": res["url"], "depth": res["depth"], "title": res["title"],
                     "text": res["text"], "crawl_rank": len(records)}
                )
            for link in res["links"]:
                norm = normalize_url(link)
                if not _excluded(norm, exclude_patterns) and any(
                    is_same_domain(norm, seed) for seed in seeds
                ):
                    discovered.append((norm, res["depth"] + 1))
        if discovered:
            admit(discovered)

    seen: set = set()
    for snap in ray.get([s.seen_snapshot.remote() for s in shards]):
        seen.update(snap)
    stats = ray.get([s.stats.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    return {"records": records, "seen": seen, "stats": stats, "virtual_time": now}
