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
table (FIXTURES.md §2) — a real HTTP fetcher drops into
`FetchExtractWorker.fetch_extract` (connection pool in __init__) with
retry/backoff exactly as reference utils.py:43-85.

Checkpoint/resume: `CrawlCheckpoint` persists driver state + per-shard
snapshots (seen set with depths, heap, politeness, flow counters); both
modes resume mid-crawl — strict reproduces identical order+seen, scalable
reproduces the identical record/seen SETS (both tested).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import ray

from ..functions.htmlx import extract_page
from ..functions.urls import host_of, is_same_domain, normalize_url
from ..state.frontier import host_shard_of, make_shards, shard_of


def _excluded(url: str, patterns: Sequence[str]) -> bool:
    return any(p in url for p in patterns)


def pages_to_table_ref(pages: List[dict]):
    """Mock web graph → Arrow table in the object store.  Arrow string
    buffers transfer ZERO-COPY through plasma — a fetch worker maps the
    table once instead of unpickling a multi-hundred-MB Python dict per
    task (which is what a ``{url: html}`` dict broadcast costs)."""
    import pyarrow as pa

    t = pa.table(
        {
            "url": pa.array([p["url"] for p in pages], pa.string()),
            "status": pa.array([p["status"] for p in pages], pa.int32()),
            "html": pa.array([p["html"] for p in pages], pa.large_string()),
        }
    )
    return ray.put(t)


def _page_index_refs(pages_table_ref):
    """Build the url→row index + status array ONCE (driver side) and share
    them through the object store.  Before this, every worker actor ran
    ``to_pylist()`` over the whole page table in ``__init__`` — O(pages)
    Python-object materialization PER ACTOR, which at 28 workers × 72k
    pages cost ~13 s of pool spin-up (vs 1.1 s at 24k); now each actor
    unpickles one shared dict (~tens of ms) and maps the status array
    zero-copy."""
    import numpy as np

    t = ray.get(pages_table_ref)  # zero-copy plasma map on the driver
    idx = {u: i for i, u in enumerate(t["url"].to_pylist())}
    status = t["status"].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.int32)
    return ray.put(idx), ray.put(status)


@ray.remote
class FetchExtractWorker:
    """Fetch+extract worker actor (streaming crawl).

    Holds the zero-copy Arrow page store and the frontier shard handles; a
    real-HTTP transport (sources/http_transport.py, reference
    scrapers/utils.py:43-85 session + retry ladder) plugs in via
    ``transport`` — its connection pool is built once per actor on first
    fetch.  Discovered links are routed shard-to-shard without a driver
    round trip; extracted records either park in the object store (counts
    return) or, with ``records_dir``, stream to per-worker parquet
    fragments so the driver never holds record bodies at all."""

    def __init__(self, pages_table_ref, content_selector: str,
                 exclude_patterns: List[str], max_depth: int,
                 shards, num_shards: int, seed_domains: List[str],
                 wid: int = 0, records_dir: Optional[str] = None,
                 transport=None, keep_payloads: bool = True,
                 per_host_excludes: Optional[Dict[str, List[str]]] = None,
                 per_host_selectors: Optional[Dict[str, str]] = None,
                 capture_media_refs: bool = False,
                 page_index=None, page_status=None):
        # keep_payloads=False: caller wants counts + seen set only (a
        # conformance/throughput scan) — skip the object-store put of record
        # bodies nobody will read (concurrent puts from a full worker pool
        # contend on plasma)
        self.keep_payloads = keep_payloads
        if transport is not None:
            self.idx = self.status = self.html = None
        else:
            table = ray.get(pages_table_ref) if not hasattr(pages_table_ref, "column_names") else pages_table_ref
            if page_index is not None:
                # shared index built once by _page_index_refs (O(1)-ish per
                # actor: one dict unpickle + a zero-copy numpy map)
                self.idx = page_index
                self.status = page_status
            else:
                self.idx = {u: i for i, u in enumerate(table["url"].to_pylist())}
                self.status = table["status"].to_pylist()
            self.html = table["html"]  # ChunkedArray — per-row .as_py() copies one string
        self.transport = transport
        self.content_selector = content_selector
        self.exclude = list(exclude_patterns)
        # per-source exclude patterns / content selectors keyed by host
        # (reference configs carry both per competitor; sources/config.py
        # compiles them)
        self.per_host_excludes = dict(per_host_excludes or {})
        self.per_host_selectors = dict(per_host_selectors or {})
        self.max_depth = max_depth
        self.shards = shards
        self.num_shards = num_shards
        # seed_domains arrives as a deduped HOST list (crawl_scalable
        # derives it from the seed set once): link admission is an O(1)
        # set lookup, not an O(|seeds|) is_same_domain scan — with a 72k
        # seed list the old any() loop made every discovered link a 72k-
        # iteration urlparse storm and shipped the full seed list into
        # every actor's constructor args
        self.seed_hosts = frozenset(seed_domains)
        self.wid = wid
        self.capture_media_refs = capture_media_refs
        self.records_dir = records_dir
        self._frag_seq = 0
        if records_dir:
            os.makedirs(os.path.join(records_dir, "frags"), exist_ok=True)

    def _fetch_html(self, url: str) -> Optional[str]:
        if self.transport is not None:
            return self.transport.fetch(url)
        i = self.idx.get(url)
        if i is None or self.status[i] != 200:
            return None
        return self.html[i].as_py()

    def _selector_for(self, url: str) -> str:
        if self.per_host_selectors:
            from ..functions.urls import host_of

            return self.per_host_selectors.get(host_of(url),
                                               self.content_selector)
        return self.content_selector

    def _is_excluded(self, url: str) -> bool:
        if _excluded(url, self.exclude):
            return True
        if self.per_host_excludes:
            from ..functions.urls import host_of

            pats = self.per_host_excludes.get(host_of(url))
            if pats and _excluded(url, pats):
                return True
        return False

    def _write_fragment(self, records: List[dict]) -> str:
        """Append one atomic parquet fragment (tmp + rename).  The filename
        carries (wid, pid, seq) so resumed runs never collide with prior
        fragments; ``frag_row`` preserves intra-fragment extraction order
        for deterministic downstream keep-first dedup."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        name = f"frag-w{self.wid:03d}-{os.getpid()}-{self._frag_seq:06d}.parquet"
        self._frag_seq += 1
        cols = {
            "url": pa.array([r["url"] for r in records], pa.string()),
            "depth": pa.array([r["depth"] for r in records], pa.int32()),
            "title": pa.array([r["title"] for r in records], pa.string()),
            "text": pa.array([r["text"] for r in records], pa.large_string()),
            "frag_row": pa.array(range(len(records)), pa.int32()),
        }
        if self.capture_media_refs:
            # packed as one \x1f-joined string, NOT list<string>: fragment
            # rows flow through pandas block stages in load_crawl_records
            # (add_order / rank_bucket), and Ray's pandas→arrow conversion
            # rejects object columns of ndarrays.  The separator is
            # stripped from refs (a control char in an href is malformed
            # markup anyway) so unpacking is unambiguous.
            cols["media_refs_packed"] = pa.array(
                ["\x1f".join(ref.replace("\x1f", "")
                             for ref in (r.get("media_refs") or []))
                 for r in records],
                pa.string(),
            )
        t = pa.table(cols)
        final = os.path.join(self.records_dir, "frags", name)
        tmp = final + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, final)
        return name

    def fetch_extract(self, items: List[Tuple[str, int]]) -> Tuple[int, int, object]:
        """Returns (n_records, n_discovered, payload) where payload is an
        object-store ref of the records, or the fragment filename (str) when
        streaming to ``records_dir``, or None for an empty streamed batch."""
        records: List[dict] = []
        discovered: List[Tuple[str, int]] = []
        for url, depth in items:
            if self._is_excluded(url):
                continue
            html = self._fetch_html(url)
            if html is None:
                continue
            title, text, links, media = extract_page(
                html, self._selector_for(url), url,
                collect_links=depth < self.max_depth,
                collect_media=self.capture_media_refs,
            )
            if not text.strip():
                continue
            rec = {"url": url, "depth": depth, "title": title, "text": text}
            if self.capture_media_refs:
                rec["media_refs"] = media
            records.append(rec)
            for link in links:
                norm = normalize_url(link)
                if not self._is_excluded(norm) and \
                        host_of(norm) in self.seed_hosts:
                    discovered.append((norm, depth + 1))
        by_shard: Dict[int, List[Tuple[str, int]]] = defaultdict(list)
        for it in discovered:
            by_shard[shard_of(it[0], self.num_shards)].append(it)
        for sid, batch in by_shard.items():
            self.shards[sid].offer_route.remote(batch)
        if self.records_dir is not None:
            frag = self._write_fragment(records) if records else None
            return len(records), len(discovered), frag
        if not self.keep_payloads:
            return len(records), len(discovered), None
        return len(records), len(discovered), ray.put(records)

    def run_selflease(self, external_offers: int, lease_n: int = 128,
                      sweep_sleep: float = 0.002):
        """Self-leasing hot loop: the worker pulls leases straight from the
        frontier shards, fetches, routes links shard-to-shard, and settles
        each lease — the DRIVER does zero per-page work (its only job is
        ``ray.get`` on this method).

        WHEN IT PAYS: on a multi-node cluster, where every driver round
        trip is a network RTT and the driver dispatch loop is a head-node
        serialization point.  On a single node the driver RTT is an IPC
        no-op and the driver loop's finer cross-worker re-chunking wins:
        measured on the 24k-page bench graph (interleaved repeats),
        self-leasing is at parity at 8 CPUs and ~20% BEHIND at 32 — so
        the driver loop stays the default and the benched configuration;
        this mode is the documented multi-node shape, equality-tested.

        Exit: when a full sweep over all shards yields nothing, the worker
        takes a quiescence snapshot (flow conservation: every offer landed,
        every push landed, no heap entries, no unsettled leases, and all
        offers accounted: received == external seeds + settled).  A
        non-atomic snapshot can only UNDER-report 'sent' relative to
        'received' never the reverse, so a balanced read proves real
        quiescence; an unbalanced one sleeps and re-sweeps.

        Scope: politeness-off throughput scans (min_delay == 0, no budget,
        no checkpoint) — the mode the scaling benchmark measures; ordered
        and budgeted crawls keep the driver loop."""
        import time as _t

        # LEASE SIZE is the load-balance knob: a whole-shard lease would
        # serialize thousands of pages on one worker while its peers
        # starve, so tracked leases are clamped small enough that every
        # worker's next lease is always a short wait away, yet large
        # enough to amortize the take round trip over hundreds of pages
        lease_n = min(lease_n, 256)
        n_records = 0
        n_offers_total = 0
        frags: List[Tuple[str, int]] = []
        refs: List = []
        # prefetch pipeline: one in-flight take per shard, processed as
        # they complete — the next lease is already waiting when a fetch
        # batch finishes, so the take round trip never idles the worker
        futs = {self.shards[sid].take.remote(lease_n, 0.0, True): sid
                for sid in range(self.num_shards)}
        idle: set = set()
        while True:
            while futs:
                done, _ = ray.wait(list(futs), num_returns=1)
                fut = done[0]
                sid = futs.pop(fut)
                lease = ray.get(fut)
                if not lease:
                    idle.add(sid)
                    continue
                items = [(u, d) for u, d, _sched in lease]
                n_rec, n_off, payload = self.fetch_extract(items)
                # settle AFTER fetch_extract issued its offer_route calls
                self.shards[sid].complete_lease.remote(n_off)
                n_records += n_rec
                n_offers_total += n_off
                if self.records_dir is not None:
                    if payload is not None:
                        frags.append((payload, n_rec))
                elif payload is not None:
                    refs.append(payload)
                futs[self.shards[sid].take.remote(
                    lease_n, 0.0, True)] = sid
                # links this fetch routed may have landed on shards we
                # stopped polling — wake them
                for s2 in list(idle):
                    idle.discard(s2)
                    futs[self.shards[s2].take.remote(
                        lease_n, 0.0, True)] = s2
            counts = ray.get(
                [s.selflease_counts.remote() for s in self.shards])
            offers_recv = sum(c[0] for c in counts)
            pushes_balanced = sum(c[1] for c in counts) == \
                sum(c[2] for c in counts)
            pending = sum(c[3] for c in counts)
            outstanding = sum(c[4] for c in counts)
            offers_sent = external_offers + sum(c[5] for c in counts)
            if (outstanding == 0 and pending == 0 and pushes_balanced
                    and offers_recv == offers_sent):
                return n_records, n_offers_total, frags, refs
            _t.sleep(sweep_sleep)
            idle.clear()
            futs = {self.shards[sid].take.remote(lease_n, 0.0, True): sid
                    for sid in range(self.num_shards)}

    def fetch_extract_ordered(self, items: List[Tuple[str, int]]) -> List[dict]:
        """Ordered-replay variant: one result dict per item, order preserved,
        raw link lists RETURNED (not routed) so the driver's sequential
        replay does the ordered check-and-insert.  Same per-actor Arrow page
        store / HTTP session as fetch_extract."""
        out = []
        for url, depth in items:
            res = {"url": url, "depth": depth, "ok": False, "title": "",
                   "text": "", "links": []}
            if self._is_excluded(url):
                out.append(res)
                continue
            html = self._fetch_html(url)
            if html is None:
                out.append(res)
                continue
            title, text, links, _media = extract_page(
                html, self._selector_for(url), url,
                collect_links=depth < self.max_depth
            )
            if not text.strip():
                out.append(res)
                continue
            res.update(ok=True, title=title, text=text, links=links)
            out.append(res)
        return out


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
        title, text, links, _media = extract_page(
            html, content_selector, url, collect_links=depth < max_depth
        )
        if not text.strip():
            res["skipped"] = "empty"
            out.append(res)
            continue
        res.update(ok=True, title=title, text=text, links=links)
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
        sids = list(by_shard)
        all_flags = ray.get(
            [shards[sid].offer.remote([(t[2], t[3]) for t in by_shard[sid]], False) for sid in sids]
        )
        new_links: List[Tuple[int, int, str, int]] = []
        for sid, flags in zip(sids, all_flags):
            new_links.extend(t for t, is_new in zip(by_shard[sid], flags) if is_new)
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


def crawl_ordered(
    pages: List[dict],
    base_url: str,
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 200,
    exclude_patterns: Sequence[str] = (),
    num_shards: int = 4,
    window: int = 512,
    chunk_size: int = 32,
    pages_ref=None,
) -> dict:
    """Reference crawl ORDER + seen-set equality at fetch throughput: the
    windowed ordered replay from NOTES_r1 #3.

    ``crawl_strict`` pays a round barrier: fetch K, wait for ALL, replay,
    repeat — wall time is rounds × slowest-fetch.  Here fetches are
    speculatively dispatched for a sliding WINDOW ahead of the sequential
    replay cursor; results buffer out of order; the replay consumes them the
    moment the head block lands, extends the order with newly admitted
    links (which immediately widens the dispatchable window) and keeps
    going.  The replay itself is the same sequential budget + ordered
    check-and-insert as crawl_strict, so crawl order and seen set are
    bit-equal to the sequential reference (tests pin both); only the fetch
    scheduling overlaps.  Over-fetched results beyond a budget cut are
    discarded unreplayed — stop-at-budget semantics unchanged.

    Scale note: the driver holds the order list and replay cursor (O(pages)
    strings — same as the reference's own BFS queue); fetch bandwidth is the
    worker pool's (each actor maps the Arrow page store ONCE — per-task dict
    unpickling is what made the naive version 10× slower).  For corpora
    where even the order list can't fit one node, order conformance is the
    wrong requirement — use crawl_scalable.
    """
    if pages_ref is None:
        pages_ref = pages_to_table_ref(pages)
    shards = make_shards(num_shards)

    import os as _os

    avail = int(ray.available_resources().get("CPU", _os.cpu_count() or 8))
    num_workers = max(1, avail - int(num_shards * 0.25 + 1) - 1)
    idx_ref, status_ref = _page_index_refs(pages_ref)
    workers = [
        FetchExtractWorker.remote(
            pages_ref, content_selector, list(exclude_patterns), max_depth,
            [], num_shards, [],
            page_index=idx_ref, page_status=status_ref,
        )
        for _ in range(num_workers)
    ]
    worker_load = [0] * num_workers

    start = normalize_url(base_url)
    order: List[Tuple[str, int]] = [(start, 0)]
    pop = 0            # replay cursor (results consumed)
    dispatch = 0       # dispatch cursor (fetches issued)
    records: List[dict] = []
    ray.get(shards[shard_of(start, num_shards)].offer.remote([(start, 0)], False))

    pending: Dict = {}          # future -> block start index
    buffered: Dict[int, List[dict]] = {}
    budget_hit = False

    while (pop < len(order) or pending or buffered) and not budget_hit:
        # top-up: keep up to `window` positions in flight ahead of the replay
        while dispatch < len(order) and dispatch - pop < window:
            end = min(dispatch + chunk_size, len(order), pop + window)
            items = order[dispatch:end]
            wid = min(range(num_workers), key=worker_load.__getitem__)
            fut = workers[wid].fetch_extract_ordered.remote(items)
            worker_load[wid] += 1
            pending[fut] = (dispatch, wid)
            dispatch = end

        if pending:
            done, _ = ray.wait(list(pending), num_returns=1)
            for fut in done:
                start_idx, wid = pending.pop(fut)
                worker_load[wid] -= 1
                buffered[start_idx] = ray.get(fut)

        # replay every contiguous block available at the cursor
        link_batch: List[Tuple[int, int, str, int]] = []  # (abs page idx, link j, url, depth)
        while pop in buffered and not budget_hit:
            for res in buffered.pop(pop):
                if len(records) >= max_pages:
                    budget_hit = True
                    break
                abs_i = pop
                pop += 1
                if not res["ok"]:
                    continue
                records.append({
                    "url": res["url"], "depth": res["depth"], "title": res["title"],
                    "text": res["text"], "crawl_rank": len(records),
                })
                for j, link in enumerate(res["links"]):
                    norm = normalize_url(link)
                    if is_same_domain(norm, base_url) and not _excluded(norm, exclude_patterns):
                        link_batch.append((abs_i, j, norm, res["depth"] + 1))

        if link_batch:
            # ordered sharded check-and-insert, exactly crawl_strict's shape
            by_shard: Dict[int, List[Tuple[int, int, str, int]]] = defaultdict(list)
            for t in link_batch:
                by_shard[shard_of(t[2], num_shards)].append(t)
            sids = list(by_shard)
            all_flags = ray.get(
                [shards[sid].offer.remote([(t[2], t[3]) for t in by_shard[sid]], False)
                 for sid in sids]
            )
            new_links: List[Tuple[int, int, str, int]] = []
            for sid, flags in zip(sids, all_flags):
                new_links.extend(t for t, is_new in zip(by_shard[sid], flags) if is_new)
            new_links.sort(key=lambda t: (t[0], t[1]))
            order.extend((t[2], t[3]) for t in new_links)

    seen: set = set()
    for snap in ray.get([s.seen_snapshot.remote() for s in shards]):
        seen.update(snap)
    seen.add(start)
    stats = ray.get([s.stats.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    for w in workers:
        ray.kill(w)
    return {"records": records, "order": [r["url"] for r in records], "seen": seen,
            "stats": stats}


def crawl_scalable(
    pages: List[dict],
    seeds: Sequence[str],
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 10**9,
    exclude_patterns: Sequence[str] = (),
    num_shards: int = 8,
    lease_per_shard: int = 128,
    chunk_size: Optional[int] = None,
    min_delay: float = 0.0,
    respect_robots: bool = False,
    robots_texts: Optional[Dict[str, str]] = None,
    pages_table_ref=None,
    materialize_records: bool = True,
    num_workers: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    stop_after_fetches: Optional[int] = None,
    records_dir: Optional[str] = None,
    transport=None,
    wall_clock_politeness: bool = False,
    self_leasing: bool = False,
    per_host_delay: Optional[Dict[str, float]] = None,
    per_host_excludes: Optional[Dict[str, List[str]]] = None,
    per_host_budget: Optional[Dict[str, int]] = None,
    per_host_selectors: Optional[Dict[str, str]] = None,
    capture_media_refs: bool = False,
    collect_seen: bool = True,
    heap_mem_cap: Optional[int] = None,
    heap_spill_dir: Optional[str] = None,
    seen_capacity_hint: int = 1 << 16,
) -> dict:
    """Throughput-shaped crawl: a fetch/extract worker actor pool fed by
    politeness-scheduled leases from the frontier shards; links route
    shard-to-shard; no global order barrier.

    SELF-LEASING (``self_leasing=True``): workers pull leases straight
    from the shards and the driver blocks on one ``ray.get`` — zero
    driver round trips per page.  This is the multi-node shape (on a
    real cluster the driver loop is a head-node serialization point and
    each dispatch a network RTT); on THIS single node it measures at
    parity with the driver loop at both 8 and 32 CPUs (after the
    adaptive-chunk dispatch fix; before it, the driver loop's frozen
    ~74-item chunks made self-leasing look ~20% behind at 32 — the gap
    was the driver loop's own dispatch bottleneck, since removed), so
    the driver loop remains the default and the benched configuration.  Restricted to the
    politeness-off, unbudgeted, non-checkpointed throughput scan;
    quiescence is flow-counter conservation checked by the workers
    themselves (see FetchExtractWorker.run_selflease).

    POLITENESS CLOCK: by default the lease schedule runs on a VIRTUAL clock
    (no sleeping) — correct for the mock transport and for measuring
    scheduler throughput, but min_delay is NOT enforced in wall time.  With
    a live ``transport`` you MUST pass ``wall_clock_politeness=True``: the
    driver then holds every lease whose scheduled time is still in the
    future and dispatches it only once the wall clock reaches it.

    MEDIA CAPTURE (``capture_media_refs=True``): each record additionally
    carries the page's same-domain non-html anchors (canonicalized,
    first-occurrence order) in a ``media_refs`` column — the raw material
    for the interleaved text+media payload (see
    ``pipelines.full.crawl_dataset_to_interleaved``).  Off by default so
    conformance-mode outputs stay byte-identical to the reference, which
    drops these links.

    RECORD STREAMING: with ``records_dir``, workers append extracted
    records to per-worker atomic parquet fragments and only counts +
    fragment names cross the driver — the driver never holds record bodies
    and the checkpoint stores the fragment manifest, not the records.  Read
    the result back with :func:`load_crawl_records`.

    Checkpoint/resume: with ``checkpoint_dir`` + ``stop_after_fetches``, the
    crawl stops after N fetch-task completions, re-pushes every outstanding
    lease back onto its host shard (so nothing in flight is lost), snapshots
    all shard state (seen set, heap, politeness, flow counters) and persists
    the records crawled so far (or their fragment manifest); ``resume=True``
    continues to completion and the union of partial+resumed records equals
    an uninterrupted run's.

    FAILURE MODEL: a fetch-worker death mid-task surfaces as an error
    rather than being silently retried, BY DESIGN: the dead task may have
    already routed link offers shard-to-shard, and without per-task
    generation tokens the flow-counter quiescence check cannot reconcile a
    replayed task's double-counted offers (an in-place retry could either
    hang termination detection or falsely terminate).  The designed
    recovery is the checkpoint path — rerun from the last snapshot, whose
    settle step re-pushes in-flight leases and rebalances the counters —
    i.e. periodic ``stop_after_fetches`` checkpoints are the unit of fault
    tolerance on a real cluster, exactly like any other lineage-free
    stateful shuffle."""
    polite = min_delay > 0 or any(
        d > 0 for d in (per_host_delay or {}).values())
    if transport is not None and polite and not wall_clock_politeness:
        # the virtual politeness clock does not sleep; against a live
        # transport that would hammer real hosts at full speed while
        # CLAIMING a min_delay — make the documented MUST a mechanism
        raise ValueError(
            "crawl_scalable: a live transport with min_delay > 0 requires "
            "wall_clock_politeness=True (the virtual clock does not enforce "
            "min_delay in wall time)"
        )
    if self_leasing and (checkpoint_dir or stop_after_fetches is not None
                         or wall_clock_politeness or polite
                         or max_pages < 10**9):
        raise ValueError(
            "crawl_scalable: self_leasing is the politeness-off, "
            "unbudgeted, non-checkpointed throughput mode — budgeted / "
            "checkpointed / wall-clock-polite crawls use the driver loop")
    if pages_table_ref is None and transport is None:
        pages_table_ref = pages_to_table_ref(pages)
    shards = make_shards(num_shards, min_delay, respect_robots, robots_texts,
                         capacity_hint=seen_capacity_hint,
                         depth_refinement=max_depth < 10**6,
                         per_host_delay=per_host_delay,
                         per_host_budget=per_host_budget,
                         heap_mem_cap=heap_mem_cap,
                         spill_dir=heap_spill_dir,
                         # live robots: hosts not covered by robots_texts
                         # fetch {scheme}://host/robots.txt ONCE through
                         # the crawl transport, cached per host in the
                         # shard (north-rule robots caching)
                         robots_transport=(transport if respect_robots
                                           else None))
    ray.get([s.set_peers.remote(shards) for s in shards])

    ckpt = CrawlCheckpoint(checkpoint_dir) if checkpoint_dir else None
    prior_records: List[dict] = []
    frag_manifest: List[Tuple[str, int]] = []  # (fragment name, n_records)
    offers_sent = 0

    def offer_async(items: List[Tuple[str, int]]) -> int:
        """Fire-and-forget: route (url, depth) items to their URL-hash
        shards; shards check-and-insert and forward admitted URLs straight
        to the host-home shards' fetch queues (no driver round trip)."""
        by_shard: Dict[int, List[Tuple[str, int]]] = defaultdict(list)
        for it in items:
            by_shard[shard_of(it[0], num_shards)].append(it)
        for sid, batch in by_shard.items():
            shards[sid].offer_route.remote(batch)
        return len(items)

    state = ckpt.load() if (ckpt and resume) else None
    norm_seeds = [normalize_url(s) for s in seeds]
    # deduped seed HOSTS (is_same_domain is exact netloc equality, so the
    # per-link admission check only ever needs the host set)
    seed_domains = sorted({host_of(u) for u in norm_seeds})
    if state:
        d = state["driver"]
        offers_sent = d["offers_sent"]
        prior_records = d.get("records", [])
        frag_manifest = [tuple(x) for x in d.get("frags", [])]
        ray.get([s.restore.remote(st) for s, st in zip(shards, state["shards"])])
    else:
        seed_items = [(u, 0) for u in norm_seeds]
        offers_sent += offer_async(seed_items)

    n_records = len(prior_records) + sum(n for _, n in frag_manifest)
    n_records_at_start = n_records  # resumed runs exclude prior sessions
                                    # from the sustained-throughput window
    record_refs: List = []
    now = state["driver"]["now"] if state else 0.0
    n_fetch_completions = 0
    exclude_list = list(exclude_patterns)

    import os as _os

    if num_workers is None:
        avail = int(ray.available_resources().get("CPU", _os.cpu_count() or 8))
        # leave room for the frontier shards (0.25 CPU each) + driver slack,
        # else the last worker actor never schedules and its queued calls
        # would stall quiescence (floor of 1, NOT 2 — a 2-worker floor on a
        # 2-CPU session oversubscribes and hangs the same way)
        num_workers = max(1, avail - int(num_shards * 0.25 + 1) - 1)
    if transport is None:
        idx_ref, status_ref = _page_index_refs(pages_table_ref)
    else:
        idx_ref = status_ref = None
    workers = [
        FetchExtractWorker.remote(
            pages_table_ref, content_selector, exclude_list, max_depth,
            shards, num_shards, seed_domains,
            wid=w, records_dir=records_dir, transport=transport,
            keep_payloads=materialize_records or records_dir is not None,
            per_host_excludes=per_host_excludes,
            per_host_selectors=per_host_selectors,
            capture_media_refs=capture_media_refs,
            page_index=idx_ref, page_status=status_ref,
        )
        for w in range(num_workers)
    ]
    worker_load = [0] * num_workers

    if self_leasing:
        # workers own the lease loop end-to-end; the driver's only crawl-
        # time action is this one ray.get (seed offers were fired above)
        results = ray.get([
            w.run_selflease.remote(offers_sent, lease_per_shard)
            for w in workers])
        for n_rec, n_off, frags, refs in results:
            n_records += n_rec
            offers_sent += n_off
            frag_manifest.extend(tuple(x) for x in frags)
            record_refs.extend(refs)

    # Fully-async driver: per-shard take() futures and fetch futures share
    # one ray.wait loop — no barrier across shards, so one slow shard (busy
    # draining offer_route messages) never stalls the others' dispatch.
    take_out: Dict = {}   # take future -> shard id
    fetch_out: Dict = {}  # fetch future -> worker id
    idle_shards: set = set()

    import heapq
    import time as _time_mod
    from collections import deque

    delayed: List[Tuple[float, str, int]] = []  # (not-before wall t, url, depth)
    wall_t0 = _time_mod.monotonic()

    def wall_now() -> float:
        return _time_mod.monotonic() - wall_t0

    def issue_take(sid: int) -> None:
        t = wall_now() if wall_clock_politeness else now
        take_out[shards[sid].take.remote(lease_per_shard, t)] = sid

    # THROTTLED DYNAMIC DISPATCH: leased chunks queue driver-side and each
    # worker holds at most MAX_OUTSTANDING in-flight tasks; the next chunk
    # goes to whichever worker frees up.  Dispatching a whole lease round
    # up-front (the previous shape) froze the assignment at lease time, so
    # a straggling worker kept chewing its fixed share while its peers sat
    # idle at the tail — switching to the queue measured ~20% more
    # saturated docs/s at 28 workers (4.4k → 5.5k on the 24k graph).  The
    # queue holds (url, depth) tuples already leased from the shards, so
    # the interrupt path re-pushes it exactly like in-flight leases.
    #
    # ADAPTIVE CHUNKS: the queue is FLAT and each dispatch carves
    # queue-depth ÷ 8 items, clamped to [32, 256].  The driver loop pays
    # O(1) ray.wait/ray.get work PER TASK, so a saturated frontier wants
    # few big tasks (the previous per-lease formula froze chunks at ~74
    # items for 28 workers, capping the driver at ~130 completions/s —
    # the whole 8→32-CPU scaling gap: 28 workers measured 4.8k docs/s at
    # chunk 74 vs 10.5k at 256 on the 72k graph), while the BFS ramp
    # wants many small ones so a 40-link frontier still fans out across
    # workers.  Sizing by what's QUEUED at carve time serves both (one
    # 4096-URL lease → 256-item chunks immediately; dividing by free
    # slots instead ramped too slowly and measured ~10% lower); 256 stays
    # the cap because a bigger chunk re-freezes tail assignment (1024
    # measured ~12% slower).
    dispatch_q: deque = deque()
    MAX_OUTSTANDING = 2
    CHUNK_MIN, CHUNK_MAX = 32, 256
    t_first_dispatch: Optional[float] = None

    def fill_workers() -> None:
        nonlocal t_first_dispatch
        while dispatch_q:
            wid = min(range(num_workers), key=worker_load.__getitem__)
            if worker_load[wid] >= MAX_OUTSTANDING:
                return
            n = chunk_size or max(
                CHUNK_MIN, min(CHUNK_MAX, len(dispatch_q) // 8))
            part = [dispatch_q.popleft()
                    for _ in range(min(n, len(dispatch_q)))]
            if t_first_dispatch is None:
                t_first_dispatch = wall_now()
            fut = workers[wid].fetch_extract.remote(part)
            worker_load[wid] += 1
            fetch_out[fut] = (wid, part)

    def dispatch_items(flat: List[Tuple[str, int]]) -> None:
        dispatch_q.extend(flat)
        fill_workers()

    def spawn_fetches(lease) -> None:
        nonlocal now
        flat = []
        for url, depth, t in lease:
            if wall_clock_politeness and t > wall_now():
                # hold the lease until its scheduled wall time — with a live
                # transport this is what enforces min_delay per host
                heapq.heappush(delayed, (t, url, depth))
                continue
            flat.append((url, depth))
            now = max(now, t)
        if flat:
            dispatch_items(flat)

    def release_due() -> None:
        due: List[Tuple[str, int]] = []
        w = wall_now()
        while delayed and delayed[0][0] <= w:
            _t, url, depth = heapq.heappop(delayed)
            due.append((url, depth))
        if due:
            dispatch_items(due)

    if not self_leasing:
        for sid in range(num_shards):
            issue_take(sid)

    while not self_leasing and n_records < max_pages:
        if wall_clock_politeness:
            release_due()
        if not take_out and not fetch_out and not dispatch_q and delayed:
            # everything else idle but held leases remain: sleep to the next
            # scheduled dispatch instead of spinning
            _time_mod.sleep(max(0.0, delayed[0][0] - wall_now()))
            release_due()
            continue
        if not take_out and not fetch_out and not dispatch_q:
            # everything idle: quiescent only when every routed message has
            # landed and all heaps are empty (flow-counter conservation)
            flows = ray.get([s.flow_counts.remote() for s in shards])
            offers_received = sum(f[0] for f in flows)
            pushes_balanced = sum(f[1] for f in flows) == sum(f[2] for f in flows)
            pending = sum(f[3] for f in flows)
            if offers_received == offers_sent and pushes_balanced and pending == 0:
                break
            idle_shards.clear()
            for sid in range(num_shards):
                issue_take(sid)
            continue
        done, _ = ray.wait(
            list(take_out) + list(fetch_out),
            num_returns=min(len(take_out) + len(fetch_out), 8),
        )
        woke_idle = False
        for fut in done:
            if fut in take_out:
                sid = take_out.pop(fut)
                lease = ray.get(fut)
                if lease:
                    spawn_fetches(lease)
                    issue_take(sid)
                else:
                    idle_shards.add(sid)
            else:
                wid, _part = fetch_out.pop(fut)
                worker_load[wid] -= 1
                fill_workers()
                n_rec, n_offers, payload = ray.get(fut)
                n_records += n_rec
                offers_sent += n_offers
                if records_dir is not None:
                    if payload is not None:
                        frag_manifest.append((payload, n_rec))
                elif payload is not None:
                    record_refs.append(payload)
                n_fetch_completions += 1
                woke_idle = True
        if stop_after_fetches is not None and n_fetch_completions >= stop_after_fetches:
            break
        if woke_idle and idle_shards:
            # new links may have landed on shards we stopped polling
            for sid in list(idle_shards):
                idle_shards.discard(sid)
                issue_take(sid)

    t_loop_end = wall_now()  # before settle/teardown, which sustained excludes

    # Interrupted mid-crawl: settle everything in flight, then snapshot.
    # 1. drain outstanding take futures and re-push their leases;
    # 2. let outstanding fetch tasks finish, COUNT their routed offers
    #    (flow-counter balance) but DISCARD their records, and re-push
    #    their leases so resume re-fetches those pages;
    # 3. wait until the shards' flow counters balance (all routed messages
    #    landed) before snapshotting.
    if ckpt:
        import time as _time

        by_host: Dict[int, List[Tuple[str, int]]] = defaultdict(list)
        for fut, sid in list(take_out.items()):
            for url, depth, _t in ray.get(fut):
                by_host[host_shard_of(url, num_shards)].append((url, depth))
        take_out.clear()
        for _t, url, depth in delayed:  # held wall-clock leases re-push too
            by_host[host_shard_of(url, num_shards)].append((url, depth))
        delayed.clear()
        for it in dispatch_q:  # queued-but-undispatched items re-push too
            by_host[host_shard_of(it[0], num_shards)].append(it)
        dispatch_q.clear()
        for fut, (wid, part) in list(fetch_out.items()):
            _n_rec, n_offers, payload = ray.get(fut)
            offers_sent += n_offers
            if records_dir is not None and payload is not None:
                # worker already wrote the fragment, but these records are
                # DISCARDED (their leases re-push for re-fetch on resume) —
                # delete the orphan so resume can't double-count it
                try:
                    os.remove(os.path.join(records_dir, "frags", payload))
                except OSError:
                    pass
            for it in part:
                by_host[host_shard_of(it[0], num_shards)].append(it)
        fetch_out.clear()
        if by_host:
            ray.get([shards[sid].push_external.remote(b) for sid, b in by_host.items()])
        # settle: a snapshot taken while offer/push messages are still in
        # flight would freeze the restored flow counters unbalanced and the
        # resumed run could never detect quiescence
        for _ in range(500):
            flows = ray.get([s.flow_counts.remote() for s in shards])
            if (sum(f[0] for f in flows) == offers_sent
                    and sum(f[1] for f in flows) == sum(f[2] for f in flows)):
                break
            _time.sleep(0.01)

    records: List[dict] = list(prior_records)
    if records_dir is not None:
        # records live in worker-written parquet fragments; the driver holds
        # only (fragment name, count).  Persist the manifest so readers and
        # resumed runs trust exactly the committed fragments.
        manifest_tmp = os.path.join(records_dir, "_manifest.json.tmp")
        with open(manifest_tmp, "w") as f:
            json.dump({"fragments": [[p, n] for p, n in frag_manifest]}, f)
        os.replace(manifest_tmp, os.path.join(records_dir, "_manifest.json"))
    elif materialize_records:
        # depth-refinement may re-fetch a page at a smaller depth → dedupe
        # by URL keeping the first occurrence
        seen_urls = {r["url"] for r in records}
        for chunk_records in ray.get(record_refs):
            for r in chunk_records:
                if len(records) >= max_pages:
                    break
                if r["url"] in seen_urls:
                    continue
                seen_urls.add(r["url"])
                r["crawl_rank"] = len(records)
                records.append(r)
        n_records = len(records)

    if ckpt:
        shard_states = ray.get([s.checkpoint.remote() for s in shards])
        if records_dir is not None:
            driver_state = {"offers_sent": offers_sent, "now": now,
                            "frags": [[p, n] for p, n in frag_manifest]}
        else:
            driver_state = {"offers_sent": offers_sent, "records": records,
                            "now": now}
        ckpt.save(driver_state, shard_states)

    seen: set = set()
    if collect_seen:
        for snap in ray.get([s.seen_snapshot.remote() for s in shards]):
            seen.update(snap)
    stats = ray.get([s.stats.remote() for s in shards])
    if not collect_seen:
        # throughput scans don't read the set; shipping 10^N URL strings
        # through the driver would be pure teardown overhead — the COUNT
        # comes from shard stats instead
        n_seen_total = sum(st.get("seen", 0) for st in stats)
    for s in shards:
        ray.kill(s)
    for w in workers:
        ray.kill(w)
    # sustained throughput: all records over the window from the FIRST
    # fetch dispatch to loop exit — excludes the driver-side seed/offer/
    # index prep a long-running frontier amortizes to zero, but INCLUDES
    # worker cold start and every fetch (a window anchored at the first
    # COMPLETION instead would miss work already in flight when the driver
    # processes it, over-reading badly at high worker counts)
    sustained = None
    n_this_session = n_records - n_records_at_start
    if (not self_leasing and t_first_dispatch is not None
            and t_loop_end > t_first_dispatch and n_this_session > 0):
        sustained = round(n_this_session
                          / (t_loop_end - t_first_dispatch), 1)
    return {"records": records, "n_records": min(n_records, max_pages),
            "record_refs": record_refs, "seen": seen,
            "n_seen": len(seen) if collect_seen else n_seen_total,
            "stats": stats,
            "virtual_time": now, "records_path": records_dir,
            "frag_manifest": frag_manifest,
            "sustained_docs_per_sec": sustained}


def load_crawl_records(records_dir: str, max_pages: Optional[int] = None):
    """Read a streamed crawl's committed record fragments back as a Ray
    Dataset, deduped by URL keeping the first occurrence in MANIFEST order
    (the driver appends fragments in fetch-completion order, so keep-first
    here matches the in-memory run's driver materialization; a
    name-sorted order would instead tie-break by (wid, pid) and could keep
    a depth-refined re-fetch over the first arrival) with a ``crawl_rank``
    column.

    Ranks are assigned DISTRIBUTED: ``_order = frag_idx·10⁹ + frag_row`` is
    globally unique, fragments are small (one worker chunk each), so
    rank = prefix-sum offset of the fragment (per-fragment survivor counts,
    a #fragments-row driver table) + within-fragment position (vectorized
    inside a ``groupby(frag)``).  No global sort, no driver
    materialization — works at any corpus size."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    with open(os.path.join(records_dir, "_manifest.json")) as f:
        frag_names = [p for p, _n in json.load(f)["fragments"]]
    if not frag_names:
        return rd.from_items([])
    order_of = {name: i for i, name in enumerate(frag_names)}
    paths = [os.path.join(records_dir, "frags", p) for p in frag_names]
    ds = rd.read_parquet(paths, include_paths=True)

    def add_order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        frag_idx = df["path"].map(lambda p: order_of[os.path.basename(p)])
        df["_order"] = frag_idx.astype("int64") * 1_000_000_000 + df["frag_row"].astype("int64")
        return df.drop(columns=["path"])

    ds = ds.map_batches(add_order, batch_format="pandas")
    from ..stages.dedup import exact_url_dedup

    ds = exact_url_dedup(ds, url_col="url", seq_col="_order")
    ds = ds.materialize()

    # pass 1: per-fragment survivor counts — partial np.unique per batch,
    # merged on the driver (#fragments rows; each fragment is one worker
    # chunk, so this table is ~n_records/chunk_size rows, not n_records)
    def frag_partials(df: pd.DataFrame) -> pd.DataFrame:
        fi, c = np.unique(df["_order"].to_numpy() // 1_000_000_000,
                          return_counts=True)
        return pd.DataFrame({"frag_idx": fi, "n": c})

    partials = ds.map_batches(frag_partials, batch_format="pandas").to_pandas()
    counts = partials.groupby("frag_idx")["n"].sum().sort_index()
    offsets = counts.cumsum().shift(fill_value=0)
    offset_of = offsets.to_dict()

    # pass 2: within-fragment position.  Shuffle on frag%64 (bounded key
    # space — one Python call per BUCKET, not per fragment) and rank all
    # of a bucket's fragments in one vectorized pandas groupby; frag_row
    # is unique within a fragment, so rank(method) choice is immaterial.
    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        frag = (df["_order"] // 1_000_000_000).astype("int64")
        within = df.groupby(frag)["frag_row"].rank(method="first").astype("int64") - 1
        df["crawl_rank"] = frag.map(offset_of) + within
        return df.drop(columns=["frag_row", "_order", "_bucket"])

    ds = ds.add_column(
        "_bucket", lambda df: (df["_order"] // 1_000_000_000) % 64,
        batch_format="pandas",
    )
    ds = ds.groupby("_bucket").map_groups(rank_bucket, batch_format="pandas")
    if max_pages is not None:
        # the max_pages smallest ranks == the crawl's first max_pages pages
        ds = ds.map_batches(
            lambda df: df[df["crawl_rank"] < max_pages], batch_format="pandas"
        )
    return ds


def crawl_multi_ordered(
    pages: List[dict],
    configs: Sequence[dict],
    num_shards: int = 4,
    window: int = 512,
    chunk_size: int = 32,
) -> dict:
    """Reference-order multi-source crawl: the reference crawls its
    competitor configs ONE AT A TIME (reference pipeline.py scrape loop),
    so multi-source order conformance is the concatenation of per-source
    BFS orders.  Each source runs through :func:`crawl_ordered` (windowed
    ordered replay — order + seen set bit-equal to the sequential loop)
    with ITS OWN selector / excludes / depth / budget from the config;
    ``crawl_rank`` is re-based so the global order is the concatenation.

    The zero-copy page table is built ONCE and shared by every source's
    worker pool.  Each source uses its config's OWN values directly —
    NOT the compiled plan's per-host merge (two same-host configs keep
    their separate excludes/selectors here, exactly like the reference's
    sequential per-config loop; the merged plan is only for the SHARED
    frontier of crawl_scalable, where one host has one queue)."""
    from ..functions.urls import host_of

    pages_ref = pages_to_table_ref(pages)
    records: List[dict] = []
    seen: set = set()
    per_source: List[dict] = []
    for cfg in configs:
        base = normalize_url(cfg["base_url"])
        host = host_of(base)
        res = crawl_ordered(
            [], base,
            content_selector=cfg.get("content_selector", "article"),
            max_depth=int(cfg.get("max_depth", 3)),
            max_pages=int(cfg.get("max_pages", 10**9)),
            exclude_patterns=tuple(cfg.get("exclude_patterns", ())),
            num_shards=num_shards, window=window, chunk_size=chunk_size,
            pages_ref=pages_ref,
        )
        base_rank = len(records)
        for r in res["records"]:
            r = dict(r)
            r["crawl_rank"] = base_rank + r["crawl_rank"]
            records.append(r)
        seen |= set(res["seen"])
        per_source.append({"source": cfg.get("name") or host,
                           "n_records": len(res["records"]),
                           "n_seen": len(res["seen"])})
    return {"records": records, "seen": seen, "per_source": per_source}
