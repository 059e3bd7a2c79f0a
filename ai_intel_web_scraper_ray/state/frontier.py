"""Sharded URL-frontier actor.

Each shard owns a hash partition of canonical-URL space
(shard = sha256(url) % num_shards, functions/urls.py:frontier_shard) and
holds, per the north rule:

- the partition's seen-set (cuckoo filter + exact backing store,
  state/seenset.py) with check-and-insert-at-enqueue semantics — the
  distributed equivalent of the reference's ``visited`` set
  (reference: competitive-intel/scrapers/docs_scraper.py:117-164);
- a priority heap keyed (depth, discovery_seq) — BFS order within the shard;
- per-host politeness buckets (state/politeness.py) consulted when leasing
  fetch work;
- a robots cache (state/robots.py), config-defeasible;
- lineage counters (offered / admitted / emitted) and checkpoint snapshots.

Two usage modes:
- *strict* conformance crawl: the driver keeps the global BFS order and uses
  only ``offer`` (ordered check-and-insert); see pipelines/crawl.py.
- *scalable* crawl: shards hand out politeness-scheduled leases via ``take``;
  global ordering is per-shard BFS, which preserves the seen-SET invariant
  while letting all shards progress independently.

Hot-host skew: a host's fetch leases all flow through the shard that owns the
host name (host→shard routing is separate from URL→shard seen-set routing),
so one token bucket exists per host no matter how many shards hold its URLs.
"""

from __future__ import annotations

import heapq
import os
import pickle
import tempfile
from typing import Dict, List, Optional, Sequence, Tuple

import ray

from ..functions.urls import frontier_shard, host_of
from .politeness import HostPoliteness
from .robots import RobotsCache
from .seenset import SeenSet


class SpillHeap:
    """External-memory (depth, seq, url) priority queue: the 10^10-URL
    frontier answer to a per-shard heap that no longer fits in RAM.

    The in-memory heap is bounded at ``mem_cap`` entries; on overflow the
    WORST-keyed half is written as one sorted on-disk segment carrying
    its min key.  Pops stay EXACT: before any pop, every segment whose
    min key beats the in-memory minimum is reloaded — BFS offers arrive
    in (mostly) nondecreasing depth, so spilled segments hold the deep
    tail and reloads happen only when the crawl actually reaches that
    depth.  ``mem_cap=None`` (the default) is a plain in-memory heap,
    bit-identical to the pre-spill behavior.

    Keys are unique per shard ((depth, seq) with a shard-local seq), so
    heap-vs-segment comparisons can't tie.

    OWNERSHIP: a ``spill_dir`` belongs to exactly ONE live SpillHeap —
    ``restore`` reclaims every ``*.pkl`` in it as stale debris from a
    killed predecessor (see the comment there).  Frontier shards satisfy
    this by construction (each gets a private ``shard{id}`` subdir);
    anything else reusing a heap's spill dir concurrently would have its
    live segments deleted.  Run one crawl per ``heap_spill_dir``."""

    def __init__(self, mem_cap: Optional[int] = None,
                 spill_dir: Optional[str] = None):
        self._heap: List[Tuple[int, int, str]] = []
        self.mem_cap = mem_cap
        self._spill_dir = spill_dir
        self._made_tempdir = False
        # (min_key, path, count) per on-disk segment, as a HEAP on
        # min_key so the due-reload check is an O(1) peek, never a scan
        self._segments: List[Tuple[Tuple[int, int, str], str, int]] = []
        self._spilled = 0
        self._n_files = 0
        self.spill_events = 0

    def __len__(self) -> int:
        return len(self._heap) + self._spilled

    def _dir(self) -> str:
        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix="frontier_spill_")
            self._made_tempdir = True
        else:
            os.makedirs(self._spill_dir, exist_ok=True)
        return self._spill_dir

    def _spill(self) -> None:
        keep = max(1, (self.mem_cap or 1) // 2)
        items = sorted(self._heap)
        self._heap = items[:keep]
        rest = items[keep:]
        if not rest:
            return
        path = os.path.join(self._dir(), f"seg{self._n_files}.pkl")
        self._n_files += 1
        with open(path, "wb") as f:
            pickle.dump(rest, f, protocol=pickle.HIGHEST_PROTOCOL)
        heapq.heappush(self._segments, (rest[0], path, len(rest)))
        self._spilled += len(rest)
        self.spill_events += 1

    def push(self, item: Tuple[int, int, str]) -> None:
        heapq.heappush(self._heap, item)
        if self.mem_cap is not None and len(self._heap) > self.mem_cap:
            self._spill()

    def _reload_due(self) -> None:
        while self._segments:
            if self._heap and self._heap[0] <= self._segments[0][0]:
                return
            _, path, cnt = heapq.heappop(self._segments)
            with open(path, "rb") as f:
                items = pickle.load(f)
            os.remove(path)
            self._spilled -= cnt
            for it in items:
                heapq.heappush(self._heap, it)
            if self.mem_cap is not None and \
                    len(self._heap) > 2 * self.mem_cap:
                self._spill()

    def pop(self) -> Tuple[int, int, str]:
        self._reload_due()
        return heapq.heappop(self._heap)

    def snapshot(self) -> List[Tuple[int, int, str]]:
        """Full sorted contents (checkpoint reads every segment — the
        checkpoint already serializes the whole frontier)."""
        items = list(self._heap)
        for _, path, _ in self._segments:
            with open(path, "rb") as f:
                items.extend(pickle.load(f))
        return sorted(items)

    def restore(self, items: Sequence[Tuple[int, int, str]]) -> None:
        self._drop_segments()
        # a killed process leaves its snapshot's spilled segment files on
        # disk; the checkpoint fully supersedes them, so any *.pkl already
        # in this shard's spill dir is stale — reclaim before re-spilling
        # (also avoids seg-number collisions with the dead run's files)
        if self._spill_dir is not None and os.path.isdir(self._spill_dir):
            for fname in os.listdir(self._spill_dir):
                if fname.endswith(".pkl"):
                    try:
                        os.remove(os.path.join(self._spill_dir, fname))
                    except OSError:
                        pass
        self._heap = [tuple(x) for x in items]
        heapq.heapify(self._heap)
        if self.mem_cap is not None:
            while len(self._heap) > self.mem_cap:
                self._spill()

    def _drop_segments(self) -> None:
        for _, path, _ in self._segments:
            try:
                os.remove(path)
            except OSError:
                pass
        self._segments = []
        self._spilled = 0

    def close(self) -> None:
        """Delete remaining spill segments (and the auto-created tempdir)
        — undrained crawls must not leak /tmp disk."""
        self._drop_segments()
        if self._made_tempdir and self._spill_dir is not None:
            try:
                os.rmdir(self._spill_dir)
            except OSError:
                pass
            self._spill_dir = None
            self._made_tempdir = False

    def __del__(self):  # best-effort teardown for discarded shards
        try:
            self.close()
        except Exception:
            pass


class FrontierShardImpl:
    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        min_delay: float = 0.0,
        respect_robots: bool = False,
        robots_texts: Optional[Dict[str, str]] = None,
        capacity_hint: int = 1 << 16,
        depth_refinement: bool = True,
        per_host_delay: Optional[Dict[str, float]] = None,
        per_host_budget: Optional[Dict[str, int]] = None,
        heap_mem_cap: Optional[int] = None,
        spill_dir: Optional[str] = None,
        robots_transport=None,
    ):
        self.shard_id = shard_id
        self.num_shards = num_shards
        # re-admission on smaller-depth sightings only matters when a depth
        # cutoff can flip expansion decisions; with an unbounded max_depth
        # the crawl sets this False and saves the re-fetches
        self.depth_refinement = depth_refinement
        self._capacity_hint = capacity_hint
        self.seen = SeenSet(capacity_hint)
        # (depth, discovery_seq, url); heap_mem_cap bounds the in-memory
        # slice, overflow spills to sorted disk segments (SpillHeap)
        self.heap = SpillHeap(
            heap_mem_cap,
            os.path.join(spill_dir, f"shard{shard_id}") if spill_dir
            else None)
        self.politeness = HostPoliteness(min_delay, per_host_delay)
        # per-host fetch budgets (lease-level: counts fetch ATTEMPTS of
        # leased URLs; the reference's successful-extract budget semantics
        # are owned by the strict/ordered modes).  Budgets require
        # host-affinity routing — see offer_route — so each host's counter
        # lives whole on its home shard and stays globally exact.
        self.per_host_budget: Dict[str, int] = dict(per_host_budget or {})
        self.emitted_by_host: Dict[str, int] = {}
        self.budget_dropped = 0
        robots_texts = robots_texts or {}
        # live robots fetch (north-rule "robots.txt caching"): a host not
        # covered by the injected texts fetches {scheme}://host/robots.txt
        # ONCE through the crawl transport — the scheme is learned from
        # the host's first offered URL, and RobotsCache caches per host,
        # so a transport error (incl. 404) simply means allow-all for
        # that host, exactly like a missing injected text
        self._host_scheme: Dict[str, str] = {}
        self._robots_transport = robots_transport

        def _fetch_robots(host: str) -> Optional[str]:
            if host in robots_texts:
                return robots_texts[host]
            if self._robots_transport is None:
                return None
            scheme = self._host_scheme.get(host, "https")
            return self._robots_transport.fetch(
                f"{scheme}://{host}/robots.txt")

        self.robots = RobotsCache(
            fetch_robots=_fetch_robots,
            respect_robots=respect_robots,
        )
        # compile robots Crawl-delay floors onto the politeness buckets:
        # texts known up front compile NOW (so politeness.active — and with
        # it host-affinity routing — engages before the first lease); hosts
        # whose robots arrive later (real fetcher) raise lazily in take()
        self._delay_checked: set = set()
        if respect_robots:
            for h in robots_texts:
                self._delay_checked.add(h)
                d = self.robots.crawl_delay(h)
                if d is not None:
                    self.politeness.raise_floor(h, d)
        self._seq = 0
        self.offered = 0
        self.admitted = 0
        self.emitted = 0
        # streaming-mode flow accounting (quiescence detection)
        self.peers = None
        self.offers_received = 0
        self.pushes_sent = 0
        self.pushes_received = 0
        # self-leasing mode accounting: a worker that takes a tracked lease
        # owes a complete_lease() once the lease's discovered links have
        # been handed to offer_route — until then the crawl is not quiescent
        self.leases_outstanding = 0
        self.offers_sent_acc = 0

    # -- seen-set / enqueue ------------------------------------------------

    def offer(self, items: Sequence[Tuple[str, int]], enqueue: bool = True) -> List[bool]:
        """Ordered check-and-insert of (url, depth) items.  Returns one bool
        per item: True iff the URL was new (now marked seen and, if
        ``enqueue`` and robots-allowed, pushed on the heap)."""
        self.offered += len(items)
        out = self.seen.check_and_insert_batch([u for u, _ in items])
        if enqueue:
            for (url, depth), is_new in zip(items, out):
                if is_new:
                    self._note_scheme(url)
                if is_new and self.robots.allowed(url):
                    self.heap.push((depth, self._seq, url))
                    self._seq += 1
                    self.admitted += 1
        return out

    def _note_scheme(self, url: str) -> None:
        """Remember a host's scheme from its first offered URL so a live
        robots fetch targets the right origin.  No-op unless live robots
        mode is active."""
        if self._robots_transport is None or not self.robots.respect:
            return
        h = host_of(url)
        if h not in self._host_scheme:
            i = url.find("://")
            if i > 0:
                self._host_scheme[h] = url[:i]

    # -- streaming mode: shard-to-shard routing ---------------------------

    def set_peers(self, peers) -> None:
        """Handles to all frontier shards (including self) for direct
        admitted-link routing without a driver round trip."""
        self.peers = peers

    def offer_route(self, items: Sequence[Tuple[str, int]]) -> None:
        """check-and-insert each (url, depth) on THIS shard's seen set (the
        caller routed by URL hash), then enqueue admitted items.

        Routing: with politeness ON (min_delay > 0) an admitted URL goes to
        its HOST's home shard, which owns the host's single token bucket —
        correctness over balance, and throughput is politeness-capped per
        host anyway.  With politeness OFF the queue stays HERE (URL-hash
        shard): perfectly hash-balanced, no forwarding hop, which is the
        hot-host skew split the north rule requires (a 50%-of-corpus host
        no longer serializes behind one shard's queue).  Robots checks work
        on any shard (every shard holds the robots cache)."""
        from ..functions.urls import frontier_shard as _fs

        self.offers_received += len(items)
        self.offered += len(items)
        # monotone depth refinement: 'new' AND 'better' (strictly smaller
        # depth) sightings are (re-)admitted, so depth-cutoff decisions
        # converge to BFS-minimal depths under any message ordering.
        # One vectorized seen-set pass over the batch; only the admitted
        # sliver pays the per-URL routing below.
        statuses = self.seen.offer_depth_batch(items)
        ok = ("new", "better") if self.depth_refinement else ("new",)

        if not (self.politeness.active or self.per_host_budget):
            admitted = [it for it, st in zip(items, statuses) if st in ok]
            self.pushes_sent += len(admitted)
            self._push_local(admitted, count_received=True)
            return
        by_host: dict = {}
        for it, st in zip(items, statuses):
            if st in ok:
                hs = _fs(host_of(it[0]), self.num_shards)
                by_host.setdefault(hs, []).append(it)
        for hs, batch in by_host.items():
            self.pushes_sent += len(batch)
            if hs == self.shard_id:
                self._push_local(batch, count_received=True)
            else:
                self.peers[hs].push.remote(batch)

    def _push_local(self, items: Sequence[Tuple[str, int]], count_received: bool = False) -> int:
        if count_received:
            self.pushes_received += len(items)
        pushed = 0
        for url, depth in items:
            self._note_scheme(url)
            if self.robots.allowed(url):
                self.heap.push((depth, self._seq, url))
                self._seq += 1
                self.admitted += 1
                pushed += 1
        return pushed

    def flow_counts(self) -> Tuple[int, int, int, int]:
        """(offers_received, pushes_sent, pushes_received, pending)"""
        return (self.offers_received, self.pushes_sent, self.pushes_received, len(self.heap))

    # -- scalable-mode leases ---------------------------------------------

    def push(self, items: Sequence[Tuple[str, int]]) -> int:
        """Enqueue already-admitted (url, depth) items on this shard's heap
        WITHOUT touching the seen set.  Used for host-affinity routing: the
        URL-hash shard owns seen-set membership; the HOST-hash shard owns the
        fetch queue + the host's single politeness bucket (SURVEY.md §7.5.5:
        two keys, two routings).  Counts received only — the SENDING shard
        counted pushes_sent in offer_route."""
        return self._push_local(items, count_received=True)

    def push_external(self, items: Sequence[Tuple[str, int]]) -> int:
        """Driver-originated push (checkpoint lease re-entry): counts both
        sent and received here so flow conservation stays balanced.

        Re-entered items were already LEASED once (budget charged in
        take()); refund that charge so an interrupted+resumed budgeted
        crawl fetches the same pages as an uninterrupted one."""
        if self.per_host_budget:
            for url, _depth in items:
                h = host_of(url)
                if h in self.per_host_budget:
                    used = self.emitted_by_host.get(h, 0)
                    if used > 0:
                        self.emitted_by_host[h] = used - 1
        self.pushes_sent += len(items)
        return self._push_local(items, count_received=True)

    def take(self, n: int, now: float,
             track_lease: bool = False) -> List[Tuple[str, int, float]]:
        """Pop up to n (url, depth, scheduled_time) leases in (depth, seq)
        order, politeness-scheduled per host.

        ``track_lease=True`` (self-leasing workers) counts a non-empty
        lease as outstanding INSIDE this call — there is no window where
        URLs have left the heap but no counter records the debt — and the
        worker must settle it with :meth:`complete_lease`."""
        out = []
        while self.heap and len(out) < n:
            depth, _, url = self.heap.pop()
            host = host_of(url)
            if self.per_host_budget:
                cap = self.per_host_budget.get(host)
                used = self.emitted_by_host.get(host, 0)
                if cap is not None and used >= cap:
                    # budget exhausted: drop, never requeue (the
                    # reference's stop-at-budget discard), keep counting
                    self.budget_dropped += 1
                    continue
                self.emitted_by_host[host] = used + 1
            if self.robots.respect and host not in self._delay_checked:
                self._delay_checked.add(host)
                # refresh=True: offer-time allowed() caches a None parser
                # for hosts whose robots text wasn't available yet, so the
                # one-shot lease-time check must re-ask the robots source
                d = self.robots.crawl_delay(host, refresh=True)
                if d is not None:
                    self.politeness.raise_floor(host, d)
            t = self.politeness.reserve(host, now)
            out.append((url, depth, t))
            self.emitted += 1
        if track_lease and out:
            self.leases_outstanding += 1
        return out

    def complete_lease(self, n_offers: int) -> None:
        """Settle one tracked lease: the worker has fetched every leased
        URL and already ISSUED offer_route calls for the n_offers links it
        discovered (issue-then-settle order is what makes the quiescence
        snapshot race-free: an unsettled lease keeps leases_outstanding
        > 0, and a settled one makes offers_sent_acc >= the in-flight
        offers, so 'received == sent' can only hold once they landed)."""
        self.leases_outstanding -= 1
        self.offers_sent_acc += n_offers

    def selflease_counts(self) -> Tuple[int, int, int, int, int, int]:
        """(offers_received, pushes_sent, pushes_received, pending,
        leases_outstanding, offers_sent_acc) — the self-leasing quiescence
        snapshot (flow_counts stays 4-wide for the driver-loop mode)."""
        return (self.offers_received, self.pushes_sent, self.pushes_received,
                len(self.heap), self.leases_outstanding, self.offers_sent_acc)

    def pending(self) -> int:
        return len(self.heap)

    # -- introspection / checkpoint ---------------------------------------

    def seen_snapshot(self) -> List[str]:
        return self.seen.snapshot()

    def stats(self) -> Dict[str, int]:
        return {
            "shard": self.shard_id,
            "seen": len(self.seen),
            "pending": len(self.heap),
            "offered": self.offered,
            "admitted": self.admitted,
            "emitted": self.emitted,
            "filter_negatives": self.seen.filter_negatives,
            "filter_positives": self.seen.filter_positives,
            "filter_rebuilds": self.seen.filter_rebuilds,
            "budget_dropped": self.budget_dropped,
        }

    def checkpoint(self) -> Dict:
        return {
            "shard_id": self.shard_id,
            "seen": self.seen.snapshot_items(),
            "heap": self.heap.snapshot(),
            "seq": self._seq,
            "politeness": self.politeness.snapshot(),
            "counters": (self.offered, self.admitted, self.emitted),
            "emitted_by_host": dict(self.emitted_by_host),
            "budget_dropped": self.budget_dropped,
            "flows": (self.offers_received, self.pushes_sent, self.pushes_received),
        }

    def restore(self, state: Dict) -> None:
        # restore at the shard's CONFIGURED capacity — the default hint
        # would force a ladder of replay rebuilds before the first lease
        self.seen = SeenSet.restore(state["seen"],
                                    capacity_hint=self._capacity_hint)
        self.heap.restore([tuple(x) for x in state["heap"]])
        self._seq = state["seq"]
        self.politeness.restore(state["politeness"])
        self.offered, self.admitted, self.emitted = state["counters"]
        self.emitted_by_host = dict(state.get("emitted_by_host", {}))
        self.budget_dropped = state.get("budget_dropped", 0)
        flows = state.get("flows")
        if flows:
            self.offers_received, self.pushes_sent, self.pushes_received = flows


# the actor handle everyone uses; FrontierShardImpl stays importable for
# in-process benchmarks/tests (no private __ray_metadata__ unwrapping)
FrontierShard = ray.remote(num_cpus=0.25)(FrontierShardImpl)


def make_shards(
    num_shards: int,
    min_delay: float = 0.0,
    respect_robots: bool = False,
    robots_texts: Optional[Dict[str, str]] = None,
    capacity_hint: int = 1 << 16,
    depth_refinement: bool = True,
    per_host_delay: Optional[Dict[str, float]] = None,
    per_host_budget: Optional[Dict[str, int]] = None,
    heap_mem_cap: Optional[int] = None,
    spill_dir: Optional[str] = None,
    robots_transport=None,
):
    return [
        FrontierShard.remote(
            i, num_shards, min_delay, respect_robots, robots_texts, capacity_hint,
            depth_refinement, per_host_delay, per_host_budget,
            heap_mem_cap, spill_dir, robots_transport,
        )
        for i in range(num_shards)
    ]


def shard_of(url: str, num_shards: int) -> int:
    return frontier_shard(url, num_shards)


def host_shard_of(url: str, num_shards: int) -> int:
    """Home shard of a URL's host — owns the host's fetch queue and its one
    politeness bucket."""
    return frontier_shard(host_of(url), num_shards)
