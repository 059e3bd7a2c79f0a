"""Crawl conformance: distributed frontier vs sequential reference BFS."""

import pytest

from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable, crawl_strict
from ai_intel_web_scraper_ray.state.seenset import BloomFilter, CuckooFilter, SeenSet

from . import fixtures, oracle

PAGES = fixtures.make_web_graph()
PAGES_BY_URL = {p["url"]: p for p in PAGES}
BASE = "https://docs.hot.example/p0"


def run_both(base=BASE, selector="article", max_depth=3, max_pages=200,
             exclude=("/excluded/",), num_shards=4, round_size=16):
    got = crawl_strict(
        PAGES, base, selector, max_depth, max_pages, exclude,
        num_shards=num_shards, round_size=round_size,
    )
    exp_order, exp_seen = oracle.oracle_crawl(
        PAGES_BY_URL, base, selector, max_depth, max_pages, exclude
    )
    return got, exp_order, exp_seen


class TestStrictCrawl:
    def test_order_and_seen_equality(self):
        got, exp_order, exp_seen = run_both()
        assert got["order"] == exp_order
        assert got["seen"] == exp_seen

    def test_budget_cut(self):
        got, exp_order, exp_seen = run_both(max_pages=7, round_size=5)
        assert len(got["order"]) == 7
        assert got["order"] == exp_order
        assert got["seen"] == exp_seen

    def test_depth_cut(self):
        got, exp_order, exp_seen = run_both(max_depth=1)
        assert got["order"] == exp_order
        assert got["seen"] == exp_seen

    def test_round_and_shard_invariance(self):
        a, exp_order, exp_seen = run_both(num_shards=2, round_size=3)
        b, _, _ = run_both(num_shards=7, round_size=50)
        assert a["order"] == exp_order == b["order"]
        assert a["seen"] == exp_seen == b["seen"]

    def test_cold_host(self):
        got, exp_order, exp_seen = run_both(base="https://docs.cold1.example/p0")
        assert got["order"] == exp_order
        assert got["seen"] == exp_seen
        assert len(exp_order) > 3

    def test_extract_content_matches_oracle(self):
        got, *_ = run_both(max_pages=10)
        from ai_intel_web_scraper_ray.functions.htmlx import extract_content

        for rec in got["records"]:
            title, text = extract_content(PAGES_BY_URL[rec["url"]]["html"], "article", rec["url"])
            assert rec["title"] == title
            assert rec["text"] == text
            assert "## Section one" in text  # structure preserved
            assert "cookies" not in text     # banner pruned


class TestCheckpointResume:
    def test_resume_identical(self, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        partial = crawl_strict(
            PAGES, BASE, max_pages=50, exclude_patterns=("/excluded/",),
            round_size=8, checkpoint_dir=ckpt, checkpoint_every_rounds=1,
            stop_after_rounds=2,
        )
        assert len(partial["order"]) < 50
        resumed = crawl_strict(
            PAGES, BASE, max_pages=50, exclude_patterns=("/excluded/",),
            round_size=8, checkpoint_dir=ckpt, resume=True,
        )
        full = crawl_strict(
            PAGES, BASE, max_pages=50, exclude_patterns=("/excluded/",), round_size=8
        )
        assert resumed["order"] == full["order"]
        assert resumed["seen"] == full["seen"]


class TestScalableCheckpointResume:
    def test_interrupt_and_resume_completes_crawl(self, tmp_path):
        ckpt = str(tmp_path / "sckpt")
        common = dict(max_depth=3, exclude_patterns=("/excluded/",), num_shards=3,
                      lease_per_shard=4, chunk_size=4, num_workers=2)
        partial = crawl_scalable(PAGES, [BASE], checkpoint_dir=ckpt,
                                 stop_after_fetches=2, **common)
        full = crawl_scalable(PAGES, [BASE], **common)
        assert len(partial["records"]) < len(full["records"])
        resumed = crawl_scalable(PAGES, [BASE], checkpoint_dir=ckpt, resume=True,
                                 **common)
        assert sorted(r["url"] for r in resumed["records"]) == \
            sorted(r["url"] for r in full["records"])
        assert resumed["seen"] == full["seen"]

    def test_interrupt_with_queued_chunks_resumes_exactly(self, tmp_path):
        """Regression for the throttled-dispatch queue: with many seeds,
        small chunks, and few workers, the driver-side dispatch queue is
        NON-empty at the stop point — those leased-but-undispatched URLs
        must be re-pushed at checkpoint exactly like in-flight leases, or
        resume would lose them."""
        from ai_intel_web_scraper_ray.sources.synthetic import (
            make_bench_web_graph,
        )

        pages = make_bench_web_graph(600)
        seeds = [p["url"] for p in pages]
        n_unique = len({p["url"] for p in pages})
        ckpt = str(tmp_path / "qckpt")
        common = dict(max_depth=0, num_shards=3, lease_per_shard=512,
                      chunk_size=16, num_workers=2,
                      materialize_records=False)
        # ~600 seeds / chunk 16 ≈ 38 chunks >> 2 workers × 2 outstanding:
        # the queue holds ~34 chunks when fetch #2 completes
        partial = crawl_scalable(pages, seeds, checkpoint_dir=ckpt,
                                 stop_after_fetches=2, **common)
        assert partial["n_records"] < n_unique
        resumed = crawl_scalable(pages, seeds, checkpoint_dir=ckpt,
                                 resume=True, **common)
        full = crawl_scalable(pages, seeds, **common)
        assert resumed["seen"] == full["seen"]
        assert len(resumed["seen"]) == n_unique



class TestScalableCrawl:
    def test_throughput_scan_counts_match_materialized(self):
        """materialize_records=False (counts + seen set only) must agree
        with the materializing run — and ship NO record payloads at all
        (workers skip the object-store put in that mode).  n_records counts
        FETCHES: monotone depth refinement may legitimately re-fetch a URL
        whose depth improved after its first fetch (race-dependent, in
        EITHER run), so the exact invariants are the seen set and the
        unique-page lower bound, not fetch-count equality."""
        full = crawl_scalable(PAGES, [BASE], max_depth=3,
                              exclude_patterns=("/excluded/",),
                              num_shards=3, num_workers=2)
        scan = crawl_scalable(PAGES, [BASE], max_depth=3,
                              exclude_patterns=("/excluded/",),
                              num_shards=3, num_workers=2,
                              materialize_records=False)
        unique_pages = {r["url"] for r in full["records"]}
        assert scan["n_records"] >= len(unique_pages)
        # depth-refinement re-fetches are rare races; a 2x corpus-level
        # ceiling still catches gross double-dispatch regressions
        assert scan["n_records"] <= 2 * len(unique_pages)
        assert scan["seen"] == full["seen"]
        assert scan["records"] == []
        assert scan["record_refs"] == []

    def test_seen_set_matches_reference_when_unbounded(self):
        got = crawl_scalable(
            PAGES, [BASE], max_depth=3, exclude_patterns=("/excluded/",),
            num_shards=4,
        )
        _, exp_seen = oracle.oracle_crawl(
            PAGES_BY_URL, BASE, "article", 3, 10**9, ("/excluded/",)
        )
        assert got["seen"] == exp_seen
        exp_order, _ = oracle.oracle_crawl(
            PAGES_BY_URL, BASE, "article", 3, 10**9, ("/excluded/",)
        )
        assert sorted(r["url"] for r in got["records"]) == sorted(exp_order)

    def test_politeness_virtual_clock(self):
        got = crawl_scalable(
            PAGES, [BASE], max_depth=3, exclude_patterns=("/excluded/",),
            num_shards=4, min_delay=0.5,
        )
        n = len(got["records"])
        # one host ⇒ serial politeness floor: (n-1) * min_delay lower bound
        assert got["virtual_time"] >= (n - 1) * 0.5

    def test_robots_gating(self):
        robots = {"docs.hot.example": "User-agent: *\nDisallow: /p1\n"}
        got = crawl_scalable(
            PAGES, [BASE], max_depth=3, exclude_patterns=("/excluded/",),
            num_shards=2, respect_robots=True, robots_texts=robots,
        )
        urls = {r["url"] for r in got["records"]}
        assert BASE in urls  # seed itself allowed (p0)
        assert not any(u.startswith("https://docs.hot.example/p1") for u in urls)

    def test_robots_crawl_delay_floor(self):
        """A robots.txt Crawl-delay must schedule fetches even when no
        politeness delay is configured: with delay 2 s declared the
        virtual clock accrues at least (n-1)×2 s for the single host."""
        robots = {"docs.hot.example":
                  "User-agent: *\nCrawl-delay: 2\n"}
        got = crawl_scalable(
            PAGES, [BASE], max_depth=2, exclude_patterns=("/excluded/",),
            num_shards=2, respect_robots=True, robots_texts=robots,
        )
        n = len(got["records"])
        assert n > 1
        assert got["virtual_time"] >= (n - 1) * 2.0

    def test_robots_crawl_delay_never_lowers_config(self):
        """A configured per-host delay above the robots Crawl-delay wins
        (raise_floor only raises); a declared delay above the default
        min_delay wins over it."""
        from ai_intel_web_scraper_ray.state.politeness import HostPoliteness
        from ai_intel_web_scraper_ray.state.robots import RobotsCache

        cache = RobotsCache(
            fetch_robots=lambda h: "User-agent: *\nCrawl-delay: 2\n",
            respect_robots=True)
        assert cache.crawl_delay("h.example") == 2.0

        # late-arriving robots text (dynamic source): offer-time allowed()
        # caches a MISS; the lease-time crawl_delay(refresh=True) must
        # re-ask the source instead of trusting the cached None
        texts = {}
        dyn = RobotsCache(fetch_robots=lambda h: texts.get(h),
                          respect_robots=True)
        assert dyn.allowed("https://late.example/p") is True  # caches None
        texts["late.example"] = "User-agent: *\nCrawl-delay: 3\n"
        assert dyn.crawl_delay("late.example") is None  # stale cache
        assert dyn.crawl_delay("late.example", refresh=True) == 3.0

        pol = HostPoliteness(min_delay=0.5,
                             per_host_delay={"big.example": 5.0})
        pol.raise_floor("big.example", 2.0)   # config 5.0 stays
        pol.raise_floor("small.example", 2.0)  # floor raised over 0.5
        assert pol.per_host_delay["big.example"] == 5.0
        assert pol.per_host_delay["small.example"] == 2.0
        t0 = pol.reserve("small.example", 0.0)
        assert pol.reserve("small.example", 0.0) - t0 == 2.0


class TestSeenSet:
    def test_cuckoo_membership(self):
        f = CuckooFilter(1024)
        keys = [hash(f"k{i}") & ((1 << 63) - 1) for i in range(500)]
        for k in keys:
            f.add(k)
        assert all(k in f for k in keys)  # no false negatives

    def test_bloom(self):
        b = BloomFilter(1000)
        for i in range(500):
            b.add(i * 2654435761)
        assert all((i * 2654435761) in b for i in range(500))
        fps = sum((i * 40503 + 7) in b for i in range(10000, 20000))
        assert fps < 500  # ~1% target

    def test_seenset_exactness(self):
        s = SeenSet(256)
        urls = [f"https://h/{i}" for i in range(2000)]
        assert all(s.check_and_insert(u) for u in urls)
        assert not any(s.check_and_insert(u) for u in urls)
        assert len(s) == 2000

    def test_snapshot_restore(self):
        s = SeenSet(128)
        for i in range(100):
            s.check_and_insert(f"u{i}")
        r = SeenSet.restore(s.snapshot())
        assert not r.check_and_insert("u5")
        assert r.check_and_insert("new")

    def test_batch_matches_scalar(self):
        """Batch APIs must replay scalar semantics exactly — results,
        exact store, filter table bits, and diagnostic counters — including
        intra-batch duplicates and depth refinement."""
        urls = [f"https://h{i % 7}/p{i}" for i in range(600)]
        mix = ([(u, 2) for u in urls[:300]]
               + [(u, 2) for u in urls[100:400]]     # intra-batch dups
               + [(u, 1) for u in urls[200:500]])    # smaller-depth resights
        a, b = SeenSet(256), SeenSet(256)
        got_a = [a.offer_depth(u, d) for u, d in mix]
        got_b = b.offer_depth_batch(mix)
        assert got_a == got_b
        assert a.exact == b.exact
        assert (a.filter.table == b.filter.table).all()
        assert (a.filter_negatives, a.filter_positives) == (
            b.filter_negatives, b.filter_positives)

        c, d = SeenSet(256), SeenSet(256)
        us = urls[:300] + urls[100:400]
        assert [c.check_and_insert(u) for u in us] == d.check_and_insert_batch(us)
        assert c.exact == d.exact
        assert (c.filter.table == d.filter.table).all()

    def test_batch_with_spill(self):
        """A deliberately-tiny FIXED-SIZE filter (grow=False pins the
        pre-growth behavior) overflows into the bloom spill; the
        vectorized precheck must still consult it (no false negatives)."""
        s = SeenSet(16, grow=False)   # 16-bucket floor, fills fast
        urls = [f"https://spill/{i}" for i in range(5000)]
        s.check_and_insert_batch(urls)
        assert s.filter.spill is not None   # spill actually engaged
        assert not any(s.check_and_insert_batch(urls))
        assert len(s) == 5000

    def test_occupancy_excludes_spills(self):
        """The growth trigger gauges TRUE slot occupancy (advisor r3): bloom
        spills increment the insert count but fill no slot, so `occupied`
        must stay bounded by the physical slot count even when `count`
        runs far past it on a spill-heavy fixed-size shard."""
        s = SeenSet(16, grow=False)
        s.check_and_insert_batch([f"https://occ/{i}" for i in range(5000)])
        f = s.filter
        slots = f.nbuckets * 4
        assert f.spilled > 0 and f.count > slots   # raw count overran
        assert f.occupied == f.count - f.spilled
        assert f.occupied <= slots                  # physical bound holds

    def test_filter_growth_amortized(self):
        """Past ~85% load the filter rebuilds at 2x+ from the exact store
        instead of entering the per-insert 500-kick eviction spiral (the
        ~100x offer-throughput collapse measured at 100k URLs over a
        64k-slot filter).  Growth preserves exact membership, keeps load
        bounded, and never engages the bloom on a clean insert stream."""
        s = SeenSet(256)
        urls = [f"https://g/{i}" for i in range(20_000)]
        assert all(s.check_and_insert_batch(urls))
        assert s.filter_rebuilds >= 2
        f = s.filter
        assert f.count / (f.nbuckets * 4) < 0.85
        assert f.spill is None
        assert not any(s.check_and_insert_batch(urls))   # membership intact
        assert len(s) == 20_000

    def test_growth_batch_matches_scalar(self):
        """Scalar and batch replays must stay bit-exact ACROSS a rebuild:
        growth fires at the same insert index in both, so the rebuilt
        tables are identical."""
        urls = [f"https://gb/{i}" for i in range(3000)]
        a, b = SeenSet(256), SeenSet(256)
        got_a = [a.check_and_insert(u) for u in urls]
        got_b = b.check_and_insert_batch(urls)
        assert got_a == got_b
        assert a.filter_rebuilds == b.filter_rebuilds >= 1
        assert (a.filter.table == b.filter.table).all()
        c, d = SeenSet(256), SeenSet(256)
        mix = [(u, i % 5) for i, u in enumerate(urls)]
        got_c = [c.offer_depth(u, dep) for u, dep in mix]
        got_d = d.offer_depth_batch(mix)
        assert got_c == got_d
        assert c.filter_rebuilds == d.filter_rebuilds >= 1
        assert (c.filter.table == d.filter.table).all()



def test_robots_record_set_matches_sequential_oracle():
    """Record SET + BFS min-depths of a robots-gated distributed crawl
    equal the independent robots-aware sequential walk
    (oracle_crawl_robots) — live, not just the pinned parquet."""
    from .oracle import oracle_crawl_robots
    from tools.gen_pinned_oracles import CRAWL_ROBOTS_TEXTS

    got = crawl_scalable(
        PAGES, [BASE], max_depth=3, exclude_patterns=("/excluded/",),
        num_shards=4, respect_robots=True,
        robots_texts=CRAWL_ROBOTS_TEXTS)
    eng = {(r["url"], r["depth"]) for r in got["records"]}
    exp = {(r["url"], r["depth"])
           for r in oracle_crawl_robots(PAGES_BY_URL, BASE,
                                        CRAWL_ROBOTS_TEXTS,
                                        exclude_patterns=("/excluded/",))}
    assert eng == exp
    assert not any("/p7" in u or "/p12" in u for u, _ in eng)
