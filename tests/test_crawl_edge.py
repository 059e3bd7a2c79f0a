"""Crawl robustness edge cases."""

from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable, crawl_strict

from . import fixtures, oracle

PAGES = fixtures.make_web_graph()
PAGES_BY_URL = {p["url"]: p for p in PAGES}


class TestStrictEdges:
    def test_start_url_missing(self):
        got = crawl_strict(PAGES, "https://docs.hot.example/does-not-exist")
        exp_order, exp_seen = oracle.oracle_crawl(
            PAGES_BY_URL, "https://docs.hot.example/does-not-exist", "article", 3, 200, ()
        )
        assert got["order"] == exp_order == []
        assert got["seen"] == exp_seen

    def test_start_url_is_error_page(self):
        # p9 on hot host has status 404 in the fixture
        url = "https://docs.hot.example/p9"
        assert PAGES_BY_URL[url]["status"] == 404
        got = crawl_strict(PAGES, url)
        exp_order, exp_seen = oracle.oracle_crawl(PAGES_BY_URL, url, "article", 3, 200, ())
        assert got["order"] == exp_order == []
        assert got["seen"] == exp_seen == {url}

    def test_exclude_everything(self):
        got = crawl_strict(PAGES, "https://docs.hot.example/p0",
                           exclude_patterns=("docs.hot.example",))
        exp_order, exp_seen = oracle.oracle_crawl(
            PAGES_BY_URL, "https://docs.hot.example/p0", "article", 3, 200,
            ("docs.hot.example",),
        )
        assert got["order"] == exp_order == []
        assert got["seen"] == exp_seen

    def test_max_pages_zero(self):
        got = crawl_strict(PAGES, "https://docs.hot.example/p0", max_pages=0)
        assert got["order"] == []


class TestScalableEdges:
    def test_empty_seed_list(self):
        got = crawl_scalable(PAGES, [], num_shards=2)
        assert got["records"] == []
        assert got["seen"] == set()

    def test_seed_not_in_graph(self):
        got = crawl_scalable(PAGES, ["https://nowhere.example/x"], num_shards=2)
        assert got["records"] == []
        assert got["seen"] == {"https://nowhere.example/x"}

    def test_max_pages_budget(self):
        got = crawl_scalable(PAGES, ["https://docs.hot.example/p0"], max_pages=5,
                             num_shards=2, exclude_patterns=("/excluded/",))
        assert len(got["records"]) == 5


class TestSpillHeap:
    def test_matches_plain_heap_random_interleave(self):
        """Randomized interleaved push/pop: a mem_cap=8 SpillHeap must pop
        the exact same global order as an unbounded heap, and must have
        actually spilled."""
        import heapq
        import random

        from ai_intel_web_scraper_ray.state.frontier import SpillHeap

        rng = random.Random(42)
        sh = SpillHeap(mem_cap=8)
        ref: list = []
        seq = 0
        pops_sh, pops_ref = [], []
        for _ in range(2000):
            if ref and rng.random() < 0.4:
                pops_sh.append(sh.pop())
                pops_ref.append(heapq.heappop(ref))
            else:
                item = (rng.randint(0, 9), seq, f"https://h/{seq}")
                seq += 1
                sh.push(item)
                heapq.heappush(ref, item)
            assert len(sh) == len(ref)
        while ref:
            pops_sh.append(sh.pop())
            pops_ref.append(heapq.heappop(ref))
        assert pops_sh == pops_ref
        assert sh.spill_events > 0

    def test_snapshot_restore_with_active_segments(self):
        """snapshot() must read back spilled segments; restore() into a
        capped heap re-spills and preserves pop order."""
        from ai_intel_web_scraper_ray.state.frontier import SpillHeap

        sh = SpillHeap(mem_cap=8)
        items = [(d, i, f"https://h/{i}") for i, d in enumerate(
            [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4])]
        for it in items:
            sh.push(it)
        snap = sh.snapshot()
        assert snap == sorted(items)
        sh2 = SpillHeap(mem_cap=4)
        sh2.restore(snap)
        assert [sh2.pop() for _ in range(len(items))] == sorted(items)

    def test_close_reclaims_segments(self, tmp_path):
        """close() deletes undrained segment files and the spill dir —
        a terminated crawl must not leak /tmp disk."""
        import os

        from ai_intel_web_scraper_ray.state.frontier import SpillHeap

        d = str(tmp_path / "spill")
        sh = SpillHeap(mem_cap=4, spill_dir=d)
        for i in range(64):
            sh.push((i % 7, i, f"https://h/{i}"))
        assert sh.spill_events > 0
        assert any(f.endswith(".pkl") for f in os.listdir(d))
        sh.close()
        assert not any(f.endswith(".pkl") for f in os.listdir(d))
        assert len(sh) == len(sh._heap)  # only the in-memory slice left

    def test_crawl_scalable_spilled_equals_unbounded(self):
        """A crawl with a tiny per-shard heap cap must fetch the exact
        same record set and min-depths as the unbounded crawl."""
        base = "https://docs.hot.example/p0"
        a = crawl_scalable(PAGES, [base], max_depth=3,
                           exclude_patterns=("/excluded/",), num_shards=2)
        b = crawl_scalable(PAGES, [base], max_depth=3,
                           exclude_patterns=("/excluded/",), num_shards=2,
                           heap_mem_cap=4)
        da = {r["url"]: r["depth"] for r in a["records"]}
        db = {r["url"]: r["depth"] for r in b["records"]}
        assert da == db
        assert a["seen"] == b["seen"]


def test_lineage_counters_match_sequential_walk():
    """North rule "per-partition lineage + metrics": the scalable crawl's
    per-shard offered/seen/admitted/emitted counters equal the independent
    sequential walk's — offered includes duplicate-sighting multiplicity
    (schedule-independent with depth refinement off), and a drained
    unbudgeted robots-off crawl emits exactly what it admits."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    from .oracle import oracle_crawl_lineage

    pages = make_web_graph()
    res = crawl_scalable(pages, ["https://docs.hot.example/p0"],
                         exclude_patterns=("/excluded/",), num_shards=4,
                         max_depth=10**6, materialize_records=False,
                         collect_seen=False)
    got = sorted(
        ({k: st[k] for k in ("shard", "offered", "seen",
                             "admitted", "emitted")}
         for st in res["stats"]), key=lambda d: d["shard"])
    want = oracle_crawl_lineage({p["url"]: p for p in pages},
                                "https://docs.hot.example/p0",
                                num_shards=4,
                                exclude_patterns=("/excluded/",))
    assert got == want
    assert sum(d["offered"] for d in got) > sum(d["seen"] for d in got)


def test_crawl_seen_growth_end_to_end():
    """A crawl whose URL count outruns the shards' seen-set capacity_hint
    must trigger amortized filter growth (not the kick-spiral collapse)
    and produce EXACTLY the same records and seen set as a right-sized
    run."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = make_web_graph(
        hosts=["h0.example", "h1.example", "h2.example"],
        pages_per_host={0: 800, 1: 600, 2: 600})
    seeds = [f"https://h{i}.example/p0" for i in range(3)]
    big = crawl_scalable(pages, seeds, max_depth=10**9, num_shards=4,
                         lease_per_shard=512)
    small = crawl_scalable(pages, seeds, max_depth=10**9, num_shards=4,
                           lease_per_shard=512, seen_capacity_hint=256)
    assert small["seen"] == big["seen"]
    assert {r["url"] for r in small["records"]} == \
        {r["url"] for r in big["records"]}
    rebuilds = sum(s["filter_rebuilds"] for s in small["stats"])
    assert rebuilds >= 1          # growth actually exercised
    assert sum(s["filter_rebuilds"] for s in big["stats"]) == 0
