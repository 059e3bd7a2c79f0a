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
