"""Blog crawl variant vs the sequential reference-semantics oracle."""

from ai_intel_web_scraper_ray.pipelines.blogcrawl import (
    blog_crawl,
    looks_like_listing_page,
    looks_like_post_url,
    score_relevance,
)
from ai_intel_web_scraper_ray.sources.synthetic import make_blog_graph

from . import oracle

PAGES = make_blog_graph()
PAGES_BY_URL = {p["url"]: {"status": p["status"], "html": p["html"]} for p in PAGES}
BASE = "https://blog.example/blog"
KEYWORDS = ["benchmark", "throughput", "zzz-missing"]


class TestHeuristics:
    def test_post_url(self):
        assert looks_like_post_url("https://b.io/blog/my-long-slug-here", "https://b.io/blog")
        assert looks_like_post_url("https://b.io/blog/2024-review", "https://b.io/blog")
        assert not looks_like_post_url("https://b.io/blog/tags/x", "https://b.io/blog")
        assert not looks_like_post_url("https://b.io/blog", "https://b.io/blog")

    def test_listing_url(self):
        assert looks_like_listing_page("https://b.io/blog/category/eng", "https://b.io/blog")
        assert looks_like_listing_page("https://b.io/blog/page/2", "https://b.io/blog")
        assert not looks_like_listing_page("https://b.io/blog/some-post-x", "https://b.io/blog")

    def test_relevance(self):
        assert score_relevance("benchmark throughput results", ["benchmark", "nope"]) == 0.5
        assert score_relevance("anything", []) == 0.0


class TestBlogCrawl:
    def test_matches_oracle(self):
        got = blog_crawl(PAGES, BASE, max_pages=12, priority_keywords=KEYWORDS)
        exp = oracle.oracle_blog_crawl(PAGES_BY_URL, BASE, max_pages=12,
                                       priority_keywords=KEYWORDS)
        assert [r["url"] for r in got] == [r["url"] for r in exp]
        assert [r["relevance_score"] for r in got] == [r["relevance_score"] for r in exp]
        assert [r["id"] for r in got] == [r["id"] for r in exp]

    def test_pagination_probe_discovers_paged_posts(self):
        got = blog_crawl(PAGES, BASE, max_pages=50, priority_keywords=KEYWORDS)
        urls = {r["url"] for r in got}
        # posts reachable only via ?paged= listings
        assert any("-post-2-" in u for u in urls)
        assert any("-post-3-" in u for u in urls)

    def test_short_posts_dropped_and_category_followed(self):
        got = blog_crawl(PAGES, BASE, max_pages=50, priority_keywords=KEYWORDS)
        urls = {r["url"] for r in got}
        assert not any("tiny-post" in u for u in urls)
        assert any("deep-dive-cat" in u for u in urls)  # via category listing

    def test_relevance_ordering(self):
        got = blog_crawl(PAGES, BASE, max_pages=50, priority_keywords=KEYWORDS)
        scores = [r["relevance_score"] for r in got]
        assert scores == sorted(scores, reverse=True)
        assert scores[0] > 0

    def test_explicit_pagination_pattern(self):
        got = blog_crawl(PAGES, BASE, max_pages=20, priority_keywords=KEYWORDS,
                         pagination_pattern="?paged={page}")
        exp = oracle.oracle_blog_crawl(PAGES_BY_URL, BASE, max_pages=20,
                                       priority_keywords=KEYWORDS,
                                       pagination_pattern="?paged={page}")
        assert [r["url"] for r in got] == [r["url"] for r in exp]
