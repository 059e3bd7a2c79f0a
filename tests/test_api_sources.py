"""API-ingestion adapters over the deterministic mock backend."""

import ray.data as rd

from ai_intel_web_scraper_ray.sources.apisources import (
    scrape_all_sources,
    scrape_github_discussions,
    scrape_github_issues,
    scrape_github_releases,
    scrape_hn,
    scrape_reddit,
)
from ai_intel_web_scraper_ray.sources.synthetic_api import MockAPI

from . import fixtures

API = MockAPI()
REPO = "acme/acme-db"


class TestGithubIssues:
    def test_budget_and_pr_skip(self):
        recs = scrape_github_issues(API, "acme", REPO, {"max_issues": 50})
        assert len(recs) == 50
        # PRs (every 10th item) are skipped
        nums = [r["metadata"]["issue_number"] for r in recs]
        assert not any((n - 1000) % 10 == 9 for n in nums)

    def test_label_flags_and_sentiment(self):
        recs = scrape_github_issues(API, "acme", REPO, {"max_issues": 30})
        for r in recs:
            labels = [l.lower() for l in r["metadata"]["labels"]]
            assert r["metadata"]["is_bug"] == ("bug" in labels)
            assert r["sentiment"] == ("negative" if r["metadata"]["is_bug"] else "neutral")

    def test_text_composition_with_comments(self):
        recs = scrape_github_issues(API, "acme", REPO,
                                    {"max_issues": 20, "fetch_comments_for_top_n": 20})
        with_comments = [r for r in recs if len(r["metadata"]["top_comments"]) >= 2]
        assert with_comments
        r = with_comments[0]
        assert r["text"].startswith("# Issue")
        assert "## Top Comments" in r["text"]
        assert "---" in r["text"]  # the \n\n---\n\n comment separator
        assert r["metadata"]["top_comments"][0].startswith("**commenter")

    def test_comment_fetch_only_top_n(self):
        recs = scrape_github_issues(API, "acme", REPO,
                                    {"max_issues": 40, "fetch_comments_for_top_n": 5})
        for r in recs[6:]:
            assert r["metadata"]["top_comments"] == []

    def test_pagination_beyond_one_page(self):
        recs = scrape_github_issues(API, "acme", REPO, {"max_issues": 120})
        assert len(recs) == 117  # 130 items minus 13 PRs


class TestDiscussions:
    def test_cursor_pagination_and_answer(self):
        recs = scrape_github_discussions(API, "acme", REPO, {"max_discussions": 80})
        assert len(recs) == 80
        answered = [r for r in recs if r["metadata"]["is_answered"]]
        assert answered
        assert "## Accepted Answer" in answered[0]["text"]
        unanswered = [r for r in recs if not r["metadata"]["is_answered"]]
        assert "## Accepted Answer" not in unanswered[0]["text"]

    def test_budget(self):
        recs = scrape_github_discussions(API, "acme", REPO, {"max_discussions": 30})
        assert len(recs) == 30


class TestReleases:
    def test_all_pages(self):
        recs = scrape_github_releases(API, "acme", REPO)
        assert len(recs) == 7
        assert recs[0]["text"].startswith("# Release Version 1.0 (v1.0.0)")
        assert recs[0]["credibility"] == "official"
        assert any(r["metadata"]["is_prerelease"] for r in recs)


class TestReddit:
    CONFIG = {"search_terms": ["fast query", "acme db", "benchmark", "extra"],
              "subreddits": ["databases"], "max_results_per_query": 20}

    def test_seen_dedup_across_terms(self):
        recs = scrape_reddit(API, "acme", self.CONFIG)
        urls = [r["url"] for r in recs]
        assert len(urls) == len(set(urls))

    def test_short_posts_dropped(self):
        recs = scrape_reddit(API, "acme", self.CONFIG)
        assert all(r["word_count"] >= 10 for r in recs)
        # titles alone (# Post N about term) are < 10 words → all kept posts have selftext
        assert all("fast query is great" in r["text"] for r in recs)


class TestHN:
    CONFIG = {"search_terms": ["acme", "fastdb"], "max_results_per_query": 30}

    def test_seen_dedup_and_comment_hydration(self):
        recs = scrape_hn(API, "acme", self.CONFIG)
        ids = [r["metadata"]["hn_id"] for r in recs]
        assert len(ids) == len(set(ids))
        high = [r for r in recs if r["metadata"]["points"] > 5]
        assert high and all("## Top Comments" in r["text"] for r in high)
        # HTML stripped from comments
        assert not any("<p>" in r["text"] for r in recs)
        low = [r for r in recs if r["metadata"]["points"] <= 5]
        assert all("## Top Comments" not in r["text"] for r in low)


class TestFanOut:
    def test_scrape_all_and_process(self):
        recs = scrape_all_sources(
            API, "acme", ["acme/acme-db"],
            community_config={"search_terms": ["fast"], "max_results_per_query": 10},
            github_config={"max_issues": 25, "max_discussions": 10},
        )
        assert [r["arrival_seq"] for r in recs] == list(range(len(recs)))
        kinds = {r["source_type"] for r in recs}
        assert kinds == {"github_issue", "github_discussion", "github_release",
                         "community_reddit", "community_hn"}
        # records flow into the standard pipeline table form
        table = fixtures.records_to_table(
            [dict(r, scraped_date=None, content_date=None, topics=[],
                  subtopics=[]) for r in recs]
        )
        ds = rd.from_arrow(table)
        assert ds.count() == len(recs)
