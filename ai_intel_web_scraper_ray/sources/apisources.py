"""API-ingestion sources: GitHub issues/discussions/releases, Reddit, HN.

Projection semantics mirror the reference scrapers exactly:
- issues (reference: competitive-intel/scrapers/github_scraper.py:113-216):
  paginated REST loop (state=all, sort/direction from config, per_page 100),
  PRs skipped, budget on records, label→bug/feature flags, comments fetched
  for the top-N records ("**author**: body" form), text = ``# title\\n\\nbody``
  + "## Top Comments" joined by "\\n\\n---\\n\\n", ≤5 comments kept in
  metadata, sentiment NEGATIVE iff bug label;
- discussions (github_scraper.py:233-334): GraphQL cursor loop, batch ≤50,
  text + "## Accepted Answer" section when answered;
- releases (github_scraper.py:336-391): all pages, text
  ``# Release {name} ({tag})\\n\\n{body}``, credibility official;
- reddit (community_scraper.py:64-140): global term search then per-
  subreddit search over terms[:3] at half budget, seen-URL dedup, <10-word
  posts dropped, keyword sentiment;
- hn (community_scraper.py:178-292): Algolia story search, seen-objectID
  dedup, comment hydration for points>5 with HTML tags stripped.

The API client is injected (a picklable object with the methods used below)
— tests use the deterministic MockAPI in sources/synthetic_api.py; a real
HTTP client with tenacity-style retry/backoff drops in unchanged.
Independent work units (repos, search terms) fan out as Ray tasks; each
unit's pagination stays sequential (cursor/page dependency), which is the
reference's politeness contract per endpoint.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import ray

from ..functions.sentiment import estimate_sentiment
from ..functions.urls import count_words, record_id

_TAG_RE = re.compile(r"<[^>]+>")

BUG_LABELS = ("bug", "defect")
FEATURE_LABELS = ("enhancement", "feature request", "feature")


def scrape_github_issues(api, origin: str, repo: str, config: dict) -> List[dict]:
    max_issues = config.get("max_issues", 500)
    sort = config.get("issue_sort", "comments")
    direction = config.get("issue_direction", "desc")
    top_n = config.get("fetch_comments_for_top_n", 50)

    records: List[dict] = []
    page = 1
    while len(records) < max_issues:
        items = api.github_issues(repo, state="all", sort=sort,
                                  direction=direction, per_page=100, page=page)
        if not items:
            break
        for item in items:
            if "pull_request" in item:
                continue
            if len(records) >= max_issues:
                break
            labels = [l["name"] for l in item.get("labels", [])]
            is_bug = any(l.lower() in BUG_LABELS for l in labels)
            is_feature = any(l.lower() in FEATURE_LABELS for l in labels)
            title = item.get("title", "")
            body = item.get("body") or ""
            number = item["number"]

            top_comments: List[str] = []
            if len(records) < top_n and item.get("comments", 0) > 0:
                for c in api.github_issue_comments(repo, number, per_page=10):
                    cbody = c.get("body", "")
                    if cbody.strip():
                        author = c.get("user", {}).get("login", "unknown")
                        top_comments.append(f"**{author}**: {cbody}")

            text = f"# {title}\n\n{body}"
            if top_comments:
                text += "\n\n## Top Comments\n\n" + "\n\n---\n\n".join(top_comments)
            url = item["html_url"]
            records.append(
                {
                    "id": record_id(origin, "github_issue", url),
                    "origin": origin,
                    "source_type": "github_issue",
                    "url": url,
                    "title": title,
                    "text": text,
                    "credibility": "community",
                    "sentiment": "negative" if is_bug else "neutral",
                    "word_count": count_words(text),
                    "metadata": {
                        "issue_number": number,
                        "state": item["state"],
                        "labels": labels,
                        "comments_count": item.get("comments", 0),
                        "created_at": item.get("created_at", ""),
                        "author": item.get("user", {}).get("login", "unknown"),
                        "top_comments": top_comments[:5],
                        "is_bug": is_bug,
                        "is_feature_request": is_feature,
                    },
                }
            )
        page += 1
    return records


def scrape_github_discussions(api, origin: str, repo: str, config: dict) -> List[dict]:
    max_discussions = config.get("max_discussions", 200)
    records: List[dict] = []
    cursor: Optional[str] = None
    while len(records) < max_discussions:
        batch = min(50, max_discussions - len(records))
        nodes, has_next, cursor = api.github_discussions(repo, first=batch, after=cursor)
        if not nodes:
            break
        for d in nodes:
            title = d.get("title", "")
            body = d.get("body", "")
            answer_body = None
            if d.get("isAnswered") and d.get("answer"):
                answer_body = d["answer"].get("body", "")
            text = f"# {title}\n\n{body}"
            if answer_body:
                text += f"\n\n## Accepted Answer\n\n{answer_body}"
            url = d.get("url", "")
            records.append(
                {
                    "id": record_id(origin, "github_discussion", url),
                    "origin": origin,
                    "source_type": "github_discussion",
                    "url": url,
                    "title": title,
                    "text": text,
                    "credibility": "community",
                    "sentiment": "neutral",
                    "word_count": count_words(text),
                    "metadata": {
                        "discussion_number": d["number"],
                        "category": (d.get("category") or {}).get("name", ""),
                        "is_answered": bool(d.get("isAnswered")),
                        "answer_body": answer_body,
                        "comments_count": (d.get("comments") or {}).get("totalCount", 0),
                        "created_at": d.get("createdAt", ""),
                        "author": (d.get("author") or {}).get("login", "unknown"),
                    },
                }
            )
        if not has_next:
            break
    return records


def scrape_github_releases(api, origin: str, repo: str) -> List[dict]:
    records: List[dict] = []
    page = 1
    while True:
        items = api.github_releases(repo, per_page=100, page=page)
        if not items:
            break
        for item in items:
            tag = item.get("tag_name", "")
            name = item.get("name", tag)
            body = item.get("body") or ""
            url = item["html_url"]
            text = f"# Release {name} ({tag})\n\n{body}"
            records.append(
                {
                    "id": record_id(origin, "github_release", url),
                    "origin": origin,
                    "source_type": "github_release",
                    "url": url,
                    "title": f"Release {name}",
                    "text": text,
                    "credibility": "official",
                    "sentiment": "neutral",
                    "word_count": count_words(text),
                    "metadata": {
                        "tag_name": tag,
                        "is_prerelease": item.get("prerelease", False),
                        "created_at": item.get("created_at", ""),
                    },
                }
            )
        page += 1
    return records


def scrape_reddit(api, origin: str, config: dict) -> List[dict]:
    search_terms = config.get("search_terms", [])
    subreddits = config.get("subreddits", [])
    max_results = config.get("max_results_per_query", 50)

    seen_urls: set = set()
    records: List[dict] = []

    def post_to_record(post: dict, url: str) -> Optional[dict]:
        title = post.get("title", "")
        selftext = post.get("selftext", "")
        text = f"# {title}\n\n{selftext}" if selftext else f"# {title}"
        if count_words(text) < 10:
            return None
        return {
            "id": record_id(origin, "community_reddit", url),
            "origin": origin,
            "source_type": "community_reddit",
            "url": url,
            "title": title,
            "text": text,
            "credibility": "community",
            "sentiment": estimate_sentiment(title + " " + selftext),
            "word_count": count_words(text),
            "metadata": {
                "subreddit": post.get("subreddit", ""),
                "score": post.get("score", 0),
                "num_comments": post.get("num_comments", 0),
                "author": post.get("author", "unknown"),
                "created_utc": post.get("created_utc", 0),
                "permalink": post.get("permalink", ""),
            },
        }

    for term in search_terms:
        for post in api.reddit_search(term, subreddit=None, limit=min(max_results, 100)):
            url = f"https://www.reddit.com{post.get('permalink', '')}"
            if url in seen_urls:
                continue
            seen_urls.add(url)
            rec = post_to_record(post, url)
            if rec:
                records.append(rec)
    for subreddit in subreddits:
        for term in search_terms[:3]:
            for post in api.reddit_search(term, subreddit=subreddit,
                                          limit=min(max_results // 2, 100)):
                url = f"https://www.reddit.com{post.get('permalink', '')}"
                if url in seen_urls:
                    continue
                seen_urls.add(url)
                rec = post_to_record(post, url)
                if rec:
                    records.append(rec)
    return records


def scrape_hn(api, origin: str, config: dict) -> List[dict]:
    search_terms = config.get("search_terms", [])
    max_results = config.get("max_results_per_query", 50)
    seen_ids: set = set()
    records: List[dict] = []

    for term in search_terms:
        for hit in api.hn_search(term, hits_per_page=min(max_results, 100)):
            hn_id = hit.get("objectID", "")
            if hn_id in seen_ids:
                continue
            seen_ids.add(hn_id)
            title = hit.get("title", "")
            story_url = hit.get("url", "")
            hn_url = f"https://news.ycombinator.com/item?id={hn_id}"
            text = f"# {title}\n\nHN Discussion: {hn_url}"
            if story_url:
                text += f"\nOriginal URL: {story_url}"
            points = hit.get("points", 0) or 0
            top_comments: List[str] = []
            if points > 5:
                for child in api.hn_item(hn_id).get("children", [])[:10]:
                    ctext = child.get("text", "")
                    if ctext:
                        clean = _TAG_RE.sub(" ", ctext).strip()
                        author = child.get("author", "anon")
                        top_comments.append(f"**{author}**: {clean}")
            if top_comments:
                text += "\n\n## Top Comments\n\n" + "\n\n---\n\n".join(top_comments[:5])
            records.append(
                {
                    "id": record_id(origin, "community_hn", hn_url),
                    "origin": origin,
                    "source_type": "community_hn",
                    "url": hn_url,
                    "title": title,
                    "text": text,
                    "credibility": "community",
                    "sentiment": estimate_sentiment(title + " " + " ".join(top_comments)),
                    "word_count": count_words(text),
                    "metadata": {
                        "hn_id": int(hn_id) if str(hn_id).isdigit() else 0,
                        "points": points,
                        "num_comments": hit.get("num_comments", 0) or 0,
                        "top_comments": top_comments[:5],
                    },
                }
            )
    return records


# ---------------------------------------------------------------------------
# fan-out: independent units (repos / configs) as Ray tasks
# ---------------------------------------------------------------------------


@ray.remote
def _unit(kind: str, api, origin: str, arg, config: dict) -> List[dict]:
    if kind == "issues":
        return scrape_github_issues(api, origin, arg, config)
    if kind == "discussions":
        return scrape_github_discussions(api, origin, arg, config)
    if kind == "releases":
        return scrape_github_releases(api, origin, arg)
    if kind == "reddit":
        return scrape_reddit(api, origin, config)
    if kind == "hn":
        return scrape_hn(api, origin, config)
    raise ValueError(kind)


def scrape_all_sources(api, origin: str, repos: Sequence[str],
                       community_config: Optional[dict] = None,
                       github_config: Optional[dict] = None) -> List[dict]:
    """Fan out every (repo, kind) + community source as a Ray task; results
    concatenated in the reference's fixed order (issues, discussions,
    releases per repo, then reddit, then hn — pipeline.py:115-152)."""
    github_config = github_config or {}
    futures = []
    for repo in repos:
        futures.append(("issues", _unit.remote("issues", api, origin, repo, github_config)))
        futures.append(("discussions", _unit.remote("discussions", api, origin, repo, github_config)))
        futures.append(("releases", _unit.remote("releases", api, origin, repo, github_config)))
    if community_config:
        futures.append(("reddit", _unit.remote("reddit", api, origin, None, community_config)))
        futures.append(("hn", _unit.remote("hn", api, origin, None, community_config)))
    out: List[dict] = []
    for _, fut in futures:
        out.extend(ray.get(fut))
    for i, rec in enumerate(out):
        rec["arrival_seq"] = i
    return out
