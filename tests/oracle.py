"""Sequential conformance oracle.

A faithful, single-threaded reimplementation of the reference pipeline
semantics (FIXTURES.md §9) run in-process over the same fixtures as the
distributed engine.  It deliberately mirrors the *control flow* of the
reference modules (sequential loops, seen-sets, greedy LSH insert/query)
while sharing only the pinned primitives (tokenizer, minhash hashing, HTML
extraction) whose definitions this repo fixes — so tests compare the
engine's distributed execution against the reference's sequential semantics,
not the engine against itself.

Reference control flow mirrored here:
- clean/tag/filter: processors/{content_extractor,topic_tagger,quality_filter}.py
- dedup: processors/deduplicator.py:37-158 (keep-first URL/GitHub dedup,
  greedy LSH query-then-insert)
- crawl: scrapers/docs_scraper.py:107-169 (BFS deque, seen-at-enqueue,
  budget counts successful extracts, depth cutoff, exclude patterns),
  with link order pinned to first-occurrence (SURVEY.md §7.5).
"""

from __future__ import annotations

import re
from collections import deque
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ai_intel_web_scraper_ray.functions import minhash as mh
from ai_intel_web_scraper_ray.functions.htmlx import extract_content, extract_links
from ai_intel_web_scraper_ray.functions.urls import is_same_domain, normalize_url

# ---------------------------------------------------------------------------
# clean
# ---------------------------------------------------------------------------

_STRIPS = [
    re.compile(r"(we use cookies|cookie policy|accept all cookies|manage preferences).*?\.",
               re.IGNORECASE | re.DOTALL),
    re.compile(r"(subscribe to|sign up for|join our|get the latest).*?(newsletter|updates|news).*?\.",
               re.IGNORECASE | re.DOTALL),
    re.compile(r"(share on|follow us on|tweet this|share this).*?(twitter|linkedin|facebook|x\.com).*?\n",
               re.IGNORECASE),
    re.compile(r"©\s*\d{4}.*?(all rights reserved|inc\.|ltd\.|corp\.).*?\n", re.IGNORECASE),
]


def oracle_clean_one(text: str) -> Tuple[str, int]:
    for pat in _STRIPS:
        text = pat.sub("", text)
    parts = re.split(r"(```[\s\S]*?```)", text)
    norm = []
    for part in parts:
        if part.startswith("```"):
            norm.append(part)
            continue
        lines = []
        for line in part.split("\n"):
            s = line.strip()
            if s.startswith("#") or s.startswith("|") or s.startswith(("-", "*", "1.", "2.", "3.")):
                lines.append(line)
            else:
                lines.append(re.sub(r"  +", " ", line))
        norm.append("\n".join(lines))
    text = "".join(norm)
    text = re.sub(r"\n{3,}", "\n\n", text)
    text = text.strip()
    return text, len(text.split())


def oracle_clean(records: List[dict]) -> List[dict]:
    out = []
    for r in records:
        r = dict(r)
        r["text"], r["word_count"] = oracle_clean_one(r["text"])
        out.append(r)
    return out


# ---------------------------------------------------------------------------
# tag
# ---------------------------------------------------------------------------


def oracle_tag(records: List[dict], topic_keywords: Dict[str, Sequence[str]],
               max_topics: int = 3, threshold: float = 0.01) -> List[dict]:
    compiled = {}
    for topic, kws in topic_keywords.items():
        compiled[topic] = [
            (re.compile(r"\b" + re.escape(kw) + r"\b", re.IGNORECASE), 1.0 + kw.count(" ") * 0.5)
            for kw in kws
        ]
    out = []
    for r in records:
        r = dict(r)
        text = f"{r['title']} {r['text']}"
        scores = {}
        for topic, pats in compiled.items():
            if not pats:
                continue
            total = sum(len(p.findall(text)) * w for p, w in pats)
            if total > 0:
                scores[topic] = total / len(pats)
        ranked = sorted(scores.items(), key=lambda kv: kv[1], reverse=True)
        top = [t for t, s in ranked[:max_topics] if s >= threshold]
        r["topics"] = top if top else ["unclassified"]
        out.append(r)
    return out


# ---------------------------------------------------------------------------
# quality filter
# ---------------------------------------------------------------------------

_BP = ["skip to content", "table of contents", "cookie policy",
       "privacy policy", "terms of service", "subscribe to newsletter"]


def oracle_should_remove(r: dict, min_words: int = 100, max_code_ratio: float = 0.85) -> str:
    if r["word_count"] < min_words:
        return "too_short"
    if r["source_type"] not in ("benchmark", "github_release") and \
            (not r["topics"] or r["topics"] == ["unclassified"]):
        return "no_topics"
    if r["source_type"] == "official_docs":
        blocks = re.findall(r"```[\s\S]*?```", r["text"])
        if blocks and r["text"]:
            ratio = sum(len(b) for b in blocks) / len(r["text"])
            if ratio > max_code_ratio:
                return "mostly_code"
    lower = r["text"].lower()
    if sum(1 for p in _BP if p in lower) >= 3:
        return "boilerplate"
    words = r["text"].split()
    if len(words) < 50:
        link_words = sum(1 for w in words if w.startswith("http") or w.startswith("/"))
        if link_words > len(words) * 0.3:
            return "boilerplate"
    return ""


def oracle_filter(records: List[dict]) -> Tuple[List[dict], Dict[str, int]]:
    kept, reasons = [], {}
    for r in records:
        why = oracle_should_remove(r)
        if why:
            reasons[why] = reasons.get(why, 0) + 1
        else:
            kept.append(r)
    return kept, reasons


# ---------------------------------------------------------------------------
# dedup (sequential keep-first; greedy LSH query-then-insert)
# ---------------------------------------------------------------------------


def oracle_url_dedup(records: List[dict]) -> List[dict]:
    seen: Set[str] = set()
    out = []
    for r in records:
        key = r["url"].rstrip("/").lower()
        if key not in seen:
            seen.add(key)
            out.append(r)
    return out


def oracle_github_dedup(records: List[dict]) -> List[dict]:
    seen: Set[str] = set()
    out = []
    for r in records:
        if r["source_type"] in ("github_issue", "github_discussion"):
            meta = r.get("metadata") or {}
            if r["source_type"] == "github_issue":
                key = f"{r['origin']}-issue-{meta.get('issue_number', '')}"
            else:
                key = f"{r['origin']}-discussion-{meta.get('discussion_number', '')}"
            if key in seen:
                continue
            seen.add(key)
        out.append(r)
    return out


def oracle_minhash_dedup(records: List[dict], threshold: float = 0.7) -> List[dict]:
    if len(records) <= 1:
        return list(records)
    buckets: Dict[int, List[str]] = {}
    sigs: Dict[str, np.ndarray] = {}
    kept_ids: Set[str] = set()
    out = []
    for r in records:
        sig = mh.signature(r["text"])
        bands = mh.band_hashes(sig)
        sigs[r["id"]] = sig
        candidates: Set[str] = set()
        for b in bands.tolist():
            candidates.update(buckets.get(b, ()))
        hit = any(
            cid in kept_ids and mh.est_jaccard(sig, sigs[cid]) >= threshold
            for cid in candidates
        )
        if hit:
            continue
        for b in bands.tolist():
            buckets.setdefault(b, []).append(r["id"])
        kept_ids.add(r["id"])
        out.append(r)
    return out


def oracle_dedup(records: List[dict]) -> List[dict]:
    return oracle_minhash_dedup(oracle_github_dedup(oracle_url_dedup(records)))


def oracle_process(records: List[dict], topic_keywords: Dict[str, Sequence[str]]) -> List[dict]:
    records = oracle_clean(records)
    records = oracle_tag(records, topic_keywords)
    kept, _ = oracle_filter(records)
    return oracle_dedup(kept)


# ---------------------------------------------------------------------------
# blog crawl (sequential — the reference BlogScraper loop)
# ---------------------------------------------------------------------------


def oracle_blog_crawl(
    pages: Dict[str, dict],
    base_url: str,
    content_selector: str = "article",
    max_pages: int = 50,
    priority_keywords: Sequence[str] = (),
    pagination_pattern: str = "",
) -> List[dict]:
    """Sequential replay of blog_scraper.py:36-143 + _scrape_post."""
    from ai_intel_web_scraper_ray.functions.urls import count_words, record_id
    from ai_intel_web_scraper_ray.pipelines.blogcrawl import (
        looks_like_listing_page,
        looks_like_post_url,
        score_relevance,
    )

    visited = set()
    post_urls: List[str] = []
    queue: deque = deque()
    start = normalize_url(base_url)
    queue.append(start)
    visited.add(start)

    if pagination_pattern:
        for n in range(2, 100):
            queue.append(base_url.rstrip("/") + pagination_pattern.format(page=n))
    else:
        probe = base_url.rstrip("/") + "?paged=2"
        if pages.get(probe, {}).get("status") == 200:
            for n in range(2, 100):
                queue.append(base_url.rstrip("/") + f"?paged={n}")

    pages_checked = 0
    while queue and pages_checked < max_pages * 2:
        url = queue.popleft()
        pages_checked += 1
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        for link in extract_links(page["html"], url):
            norm = normalize_url(link)
            if norm in visited:
                continue
            visited.add(norm)
            if not is_same_domain(norm, base_url):
                continue
            if looks_like_post_url(norm, base_url):
                post_urls.append(norm)
            elif looks_like_listing_page(norm, base_url):
                queue.append(norm)

    post_urls = list(dict.fromkeys(post_urls))

    records: List[dict] = []
    for url in post_urls:
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        title, text = extract_content(page["html"], content_selector, url)
        if not text.strip() or count_words(text) < 50:
            continue
        blob = title + " " + text
        records.append(
            {
                "id": record_id("blog", "blog", url),
                "url": url,
                "title": title,
                "relevance_score": score_relevance(blob, priority_keywords),
            }
        )
        if len(records) >= max_pages:
            break

    records.sort(key=lambda r: r["relevance_score"], reverse=True)
    return records


# ---------------------------------------------------------------------------
# crawl (sequential BFS — the reference _crawl loop)
# ---------------------------------------------------------------------------


def oracle_crawl(
    pages: Dict[str, dict],
    base_url: str,
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 200,
    exclude_patterns: Sequence[str] = (),
) -> Tuple[List[str], Set[str]]:
    """Returns (crawl order of successfully-extracted urls, final seen set).

    ``pages``: url → {status, html}; fetch fails unless status == 200.
    """

    def excluded(url: str) -> bool:
        return any(p in url for p in exclude_patterns)

    visited: Set[str] = set()
    order: List[str] = []
    queue: deque = deque()
    start = normalize_url(base_url)
    queue.append((start, 0))
    visited.add(start)

    while queue and len(order) < max_pages:
        url, depth = queue.popleft()
        if excluded(url):
            continue
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        title, text = extract_content(page["html"], content_selector, url)
        if not text.strip():
            continue
        order.append(url)
        if depth < max_depth:
            for link in extract_links(page["html"], url, content_selector):
                norm = normalize_url(link)
                if norm not in visited and is_same_domain(norm, base_url) and not excluded(norm):
                    visited.add(norm)
                    queue.append((norm, depth + 1))
    return order, visited


def oracle_crawl_lineage(
    pages: Dict[str, dict],
    base_url: str,
    content_selector: str = "article",
    num_shards: int = 4,
    exclude_patterns: Sequence[str] = (),
) -> List[dict]:
    """Per-shard frontier lineage counters from an independent sequential
    walk (no depth cutoff, no page budget): ``offered`` counts every
    admissible link sighting WITH multiplicity, ``seen``/``admitted`` the
    distinct first sightings, ``emitted`` the leases — which a drained,
    unbudgeted, robots-off crawl must equal admitted exactly.  Routing by
    the engine's URL-hash ``shard_of`` (an engine-defined convention with
    no reference twin — the counters, not the routing, are under test)."""
    from ai_intel_web_scraper_ray.state.frontier import shard_of

    def excluded(url: str) -> bool:
        return any(p in url for p in exclude_patterns)

    offered = [0] * num_shards
    admitted = [0] * num_shards
    visited: Set[str] = set()
    queue: deque = deque()
    start = normalize_url(base_url)

    def offer(norm: str) -> None:
        s = shard_of(norm, num_shards)
        offered[s] += 1
        if norm not in visited:
            visited.add(norm)
            admitted[s] += 1
            queue.append(norm)

    offer(start)
    while queue:
        url = queue.popleft()
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        _, text = extract_content(page["html"], content_selector, url)
        if not text.strip():
            continue
        for link in extract_links(page["html"], url, content_selector):
            norm = normalize_url(link)
            if excluded(norm) or not is_same_domain(norm, base_url):
                continue
            offer(norm)
    return [{"shard": s, "offered": offered[s], "seen": admitted[s],
             "admitted": admitted[s], "emitted": admitted[s]}
            for s in range(num_shards)]


def oracle_crawl_robots(
    pages: Dict[str, dict],
    base_url: str,
    robots_texts: Dict[str, str],
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 200,
    exclude_patterns: Sequence[str] = (),
    user_agent: str = "CompetitiveIntel/1.0",
) -> List[dict]:
    """Sequential BFS replay of :func:`oracle_crawl` with robots.txt
    ADMISSION gating (the engine's frontier semantics: a URL is admitted
    iff unseen AND allowed; a disallowed URL is consumed as seen and
    never revisited).  Parsing is stdlib ``urllib.robotparser`` — the
    same grammar the engine's RobotsCache speaks, evaluated here in an
    independent sequential loop.  Returns [{url, depth, title}, ...] in
    crawl order (BFS ⇒ depth is the shortest same-domain distance)."""
    import urllib.robotparser

    from ai_intel_web_scraper_ray.functions.urls import host_of

    parsers: Dict[str, object] = {}

    def allowed(url: str) -> bool:
        host = host_of(url)
        if host not in parsers:
            text = robots_texts.get(host)
            p = None
            if text is not None:
                p = urllib.robotparser.RobotFileParser()
                p.parse(text.splitlines())
            parsers[host] = p
        p = parsers[host]
        return True if p is None else p.can_fetch(user_agent, url)

    def excluded(url: str) -> bool:
        return any(pat in url for pat in exclude_patterns)

    visited: Set[str] = set()
    records: List[dict] = []
    start = normalize_url(base_url)
    queue: deque = deque()
    if allowed(start):
        queue.append((start, 0))
    visited.add(start)

    while queue and len(records) < max_pages:
        url, depth = queue.popleft()
        if excluded(url):
            continue
        page = pages.get(url)
        if page is None or page["status"] != 200:
            continue
        title, text = extract_content(page["html"], content_selector, url)
        if not text.strip():
            continue
        records.append({"url": url, "depth": depth, "title": title})
        if depth < max_depth:
            for link in extract_links(page["html"], url, content_selector):
                norm = normalize_url(link)
                if norm in visited or not is_same_domain(norm, base_url) \
                        or excluded(norm):
                    continue
                visited.add(norm)
                if allowed(norm):
                    queue.append((norm, depth + 1))
    return records
