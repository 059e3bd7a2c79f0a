"""Blog crawl: listing-page discovery + parallel post scrape + relevance sort.

Mirrors the reference blog scraper
(reference: competitive-intel/scrapers/blog_scraper.py:36-173):
- discovery BFS over listing pages with a ``pages_checked < max_pages*2``
  budget; ``?paged=2`` probe auto-detects query-param pagination and
  pre-seeds listing URLs 2..99 (:94-115);
- the reference's quirk order is preserved: a discovered link enters
  ``visited`` BEFORE the same-domain check (:129-135);
- post vs listing classification heuristics (:145-173): slug >5 chars with
  '-', or a 4-digit pattern; /page/ /tags/ /category/ /archive = listing;
- discovered post URLs deduped order-preserving (dict.fromkeys, :143);
- posts scraped until ``max_pages`` records in DISCOVERY order (<50-word
  posts dropped, :188-189) — distributed as over-fetch + truncate-by-order;
- relevance = fraction of priority keywords present (substring, lowercase,
  :217-223); final stable sort by relevance desc (ties keep discovery
  order, :76).

Discovery is inherently sequential-ish (listing budget in pop order) but
each round's fetches run in parallel; the post scrape phase — the bulk of
the work — is fully parallel.
"""

from __future__ import annotations

import re
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import ray

from ..functions.htmlx import extract_content, extract_links
from ..functions.urls import (
    count_words,
    extract_date_from_text,
    is_same_domain,
    normalize_url,
    record_id,
)


def looks_like_post_url(url: str, base_url: str) -> bool:
    path = url.replace(base_url.rstrip("/"), "")
    if not path or path == "/":
        return False
    if any(seg in path.lower() for seg in ["/tags/", "/category/", "/page/"]):
        return False
    segments = [s for s in path.split("/") if s]
    if len(segments) >= 1:
        slug = segments[-1]
        if len(slug) > 5 and "-" in slug:
            return True
        if re.search(r"\d{4}", path):
            return True
    return len(segments) >= 1


def looks_like_listing_page(url: str, base_url: str) -> bool:
    path = url.replace(base_url.rstrip("/"), "")
    if not path or path == "/":
        return False
    return any(seg in path.lower() for seg in ["/page/", "/tags/", "/category/", "/archive"])


def score_relevance(text: str, keywords: Sequence[str]) -> float:
    if not keywords:
        return 0.0
    lower = text.lower()
    return sum(1 for kw in keywords if kw.lower() in lower) / len(keywords)


@ray.remote
def _fetch_page_chunk(pages: Dict[str, dict], urls: List[str]) -> List[Optional[str]]:
    """status==200 → html, else None; order preserved."""
    out = []
    for u in urls:
        p = pages.get(u)
        out.append(p["html"] if p and p.get("status") == 200 else None)
    return out


@ray.remote
def _scrape_post_chunk(
    pages: Dict[str, dict], urls: List[str], content_selector: str,
    priority_keywords: List[str], origin: str,
) -> List[Optional[dict]]:
    out: List[Optional[dict]] = []
    for url in urls:
        p = pages.get(url)
        if not p or p.get("status") != 200:
            out.append(None)
            continue
        title, text = extract_content(p["html"], content_selector, url)
        if not text.strip() or count_words(text) < 50:
            out.append(None)
            continue
        blob = title + " " + text
        out.append(
            {
                "id": record_id(origin, "blog", url),
                "url": url,
                "title": title,
                "text": text,
                "word_count": count_words(text),
                "content_date": extract_date_from_text(text),
                "relevance_score": score_relevance(blob, priority_keywords),
                "priority_keywords_matched": [
                    kw for kw in priority_keywords if kw.lower() in blob.lower()
                ],
            }
        )
    return out


def blog_crawl(
    pages: List[dict],
    base_url: str,
    content_selector: str = "article",
    max_pages: int = 50,
    priority_keywords: Sequence[str] = (),
    pagination_pattern: str = "",
    origin: str = "blog",
    chunk_size: int = 16,
) -> List[dict]:
    """Returns scraped blog post records, relevance-sorted desc (stable)."""
    pages_by_url = {p["url"]: {"status": p["status"], "html": p["html"]} for p in pages}
    pages_ref = ray.put(pages_by_url)

    # -- discovery (listing BFS, budget in pop order) ---------------------
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
        if pages_by_url.get(probe, {}).get("status") == 200:
            for n in range(2, 100):
                queue.append(base_url.rstrip("/") + f"?paged={n}")

    pages_checked = 0
    budget = max_pages * 2
    while queue and pages_checked < budget:
        # fetch the next round in parallel, then replay in pop order
        round_urls = []
        while queue and len(round_urls) < chunk_size and pages_checked + len(round_urls) < budget:
            round_urls.append(queue.popleft())
        htmls = ray.get(_fetch_page_chunk.remote(pages_ref, round_urls))
        for url, html in zip(round_urls, htmls):
            pages_checked += 1
            if html is None:
                continue
            for link in extract_links(html, url):
                norm = normalize_url(link)
                if norm in visited:
                    continue
                visited.add(norm)  # reference quirk: before the domain check
                if not is_same_domain(norm, base_url):
                    continue
                if looks_like_post_url(norm, base_url):
                    post_urls.append(norm)
                elif looks_like_listing_page(norm, base_url):
                    queue.append(norm)

    post_urls = list(dict.fromkeys(post_urls))

    # -- parallel post scrape, truncate by discovery order ----------------
    futures = [
        _scrape_post_chunk.remote(pages_ref, post_urls[i : i + chunk_size],
                                  content_selector, list(priority_keywords), origin)
        for i in range(0, len(post_urls), chunk_size)
    ]
    records: List[dict] = []
    for chunk in ray.get(futures):
        for rec in chunk:
            if rec is not None and len(records) < max_pages:
                records.append(rec)
        if len(records) >= max_pages:
            break

    records.sort(key=lambda r: r["relevance_score"], reverse=True)  # stable
    return records
