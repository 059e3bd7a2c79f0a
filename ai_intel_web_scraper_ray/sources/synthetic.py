"""Deterministic synthetic corpus generators (seeded, no wall clock).

The crawl bench and the conformance tests both consume the web graph built
here (FIXTURES.md §2): multi-host, hot-host skew, deterministic HTML that
exercises the extractor (code fences, tables, headings, lists, boilerplate
removal) and the canonicalizer (fragment/query/extension/cross-domain
links), plus 404/500/429 sprinkling and exclude-pattern targets.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey".split()
)


def sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def page_html(url: str, title: str, body_paras: List[str], links: List[str],
              selector_variant: int, include_noise: bool = True) -> str:
    anchors = "\n".join(f'<a href="{l}">link {j}</a>' for j, l in enumerate(links))
    paras = "\n".join(f"<p>{p}</p>" for p in body_paras)
    noise = (
        '<nav><a href="/nav-only">nav link</a>Navigation menu</nav>'
        '<header>Site header</header>'
        '<div class="cookie-banner">We use cookies. Accept all cookies.</div>'
        '<aside>side bar text</aside>'
    ) if include_noise else ""
    code = '<pre class="language-sql">SELECT fast FROM tbl</pre>'
    table = "<table><tr><th>db</th><th>speed</th></tr><tr><td>acme</td><td>fast</td></tr></table>"
    heading = "<h2>Section one</h2>"
    content = f"{heading}{paras}{code}{table}<ul><li>item one</li><li>item two</li></ul>{anchors}"
    if selector_variant == 0:
        area = f"<article>{content}</article>"
    elif selector_variant == 1:
        area = f"<main>{content}</main>"
    else:
        area = f'<div class="content">{content}</div>'
    footer = "<footer>Footer stuff</footer>" if include_noise else ""
    return f"<html><head><title>{title}</title></head><body>{noise}{area}{footer}</body></html>"


def make_web_graph(
    seed: int = 42,
    hosts: Optional[List[str]] = None,
    pages_per_host: Optional[Dict[int, int]] = None,
    para_words: int = 60,
    error_sprinkle: bool = True,
) -> List[dict]:
    """Web graph rows {url, host, status, html, out_links, latency_ms}.
    Host 0 is the hot host (more pages, higher latency)."""
    rng = random.Random(seed)
    hosts = hosts or ["docs.hot.example", "docs.cold1.example", "docs.cold2.example"]
    pages_per_host = pages_per_host or {0: 40, 1: 20, 2: 20}
    nhosts = len(hosts)
    pages: List[dict] = []

    for hi, host in enumerate(hosts):
        n = pages_per_host.get(hi, 20)
        for p in range(n):
            url = f"https://{host}/p{p}"
            links: List[str] = []
            for child in (p * 2 + 1, p * 2 + 2, p + 7):
                if child < n:
                    links.append(f"/p{child}")
            if p % 3 == 0 and n > 1:
                links.append(f"/p{rng.randrange(n)}#frag")
                links.append(f"/p{rng.randrange(n)}?utm=x")
            links.append(f"/p{p}")
            links.append("/assets/logo.png")
            links.append(f"https://{hosts[(hi + 1) % nhosts]}/p0")
            if p % 5 == 4:
                links.append("/excluded/skipme")
            status = 200
            if error_sprinkle:
                if p % 11 == 9:
                    status = 404
                elif p % 13 == 12:
                    status = 500
                elif p % 17 == 16:
                    status = 429
            body = [
                f"The fast query engine on {host} page {p} joins each table. " * 6,
                sentence(rng, para_words),
            ]
            html = page_html(url, f"{host} page {p}", body, links, selector_variant=p % 3)
            pages.append(
                {
                    "url": url,
                    "host": host,
                    "status": status,
                    "html": html,
                    "out_links": links,
                    "latency_ms": 5 + (40 if hi == 0 else 10) + rng.randrange(10),
                }
            )
    pages.append({
        "url": f"https://{hosts[0]}/excluded/skipme", "host": hosts[0], "status": 200,
        "html": page_html("x", "excluded", ["body"], [], 0),
        "out_links": [], "latency_ms": 5,
    })
    return pages


def make_blog_graph(seed: int = 42, n_listing_pages: int = 4,
                    posts_per_listing: int = 6) -> List[dict]:
    """Blog site fixture: /blog listing with ?paged=2..N pagination, post
    pages with slugs (some <50 words, some keyword-rich), category listing
    pages, date-pattern posts — exercises the blog scraper heuristics
    (reference blog_scraper.py:145-173)."""
    rng = random.Random(seed)
    host = "blog.example"
    base = f"https://{host}/blog"
    pages: List[dict] = []

    def listing_html(page_no: int) -> str:
        links = []
        for j in range(posts_per_listing):
            links.append(f"/blog/fast-query-post-{page_no}-{j}")
        links.append("/blog/2024-year-review")       # date-pattern post
        links.append("/blog/category/engineering")   # listing-like
        links.append(f"/blog?paged={page_no + 1}")   # next page (query param → dropped by canonicalizer)
        links.append("/blog/tiny-post-x")            # short post
        body = [sentence(rng, 30)]
        return page_html(f"{base}?paged={page_no}", f"Blog page {page_no}", body, links, 0)

    # listing pages: base + ?paged=2..n (query-string URLs — fetched raw)
    pages.append({"url": base, "host": host, "status": 200,
                  "html": listing_html(1), "out_links": [], "latency_ms": 5})
    for n in range(2, n_listing_pages + 1):
        pages.append({"url": f"{base}?paged={n}", "host": host, "status": 200,
                      "html": listing_html(n), "out_links": [], "latency_ms": 5})
    # category listing discovered via links
    cat_links = [f"/blog/deep-dive-cat-{j}" for j in range(3)]
    pages.append({"url": f"{base}/category/engineering", "host": host, "status": 200,
                  "html": page_html("x", "Category", [sentence(rng, 20)], cat_links, 0),
                  "out_links": [], "latency_ms": 5})

    def post_html(title: str, rich: bool, long: bool) -> str:
        kw = "benchmark throughput fast query " if rich else ""
        if not long:
            # genuinely below the 50-word floor even with page furniture
            return (f"<html><head><title>{title}</title></head><body>"
                    f"<article><p>{sentence(rng, 8)}</p></article></body></html>")
        body = [kw + sentence(rng, 120) + " Posted 2024-03-15", sentence(rng, 80)]
        return page_html("x", title, body, ["/blog"], 0)

    for n in range(1, n_listing_pages + 1):
        for j in range(posts_per_listing):
            pages.append({
                "url": f"{base}/fast-query-post-{n}-{j}", "host": host, "status": 200,
                "html": post_html(f"Fast query post {n}-{j}", rich=(j % 2 == 0), long=True),
                "out_links": [], "latency_ms": 5,
            })
    pages.append({"url": f"{base}/2024-year-review", "host": host, "status": 200,
                  "html": post_html("2024 year review", rich=True, long=True),
                  "out_links": [], "latency_ms": 5})
    for j in range(3):
        pages.append({"url": f"{base}/deep-dive-cat-{j}", "host": host, "status": 200,
                      "html": post_html(f"Deep dive {j}", rich=False, long=True),
                      "out_links": [], "latency_ms": 5})
    pages.append({"url": f"{base}/tiny-post-x", "host": host, "status": 200,
                  "html": post_html("Tiny", rich=False, long=False),
                  "out_links": [], "latency_ms": 5})
    return pages


def make_bench_web_graph(n_pages: int = 20000, seed: int = 42,
                         paras_per_page: int = 200) -> List[dict]:
    """Larger graph for throughput benchmarking: one hot host with 50% of
    pages + 8 cold hosts, all status 200, branching factor ~3.

    Pages are structurally realistic (~200 elements, ~20 KB) — extraction
    cost is per-element, so element-rich pages are what make the fetch+
    extract stage compute-bound like a real crawl.  Paragraphs come from a
    pre-wrapped pool so graph construction stays O(n_pages) string joins."""
    rng = random.Random(seed)
    pool = [f"<p>{sentence(rng, 15)}</p>" for _ in range(512)]
    hosts = ["hot.bench.example"] + [f"cold{i}.bench.example" for i in range(8)]
    per_host = {0: n_pages // 2}
    rest = n_pages - per_host[0]
    for i in range(1, 9):
        per_host[i] = rest // 8

    noise = (
        '<nav><a href="/nav-only">nav link</a>Navigation menu</nav>'
        '<header>Site header</header>'
        '<div class="cookie-banner">We use cookies. Accept all cookies.</div>'
    )
    code = '<pre class="language-sql">SELECT fast FROM tbl</pre>'
    table = "<table><tr><th>db</th><th>speed</th></tr><tr><td>acme</td><td>fast</td></tr></table>"
    pages: List[dict] = []
    for hi, host in enumerate(hosts):
        n = per_host.get(hi, 0)
        for p in range(n):
            url = f"https://{host}/p{p}"
            links = [f"/p{c}" for c in (p * 2 + 1, p * 2 + 2, p + 7) if c < n]
            anchors = "".join(f'<a href="{l}">l</a>' for l in links)
            start = (p * 37) % (512 - paras_per_page) if paras_per_page < 512 else 0
            paras = "".join(pool[start : start + paras_per_page])
            html = (
                f"<html><head><title>{host} page {p}</title></head><body>{noise}"
                f"<article><h2>Section one</h2>{paras}{code}{table}{anchors}</article>"
                f"<footer>Footer stuff</footer></body></html>"
            )
            pages.append({"url": url, "host": host, "status": 200, "html": html,
                          "out_links": links, "latency_ms": 5})
    return pages
