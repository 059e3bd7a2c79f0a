"""URL canonicalization and predicates.

Semantics mirror the reference scraper utilities
(reference: competitive-intel/scrapers/utils.py:88-117, 249-257, 260-276):
- canonical form drops fragment AND query string, strips the trailing slash
  except for the root path, resolves relative URLs against a base;
- same-domain = netloc equality;
- html-ness = an extension blocklist on the lowercased path;
- record ids are ``{origin}-{source_type}-{sha256(url)[:12]}``.

The canonical URL is the frontier's partition key: shard = hash(canonical) % P.
"""

from __future__ import annotations

import hashlib
import re
from datetime import date
from typing import Optional
from urllib.parse import urljoin, urlparse, urlunparse

NON_HTML_EXTENSIONS = (
    ".pdf", ".png", ".jpg", ".jpeg", ".gif", ".svg", ".ico",
    ".zip", ".tar", ".gz", ".mp4", ".mp3", ".css", ".js",
    ".woff", ".woff2", ".ttf", ".eot", ".xml", ".json",
)


# already-canonical absolute http(s) URL with a plain path: no query, no
# fragment, no params, no trailing slash (except bare root, handled below),
# and no tab/CR/LF anywhere (urlsplit STRIPS those per the URL spec, so a
# URL containing them is never canonical; \Z not $ — $ matches before a
# trailing newline).  Matching this proves normalize_url would return the
# input unchanged, so the urlparse round trip (≈25 µs) is skipped — on a
# 72k-URL seed list the fast path turns seconds of driver-side
# canonicalization into ~0.1 s.
_CANONICAL_RE = re.compile(
    r"\Ahttps?://[^/?#\t\r\n]+(?:/[^?#;\t\r\n]*[^/?#;\t\r\n])?\Z")


def normalize_url(url: str, base_url: Optional[str] = None) -> str:
    """Canonicalize a URL: resolve, drop fragment + query, strip trailing /."""
    if base_url:
        url = urljoin(base_url, url)
    if _CANONICAL_RE.match(url):
        return url
    p = urlparse(url)
    path = p.path.rstrip("/") if p.path != "/" else "/"
    return urlunparse((p.scheme, p.netloc, path, p.params, "", ""))


def is_same_domain(url: str, base_url: str) -> bool:
    return urlparse(url).netloc == urlparse(base_url).netloc


def is_html_url(url: str) -> bool:
    path = urlparse(url).path.lower()
    return not path.endswith(NON_HTML_EXTENSIONS)


def url_dedup_key(url: str) -> str:
    """Exact-dedup key (reference: processors/deduplicator.py:77)."""
    return url.rstrip("/").lower()


def record_id(origin: str, source_type: str, url: str) -> str:
    h = hashlib.sha256(url.encode()).hexdigest()[:12]
    return f"{origin}-{source_type}-{h}"


def frontier_shard(canonical_url: str, num_shards: int) -> int:
    """Stable shard assignment for the URL frontier (sha256-based, not
    Python ``hash`` which is seed-randomized)."""
    digest = hashlib.sha256(canonical_url.encode()).digest()
    return int.from_bytes(digest[:8], "big") % num_shards


def host_of(url: str) -> str:
    """netloc of the URL; absolute http(s)-style URLs take a split fast
    path (identical result to urlparse — pinned by a property test),
    because the crawl runs this once per seed and per discovered link."""
    if url.startswith(("http://", "https://")):
        rest = url[url.find("://") + 3:]
        cut = len(rest)
        for c in ("/", "?", "#"):
            j = rest.find(c)
            if j != -1 and j < cut:
                cut = j
        host = rest[:cut]
        # bracketed (IPv6) hosts go through urlparse, which also VALIDATES
        # them (raising on malformed input, same as before the fast path);
        # tab/CR/LF anywhere defers to urlparse, which strips them
        if ("[" not in host and "]" not in host
                and "\t" not in url and "\r" not in url and "\n" not in url):
            return host
    return urlparse(url).netloc


def count_words(text: str) -> int:
    return len(text.split())


_DATE_PATTERNS = [
    re.compile(r"(\d{4}-\d{2}-\d{2})"),
    re.compile(r"(\w+ \d{1,2},? \d{4})"),
    re.compile(r"(\d{1,2} \w+ \d{4})"),
]

_MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jun": 6, "jul": 7,
    "aug": 8, "sep": 9, "sept": 9, "oct": 10, "nov": 11, "dec": 12,
}


def _parse_date_str(s: str) -> Optional[date]:
    """Tiny dateutil replacement for the three formats we match."""
    s = s.strip().replace(",", "")
    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", s)
    if m:
        try:
            return date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        except ValueError:
            return None
    m = re.fullmatch(r"(\w+) (\d{1,2}) (\d{4})", s)
    if m and m.group(1).lower() in _MONTHS:
        try:
            return date(int(m.group(3)), _MONTHS[m.group(1).lower()], int(m.group(2)))
        except ValueError:
            return None
    m = re.fullmatch(r"(\d{1,2}) (\w+) (\d{4})", s)
    if m and m.group(2).lower() in _MONTHS:
        try:
            return date(int(m.group(3)), _MONTHS[m.group(2).lower()], int(m.group(1)))
        except ValueError:
            return None
    return None


def extract_date_from_text(text: str) -> Optional[date]:
    """First date-looking string in the leading 500 chars, parsed with
    dateutil's permissive parser exactly as the reference does
    (reference: scrapers/utils.py:260-276); the explicit three-format
    parser above is the fallback when dateutil is absent."""
    head = text[:500]
    for pat in _DATE_PATTERNS:
        m = pat.search(head)
        if m:
            try:
                from dateutil.parser import parse as _dateparse

                return _dateparse(m.group(1)).date()
            except ImportError:
                d = _parse_date_str(m.group(1))
                if d:
                    return d
            except ValueError:
                pass
    return None
