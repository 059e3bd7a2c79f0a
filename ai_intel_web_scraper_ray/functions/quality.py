"""Quality-filter predicates.

Semantics mirror the reference quality filter
(reference: competitive-intel/processors/quality_filter.py:17-138):
- too_short: word_count < min_word_count (default 100)
- no_topics: untagged (empty or ["unclassified"]) unless source_type is
  exempt ({"benchmark", "github_release"})
- mostly_code: official_docs whose fenced-code char ratio > 0.85
- boilerplate: ≥3 of 6 boilerplate phrases, or <50 words of which >30% are
  link-words (startswith http or /)

Also provides a continuous quality *score* (length / punctuation / stopword
ratios) for the large-scale training-data path; the score formula is kept
SQL-expressible so the DuckDB oracle can verify it.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

TOPIC_EXEMPT_TYPES = {"benchmark", "github_release"}

BOILERPLATE_PHRASES = [
    "skip to content",
    "table of contents",
    "cookie policy",
    "privacy policy",
    "terms of service",
    "subscribe to newsletter",
]

_CODE_FENCE = re.compile(r"```[\s\S]*?```")


def code_ratio(text: str) -> float:
    blocks = _CODE_FENCE.findall(text)
    if not blocks or not text:
        return 0.0
    return sum(len(b) for b in blocks) / len(text)


def is_boilerplate(text: str) -> bool:
    lower = text.lower()
    hits = sum(1 for p in BOILERPLATE_PHRASES if p in lower)
    if hits >= 3:
        return True
    words = text.split()
    if len(words) < 50:
        link_words = sum(1 for w in words if w.startswith("http") or w.startswith("/"))
        if link_words > len(words) * 0.3:
            return True
    return False


def removal_reason(
    word_count: int,
    topics: Optional[Sequence[str]],
    source_type: str,
    text: str,
    min_word_count: int = 100,
    max_code_ratio: float = 0.85,
    require_topics: bool = True,
) -> str:
    """'' = keep; otherwise the removal reason (first matching rule wins,
    in the reference's check order)."""
    if word_count < min_word_count:
        return "too_short"
    if require_topics and source_type not in TOPIC_EXEMPT_TYPES:
        if not topics or list(topics) == ["unclassified"]:
            return "no_topics"
    if source_type == "official_docs" and code_ratio(text) > max_code_ratio:
        return "mostly_code"
    if is_boilerplate(text):
        return "boilerplate"
    return ""


# ---------------------------------------------------------------------------
# Continuous quality scoring for training-data curation (SQL-expressible).
# ---------------------------------------------------------------------------

# Keep in sync with the oracle SQL in __ray_entry__.py (ASCII classes only).
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for"]
_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_PUNCT_RE = re.compile(r"[^A-Za-z0-9_\s]")


def quality_features(text: str) -> dict:
    """n_words, n_punct, stopword hits, mean word length — all exact counts
    reproducible in DuckDB SQL."""
    words = _WORD_RE.findall(text)
    n_words = len(words)
    n_punct = len(_PUNCT_RE.findall(text))
    lower = text.lower()
    stop_hits = 0
    for sw in QUALITY_STOPWORDS:
        stop_hits += len(re.findall(r"\b" + sw + r"\b", lower))
    total_chars = sum(len(w) for w in words)
    return {
        "n_words": n_words,
        "n_punct": n_punct,
        "stop_hits": stop_hits,
        "mean_word_len": (total_chars / n_words) if n_words else 0.0,
        "stop_ratio": (stop_hits / n_words) if n_words else 0.0,
        "punct_ratio": (n_punct / n_words) if n_words else 0.0,
    }
