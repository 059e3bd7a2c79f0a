"""Keyword sentiment estimation.

Semantics mirror the reference community scraper's estimator
(reference: competitive-intel/scrapers/community_scraper.py:294-319):
substring counts of fixed negative/positive signal lists over the lowercased
text; NEGATIVE if neg > pos+1, POSITIVE if pos > neg+1, MIXED if both > 0,
else NEUTRAL.
"""

from __future__ import annotations

NEGATIVE_SIGNALS = [
    "problem", "issue", "bug", "broken", "crash", "slow",
    "limitation", "missing", "doesn't support", "can't",
    "disappointing", "frustrating", "worse", "awful",
    "not production", "not ready", "unstable",
]
POSITIVE_SIGNALS = [
    "fast", "great", "excellent", "love", "amazing",
    "impressed", "recommend", "solid", "reliable",
    "production ready", "best", "performant",
]


def estimate_sentiment(text: str) -> str:
    lower = text.lower()
    neg = sum(1 for s in NEGATIVE_SIGNALS if s in lower)
    pos = sum(1 for s in POSITIVE_SIGNALS if s in lower)
    if neg > pos + 1:
        return "negative"
    if pos > neg + 1:
        return "positive"
    if neg > 0 and pos > 0:
        return "mixed"
    return "neutral"
