"""Independent source of truth for the keyword banks the generated oracle
SQL imports from the implementation (ADVICE r1: without this, drift in the
implementation lists would silently pass the driver gate, because oracle and
engine would drift together).

- Sentiment signals are TRANSCRIBED from the reference
  (competitive-intel/scrapers/community_scraper.py:298-308) — they must
  match the reference verbatim.
- The langid stopword bank and the default topic bank are engine-defined
  (the reference loads topic keywords from an external config/keywords.json,
  tagging.py:83) — their pinned copies here freeze the behavior the oracle
  was validated against.
"""

from __future__ import annotations

REFERENCE_NEGATIVE_SIGNALS = [
    "problem", "issue", "bug", "broken", "crash", "slow",
    "limitation", "missing", "doesn't support", "can't",
    "disappointing", "frustrating", "worse", "awful",
    "not production", "not ready", "unstable",
]
REFERENCE_POSITIVE_SIGNALS = [
    "fast", "great", "excellent", "love", "amazing",
    "impressed", "recommend", "solid", "reliable",
    "production ready", "best", "performant",
]

PINNED_LANG_STOPWORDS = [
    ("en", ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it"]),
    ("de", ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"]),
    ("fr", ["le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"]),
    ("es", ["el", "los", "las", "es", "no", "por", "para", "una", "con", "del"]),
    ("zh", ["de", "shi", "bu", "le", "wo", "zai", "you", "he", "ren", "zhe"]),
]

PINNED_TOPIC_KEYWORDS = {
    "query_processing": ["query", "scan", "filter", "join", "group by", "order by"],
    "storage": ["table", "column", "row", "part", "batch", "merge"],
    "performance": ["fast", "slow", "big", "small", "hash join", "window"],
    "streaming": ["window", "stream", "event", "late data", "watermark"],
    "distributed": ["spark", "shuffle", "partition", "cluster", "worker node"],
}


def test_sentiment_signals_match_reference_transcription():
    from ai_intel_web_scraper_ray.functions.sentiment import (
        NEGATIVE_SIGNALS,
        POSITIVE_SIGNALS,
    )

    assert NEGATIVE_SIGNALS == REFERENCE_NEGATIVE_SIGNALS
    assert POSITIVE_SIGNALS == REFERENCE_POSITIVE_SIGNALS


def test_langid_stopwords_pinned():
    from ai_intel_web_scraper_ray.functions.langid import LANG_STOPWORDS

    assert LANG_STOPWORDS == PINNED_LANG_STOPWORDS


def test_topic_keywords_pinned():
    from ai_intel_web_scraper_ray.functions.tagging import DEFAULT_TOPIC_KEYWORDS

    assert DEFAULT_TOPIC_KEYWORDS == PINNED_TOPIC_KEYWORDS


PINNED_RAKE_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "that", "are", "was",
    "or", "from", "but", "not", "have", "has", "had", "we", "you", "they",
]


def test_rake_stoplist_matches_pinned_transcription():
    """The oracle SQL carries the stoplist as literals; this pinned copy
    keeps implementation drift from slipping past the gate unnoticed."""
    from ai_intel_web_scraper_ray.pipelines.docqueries import _RAKE_STOPWORDS

    assert _RAKE_STOPWORDS == frozenset(PINNED_RAKE_STOPWORDS)
    assert len(PINNED_RAKE_STOPWORDS) == 30
