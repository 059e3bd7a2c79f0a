"""Heuristic language identification (stopword n-gram scoring).

A training-data-pipeline addition beyond the reference's operator set (the
reference never classifies language).  Score per language = number of matches
of that language's stopword alternation (word-bounded, lowercased); prediction
= argmax with deterministic tiebreak by language order, "und" if no hits.

The stopword lists and the scoring rule are deliberately SQL-expressible so
the DuckDB oracle can verify the operator exactly.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

# Order matters: deterministic argmax tiebreak.
LANG_STOPWORDS: List[Tuple[str, List[str]]] = [
    ("en", ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it"]),
    ("de", ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"]),
    ("fr", ["le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"]),
    ("es", ["el", "los", "las", "es", "no", "por", "para", "una", "con", "del"]),
    ("zh", ["de", "shi", "bu", "le", "wo", "zai", "you", "he", "ren", "zhe"]),
]

_COMPILED = [
    (lang, re.compile(r"\b(?:" + "|".join(words) + r")\b"))
    for lang, words in LANG_STOPWORDS
]


def lang_scores(text: str) -> Dict[str, int]:
    lower = text.lower()
    return {lang: len(pat.findall(lower)) for lang, pat in _COMPILED}


def detect_lang(text: str) -> str:
    scores = lang_scores(text)
    best_lang, best = "und", 0
    for lang, _ in LANG_STOPWORDS:  # fixed order => deterministic tiebreak
        if scores[lang] > best:
            best_lang, best = lang, scores[lang]
    return best_lang
