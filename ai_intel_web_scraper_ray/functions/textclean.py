"""Content cleaning: boilerplate strip + structure-preserving whitespace
normalization.

Semantics mirror the reference content extractor
(reference: competitive-intel/processors/content_extractor.py:22-105):
four strip regexes (cookie banners, newsletter CTAs, social-share lines,
copyright lines), whitespace normalization that preserves code fences,
markdown headings, tables and list items, collapse of 3+ blank lines, and a
recomputed word count.

Module-level compiled regexes: zero per-batch setup cost, usable from plain
(non-actor) map_batches tasks.
"""

from __future__ import annotations

import re
from typing import List, Tuple

STRIP_PATTERNS = [
    re.compile(
        r"(we use cookies|cookie policy|accept all cookies|manage preferences).*?\.",
        re.IGNORECASE | re.DOTALL,
    ),
    re.compile(
        r"(subscribe to|sign up for|join our|get the latest).*?(newsletter|updates|news).*?\.",
        re.IGNORECASE | re.DOTALL,
    ),
    re.compile(
        r"(share on|follow us on|tweet this|share this).*?(twitter|linkedin|facebook|x\.com).*?\n",
        re.IGNORECASE,
    ),
    re.compile(
        r"©\s*\d{4}.*?(all rights reserved|inc\.|ltd\.|corp\.).*?\n",
        re.IGNORECASE,
    ),
]

_CODE_FENCE_SPLIT = re.compile(r"(```[\s\S]*?```)")
_BLANK_RUN = re.compile(r"\n{3,}")
_MULTI_SPACE = re.compile(r"  +")
_LIST_PREFIXES = ("-", "*", "1.", "2.", "3.")


def _normalize_whitespace(text: str) -> str:
    parts = _CODE_FENCE_SPLIT.split(text)
    out: List[str] = []
    for part in parts:
        if part.startswith("```"):
            out.append(part)
            continue
        lines = []
        for line in part.split("\n"):
            stripped = line.strip()
            if stripped.startswith("#") or stripped.startswith("|") or stripped.startswith(_LIST_PREFIXES):
                lines.append(line)
            else:
                lines.append(_MULTI_SPACE.sub(" ", line))
        out.append("\n".join(lines))
    return "".join(out)


def clean_text(text: str) -> Tuple[str, int]:
    """Clean one document; returns (cleaned_text, word_count)."""
    for pat in STRIP_PATTERNS:
        text = pat.sub("", text)
    text = _normalize_whitespace(text)
    text = _BLANK_RUN.sub("\n\n", text)
    text = text.strip()
    return text, len(text.split())
