"""Deterministic offline tokenizer.

The reference counts tokens with tiktoken's ``text-embedding-3-small`` vocab
(reference: competitive-intel/vectorstore/chunker.py:30-41). tiktoken is not
available in this environment, so we pin an explicit, reproducible regex
tokenizer: word runs + single punctuation marks, whitespace skipped.  The same
tokenizer drives the engine AND the conformance oracle AND the DuckDB oracle
SQL (the pattern is RE2-compatible: no lookaheads), so chunk boundaries and
token counts agree everywhere.

``encode_spans`` returns (start, end) character offsets so a hard token-slice
split can reconstruct exact substrings of the original text (the analogue of
tiktoken encode→slice→decode in chunker.py:571-588).
"""

from __future__ import annotations

import re
from typing import List, Tuple

# RE2-safe (used verbatim in DuckDB oracle SQL as well).
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


def count_tokens(text: str) -> int:
    return sum(1 for _ in _TOKEN_RE.finditer(text))


def encode_spans(text: str) -> List[Tuple[int, int]]:
    """Token boundaries as character spans into ``text``."""
    return [m.span() for m in _TOKEN_RE.finditer(text)]


def slice_by_tokens(text: str, spans: List[Tuple[int, int]], start_tok: int, end_tok: int) -> str:
    """Substring covering tokens [start_tok, end_tok) including interior gaps."""
    if start_tok >= len(spans) or start_tok >= end_tok:
        return ""
    end_tok = min(end_tok, len(spans))
    return text[spans[start_tok][0] : spans[end_tok - 1][1]]


def count_whitespace_tokens(text: str) -> int:
    """Plain whitespace token count (reference: scrapers/utils.py:255-257)."""
    return len(text.split())
