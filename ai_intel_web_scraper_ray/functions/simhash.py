"""SimHash (64-bit) document fingerprints for near-dup detection.

Training-data-pipeline addition (the reference only has MinHash dedup).
Charikar's SimHash over word features: each word hashed to 64 bits with the
same deterministic polars hasher used for MinHash shingles; bitwise
majority-vote weighted by term frequency; Hamming distance ≤ k = near-dup.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import numpy as np
import polars as pl

_SEED = 7


def simhash(text: str) -> int:
    words = text.lower().split()
    if not words:
        return 0
    counts = Counter(words)
    uniq = list(counts.keys())
    hashes = pl.Series(uniq).hash(seed=_SEED).to_numpy().astype(np.uint64)
    weights = np.fromiter((counts[w] for w in uniq), dtype=np.int64, count=len(uniq))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if acc[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return int(out)


def simhash_batch(texts: Sequence[str]) -> np.ndarray:
    return np.fromiter((simhash(t) for t in texts), dtype=np.uint64, count=len(texts))


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
