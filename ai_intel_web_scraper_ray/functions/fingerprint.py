"""Rolling-hash document fingerprinting (winnowing).

Training-data-pipeline addition: k-gram character rolling hashes (Karp-Rabin)
with winnowing window selection (Schleimer et al., SIGMOD'03 — public
algorithm).  Produces a compact set of position-independent fingerprints per
document; overlap of fingerprint sets approximates content overlap.
"""

from __future__ import annotations

from typing import List

_BASE = 1000003
_MOD = (1 << 61) - 1
K_DEFAULT = 16
WINDOW_DEFAULT = 8


def rolling_hashes(text: str, k: int = K_DEFAULT) -> List[int]:
    n = len(text)
    if n < k:
        return []
    h = 0
    pow_k = pow(_BASE, k - 1, _MOD)
    out = []
    for i, ch in enumerate(text):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= k - 1:
            out.append(h)
            h = (h - ord(text[i - k + 1]) * pow_k) % _MOD
    return out


def winnow(hashes: List[int], window: int = WINDOW_DEFAULT) -> List[int]:
    """Min-hash per sliding window, deduped consecutively (rightmost min)."""
    if not hashes:
        return []
    if len(hashes) <= window:
        return [min(hashes)]
    out = []
    prev = None
    for i in range(len(hashes) - window + 1):
        w = hashes[i : i + window]
        m = min(w)
        # rightmost occurrence of the min
        idx = i + max(j for j, v in enumerate(w) if v == m)
        if prev != (m, idx):
            out.append(m)
            prev = (m, idx)
    return out


def fingerprint(text: str, k: int = K_DEFAULT, window: int = WINDOW_DEFAULT) -> List[int]:
    return winnow(rolling_hashes(text, k), window)
