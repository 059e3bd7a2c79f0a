"""Vectorized fixed-size Bloom filter for broadcast semi-joins.

The 100-TB join pattern this enables: instead of shipping the small side's
KEYSET to every probe task (O(|keys|) driver memory and serialization), each
small-side block emits a fixed-size bitmap partial, the driver ORs ≤ blocks
bitmaps (bitmaps OR losslessly — the reason this is a *mergeable* filter,
unlike a cuckoo filter), and one `ray.put` broadcasts the result.  Probe
tasks drop most non-matching rows vectorized; an exact join over the
survivors removes the false positives, so results stay exact.

Complements `state/seenset.py`'s CuckooFilter (mutable membership with
deletes, used by the crawl frontier); this one is immutable-after-build and
exists for its O(1) merge + broadcast shape.
"""

from __future__ import annotations

import numpy as np

# 2^20 bits = 128 KiB per bitmap; with 4 probes the false-positive rate at
# 10^5 keys is ~(1 - e^(-4*1e5/2^20))^4 ≈ 0.9% — small enough that the
# exact verify join sees barely more than the true matches
_M_BITS = 1 << 20
_N_PROBES = 4
_MUL1 = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 / golden-ratio constants
_MUL2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _positions(keys: np.ndarray) -> np.ndarray:
    """(n, _N_PROBES) int64 bit positions via double hashing."""
    k = keys.astype(np.uint64)
    h1 = (k * _MUL1) >> np.uint64(16)
    h2 = ((k * _MUL2) >> np.uint64(16)) | np.uint64(1)  # odd stride
    i = np.arange(_N_PROBES, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(_M_BITS)).astype(np.int64)


def bloom_partial(keys: np.ndarray) -> bytes:
    """One block's keys → a fixed 128 KiB bitmap (OR-mergeable)."""
    bitmap = np.zeros(_M_BITS >> 3, dtype=np.uint8)
    if len(keys):
        pos = _positions(np.asarray(keys, dtype=np.int64)).ravel()
        np.bitwise_or.at(bitmap, pos >> 3,
                         np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
    return bitmap.tobytes()


def bloom_merge(partials) -> np.ndarray:
    """OR a sequence of bitmap byte-strings into one uint8 array."""
    out = np.zeros(_M_BITS >> 3, dtype=np.uint8)
    for p in partials:
        out |= np.frombuffer(p, dtype=np.uint8)
    return out


def bloom_might_contain(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test: bool mask, false positives possible,
    false negatives impossible."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _positions(np.asarray(keys, dtype=np.int64))
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)
