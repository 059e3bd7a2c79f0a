"""Unit tests for the OR-mergeable broadcast Bloom filter
(functions/bloom.py): no false negatives ever, merge == build-on-union,
and a sane false-positive rate at the design load."""

from __future__ import annotations

import numpy as np

from ai_intel_web_scraper_ray.functions.bloom import (
    bloom_merge,
    bloom_might_contain,
    bloom_partial,
)


def test_no_false_negatives():
    keys = np.arange(0, 200_000, 7, dtype=np.int64)
    bitmap = bloom_merge([bloom_partial(keys)])
    assert bloom_might_contain(bitmap, keys).all()


def test_merge_equals_union_build():
    a = np.arange(0, 50_000, 3, dtype=np.int64)
    b = np.arange(1, 50_000, 5, dtype=np.int64)
    merged = bloom_merge([bloom_partial(a), bloom_partial(b)])
    union = bloom_merge([bloom_partial(np.concatenate([a, b]))])
    assert np.array_equal(merged, union)


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    probes = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    bitmap = bloom_merge([bloom_partial(members)])
    fp = bloom_might_contain(bitmap, probes).mean()
    # design point: 10^5 keys in 2^20 bits, 4 probes → ~0.9% theoretical
    assert fp < 0.03, fp


def test_empty_inputs():
    bitmap = bloom_merge([bloom_partial(np.array([], dtype=np.int64))])
    assert not bitmap.any()
    assert bloom_might_contain(bitmap, np.array([1, 2], dtype=np.int64)).sum() == 0
    assert len(bloom_might_contain(bitmap, np.array([], dtype=np.int64))) == 0
