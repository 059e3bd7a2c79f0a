"""Deterministic hash-embedding stub + cosine kernels.

The reference embeds chunks with OpenAI text-embedding-3-small (1536-d,
batches of 256; reference: competitive-intel/vectorstore/embedder.py:21-123).
No network access exists here, so the engine ships a deterministic stand-in
with the same interface: ``embed(text) = unit-normalized float32[D] drawn from
a sha256(text)-seeded PRNG`` (FIXTURES.md §7).  A real client would slot into
the same actor-pool stage (stages/embedstage.py) unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np

DEFAULT_DIM = 32
PROD_DIM = 1536  # reference production shape


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def embed_batch(texts: Sequence[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = embed_text(t, dim)
    return out


def cosine_scores(matrix: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Cosine similarity of each row of ``matrix`` vs ``query`` in float64
    (float64 so scores agree bit-for-bit with DuckDB's double kernels
    after rounding)."""
    m = matrix.astype(np.float64)
    q = query.astype(np.float64)
    mn = np.linalg.norm(m, axis=1)
    qn = np.linalg.norm(q)
    denom = mn * qn
    denom[denom == 0] = 1.0
    return (m @ q) / denom
