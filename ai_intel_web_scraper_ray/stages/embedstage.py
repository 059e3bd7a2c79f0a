"""Embedding actor-pool stage.

Mirrors the reference embedder's batch interface
(reference: competitive-intel/vectorstore/embedder.py:27-123: batches of 256,
8000-token truncation, retry policy) with the deterministic hash-embedding
stub from functions/embed.py standing in for the OpenAI client — the client
object would be constructed in ``__init__`` exactly like the stub config is,
so the production swap is one class attribute.

Truncation: texts longer than ``max_tokens`` tokens are truncated at a token
boundary before embedding (embedder.py truncates at 8000 tiktoken tokens).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..functions.embed import DEFAULT_DIM, embed_batch
from ..functions.tokenizer import encode_spans, slice_by_tokens

EMBED_BATCH_SIZE = 256
MAX_EMBED_TOKENS = 8000


class EmbedStage:
    def __init__(self, dim: int = DEFAULT_DIM, text_col: str = "text",
                 out_col: str = "embedding", max_tokens: int = MAX_EMBED_TOKENS):
        self.dim = dim
        self.text_col = text_col
        self.out_col = out_col
        self.max_tokens = max_tokens

    def _truncate(self, text: str) -> str:
        spans = encode_spans(text)
        if len(spans) <= self.max_tokens:
            return text
        return slice_by_tokens(text, spans, 0, self.max_tokens)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [self._truncate(t or "") for t in batch[self.text_col].to_pylist()]
        vecs = embed_batch(texts, self.dim)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), self.dim
        )
        return batch.append_column(self.out_col, arr)


_TASK_EMBEDDERS: dict = {}


def _embed_task_fn(kwargs: dict):
    """Stateless-task fallback for tiny sessions (see chunk_stage)."""
    key = tuple(sorted((k, repr(v)) for k, v in kwargs.items()))

    def fn(batch):
        inst = _TASK_EMBEDDERS.get(key)
        if inst is None:
            inst = EmbedStage(**kwargs)
            _TASK_EMBEDDERS[key] = inst
        return inst(batch)

    return fn


def embed_stage(ds, concurrency: int = 4, batch_size: int = EMBED_BATCH_SIZE, **kwargs):
    import ray

    avail = ray.available_resources().get("CPU", 8)
    if avail < 3:
        return ds.map_batches(_embed_task_fn(kwargs), batch_format="pyarrow",
                              batch_size=batch_size)
    # autoscaling pool (min 1) — see transforms.tag_stage
    return ds.map_batches(
        EmbedStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(1, concurrency)),
        # a 256-node run WILL lose actors: replace them without limit
        # (transient node loss), but bound per-task retries so a POISON
        # batch (one that deterministically kills its worker, e.g. an
        # OOM-sized document) fails the stage after 8 attempts instead of
        # livelocking kill/restart forever (tests/test_fault_tolerance.py)
        max_restarts=-1,
        max_task_retries=8,
    )
