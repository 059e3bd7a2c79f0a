"""The `vectorize` pipeline: chunk → embed → write.

Mirrors the reference `python pipeline.py vectorize`
(reference: competitive-intel/pipeline.py:537-547 → vectorstore/ingest.py:86-148:
load → chunk → embed → ChromaDB upsert) as one streaming Dataset chain —
no stage materializes the corpus; the sink is partitioned parquet
(the ChromaDB upsert is replaced by a columnar chunk+embedding table that a
vector index builds from, per SURVEY.md §2.1 S9).
"""

from __future__ import annotations

from typing import Dict, Optional

from ..stages.chunk import chunk_stage
from ..stages.embedstage import embed_stage


def vectorize_pipeline(
    ds,
    chunk_tokens: int = 400,
    overlap_tokens: int = 60,
    embed_dim: int = 32,
    chunk_concurrency: int = 4,
    embed_concurrency: int = 4,
    topic_names: Optional[Dict[str, str]] = None,
):
    """source-records Dataset → chunks-with-embeddings Dataset."""
    ds = chunk_stage(
        ds,
        concurrency=chunk_concurrency,
        chunk_tokens=chunk_tokens,
        overlap_tokens=overlap_tokens,
        topic_names=topic_names,
    )
    ds = embed_stage(ds, concurrency=embed_concurrency, dim=embed_dim)
    return ds
