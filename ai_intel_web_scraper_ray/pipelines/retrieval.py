"""Retrieval surface over the chunk+embedding table.

Mirrors the reference RAG retriever
(reference: competitive-intel/webapp/rag/retriever.py:70-260):
- metadata filters (competitor / primary topic / source type, each scalar or
  $in-list, AND-combined — the ChromaDB where-builder :192-220) become
  vectorized Arrow masks;
- multi-strategy retrieval: direct query at n, up to 3 sub-queries at n//2,
  HyDE passage at n//2, each across every collection (:100-133);
- reciprocal rank fusion with k=60, keeping the max-original-score copy per
  chunk (:222-260);
- citation dedup keep-first by (parent_doc_id, source_url)
  (reference: webapp/rag/query_engine.py:890-918).

Embedding is the deterministic stub (functions/embed.py) — a real embedder
swaps in behind the same callable.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.embed import embed_text
from .search import brute_force_topk, rrf_fuse


def build_filter_mask(t: pa.Table, competitors=None, topics=None, source_types=None):
    """AND of per-facet membership tests; None = no constraint."""
    mask = pa.array([True] * len(t))
    if competitors:
        mask = pc.and_(mask, pc.is_in(t["competitor"], value_set=pa.array(list(competitors))))
    if topics:
        # primary topic = first element of topic_ids (reference stores
        # primary_topic scalar; our chunks carry the ranked topic list)
        joined = t["topic_ids"]
        first = pc.list_element(pc.list_slice(joined, 0, 1, return_fixed_size_list=False), 0)
        mask = pc.and_(mask, pc.is_in(first, value_set=pa.array(list(topics))))
    if source_types:
        mask = pc.and_(mask, pc.is_in(t["source_type"], value_set=pa.array(list(source_types))))
    return mask


class ChunkRetriever:
    """Multi-strategy retriever over one or more chunk Datasets
    ("collections")."""

    def __init__(self, collections: Dict[str, "ray.data.Dataset"], embed_dim: int = 32):
        self.collections = collections
        self.embed_dim = embed_dim

    def _search(self, query_text: str, ds, n: int, competitors, topics, source_types) -> pd.DataFrame:
        if n <= 0:
            return pd.DataFrame({"chunk_id": [], "score": []})
        filtered = ds.map_batches(
            lambda t: t.filter(build_filter_mask(t, competitors, topics, source_types)),
            batch_format="pyarrow",
        )
        q = embed_text(query_text, self.embed_dim)
        df = brute_force_topk(filtered, q[None, :], k=n, vec_col="embedding", id_col="chunk_id")
        return df[["chunk_id", "score"]].reset_index(drop=True)

    def retrieve(
        self,
        query: str,
        sub_queries: Optional[Sequence[str]] = None,
        hyde_passage: Optional[str] = None,
        competitors: Optional[Sequence[str]] = None,
        topics: Optional[Sequence[str]] = None,
        source_types: Optional[Sequence[str]] = None,
        n_results: int = 10,
        collections: Optional[Sequence[str]] = None,
    ) -> pd.DataFrame:
        names = list(collections) if collections else list(self.collections)
        result_sets: List[pd.DataFrame] = []
        for name in names:
            ds = self.collections[name]
            r = self._search(query, ds, n_results, competitors, topics, source_types)
            if len(r):
                result_sets.append(r)
        for sq in (sub_queries or [])[:3]:
            for name in names:
                r = self._search(sq, self.collections[name], n_results // 2,
                                 competitors, topics, source_types)
                if len(r):
                    result_sets.append(r)
        if hyde_passage:
            for name in names:
                r = self._search(hyde_passage, self.collections[name], n_results // 2,
                                 competitors, topics, source_types)
                if len(r):
                    result_sets.append(r)
        if not result_sets:
            return pd.DataFrame({"chunk_id": [], "rrf_score": [], "score": []})
        fused = rrf_fuse(result_sets, id_col="chunk_id", score_col="score",
                         n=n_results, rrf_k=60)
        return fused


def dedup_citations(chunks: pd.DataFrame, doc_col: str = "parent_doc_id",
                    url_col: str = "source_url") -> pd.DataFrame:
    """Keep-first citation dedup by (parent_doc_id, source_url)
    (query_engine.py:890-918)."""
    return chunks.drop_duplicates([doc_col, url_col], keep="first").reset_index(drop=True)
