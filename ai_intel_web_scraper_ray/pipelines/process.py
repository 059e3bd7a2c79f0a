"""The `process` pipeline: clean → tag → quality-filter → dedup.

Mirrors the reference `python pipeline.py process`
(reference: competitive-intel/pipeline.py:161-223, fixed stage order at
processors/deduplicator.py:37-70) as a streaming Dataset chain; the only wide
operations are the three dedup shuffles.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from ..stages import dedup as dedup_stages
from ..stages import transforms as tf


def process_pipeline(
    ds,
    topic_keywords: Optional[Dict[str, Sequence[str]]] = None,
    competitor_keywords: Optional[Dict[str, Sequence[str]]] = None,
    min_word_count: int = 100,
    tagger_concurrency: int = 4,
    tagger_batch_size: int = 4096,
    run_minhash: bool = True,
):
    """records Dataset → processed records Dataset.

    ``tagger_batch_size``: 4096 amortizes per-batch overhead at corpus
    scale; benchmarks over small corpora should shrink it so the actor
    pool actually fans out (tasks ≈ rows / batch_size)."""
    ds = tf.clean_stage(ds)
    ds = tf.tag_stage(
        ds,
        concurrency=tagger_concurrency,
        batch_size=tagger_batch_size,
        topic_keywords=topic_keywords,
        competitor_keywords=competitor_keywords,
    )
    ds = tf.quality_filter_stage(ds, min_word_count=min_word_count)
    # one materialization boundary: the three dedup passes each read their
    # input twice (projection/edge discovery + the final drop filter), so
    # pin the post-filter corpus once instead of once per pass.  At 100-TB
    # scale this boundary is a partitioned-parquet stage write instead
    # (the reference's stage-file pattern, RUNBOOK.md:43).
    ds = ds.materialize()
    ds = dedup_stages.exact_url_dedup(ds, materialize_input=False)
    ds = dedup_stages.github_id_dedup(ds, materialize_input=False)
    if run_minhash:
        ds, _ = dedup_stages.minhash_dedup(ds, materialize_input=False)
    return ds
