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
    stage_dir: Optional[str] = None,
):
    """records Dataset → processed records Dataset.

    ``tagger_batch_size``: 4096 amortizes per-batch overhead at corpus
    scale; benchmarks over small corpora should shrink it so the actor
    pool actually fans out (tasks ≈ rows / batch_size).

    ``stage_dir``: the 100-TB form of the mid-pipeline boundary — the
    post-filter corpus is written through the exactly-once partitioned
    sink (16 ``arrival_seq``-hash partitions, atomic per-partition
    commit) and read back as the dedup input, so a killed run resumes by
    skipping committed partitions instead of recomputing
    clean→tag→filter (the reference's stage-file pattern,
    RUNBOOK.md:43).  Default (None) keeps the in-memory
    ``materialize()`` boundary, which is the right call while the corpus
    fits the object store."""
    ds = tf.clean_stage(ds)
    ds = tf.tag_stage(
        ds,
        concurrency=tagger_concurrency,
        batch_size=tagger_batch_size,
        topic_keywords=topic_keywords,
        competitor_keywords=competitor_keywords,
    )
    ds = tf.quality_filter_stage(ds, min_word_count=min_word_count)
    # one boundary: the three dedup passes each read their input twice
    # (projection/edge discovery + the final drop filter), so pin the
    # post-filter corpus once instead of once per pass
    if stage_dir is not None:
        import ray.data as rd

        from ..schemas import SOURCE_RECORD_SCHEMA
        from ..sources.writers import write_partitioned_exactly_once

        def add_bucket(df):
            df = df.copy()
            df["_stage_part"] = (df["arrival_seq"].astype("int64")
                                 % 16).astype("int64")
            return df

        write_partitioned_exactly_once(
            ds.map_batches(add_bucket, batch_format="pandas"),
            stage_dir, "_stage_part", sort_cols=["arrival_seq"],
            schema=SOURCE_RECORD_SCHEMA)
        # hive discovery surfaces the partition dir as a "part" column —
        # drop it so the staged corpus matches the in-memory boundary
        ds = rd.read_parquet(stage_dir).drop_columns(["part"])
    else:
        ds = ds.materialize()
    ds = dedup_stages.exact_url_dedup(ds, materialize_input=False)
    ds = dedup_stages.github_id_dedup(ds, materialize_input=False)
    if run_minhash:
        ds, _ = dedup_stages.minhash_dedup(ds, materialize_input=False)
    return ds
