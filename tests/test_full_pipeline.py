"""End-to-end crawl → interleaved → process → vectorize."""

from ai_intel_web_scraper_ray.pipelines.full import crawl_process_vectorize
from ai_intel_web_scraper_ray.sources.interleaved import span_sequences

from . import fixtures

PAGES = fixtures.make_web_graph()


def test_full_pipeline_end_to_end(tmp_path):
    out = crawl_process_vectorize(
        PAGES,
        "https://docs.hot.example/p0",
        exclude_patterns=("/excluded/",),
        topic_keywords=fixtures.TOPIC_KEYWORDS,
        out_dir=str(tmp_path / "out"),
    )
    crawl = out["crawl"]
    assert len(crawl["records"]) > 10

    inter = out["interleaved"]
    seqs = span_sequences(inter)
    assert len(seqs) == len(crawl["records"])
    # title + body spans per crawled page, in crawl order
    first = crawl["records"][0]
    from ai_intel_web_scraper_ray.functions.urls import record_id

    doc_id = record_id("crawl", "official_docs", first["url"])
    assert seqs[doc_id][0] == ("title", first["title"], "")
    assert seqs[doc_id][1] == ("body", first["text"], "")

    chunks = out["chunks"].to_pandas()
    assert len(chunks) > 0
    assert (chunks["token_count"] > 0).all()
    assert chunks["chunk_id"].is_unique
    # embeddings present with unit norm
    import numpy as np

    v = np.asarray(chunks.iloc[0]["embedding"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    # persisted outputs exist
    assert (tmp_path / "out" / "interleaved.parquet").exists()
    import glob

    assert glob.glob(str(tmp_path / "out" / "chunks" / "*.parquet"))


def test_chain_kill_resume_byte_identical(tmp_path):
    """The 100-TB operational story in one test: a crawl CHECKPOINTED
    mid-flight and a partitioned sink KILLED mid-write must, after their
    resumes, produce the byte-identical chunk layout of an uninterrupted
    crawl → process → vectorize → sink chain."""
    import os

    import pytest

    from ai_intel_web_scraper_ray.pipelines.crawl import (
        crawl_scalable,
        load_crawl_records,
    )
    from ai_intel_web_scraper_ray.pipelines.full import (
        crawl_dataset_to_source_records,
    )
    from ai_intel_web_scraper_ray.pipelines.process import process_pipeline
    from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline
    from ai_intel_web_scraper_ray.sources.writers import (
        write_partitioned_exactly_once,
    )

    base = "https://docs.hot.example/p0"
    exc = ("/excluded/",)
    common = dict(max_depth=3, exclude_patterns=exc, num_shards=3,
                  lease_per_shard=4, chunk_size=4, num_workers=2)

    def downstream(recs_dir, sink_root, fail_parts=None):
        ds = crawl_dataset_to_source_records(load_crawl_records(recs_dir))
        ds = process_pipeline(ds, topic_keywords=fixtures.TOPIC_KEYWORDS,
                              min_word_count=10, tagger_concurrency=2)
        chunks = vectorize_pipeline(ds, chunk_concurrency=2,
                                    embed_concurrency=2)
        return write_partitioned_exactly_once(
            chunks, sink_root, "source_type", sort_cols=["chunk_id"],
            _fail_parts=fail_parts)

    # uninterrupted reference chain
    recs_a = str(tmp_path / "recs_a")
    crawl_scalable(PAGES, [base], records_dir=recs_a, **common)
    sink_a = str(tmp_path / "sink_a")
    audit = downstream(recs_a, sink_a)
    assert audit["wrote"].all() and len(audit) >= 1
    victim = str(audit["part"].iloc[0])

    # interrupted chain: crawl stops after 3 fetches, then resumes
    recs_b = str(tmp_path / "recs_b")
    ckpt = str(tmp_path / "ckpt")
    crawl_scalable(PAGES, [base], records_dir=recs_b,
                   checkpoint_dir=ckpt, stop_after_fetches=3, **common)
    crawl_scalable(PAGES, [base], records_dir=recs_b,
                   checkpoint_dir=ckpt, resume=True, **common)

    # sink killed before committing one partition, then resumed
    sink_b = str(tmp_path / "sink_b")
    with pytest.raises(Exception):
        downstream(recs_b, sink_b, fail_parts={victim})
    downstream(recs_b, sink_b)

    def tree(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = fh.read()
        return out

    assert tree(sink_a) == tree(sink_b)
