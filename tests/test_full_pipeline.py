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
