"""Retrieval surface + generation surface tests."""

import os

import pandas as pd
import ray.data as rd

from ai_intel_web_scraper_ray.functions.embed import embed_text
from ai_intel_web_scraper_ray.pipelines.generate import (
    export_markdown,
    generate_comparisons,
    stub_llm,
)
from ai_intel_web_scraper_ray.pipelines.retrieval import ChunkRetriever, dedup_citations
from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline

from . import fixtures


def make_chunks_ds():
    records = fixtures.make_source_records(40)
    ds = rd.from_arrow(fixtures.records_to_table(records))
    return vectorize_pipeline(ds, topic_names=fixtures.TOPIC_NAMES,
                              chunk_concurrency=2, embed_concurrency=2).materialize()


CHUNKS = None


def chunks_ds():
    global CHUNKS
    if CHUNKS is None:
        CHUNKS = make_chunks_ds()
    return CHUNKS


class TestRetriever:
    def test_direct_query_topk(self):
        r = ChunkRetriever({"main": chunks_ds()})
        out = r.retrieve("fast query engine table", n_results=5)
        assert 0 < len(out) <= 5
        assert list(out.columns)[:2] == ["chunk_id", "rrf_score"]
        assert out["rrf_score"].is_monotonic_decreasing

    def test_self_retrieval_rank0(self):
        # querying with an exact chunk text must fuse that chunk to the top
        df = chunks_ds().to_pandas()
        target = df.iloc[3]
        r = ChunkRetriever({"main": chunks_ds()})
        out = r.retrieve(target["text"], n_results=5)
        assert out.iloc[0]["chunk_id"] == target["chunk_id"]

    def test_source_type_filter(self):
        r = ChunkRetriever({"main": chunks_ds()})
        out = r.retrieve("fast query", source_types=["github_issue"], n_results=8)
        df = chunks_ds().to_pandas().set_index("chunk_id")
        for cid in out["chunk_id"]:
            assert df.loc[cid, "source_type"] == "github_issue"

    def test_competitor_filter_empty(self):
        r = ChunkRetriever({"main": chunks_ds()})
        out = r.retrieve("fast query", competitors=["nonexistent"], n_results=5)
        assert len(out) == 0

    def test_multi_query_fusion_boosts(self):
        r = ChunkRetriever({"main": chunks_ds()})
        base = r.retrieve("fast query", n_results=5)
        multi = r.retrieve("fast query", sub_queries=["table merge", "cluster deploy"],
                           hyde_passage="the fast engine merges tables quickly",
                           n_results=5)
        assert len(multi) == 5
        # fused scores include contributions from >1 list for overlapping hits
        assert multi.iloc[0]["rrf_score"] >= base.iloc[0]["rrf_score"] - 1e-12

    def test_two_collections(self):
        ds = chunks_ds()
        r = ChunkRetriever({"a": ds, "b": ds})
        out = r.retrieve("fast query", n_results=4)
        # same chunk found in both collections → rrf ≈ 2/(60+rank+1)
        assert out.iloc[0]["rrf_score"] > 1.0 / 61

    def test_citation_dedup(self):
        df = pd.DataFrame({
            "parent_doc_id": ["d1", "d1", "d2"],
            "source_url": ["u1", "u1", "u1"],
            "chunk_id": ["c1", "c2", "c3"],
        })
        out = dedup_citations(df)
        assert list(out["chunk_id"]) == ["c1", "c3"]


class TestGenerate:
    def _records_ds(self):
        recs = []
        base = fixtures.make_source_records(12)
        for i, r in enumerate(base):
            recs.append(dict(r, topics=["performance"] if i % 2 else ["storage"],
                             origin="kx" if i % 3 == 0 else "acme"))
        return rd.from_arrow(fixtures.records_to_table(recs))

    def test_generate_and_resume(self, tmp_path):
        out_dir = str(tmp_path / "gen")
        entries = generate_comparisons(self._records_ds(), "kx", out_dir)
        topics = sorted(e["topic"] for e in entries)
        assert topics == ["performance", "storage"]
        assert all(e["summary"].startswith("synthetic-summary-") for e in entries)
        assert os.path.exists(os.path.join(out_dir, "topic_performance.json"))

        # resume: delete one file; rerun regenerates only that one
        os.remove(os.path.join(out_dir, "topic_storage.json"))
        marker = os.path.getmtime(os.path.join(out_dir, "topic_performance.json"))
        entries2 = generate_comparisons(self._records_ds(), "kx", out_dir)
        assert sorted(e["topic"] for e in entries2) == topics
        assert os.path.getmtime(os.path.join(out_dir, "topic_performance.json")) == marker

    def test_stub_deterministic(self):
        assert stub_llm("abc") == stub_llm("abc")
        assert stub_llm("abc") != stub_llm("abd")

    def test_export_markdown(self, tmp_path):
        entries = [{"topic": "t1", "summary": "s", "strengths": ["a"], "limitations": ["b"]}]
        p = str(tmp_path / "out.md")
        export_markdown(entries, p)
        text = open(p).read()
        assert "## t1" in text and "- a" in text and "- b" in text
