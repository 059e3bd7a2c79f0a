"""Retrieval surface + generation surface tests."""

import os

import pandas as pd
import ray.data as rd

from ai_intel_web_scraper_ray.functions.embed import embed_text
from ai_intel_web_scraper_ray.pipelines.generate import (
    CREDIBILITY_RANK,
    NO_SOURCES,
    SOURCE_ENTRY_TEMPLATE,
    export_markdown,
    format_sources_ds,
    generate_all,
    generate_comparisons,
    generate_narrative,
    generate_objections,
    normalize_comparison_row,
    normalize_handler,
    stub_llm,
    stub_llm_narrative,
    stub_llm_objections,
    summarize_entries,
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


def _sequential_format_sources(records, text_clip, max_source_tokens=80_000):
    """Independent sequential replay of the reference's _format_sources
    (objection_generator.py:204-228): stable credibility sort preserving
    load order, entry formatting, take-while char budget."""
    max_chars = max_source_tokens * 3
    ranked = sorted(records, key=lambda r: CREDIBILITY_RANK.get(r["credibility"], 3))
    parts, total = [], 0
    for r in ranked:
        entry = SOURCE_ENTRY_TEMPLATE.format(
            source_type=r["source_type"], title=r["title"], url=r["url"],
            text=(r["text"] or "")[:text_clip])
        if total + len(entry) > max_chars:
            break
        parts.append(entry)
        total += len(entry)
    return "".join(parts) if parts else NO_SOURCES


class TestObjectionSummaryGenerators:
    def _records(self, n=40):
        recs = []
        creds = ["community", "official", "third_party"]
        for i, r in enumerate(fixtures.make_source_records(n)):
            recs.append(dict(
                r, origin="kx" if i % 3 == 0 else "acme",
                credibility=creds[i % 3],
                text=(r["text"] or "filler words here ") * 3))
        return recs

    def test_format_sources_matches_sequential_oracle(self):
        recs = self._records(40)
        ds = rd.from_arrow(fixtures.records_to_table(recs))
        got = format_sources_ds(ds, text_clip=3000)
        assert got == _sequential_format_sources(recs, 3000)

    def test_format_sources_budget_take_while(self):
        # tiny budget: only the prefix that fits, stop at first overflow
        recs = self._records(40)
        ds = rd.from_arrow(fixtures.records_to_table(recs))
        got = format_sources_ds(ds, text_clip=3000, max_source_tokens=300)
        want = _sequential_format_sources(recs, 3000, 300)
        assert got == want
        assert 0 < len(got) <= 900

    def test_format_sources_empty(self):
        recs = self._records(6)
        ds = rd.from_arrow(fixtures.records_to_table(recs))
        from ai_intel_web_scraper_ray.pipelines.generate import _filter_origin
        assert format_sources_ds(_filter_origin(ds, "nobody")) == NO_SOURCES

    def test_normalize_handler_alt_names(self):
        assert normalize_handler({"theme": "t", "rebuttal": ["a", "b"]}) == {
            "objection": "t", "response": "a b"}
        out = normalize_handler({"concern": "c", "kx_positioning": {"x": "1", "y": "2"}})
        assert out == {"objection": "c", "response": "x: 1; y: 2"}
        out = normalize_handler({"question": "q", "evidence": {"doc": "d"}})
        assert out["objection"] == "q"
        assert out["response"] == "q"          # fallback: no response field
        assert out["supporting_evidence"] == ["doc: d"]
        out = normalize_handler({"objection": "o", "counter": 7, "evidence": "e"})
        assert out["response"] == "7" and out["supporting_evidence"] == ["e"]

    def test_normalize_comparison_row(self):
        assert normalize_comparison_row({"dimension": "d", "kdb": "good",
                                         "acme": "bad"}, "Acme")["kx_rating"] == "good"
        r = normalize_comparison_row({"dimension": "d"}, "Acme")
        assert r["kx_rating"] == "" and r["competitor_rating"] == ""
        r = normalize_comparison_row(
            {"dimension": "d", "kx_score": "5", "competitor_assessment": "3"}, "Acme")
        assert r == {"dimension": "d", "kx_rating": "5", "competitor_rating": "3"}

    def test_generate_objections_deterministic_and_resume(self, tmp_path):
        recs = self._records(30)
        ds = rd.from_arrow(fixtures.records_to_table(recs))
        out1 = generate_objections(ds, "kx", "acme", str(tmp_path))
        assert len(out1) == 3
        assert all(set(h) >= {"objection", "response"} for h in out1)
        # pure function of the packed prompt: digest fields match a manual replay
        from ai_intel_web_scraper_ray.pipelines.generate import OBJECTION_TEMPLATE
        kx_txt = _sequential_format_sources([r for r in recs if r["origin"] == "kx"], 3000)
        ac_txt = _sequential_format_sources([r for r in recs if r["origin"] == "acme"], 3000)
        prompt = OBJECTION_TEMPLATE.format(
            competitor_name="acme", kx_sources=kx_txt, competitor_sources=ac_txt)
        want = [normalize_handler(h) for h in stub_llm_objections(prompt)]
        assert out1 == want
        # resume: file exists -> returned verbatim without regeneration
        marker = os.path.getmtime(tmp_path / "acme_objection_handlers.json")
        out2 = generate_objections(ds, "kx", "acme", str(tmp_path))
        assert out2 == out1
        assert os.path.getmtime(tmp_path / "acme_objection_handlers.json") == marker

    def test_generate_all_three_families(self, tmp_path):
        recs = self._records(30)
        # give the records topics so the comparison step has groups
        for i, r in enumerate(recs):
            r["topics"] = ["performance"] if i % 2 else ["storage"]
        ds = rd.from_arrow(fixtures.records_to_table(recs))
        out = generate_all(ds, "kx", "acme", str(tmp_path))
        assert sorted(e["topic"] for e in out["entries"]) == ["performance", "storage"]
        assert len(out["objections"]) == 3 and len(out["cross_cutting"]) == 3
        # objections and cross-cutting use different templates -> different digests
        assert out["objections"] != out["cross_cutting"]
        nar = out["narrative"]
        assert nar["competitor"] == "acme"
        assert nar["sixty_second_pitch"].startswith("pitch-")
        rows = nar["comparison_table"]["rows"]
        assert len(rows) == 2 and all(
            set(r) == {"dimension", "kx_rating", "competitor_rating"} for r in rows)
        assert nar["deal_stage_talking_points"]["discovery"][0].startswith("talk-")
        assert nar["cross_cutting_objections"][0]["objection"].startswith("objection-")
        for fname in ("acme_objection_handlers.json", "acme_cross_cutting.json",
                      "acme_narrative.json", "combined.json"):
            assert (tmp_path / fname).exists(), fname
        # narrative resume: step filter reloads entries from combined.json
        nar2 = generate_all(ds, "kx", "acme", str(tmp_path), step="narrative")
        assert nar2["narrative"] == nar
        assert nar2["entries"] == out["entries"]

    def test_summarize_entries_shape(self):
        s = summarize_entries([
            {"topic": "b", "summary": "sb", "strengths": ["x"], "limitations": []},
            {"topic": "a", "summary": "sa", "strengths": [], "limitations": ["y"]},
        ])
        # sorted by topic, counts not contents
        assert s.index("### a") < s.index("### b")
        assert "**Strengths**: 0 identified" in s and "**Limitations**: 1 identified" in s
        assert summarize_entries([]) == "[No topic entries generated yet]"
