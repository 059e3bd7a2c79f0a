"""Chunker strategy semantics + distributed vectorize pipeline."""

import numpy as np
import pandas as pd
import ray.data as rd

from ai_intel_web_scraper_ray.functions.tokenizer import count_tokens
from ai_intel_web_scraper_ray.pipelines.search import brute_force_topk, lsh_topk, rrf_fuse
from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline
from ai_intel_web_scraper_ray.stages.chunk import (
    MIN_CHUNK_TOKENS,
    Chunker,
    chunk_id,
    context_prefix,
)

from . import fixtures

CH = Chunker(chunk_tokens=400, overlap_tokens=60, topic_names=fixtures.TOPIC_NAMES)


def make_rec(**kw):
    base = {
        "id": "acme-blog-abc",
        "origin": "acme",
        "source_type": "blog",
        "url": "https://a.io/x",
        "title": "Title here",
        "text": "",
        "topics": ["performance"],
        "credibility": "official",
        "content_date": None,
        "scraped_date": None,
        "metadata": {},
    }
    base.update(kw)
    return base


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def long_text(n):
    return " ".join(WORDS[i % len(WORDS)] for i in range(n))


class TestChunkerStrategies:
    def test_context_prefix(self):
        assert context_prefix("kx", "official_docs", ["performance"], fixtures.TOPIC_NAMES) == \
            "[KX | Official Docs | Performance]"
        assert context_prefix("acme", "blog", ["nope"], fixtures.TOPIC_NAMES) == \
            "[Acme | Blog | General]"

    def test_short_blog_single_chunk(self):
        rec = make_rec(text=long_text(120))
        chunks = CH.chunk_record(rec)
        assert len(chunks) == 1
        assert chunks[0]["text"].startswith("[Acme | Blog | Performance] ")
        assert chunks[0]["chunk_index"] == 0
        assert chunks[0]["chunk_id"] == chunk_id("acme", "acme-blog-abc", 0, chunks[0]["text"])

    def test_blog_header_sections(self):
        text = "\n## One\n" + long_text(100) + "\n## Two\n" + long_text(100)
        chunks = CH.chunk_record(make_rec(text=text))
        assert len(chunks) == 2
        assert "## One" in chunks[0]["text"]
        assert "## Two" in chunks[1]["text"]

    def test_blog_long_section_splits_with_header_reprefix(self):
        text = "\n## Big\n" + long_text(1200)
        chunks = CH.chunk_record(make_rec(text=text))
        assert len(chunks) >= 2
        for c in chunks[1:]:
            assert "## Big" in c["text"]

    def test_docs_hierarchy_path(self):
        text = "\n## Level2\n" + long_text(80) + "\n### Level3\n" + long_text(80)
        chunks = CH.chunk_record(make_rec(source_type="official_docs", text=text))
        assert len(chunks) == 2
        assert "Title here > Level2" in chunks[0]["text"]
        assert "Title here > Level2 > Level3" in chunks[1]["text"]

    def test_docs_hierarchy_trim(self):
        # Pins the reference's literal hierarchy[:level] trim
        # (chunker.py:305-310): a new h2 after an h3 trims to
        # [title, first_h2] and appends, yielding "Title > A > C".
        text = "\n## A\n" + long_text(80) + "\n### B\n" + long_text(80) + "\n## C\n" + long_text(80)
        chunks = CH.chunk_record(make_rec(source_type="official_docs", text=text))
        assert "Title here > A > B" in chunks[1]["text"]
        assert "Title here > A > C" in chunks[2]["text"]
        assert "B > C" not in chunks[2]["text"]

    def test_github_issue_header_and_comment_packing(self):
        meta = {
            "labels": ["bug", "p1"],
            "state": "open",
            "top_comments": [long_text(60), long_text(60), long_text(500)],
        }
        rec = make_rec(source_type="github_issue", text=long_text(100), metadata=meta)
        chunks = CH.chunk_record(rec)
        assert "[bug, p1] (state: open)" in chunks[0]["text"]
        # two short comments packed together; long comment split separately
        packed = [c for c in chunks if c["text"].count("Comment on 'Title here'") >= 2]
        assert packed, "short comments should be buffer-packed into one chunk"
        assert len(chunks) >= 3

    def test_discussion_answer_chunk(self):
        meta = {"category": "Q&A", "is_answered": True, "answer_body": long_text(80)}
        chunks = CH.chunk_record(make_rec(source_type="github_discussion",
                                          text=long_text(100), metadata=meta))
        assert any("Accepted answer for 'Title here'" in c["text"] for c in chunks)
        assert "(discussion, category: Q&A)" in chunks[0]["text"]

    def test_community_short_comment_dropped(self):
        meta = {"top_comments": ["too short", long_text(100)]}
        chunks = CH.chunk_record(make_rec(source_type="community_hn",
                                          text=long_text(100), metadata=meta))
        joined = " ".join(c["text"] for c in chunks)
        assert "too short" not in joined
        assert sum("Community comment" in c["text"] for c in chunks) == 1

    def test_release_single_vs_split(self):
        small = CH.chunk_record(make_rec(source_type="github_release", text=long_text(300)))
        assert len(small) == 1
        big = CH.chunk_record(make_rec(source_type="github_release", text=long_text(2000)))
        assert len(big) > 1

    def test_release_below_min_dropped(self):
        assert CH.chunk_record(make_rec(source_type="github_release", text=long_text(10))) == []

    def test_hard_split_no_separators(self):
        blob = "x" * 3000  # no spaces/newlines → token-slice fallback
        chunks = CH.chunk_record(make_rec(source_type="blog", text=blob))
        assert len(chunks) >= 1

    def test_overlap_present(self):
        text = long_text(1200)  # single paragraph, splits on " "
        parts = CH.recursive_split(text)
        assert len(parts) >= 2
        # suffix of part i overlaps prefix of part i+1
        tail = parts[0].split()[-5:]
        assert " ".join(tail) in parts[1]

    def test_min_trailing_merged(self):
        for p in CH.recursive_split(long_text(430)):
            assert count_tokens(p) >= MIN_CHUNK_TOKENS

    def test_empty_text_no_chunks(self):
        assert CH.chunk_record(make_rec(text="   ")) == []


class TestVectorizePipeline:
    def test_distributed_matches_sequential(self):
        records = fixtures.make_source_records(40)
        ds = rd.from_arrow(fixtures.records_to_table(records))
        out = vectorize_pipeline(ds, topic_names=fixtures.TOPIC_NAMES,
                                 chunk_concurrency=2, embed_concurrency=2).to_pandas()

        seq_chunks = []
        for r in records:
            seq_chunks.extend(CH.chunk_record(r))
        assert sorted(out["chunk_id"]) == sorted(c["chunk_id"] for c in seq_chunks)
        got = out.set_index("chunk_id")
        for c in seq_chunks:
            assert got.loc[c["chunk_id"], "text"] == c["text"]
            assert got.loc[c["chunk_id"], "token_count"] == c["token_count"]
        # embeddings are deterministic unit vectors
        v = got.iloc[0]["embedding"]
        assert len(v) == 32
        assert abs(np.linalg.norm(np.asarray(v)) - 1.0) < 1e-5


class TestSearch:
    def _embeddings_ds(self, n=200, dim=16):
        rng = np.random.RandomState(0)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        import pyarrow as pa

        t = pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float32()), dim),
        })
        return rd.from_arrow(t), vecs

    def test_brute_force_topk_exact(self):
        ds, vecs = self._embeddings_ds()
        q = vecs[7]
        df = brute_force_topk(ds, q[None, :], k=5)
        from ai_intel_web_scraper_ray.functions.embed import cosine_scores

        exact = cosine_scores(vecs, q)
        expected = np.argsort(-exact, kind="stable")[:5]
        assert list(df["vec_id"]) == list(expected)
        assert df.iloc[0]["vec_id"] == 7

    def test_lsh_topk_contains_self(self):
        ds, vecs = self._embeddings_ds()
        df = lsh_topk(ds, vecs[3], k=5, n_planes=6)
        assert 3 in set(df["vec_id"])

    def test_ivf_topk_contains_self_and_approximates(self):
        from ai_intel_web_scraper_ray.pipelines.search import ivf_topk

        ds, vecs = self._embeddings_ds()
        df = ivf_topk(ds, vecs[7], k=5, n_centroids=8, nprobe=3)
        assert df.iloc[0]["vec_id"] == 7
        # probing all cells == exact brute force
        full = ivf_topk(ds, vecs[7], k=5, n_centroids=8, nprobe=8)
        exact = brute_force_topk(ds, vecs[7][None, :], k=5)
        assert list(full["vec_id"]) == list(exact["vec_id"])

    def test_rrf(self):
        l1 = pd.DataFrame({"chunk_id": ["a", "b", "c"], "score": [0.9, 0.8, 0.7]})
        l2 = pd.DataFrame({"chunk_id": ["b", "a", "d"], "score": [0.95, 0.5, 0.4]})
        fused = rrf_fuse([l1, l2], n=4)
        # a: 1/61+1/62, b: 1/62+1/61 → tie broken by id; c,d get 1/63
        assert list(fused["chunk_id"])[:2] == ["a", "b"]
        assert fused.iloc[0]["rrf_score"] == fused.iloc[1]["rrf_score"]
        b_row = fused[fused["chunk_id"] == "b"].iloc[0]
        assert b_row["score"] == 0.95  # max original score kept

    def test_lsh_index_single_probe_matches_scan(self, tmp_path):
        """The partitioned index's single-probe result must equal the
        full-scan lsh_topk (same planes/seed → same bucket membership), and
        the probe must read only the query's partition, not the corpus."""
        from ai_intel_web_scraper_ray.pipelines.search import (
            build_lsh_index,
            lsh_index_topk,
        )

        ds, vecs = self._embeddings_ds()
        idx = build_lsh_index(ds, str(tmp_path / "lsh"), n_planes=6, seed=99)
        got = lsh_index_topk(idx, vecs[3], k=5)
        scan = lsh_topk(ds, vecs[3], k=5, n_planes=6, seed=99)
        assert list(got["vec_id"]) == list(scan["vec_id"])
        assert np.allclose(got["score"], scan["score"])
        # layout really is hive-partitioned: >1 bucket dir exists and the
        # probe's paths are a strict subset
        import os

        buckets = [d for d in os.listdir(tmp_path / "lsh") if d.startswith("bucket=")]
        assert len(buckets) > 1

    def test_lsh_index_multiprobe_improves_recall(self, tmp_path):
        from ai_intel_web_scraper_ray.pipelines.search import (
            build_lsh_index,
            lsh_index_topk,
        )
        from ai_intel_web_scraper_ray.pipelines.search import brute_force_topk

        ds, vecs = self._embeddings_ds()
        idx = build_lsh_index(ds, str(tmp_path / "lsh"), n_planes=6, seed=99)
        exact = set(brute_force_topk(ds, vecs[3][None, :], k=5)["vec_id"])
        r0 = set(lsh_index_topk(idx, vecs[3], k=5, multiprobe=0)["vec_id"]) & exact
        r3 = set(lsh_index_topk(idx, vecs[3], k=5, multiprobe=3)["vec_id"]) & exact
        assert len(r3) >= len(r0)
        assert 3 in set(lsh_index_topk(idx, vecs[3], k=5, multiprobe=3)["vec_id"])

    def test_ivf_index_matches_scan(self, tmp_path):
        from ai_intel_web_scraper_ray.pipelines.search import (
            build_ivf_index,
            ivf_index_topk,
            ivf_topk,
            train_ivf_centroids,
        )

        ds, vecs = self._embeddings_ds()
        cents = train_ivf_centroids(ds, 8)
        idx = build_ivf_index(ds, str(tmp_path / "ivf"), centroids=cents)
        got = ivf_index_topk(idx, vecs[7], k=5, nprobe=3)
        scan = ivf_topk(ds, vecs[7], k=5, nprobe=3, centroids=cents)
        assert list(got["vec_id"]) == list(scan["vec_id"])
        # probing every cell through the index == exact brute force
        full = ivf_index_topk(idx, vecs[7], k=5, nprobe=8)
        exact = brute_force_topk(ds, vecs[7][None, :], k=5)
        assert list(full["vec_id"]) == list(exact["vec_id"])
