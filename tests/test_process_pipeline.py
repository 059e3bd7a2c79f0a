"""Distributed stages vs the sequential conformance oracle."""

import pandas as pd
import pytest
import ray.data as rd

from ai_intel_web_scraper_ray.pipelines.process import process_pipeline
from ai_intel_web_scraper_ray.stages import dedup as dd
from ai_intel_web_scraper_ray.stages import transforms as tf

from . import fixtures, oracle

RECORDS = fixtures.make_source_records(60)


def make_ds():
    return rd.from_arrow(fixtures.records_to_table(RECORDS))


def by_id(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("arrival_seq").reset_index(drop=True)


class TestCleanStage:
    def test_matches_oracle(self):
        out = by_id(tf.clean_stage(make_ds()).to_pandas())
        exp = oracle.oracle_clean(RECORDS)
        assert len(out) == len(exp)
        for i, e in enumerate(exp):
            assert out.loc[i, "text"] == e["text"], f"row {i}"
            assert out.loc[i, "word_count"] == e["word_count"]


class TestTagStage:
    def test_matches_oracle(self):
        ds = tf.clean_stage(make_ds())
        ds = tf.tag_stage(ds, concurrency=2, topic_keywords=fixtures.TOPIC_KEYWORDS)
        out = by_id(ds.to_pandas())
        exp = oracle.oracle_tag(oracle.oracle_clean(RECORDS), fixtures.TOPIC_KEYWORDS)
        for i, e in enumerate(exp):
            assert list(out.loc[i, "topics"]) == e["topics"], f"row {i}: {out.loc[i, 'topics']} vs {e['topics']}"


class TestQualityFilter:
    def _prepped(self):
        ds = tf.clean_stage(make_ds())
        return tf.tag_stage(ds, concurrency=2, topic_keywords=fixtures.TOPIC_KEYWORDS)

    def test_kept_set_matches_oracle(self):
        out = tf.quality_filter_stage(self._prepped()).to_pandas()
        exp_records = oracle.oracle_tag(oracle.oracle_clean(RECORDS), fixtures.TOPIC_KEYWORDS)
        kept, reasons = oracle.oracle_filter(exp_records)
        assert sorted(out["arrival_seq"]) == sorted(r["arrival_seq"] for r in kept)

    def test_reason_histogram(self):
        hist = tf.removal_histogram(self._prepped()).to_pandas()
        exp_records = oracle.oracle_tag(oracle.oracle_clean(RECORDS), fixtures.TOPIC_KEYWORDS)
        _, reasons = oracle.oracle_filter(exp_records)
        got = dict(zip(hist["removal_reason"], hist["count()"]))
        assert got == reasons


class TestDedup:
    def test_url_dedup_keeps_first(self):
        out = dd.exact_url_dedup(make_ds()).to_pandas()
        exp = oracle.oracle_url_dedup(RECORDS)
        assert sorted(out["arrival_seq"]) == sorted(r["arrival_seq"] for r in exp)

    def test_github_dedup(self):
        out = dd.github_id_dedup(make_ds()).to_pandas()
        exp = oracle.oracle_github_dedup(RECORDS)
        assert sorted(out["arrival_seq"]) == sorted(r["arrival_seq"] for r in exp)

    def test_url_dedup_majority_duplicate_plasma_path(self, monkeypatch):
        """VERDICT r2 item 2: a majority-duplicate corpus must never
        build O(#duplicates) driver state — drop_broadcast_max=0 forces
        the plasma-sorted-array filter, the collected `_drop_by_seq`
        seam is patched to raise, and the kept set must equal the
        broadcast path's on a corpus that is ~90% duplicates."""
        import pandas as pd
        import ray.data as rd

        n, n_unique = 400, 40
        rows = pd.DataFrame({
            "url": [f"https://ex.com/p{i % n_unique}" for i in range(n)],
            "arrival_seq": pd.Series(range(n), dtype="int64")})
        ds = rd.from_pandas(rows).repartition(8)
        a = sorted(dd.exact_url_dedup(ds).to_pandas()["arrival_seq"])
        assert a == sorted(range(n_unique))

        def boom(*_a, **_k):
            raise AssertionError("driver-collected drop filter engaged")

        monkeypatch.setattr(dd, "_drop_by_seq", boom)
        b = sorted(dd.exact_url_dedup(ds, drop_broadcast_max=0)
                   .to_pandas()["arrival_seq"])
        assert a == b

    def test_text_dedup_plasma_path_matches(self, monkeypatch):
        import pandas as pd
        import ray.data as rd

        rows = pd.DataFrame({
            "text": [f"body {i % 7}" for i in range(100)],
            "doc_id": pd.Series(range(100), dtype="int64")})
        ds = rd.from_pandas(rows).repartition(4)
        a = sorted(dd.exact_text_dedup(ds).to_pandas()["doc_id"])
        assert a == sorted(range(7))
        monkeypatch.setattr(dd, "_drop_by_seq", lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver-collected drop filter engaged")))
        b = sorted(dd.exact_text_dedup(ds, drop_broadcast_max=0)
                   .to_pandas()["doc_id"])
        assert a == b

    def test_minhash_dedup_greedy_order(self):
        ds, n_dropped = dd.minhash_dedup(make_ds())
        out = ds.to_pandas()
        exp = oracle.oracle_minhash_dedup(RECORDS)
        assert sorted(out["arrival_seq"]) == sorted(r["arrival_seq"] for r in exp)
        assert n_dropped == len(RECORDS) - len(exp)
        # the fixture family guarantees at least the 0.9-Jaccard near-dup drops
        assert n_dropped >= 1

    def test_minhash_two_pass_same_result(self):
        # the scale path (band-count pre-pass) must match the direct path
        ds1, n1 = dd.minhash_dedup(make_ds(), two_pass=True)
        ds2, n2 = dd.minhash_dedup(make_ds(), two_pass=False)
        assert n1 == n2
        assert sorted(ds1.to_pandas()["arrival_seq"]) == sorted(ds2.to_pandas()["arrival_seq"])

    def test_greedy_not_transitive(self):
        # chain a-b, b-c without a-c: greedy keeps a, drops b, KEEPS c
        dropped = dd.greedy_resolve([("a", "b"), ("b", "c")], {"a": 0, "b": 1, "c": 2})
        assert dropped == {"b"}

    def test_distributed_greedy_matches_driver(self):
        """greedy_resolve_distributed (label-propagation components +
        per-component replay) must equal the driver O(E) pass — including
        the non-transitive chain case and multiple components."""
        edges = [
            # chain: a-b, b-c (greedy keeps a, c; drops b)
            ("a", "b", 0, 1), ("b", "c", 1, 2),
            # clique of 3 in another component: keeps d, drops e, f
            ("d", "e", 10, 11), ("d", "f", 10, 12), ("e", "f", 11, 12),
            # 2-node component
            ("x", "y", 20, 21),
        ]
        df = pd.DataFrame(edges, columns=["a_id", "b_id", "a_seq", "b_seq"])
        exp = dd.greedy_resolve(
            [(a, b) for a, b, _, _ in edges],
            {n: s for a, b, sa, sb in edges for n, s in ((a, sa), (b, sb))},
        )
        got = dd.greedy_resolve_distributed(rd.from_pandas(df)).to_pandas()
        assert set(got["dropped_id"]) == exp == {"b", "e", "f", "y"}

    def test_minhash_distributed_resolve_same_result(self):
        ds1, n1 = dd.minhash_dedup(make_ds(), distributed_resolve=True)
        ds2, n2 = dd.minhash_dedup(make_ds(), distributed_resolve=False)
        assert n1 == n2
        assert sorted(ds1.to_pandas()["arrival_seq"]) == sorted(ds2.to_pandas()["arrival_seq"])

    def test_distributed_resolve_integer_ids(self):
        """The distributed resolver must accept INTEGER id columns (the
        doc_id-keyed queries): canon() once pinned pa.string() and crashed
        with ArrowTypeError the moment the distributed path engaged."""
        docs = pd.DataFrame({
            "id": range(10),
            "arrival_seq": range(10),
            "text": ["alpha beta gamma delta epsilon zeta"] * 5
                    + [f"unique text number {i} with words" for i in range(5)],
        })
        for fn in (dd.minhash_dedup, dd.ngram_jaccard_dedup, dd.simhash_dedup):
            d1, n1 = fn(rd.from_pandas(docs), distributed_resolve=True)
            d2, n2 = fn(rd.from_pandas(docs), distributed_resolve=False)
            assert n1 == n2 > 0
            assert sorted(d1.to_pandas()["id"]) == sorted(d2.to_pandas()["id"])

    def test_verified_lsh_deviation_is_pinned(self):
        """DOCUMENTED DEVIATION from the reference (deduplicator.py:122-144):
        the reference accepts raw datasketch-LSH band hits unverified; this
        engine verifies est_jaccard ≥ threshold before accepting an edge.
        This fixture is a pair that COLLIDES in at least one LSH band (the
        reference would drop one) but whose estimated Jaccard is below the
        0.7 threshold (this engine keeps both) — asserting the divergence is
        known and bounded, not invisible."""
        import pyarrow as pa

        from ai_intel_web_scraper_ray.functions import minhash as mh

        base_words = [f"w{i}" for i in range(60)]
        base = " ".join(base_words)
        # deterministic given the pinned minhash permutations: shares the
        # first 47 words, the rest replaced → est_jaccard ≈ 0.60 < 0.7
        var = " ".join(base_words[:47] + [f"x{i}" for i in range(13)])
        sigs = mh.signatures_batch([base, var])
        est = float((sigs[0] == sigs[1]).mean())
        bands = mh.band_hashes(sigs)
        assert set(bands[0]) & set(bands[1]), "fixture must collide in a band"
        assert est < mh.DEFAULT_THRESHOLD, "fixture must fail verification"

        t = pa.table({
            "id": pa.array(["a", "b"]),
            "arrival_seq": pa.array([0, 1], pa.int64()),
            "text": pa.array([base, var]),
        })
        ds, n_dropped = dd.minhash_dedup(rd.from_arrow(t))
        assert n_dropped == 0            # raw-LSH reference would drop one
        assert sorted(ds.to_pandas()["id"]) == ["a", "b"]

    def test_apply_drop_dataset_path(self):
        """The >1M-id drop path (Dataset filter, plasma-shared sorted array
        + searchsorted) must match the broadcast-set path — including rows
        whose ids sort before/after every dropped id, and string ids."""
        import pyarrow as pa

        t = pa.table({
            "id": pa.array(["a", "b", "c", "d", "zz"]),
            "arrival_seq": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "payload": pa.array([[1, 2], [3], [], [4, 5], [6]],
                                pa.list_(pa.int64())),  # non-key list col
        })
        dropped_ds = rd.from_items([{"dropped_id": "b"}, {"dropped_id": "zz"}])
        out, n = dd._apply_drop(rd.from_arrow(t), "id", dropped_ds)
        assert n == 2
        assert sorted(out.to_pandas()["id"]) == ["a", "c", "d"]

        # integer ids through the same path
        ti = pa.table({"id": pa.array([10, 20, 30], pa.int64())})
        di = rd.from_items([{"dropped_id": 20}])
        out, n = dd._apply_drop(rd.from_arrow(ti), "id", di)
        assert n == 1
        assert sorted(out.to_pandas()["id"]) == [10, 30]

        # empty drop Dataset is a no-op
        de = rd.from_items([{"dropped_id": "x"}]).filter(lambda r: False)
        out, n = dd._apply_drop(rd.from_arrow(ti), "id", de)
        assert n == 0
        assert out.count() == 3

    def test_apply_drop_null_ids_kept(self):
        """Anti-join semantics: rows with a NULL id never match and must
        survive BOTH drop paths (the r1 searchsorted path crashed on None
        in a string id column); null dropped_ids match nothing."""
        import pyarrow as pa

        t = pa.table({
            "id": pa.array(["a", None, "b", None, "c"]),
            "arrival_seq": pa.array([0, 1, 2, 3, 4], pa.int64()),
        })
        # small/broadcast-set path
        out, n = dd._apply_drop(rd.from_arrow(t), "id", {"b"})
        got = out.to_pandas()["id"]
        assert n == 1
        assert sorted(got.dropna()) == ["a", "c"] and got.isna().sum() == 2

        # large/Dataset path, including a null dropped_id
        dropped = rd.from_arrow(
            pa.table({"dropped_id": pa.array(["b", None, "zz"])}))
        out, n = dd._apply_drop(rd.from_arrow(t), "id", dropped)
        got = out.to_pandas()["id"]
        assert sorted(got.dropna()) == ["a", "c"] and got.isna().sum() == 2


class TestFullProcess:
    def test_matches_oracle_end_to_end(self):
        ds = process_pipeline(make_ds(), topic_keywords=fixtures.TOPIC_KEYWORDS)
        out = ds.to_pandas()
        exp = oracle.oracle_process(RECORDS, fixtures.TOPIC_KEYWORDS)
        assert sorted(out["arrival_seq"]) == sorted(r["arrival_seq"] for r in exp)
        # text content equality for the kept rows
        exp_by_seq = {r["arrival_seq"]: r for r in exp}
        for _, row in out.iterrows():
            assert row["text"] == exp_by_seq[row["arrival_seq"]]["text"]
            assert list(row["topics"]) == exp_by_seq[row["arrival_seq"]]["topics"]


class TestAnalysisStages:
    def test_sentiment_stage(self):
        from ai_intel_web_scraper_ray.functions.sentiment import estimate_sentiment

        ds = tf.sentiment_stage(make_ds(), out_col="sent2")
        out = by_id(ds.to_pandas())
        for i, r in enumerate(RECORDS):
            assert out.loc[i, "sent2"] == estimate_sentiment(r["text"])

    def test_langid_stage(self):
        from ai_intel_web_scraper_ray.functions.langid import detect_lang

        ds = tf.langid_stage(make_ds())
        out = by_id(ds.to_pandas())
        for i, r in enumerate(RECORDS):
            assert out.loc[i, "pred_lang"] == detect_lang(r["text"])

    def test_token_count_stage(self):
        from ai_intel_web_scraper_ray.functions.tokenizer import count_tokens

        ds = tf.token_count_stage(make_ds())
        out = by_id(ds.to_pandas())
        for i, r in enumerate(RECORDS[:10]):
            assert out.loc[i, "n_tokens"] == count_tokens(r["text"])
            assert out.loc[i, "n_ws_tokens"] == len(r["text"].split())

    def test_quality_score_stage(self):
        from ai_intel_web_scraper_ray.functions.quality import quality_features

        ds = tf.quality_score_stage(make_ds())
        out = by_id(ds.to_pandas())
        for i, r in enumerate(RECORDS[:10]):
            f = quality_features(r["text"])
            assert out.loc[i, "n_words"] == f["n_words"]
            assert out.loc[i, "stop_hits"] == f["stop_hits"]
            import math
            assert out.loc[i, "stop_ppm"] == math.floor(f["stop_hits"] * 1e6 / max(f["n_words"], 1))


class TestStagedBoundary:
    def test_stage_dir_matches_in_memory_boundary(self, tmp_path):
        """The 100-TB form of the mid-pipeline boundary (exactly-once
        partitioned stage write + read-back) must produce the identical
        processed record set, and a rerun must SKIP the committed stage
        partitions."""
        import os

        kept_mem = sorted(
            process_pipeline(make_ds(),
                             topic_keywords=fixtures.TOPIC_KEYWORDS)
            .to_pandas()["arrival_seq"])
        stage = str(tmp_path / "stage")
        kept_staged = sorted(
            process_pipeline(make_ds(),
                             topic_keywords=fixtures.TOPIC_KEYWORDS,
                             stage_dir=stage)
            .to_pandas()["arrival_seq"])
        assert kept_mem == kept_staged
        parts_before = sorted(os.listdir(stage))
        assert any(d.startswith("part=") for d in parts_before)
        # rerun with the same stage dir: committed partitions skip, and
        # the result is unchanged
        again = sorted(
            process_pipeline(make_ds(),
                             topic_keywords=fixtures.TOPIC_KEYWORDS,
                             stage_dir=stage)
            .to_pandas()["arrival_seq"])
        assert again == kept_mem
        assert sorted(os.listdir(stage)) == parts_before
