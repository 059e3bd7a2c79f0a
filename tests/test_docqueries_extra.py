"""DuckDB oracle parity for the round-2 continuation document/embedding
operators (stratified sampling, per-language percentiles, centroid
distances) at sf0.001 — the pytest twin of the driver gate rows."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from ai_intel_web_scraper_ray.pipelines import docqueries as dq
from tools.check_correctness import compare, to_pandas

SF_DIR = "/root/testdata/sf0.001"

ORACLE_QUERIES = [
    "docs_chi2_terms",
    "emb_dbscan",
    "emb_rptree_recall",
    "emb_lof",
    "docs_containment",
    "emb_knn_calibration",
    "docs_stratified_sample",
    "docs_token_percentiles_by_lang",
    "emb_centroid_distances",
    "docs_repetition",
    "docs_write_roundtrip",
    "docs_crossdup",
    "emb_range_search",
    "docs_tfidf_top_terms",
    "docs_pack_blocks",
    "emb_kmeans_assign",
    "docs_langid_confusion",
    "docs_lang_centered",
    "docs_dup_cluster_sizes",
    "emb_nn_within_label",
    "emb_int8_quantize",
    "docs_percent_rank",
    "docs_bigram_lift",
    "emb_kmeans_iterate",
    "docs_ntile",
    "docs_vector_enrich",
    "docs_rarity_score",
    "docs_interleaved_media_stats",
    "docs_media_ref_counts",
    "docs_inverted_index",
    "docs_mixture_weights",
    "docs_train_val_test",
    "docs_lang_vocab_overlap",
    "docs_incremental_dedup",
    "emb_pq_codes",
    "emb_pq_adc_topk",
    "emb_prefix_fidelity",
    "docs_interleaved_pack",
    "emb_power_iteration",
    "docs_pii_scrub",
    "docs_weighted_sample",
    "emb_ivf_recall",
    "docs_media_asset_dedup",
    "docs_training_build",
    "emb_mips_topk",
    "docs_compaction_roundtrip",
    "docs_minhash_recall",
    "emb_semdedup",
    "docs_quality_classifier",
    "docs_dsir_weights",
    "docs_edit_dedup",
    "docs_epoch_shuffle",
    "docs_lm_score",
    "emb_hard_negatives",
    "emb_kcenter",
    "docs_phrase_search",
    "emb_random_projection",
    "docs_gopher_rules",
    "docs_line_filter",
    "docs_line_dedup",
    "emb_hamming_topk",
    "emb_hamming_recall",
    "docs_bpe_merges",
    "emb_mmr",
    "docs_bm25",
    "docs_zipf_slope",
    "docs_source_lang_entropy",
    "docs_cdc_chunks",
    "docs_vocab_growth",
    "emb_pca_top2",
    "docs_ensemble_dedup",
    "emb_knn_classify",
    "docs_readability",
    "emb_silhouette",
    "docs_charclass_census",
    "docs_media_context",
    "emb_cluster_stats",
    "emb_nn_descent",
    "docs_dup_spans",
    "media_frames",
    "media_resize_decode",
]


def test_knn_classify_contract():
    """16 held-out queries, int32 label dtypes, correctness column is
    consistent with pred==true."""
    out = dq.emb_knn_classify(SF_DIR)
    assert len(out) == 16
    assert (out["vec_id"] % 5 == 0).all()
    assert str(out["pred_label"].dtype) == "int32"
    assert ((out["pred_label"] == out["true_label"]).astype(int)
            == out["correct"]).all()


def test_ensemble_dedup_clique_and_no_edges(tmp_path):
    """4 identical docs + 1 unique: both candidate paths produce the
    clique, the joint greedy keeps the first + the unique.  An all-unique
    corpus produces EMPTY edge sets on both paths — the canonicalized
    union must keep its schema and drop nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ai_intel_web_scraper_ray.stages import dedup as dd2

    dup = "the quick brown fox jumps over the lazy dog " * 8
    uniq = "completely different content about databases " * 8
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "text": pa.array([dup, dup, dup, dup, uniq])})
    ds = rd.from_arrow(t).map_batches(
        lambda b: b.append_column("id", b["doc_id"])
        .append_column("arrival_seq", b["doc_id"]),
        batch_format="pyarrow")
    deduped, n_dropped = dd2.ensemble_near_dedup(ds)
    kept = sorted(deduped.select_columns(["doc_id"]).to_pandas()["doc_id"])
    assert kept == [1, 5] and n_dropped == 3

    texts = [f"unique document number {i} with its own words {i * 7} "
             f"{'alpha beta gamma delta'[i:]}" for i in range(6)]
    t2 = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                   "text": pa.array(texts)})
    ds2 = rd.from_arrow(t2).map_batches(
        lambda b: b.append_column("id", b["doc_id"])
        .append_column("arrival_seq", b["doc_id"]),
        batch_format="pyarrow")
    deduped2, n2 = dd2.ensemble_near_dedup(ds2)
    assert n2 == 0 and deduped2.count() == 6


def test_pca_top2_deflation_properties():
    """loading1 must equal emb_power_iteration's direction exactly (same
    contract); the deflated second direction must be unit-norm and
    near-orthogonal to the first."""
    out = dq.emb_pca_top2(SF_DIR)
    p1 = dq.emb_power_iteration(SF_DIR)
    assert np.allclose(out["loading1"].to_numpy(),
                       p1["loading"].to_numpy())
    v1 = out["loading1"].to_numpy()
    v2 = out["loading2"].to_numpy()
    assert abs(np.linalg.norm(v2) - 1.0) < 1e-4
    assert abs(float(v1 @ v2)) < 0.05


def test_vocab_growth_known_curve(tmp_path):
    """doc_id domain 10..40 → thresholds 9+31k//8; first occurrences
    a→10, b→10, c→20, d→40 give the pinned cumulative curve."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array([10, 20, 30, 40], pa.int64()),
                  "text": pa.array(["a b", "b c", "a", "d"], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_vocab_growth(str(tmp_path))
    assert out["k"].tolist() == list(range(1, 9))
    assert out["t_doc"].tolist() == [9 + (31 * k) // 8 for k in range(1, 9)]
    assert out["vocab"].tolist() == [2, 2, 3, 3, 3, 3, 3, 4]


def test_vocab_growth_wordless_corpus(tmp_path):
    """Docs exist but no words: the curve keeps all 8 rows at zero (the
    oracle's LEFT JOIN semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["", "   "], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_vocab_growth(str(tmp_path))
    assert out["vocab"].tolist() == [0] * 8
    assert out["k"].tolist() == list(range(1, 9))


def _cdc_words(boundary: bool, n: int) -> list[str]:
    """Find n distinct words whose md5-32 % 8 == 0 matches ``boundary``."""
    import hashlib

    out = []
    i = 0
    while len(out) < n:
        w = f"w{i}"
        if (int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 8 == 0) \
                == boundary:
            out.append(w)
        i += 1
    return out


def test_cdc_chunks_boundary_semantics(tmp_path):
    """Chunks cut AFTER a boundary word; a front insertion only re-chunks
    the prefix (the content-defined property), so the tail chunk stays
    shared across all three docs; empty docs vanish."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    b = _cdc_words(True, 1)[0]
    p = _cdc_words(False, 6)  # plain words
    doc1 = f"{p[0]} {p[1]} {b} {p[2]} {p[3]}"        # [p0 p1 b][p2 p3]
    doc2 = f"{p[4]} {b} {p[2]} {p[3]}"               # [p4 b][p2 p3]
    doc3 = f"{p[5]} {p[0]} {p[1]} {b} {p[2]} {p[3]}"  # [p5 p0 p1 b][p2 p3]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([doc1, doc2, doc3, ""], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_cdc_chunks(str(tmp_path))
    got = {int(r.doc_id): (int(r.n_chunks), int(r.n_shared))
           for r in out.itertuples()}
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_cdc_chunks_trailing_boundary(tmp_path):
    """A doc ENDING on a boundary word must not emit a trailing empty
    chunk, and identical single-chunk docs count each other as shared."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    b = _cdc_words(True, 1)[0]
    p = _cdc_words(False, 2)
    text = f"{p[0]} {p[1]} {b}"
    t = pa.table({"doc_id": pa.array([7, 9], pa.int64()),
                  "text": pa.array([text, text], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_cdc_chunks(str(tmp_path))
    got = {int(r.doc_id): (int(r.n_chunks), int(r.n_shared))
           for r in out.itertuples()}
    assert got == {7: (1, 1), 9: (1, 1)}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, duck):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    ray_df = to_pandas(qs[name](SF_DIR))
    sql_df = duck.execute(sqls[name]).fetch_df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, f"{name}: {problems}"


def test_stratified_sample_is_partitioning_invariant():
    """The sample membership must be a pure function of the row, not of
    block layout: 1 block and 16 blocks give identical results."""
    import ray.data as rd

    base = dq.docs_stratified_sample(SF_DIR)

    ds1 = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                          columns=["doc_id", "lang", "n_chars"],
                          override_num_blocks=16)
    # recompute through the same partial over a different layout
    import ai_intel_web_scraper_ray.pipelines.docqueries as d

    ids_rates = ds1.map_batches(
        lambda df: df[(df["doc_id"].to_numpy(dtype="int64")
                       * d._SAMPLE_HASH_K) % d._SAMPLE_HASH_MOD % 100
                      < df["lang"].map(d._SAMPLE_RATES)
                      .fillna(d._SAMPLE_DEFAULT_RATE).to_numpy(dtype="int64")],
        batch_format="pandas").to_pandas()
    regrouped = ids_rates.groupby("lang", as_index=False).agg(
        n_sampled=("doc_id", "size"), id_checksum=("doc_id", "sum"),
        sum_chars=("n_chars", "sum")).sort_values("lang")
    for c in ("n_sampled", "id_checksum", "sum_chars"):
        assert list(regrouped[c].astype("int64")) == list(base[c])


def test_centroid_distances_match_numpy_reference():
    """Brute-force single-process reference: centroid cosine from the raw
    parquet, compared to the distributed result."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    uniq = np.unique(labels)
    cents = np.stack([mat[labels == u].sum(axis=0) for u in uniq])
    norms = np.sqrt((cents * cents).sum(axis=1))
    cos = (cents @ cents.T) / np.outer(norms, norms)
    ia, ib = np.triu_indices(len(uniq), k=1)
    expect = pd.DataFrame({"label_a": uniq[ia], "label_b": uniq[ib],
                           "cos_sim": np.round(cos[ia, ib], 6)})
    got = dq.emb_centroid_distances(SF_DIR)
    assert list(got["label_a"]) == list(expect["label_a"])
    assert list(got["label_b"]) == list(expect["label_b"])
    np.testing.assert_allclose(got["cos_sim"], expect["cos_sim"], atol=2e-6)


def test_crossdup_brute_force_reference():
    """Single-process brute force over raw parquet: a gram is a cross-doc
    duplicate iff >= 2 distinct doc_ids contain it (per-doc distinct)."""
    from collections import Counter

    from ai_intel_web_scraper_ray.functions import minhash as mh

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    per_doc = {int(d): set(mh.shingles(t, 8))
               for d, t in zip(docs["doc_id"], docs["text"])}
    counts = Counter(g for s in per_doc.values() for g in s)
    got = dq.docs_crossdup(SF_DIR)
    for _, row in got.iterrows():
        grams = per_doc[int(row["doc_id"])]
        nd = sum(1 for g in grams if counts[g] >= 2)
        assert int(row["n_distinct_grams"]) == len(grams)
        expect_ppm = int(np.floor(nd * 1_000_000.0 / max(len(grams), 1)))
        assert int(row["crossdup_ppm"]) == expect_ppm


def test_crossdup_is_partitioning_invariant():
    """1-block and 16-block layouts must agree (the dup-gram set and the
    per-batch membership pass are layout-independent)."""
    import ai_intel_web_scraper_ray.pipelines.docqueries as d

    base = d.docs_crossdup(SF_DIR)
    orig = d._docs

    def docs16(sf_dir, columns=None, num_blocks=8):
        return orig(sf_dir, columns, num_blocks=16)

    d._docs = docs16
    try:
        re16 = d.docs_crossdup(SF_DIR)
    finally:
        d._docs = orig
    pd.testing.assert_frame_equal(base, re16)


def test_range_search_matches_brute_force():
    """Radius search == brute-force numpy filter over the raw parquet, at
    several thresholds including one that matches nothing."""
    from ai_intel_web_scraper_ray.pipelines.search import range_search
    import ray.data as rd

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    q = mat[ids == 0][0]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    scores = np.round((mat @ qn) / norms, 6)
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         override_num_blocks=8)
    for thr in (0.1, 0.5, 2.0):
        got = range_search(ds, q, thr)
        mask = scores >= thr
        order = np.lexsort((ids[mask], -scores[mask]))
        assert list(got["vec_id"]) == list(ids[mask][order])
        np.testing.assert_allclose(got["score"], scores[mask][order],
                                   atol=2e-6)
        assert got["vec_id"].dtype == np.int64


def test_tfidf_is_partitioning_invariant():
    import ai_intel_web_scraper_ray.pipelines.docqueries as d

    base = d.docs_tfidf_top_terms(SF_DIR)
    assert len(base) > 0 and set(base.columns) == {
        "lang", "word", "tf", "df", "score_q"}
    orig = d._docs

    def docs16(sf_dir, columns=None, num_blocks=8):
        return orig(sf_dir, columns, num_blocks=16)

    d._docs = docs16
    try:
        re16 = d.docs_tfidf_top_terms(SF_DIR)
    finally:
        d._docs = orig
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  re16.reset_index(drop=True))


def test_pack_blocks_prefix_sum_properties():
    """Packing invariants: starts are the exclusive prefix sum of token
    counts in doc_id order; offsets < block size; pack ids nondecreasing;
    and the result is identical across block layouts."""
    got = dq.docs_pack_blocks(SF_DIR)
    starts = (got["pack_id"].to_numpy() * dq._PACK_BLOCK_TOKENS
              + got["pack_offset"].to_numpy())
    expect = np.concatenate(([0], np.cumsum(got["n_tokens"].to_numpy())[:-1]))
    assert (starts == expect).all()
    assert (got["pack_offset"] < dq._PACK_BLOCK_TOKENS).all()
    assert (np.diff(got["pack_id"].to_numpy()) >= 0).all()

    import ai_intel_web_scraper_ray.pipelines.docqueries as d
    orig = d._docs

    def docs16(sf_dir, columns=None, num_blocks=8):
        return orig(sf_dir, columns, num_blocks=16)

    d._docs = docs16
    try:
        re16 = d.docs_pack_blocks(SF_DIR)
    finally:
        d._docs = orig
    pd.testing.assert_frame_equal(got, re16)


def test_dup_cluster_sizes_with_real_duplicates(tmp_path):
    """The testdata corpus has no exact duplicates (histogram = {1: n}),
    so build one that does: 3 singletons + one pair + one triple, and
    check the full multi-size histogram and partitioning-invariance."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    texts = (["unique %d" % i for i in range(3)]
             + ["pair text"] * 2 + ["triple text"] * 3)
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts,
                  "lang": ["en"] * len(texts),
                  "source": ["t"] * len(texts),
                  "n_chars": [len(t) for t in texts]}),
        tmp_path / "documents.parquet")
    out = dq.docs_dup_cluster_sizes(str(tmp_path))
    assert list(out["group_size"]) == [1, 2, 3]
    assert list(out["n_groups"]) == [3, 1, 1]


def test_nn_within_label_singleton_and_symmetry(tmp_path):
    """A singleton label emits no row (no neighbor exists); in a two-vector
    label each is the other's NN with an identical rounded score."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(5, 8)).astype(np.float32)
    labels = [0, 0, 1, 2, 2]
    pq.write_table(
        pa.table({"vec_id": list(range(5)),
                  "embedding": [v.tolist() for v in vecs],
                  "label": pa.array(labels, pa.int32())}),
        tmp_path / "embeddings.parquet")
    out = dq.emb_nn_within_label(str(tmp_path))
    assert list(out["vec_id"]) == [0, 1, 3, 4]
    # label 1 is a singleton → vec_id 2 must NOT appear
    out = out.set_index("vec_id")
    assert 2 not in out.index
    assert out.loc[0, "nn_id"] == 1 and out.loc[1, "nn_id"] == 0
    assert out.loc[3, "nn_id"] == 4 and out.loc[4, "nn_id"] == 3
    assert out.loc[0, "score"] == out.loc[1, "score"]


def test_power_iteration_matches_sequential_numpy():
    """The distributed two-pass loadings equal a single-process numpy run
    of the identical contract (and approximate the true top eigenvector)."""
    import pyarrow.parquet as pq

    X = np.stack(pq.read_table(f"{SF_DIR}/embeddings.parquet")
                 .column("embedding").to_pylist()).astype(np.float64)
    v = np.zeros(64); v[0] = 1.0
    for _ in range(2):
        w = X.T @ (X @ v)
        v = np.round(w / np.sqrt((w * w).sum()), 6)
    out = to_pandas(dq.emb_power_iteration(SF_DIR))
    assert np.array_equal(out["loading"].to_numpy(), v)
    # unit norm up to the 6-dp rounding contract
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4


def test_pii_scrub_synthesis_rules():
    out = to_pandas(dq.docs_pii_scrub(SF_DIR))
    tri = out[out["doc_id"] % 3 == 0]
    assert (tri["n_emails"] >= 1).all()
    assert (out[out["doc_id"] % 5 == 0]["n_phones"] >= 1).all()
    assert (out[out["doc_id"] % 7 == 0]["n_ips"] >= 1).all()
    none = out[(out["doc_id"] % 3 != 0) & (out["doc_id"] % 5 != 0)
               & (out["doc_id"] % 7 != 0)]
    assert (none[["n_emails", "n_phones", "n_ips"]].to_numpy() == 0).all()


def test_weighted_sample_is_partitioning_invariant():
    a = to_pandas(dq.docs_weighted_sample(SF_DIR))
    assert len(a) == 20 and a["doc_id"].is_unique
    assert list(a["sample_rank"]) == list(range(1, 21))


def test_ivf_recall_bounds_and_full_probe_is_exact():
    """recall_hits ∈ [0, 10]; probing ALL cells makes IVF == brute force
    (recall 10/10 and identical checksums)."""
    out = to_pandas(dq.emb_ivf_recall(SF_DIR))
    assert len(out) == 4
    assert out["recall_hits"].between(0, 10).all()
    full = to_pandas(dq.emb_ivf_recall(SF_DIR, nprobe=8))
    assert (full["recall_hits"] == 10).all()
    assert (full["ann_checksum"] == full["exact_checksum"]).all()


def test_media_asset_dedup_conservation():
    """Σ n_owned_refs == #distinct refs; Σ(n_media - n_dup_spans spans
    owned) consistency vs docs_media_ref_counts."""
    dedup = to_pandas(dq.docs_media_asset_dedup(SF_DIR))
    census = to_pandas(dq.docs_media_ref_counts(SF_DIR))
    assert dedup["n_owned_refs"].sum() == len(census)
    assert dedup["n_media"].sum() == census["n_spans"].sum()
    assert (dedup["n_dup_spans"] <= dedup["n_media"]).all()


def test_training_build_composes_stage_semantics(duck):
    """The composite must agree with composing its stages independently:
    split sizes follow 80/10/10 on the filtered survivor set."""
    out = to_pandas(dq.docs_training_build(SF_DIR))
    assert set(out["split"]) <= {"train", "val", "test"}
    n = out.groupby("split")["n_docs"].sum()
    total = int(n.sum())
    assert 0 < total <= 500
    assert n.get("train", 0) > n.get("val", 0)
    assert n.get("train", 0) > n.get("test", 0)
    # lowering the quality bar to zero must keep every distinct doc
    full = to_pandas(dq.docs_training_build(SF_DIR, min_words=0,
                                            min_stop_ppm=0))
    assert int(full["n_docs"].sum()) == 500


def test_mips_transform_equals_numpy_argmax():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    ip = X @ X[ids.tolist().index(0)]
    order = np.lexsort((ids, -ip))[:10]
    out = to_pandas(dq.emb_mips_topk(SF_DIR))
    assert list(out["vec_id"]) == list(ids[order])
    assert np.allclose(out["ip"], np.round(ip[order], 6))


def test_compaction_actually_merges_files():
    """File-count contract the gate row can't check: 64 fragments in,
    ≤4 files out, zero rows lost (the aggregate is oracle-checked)."""
    import glob
    import shutil
    import tempfile

    import ray.data as rd

    root = tempfile.mkdtemp(prefix="aiws_compact_t_")
    try:
        ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                             columns=["doc_id"], override_num_blocks=64)
        ds.write_parquet(f"{root}/small")
        n_small = len(glob.glob(f"{root}/small/*.parquet"))
        rd.read_parquet(f"{root}/small").repartition(4) \
            .write_parquet(f"{root}/compact")
        n_compact = len(glob.glob(f"{root}/compact/*.parquet"))
        assert n_small > 16
        assert n_compact <= 4
        back = rd.read_parquet(f"{root}/compact")
        assert back.count() == 500
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_minhash_recall_audit_bounds():
    out = to_pandas(dq.docs_minhash_recall(SF_DIR))
    r = out.iloc[0]
    assert 0 <= r["n_true_candidates"] <= r["n_exact_pairs"]
    assert r["n_true_candidates"] <= r["n_candidate_pairs"]
    assert 0 <= r["recall_ppm"] <= 1_000_000
    # the sf0.001 corpus has real near-duplicates, so the audit is not
    # vacuous (and 4x4 banding at theta=0.5 should catch most of them)
    assert r["n_exact_pairs"] > 0
    assert r["recall_ppm"] >= 500_000


def test_semdedup_and_edit_dedup_drop_paths_fire():
    """Thresholds are calibrated to the synthetic tables so the dedup
    queries actually drop rows — a dedup gate row that returns its input
    unchanged would pin nothing."""
    sem = dq.emb_semdedup(SF_DIR)
    assert len(sem) < 500
    ed = dq.docs_edit_dedup(SF_DIR)
    n_docs = len(pd.read_parquet(f"{SF_DIR}/documents.parquet"))
    assert len(ed) < n_docs


def test_quality_classifier_is_partitioning_invariant():
    """Feature hashing + weight lookup is a pure row property: 1 block
    and 16 blocks give identical scores."""
    import ray.data as rd

    base = dq.docs_quality_classifier(SF_DIR)
    one = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                          columns=["doc_id", "text"],
                          override_num_blocks=1).to_pandas()
    import hashlib

    ex = pd.DataFrame({
        "doc_id": one["doc_id"],
        "word": one["text"].fillna("").str.lower().str.split(),
    }).explode("word", ignore_index=True).dropna(subset=["word"])
    w = ex["word"].map(lambda t: (int(hashlib.md5(t.encode()).hexdigest()[:8],
                                      16) % 1024) * 2654435761 % 2003 - 1001)
    ref = ex.assign(wgt=w).groupby("doc_id", as_index=False)["wgt"].sum() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(base["score_sum"]) == list(ref["wgt"].astype("int64"))


def test_edit_dedup_byte_semantics_match_duckdb_on_non_ascii(tmp_path):
    """DuckDB's levenshtein() edits BYTES and RE2's \\s is ASCII-only;
    the engine must match both on non-ASCII text (the shipped corpus is
    pure ASCII, so this pins the contract the gate can't see).  The
    'héllö wörld xyzw' pair is 3 edits in codepoints (≤4 → dropped) but
    6 in bytes (kept) — byte semantics is observable in the survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (0, "en", "hello world xyzw padd padd padd"),
        (1, "en", "héllö wörld xyzw padd padd padd"),  # é ö ö
        (2, "en", "hello world xyzw padd padd pads"),  # 1 ASCII edit vs 0
        (3, "zh", "中文文档 abc def ghi jkl"),
        (4, "zh", "中文文件 abc def ghi jkl"),  # 1 char, 3 bytes
        (5, "en", "a b c nbsp stays intact here"),  # RE2 keeps NBSP
        (6, "en", "a b c nbsp stays intact here"),
        (7, "en", "tab\tand\vvertical ws here padd"),  # \v: neither collapses
        (8, "en", "tab and\vvertical ws here padd"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["t"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = dq.docs_edit_dedup(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    sql_df = con.execute(entrymod.oracle_sql()["docs_edit_dedup"]).fetch_df()
    con.close()
    assert list(got["doc_id"]) == list(sql_df["doc_id"])
    # the byte-vs-codepoint discriminator: doc 1 survives (8 byte edits)
    assert 1 in set(got["doc_id"])
    # the plain ASCII near-dup is dropped
    assert 2 not in set(got["doc_id"])


def test_edit_dedup_pigeonhole_candidates_exact(tmp_path):
    """The pigeonhole candidate filter (both engine and oracle) must not
    miss any true pair: short heads (<5 chars, where pieces can be
    empty and the partition argument fails — covered by the brute
    short-short branch), boundary-length pairs, prefix/suffix edits,
    and a sequential all-pairs replay as the oracle of record."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq
    import re as _re

    texts = [
        "ab", "xy", "a", "", "abcd",              # short heads
        "abcde", "abcdx", "zbcde",                # len-5 boundary
        "hello world this is a long head", "xello world this is a long head",
        "hello world this is a long hexx",        # suffix edits
        "qq" + "hello world this is a long h",    # prefix insert (shifted)
        "totally different content here!!",
    ]
    rows = [(i, "en", t) for i, t in enumerate(texts)]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["t"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    # sequential all-pairs replay (reference semantics)
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    heads = [_re.sub(r"[\t\n\f\r ]+", " ", x.lower())[:32] for x in texts]
    dropped = set()
    for a, b in itertools.combinations(range(len(heads)), 2):
        if heads[a] == heads[b] or (abs(len(heads[a]) - len(heads[b])) <= 4
                                    and lev(heads[a], heads[b]) <= 4):
            dropped.add(max(a, b))
    expected = sorted(set(range(len(heads))) - dropped)

    got = dq.docs_edit_dedup(str(tmp_path))
    assert list(got["doc_id"]) == expected

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    sql_df = con.execute(entrymod.oracle_sql()["docs_edit_dedup"]).fetch_df()
    con.close()
    assert list(sql_df["doc_id"]) == expected
    # the short-short pair ('ab','xy': ed 2) and ('a','' : ed 1) must
    # have been caught by the brute branch, not survive as false keeps
    assert 1 not in set(got["doc_id"]) and 3 not in set(got["doc_id"])


def test_new_doc_operators_handle_empty_tables(tmp_path):
    """An empty shard must be a no-op, not a driver-side KeyError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    })
    embs = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    pq.write_table(embs, tmp_path / "embeddings.parquet")
    sf = str(tmp_path)
    for fn, cols in [
        (dq.docs_quality_classifier,
         ["doc_id", "n_tokens", "score_sum", "label"]),
        (dq.docs_dsir_weights, ["doc_id", "n_tokens", "dsir_sum"]),
        (dq.docs_edit_dedup, ["doc_id"]),
        (dq.docs_epoch_shuffle, ["doc_id", "skey", "pos", "shard"]),
        (dq.emb_semdedup, ["vec_id", "cluster_id"]),
        (dq.docs_lm_score, ["doc_id", "nbig", "avg_lm_q"]),
        (dq.emb_hard_negatives, ["query_id", "rank", "vec_id", "score"]),
        (dq.emb_kcenter, ["sel_rank", "vec_id", "maxsim"]),
        (dq.docs_phrase_search, ["doc_id", "n_matches"]),
        (dq.emb_random_projection, ["vec_id", "dim", "value"]),
    ]:
        out = fn(sf)
        assert len(out) == 0, fn.__name__
        assert list(out.columns) == cols, fn.__name__


def test_mmr_fewer_candidates_than_rounds(tmp_path):
    """MMR must emit fewer rows, not crash, when the candidate pool is
    smaller than the round count (r2 review finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([list(map(float, rng.standard_normal(64)))
                               for _ in range(4)],
                              pa.list_(pa.float64())),
        "label": pa.array([0, 1, 0, 1], pa.int64()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_mmr(str(tmp_path))  # 3 candidates, 5 rounds
    assert list(out["round"]) == [1, 2, 3]
    assert set(out["vec_id"]) == {1, 2, 3}


def test_entropy_and_hamming_edge_cases(tmp_path):
    """Entropy returns a typed empty frame on an empty documents table;
    Hamming codes stay exact at non-64-multiple dims (r2 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({"source": pa.array([], pa.string()),
                     "lang": pa.array([], pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    assert len(dq.docs_source_lang_entropy(str(tmp_path))) == 0

    rng = np.random.default_rng(3)
    dim = 96  # not a multiple of 64 → two words, zero-padded tail
    vecs = [list(map(float, rng.standard_normal(dim))) for _ in range(6)]
    emb = pa.table({"vec_id": pa.array(list(range(6)), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float64())),
                    "label": pa.array([0] * 6, pa.int64())})
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    out = dq.emb_hamming_topk(str(tmp_path), k=6)
    q = np.array(vecs[0])
    exp = [(int(((np.array(v) >= 0) != (q >= 0)).sum()), i)
           for i, v in enumerate(vecs)]
    exp.sort()
    assert list(out["vec_id"]) == [i for (_, i) in exp]
    assert list(out["hamming"]) == [h for (h, _) in exp]


def test_bpe_merge_semantics(tmp_path):
    """Pins the BPE contract on a hand-computed corpus: pair counts are
    OVERLAPPING ("aaaa" has 3 (a,a) adjacencies), merge application is
    leftmost-NON-overlapping ("a a a a" -> "aa aa", not "aa a a"), and
    the loop stops early when no pairs remain."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aaaa aaaa bc", "bc bc"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
        "n_chars": pa.array([12, 5], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = dq.docs_bpe_merges(str(tmp_path))  # rounds=5, stops after 3
    rows = list(out.itertuples(index=False, name=None))
    # r1: (a,a) 3 overlapping adjacencies x freq 2 = 6, beats (b,c)=3
    # r2: after "aaaa"->"aa aa", (aa,aa)=2 < (b,c)=3 -> (b,c) wins
    # r3: (aa,aa)=2 is the only pair left; r4 finds none -> early stop
    assert rows == [(1, "a", "a", 6), (2, "b", "c", 3), (3, "aa", "aa", 2)]


def test_new_ops_degenerate_tables(tmp_path):
    """Empty/one-row inputs: emb_hamming_recall returns a typed empty
    frame for an empty embeddings table AND for a 1-row corpus (the SQL
    twin emits no row when a query has zero candidates); docs_bpe_merges
    returns a typed empty frame when the corpus has no words."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = pa.table({"vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                    "label": pa.array([], pa.int64())})
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    out = dq.emb_hamming_recall(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == [
        "query_vec_id", "n_hits", "recall_ppm"]

    one = pa.table({"vec_id": pa.array([0], pa.int64()),
                    "embedding": pa.array([[1.0] * 64],
                                          pa.list_(pa.float64())),
                    "label": pa.array([0], pa.int64())})
    pq.write_table(one, tmp_path / "embeddings.parquet")
    assert len(dq.emb_hamming_recall(str(tmp_path))) == 0

    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["!!! ???"], pa.string()),
                     "lang": pa.array(["en"], pa.string()),
                     "source": pa.array(["s"], pa.string()),
                     "n_chars": pa.array([7], pa.int64())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = dq.docs_bpe_merges(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == ["round", "s1", "s2", "n"]


def test_hamming_recall_small_pool(tmp_path):
    """emb_hamming_recall with fewer candidates than k and non-64 dims:
    each query sees 5 candidates, both top-k sets are the full pool, so
    recall_ppm = 5*1e6 // 10 = 500000 for every query; queries are the
    available vec_id<8 rows even when the table has fewer than 8."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    dim = 80  # non-multiple of 64 → padded second word
    vecs = [list(map(float, rng.standard_normal(dim))) for _ in range(6)]
    emb = pa.table({"vec_id": pa.array(list(range(6)), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float64())),
                    "label": pa.array([0] * 6, pa.int64())})
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    out = dq.emb_hamming_recall(str(tmp_path), k=10)
    assert list(out["query_vec_id"]) == list(range(6))
    assert (out["n_hits"] == 5).all()
    assert (out["recall_ppm"] == 500000).all()


def test_readability_degenerate_docs(tmp_path):
    """No-punctuation docs count as ONE sentence; an all-whitespace doc
    has zero words and is ABSENT (the SQL WHERE); vowel-group runs count
    once per run, not per vowel."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello world no punctuation here",
                          "   \t  ",
                          "Beautiful!! Queueing... aeiou"], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_readability(str(tmp_path))
    assert list(out["doc_id"]) == [1, 3]
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert r1["n_sents"] == 1            # floored at one sentence
    assert r1["n_words"] == 5
    # doc 3: "Beautiful!!" → eau+i+u = [eau][i][u]? lowercased runs:
    # b(eau)t(i)f(u)l = 3, q(ueuei)ng = 1, (aeiou) = 1, plus words=3
    r3 = out[out["doc_id"] == 3].iloc[0]
    assert r3["n_words"] == 3
    assert r3["n_sents"] == 2            # '!!' and '...' runs
    assert r3["n_syll"] == 5
    assert r3["flesch_milli"] == 206835 - 1015 * 3 // 2 - 84600 * 5 // 3


def test_silhouette_single_label(tmp_path):
    """With one label there is no 'other' centroid: b_sim pins to 0 and
    sil = ROUND(a / (1 - LEAST(a, 0)), 6) — both sides of the driver
    compare must agree on the degenerate corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [[1.0] + [0.0] * 63, [0.5] + [0.5] + [0.0] * 62]
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([7, 7], pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = dq.emb_silhouette(str(tmp_path))
    assert (got["b_sim"] == 0.0).all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    exp = con.execute(entrymod.oracle_sql()["emb_silhouette"]).fetch_df()
    con.close()
    problems = compare("emb_silhouette", got, exp)
    assert not problems, problems


def test_rake_keywords_hand_walked(tmp_path):
    """Two docs hand-walked through RAKE: doc2's bare 'learning' phrase
    dilutes learning's score (deg·10⁶//freq = 7·10⁶//4) so
    'deep learning' (3 occurrences) scores 3_750_000, below the two
    4_000_000 singleton phrases whose tie is broken phrase-ASC."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2], dtype="int64"),
        "text": ["Deep learning of deep nets! fast nets",
                 "deep learning, deep learning and learning"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    out = dq.docs_rake_keywords(str(tmp_path))
    got = [(r.phrase, int(r.n_occ), int(r.score))
           for r in out.itertuples(index=False)]
    assert got == [("deep nets", 1, 4_000_000),
                   ("fast nets", 1, 4_000_000),
                   ("deep learning", 3, 3_750_000),
                   ("learning", 1, 1_750_000)]

    # empty corpus: typed empty frame, schema intact
    pq.write_table(pa.Table.from_pandas(
        df.iloc[:0], preserve_index=False), tmp_path / "documents.parquet")
    empty = dq.docs_rake_keywords(str(tmp_path))
    assert list(empty.columns) == ["phrase", "n_occ", "score"]
    assert len(empty) == 0


def test_residual_quantize_improves_and_degenerates(tmp_path):
    """RQ-2 on a planted corpus: vectors near codebook-1 entry 0 whose
    residuals match residual-codebook entry 8 must code (0, 8) with a
    near-zero err_sq; and a table with ≤ 8 vectors has no residual
    codebook → empty frame (the SQL twin's empty cb2 join)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    rng = np.random.default_rng(7)
    cb1 = rng.normal(size=(8, 64)) * 10.0          # well-separated level-1
    res8 = rng.normal(size=64)                     # residual direction
    vecs = list(cb1)                               # ids 0..7: the codebook
    vecs.append(cb1[0] + res8)                     # id 8: residual = res8
    for i in range(9, 16):                         # ids 9..15: other cells
        vecs.append(cb1[i - 8] + rng.normal(size=64) * 0.1)
    # test rows 16..19: centroid 0 plus (almost) exactly res8
    for j in range(16, 20):
        vecs.append(cb1[0] + res8 + rng.normal(size=64) * 1e-4)
    df = pd.DataFrame({
        "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
        "embedding": [list(map(float, v)) for v in vecs]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "embeddings.parquet")
    out = dq.emb_residual_quantize(str(tmp_path))
    rows = out.set_index("vec_id")
    for j in range(16, 20):
        assert int(rows.loc[j, "code1"]) == 0
        assert int(rows.loc[j, "code2"]) == 8
        assert float(rows.loc[j, "err_sq"]) < 1e-4

    pq.write_table(pa.Table.from_pandas(df.iloc[:6], preserve_index=False),
                   tmp_path / "embeddings.parquet")
    empty = dq.emb_residual_quantize(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["vec_id", "code1", "code2", "err_sq"]


def test_js_divergence_pins_identical_and_disjoint(tmp_path):
    """JSD planted cases: identical unigram distributions score 0;
    fully disjoint vocabularies score 2*(round(ln2*1e6) tdiv 2) =
    693146 micro-nats (the per-word fixed-point-ln contract); a
    single-language or empty corpus returns a typed empty frame."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    # en and fr have IDENTICAL distributions {x:2, y:1}; de is disjoint
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "lang": ["en", "en", "fr", "de"],
        "text": ["x x", "y", "x y x", "p q r"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    out = dq.docs_js_divergence(str(tmp_path))
    got = {(r.lang1, r.lang2): (int(r.n_words), int(r.jsd_micro))
           for r in out.itertuples(index=False)}
    assert got[("en", "fr")] == (2, 0)            # identical → 0
    assert got[("de", "en")] == (5, 693146)       # disjoint → ~ln 2
    assert got[("de", "fr")] == (5, 693146)
    assert list(out.columns) == ["lang1", "lang2", "n_words", "jsd_micro"]

    # single lang → empty; empty corpus → empty, schema intact
    pq.write_table(pa.Table.from_pandas(
        df[df["lang"] == "en"], preserve_index=False),
        tmp_path / "documents.parquet")
    assert len(dq.docs_js_divergence(str(tmp_path))) == 0
    pq.write_table(pa.Table.from_pandas(df.iloc[:0], preserve_index=False),
                   tmp_path / "documents.parquet")
    empty = dq.docs_js_divergence(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["lang1", "lang2", "n_words", "jsd_micro"]


def test_char_entropy_pins_uniform_and_constant(tmp_path):
    """Entropy planted cases: a single repeated char scores 0; a
    4-char uniform doc scores ln4 in micro-nats with the per-term
    fixed-point contract (4 × 1·round(ln4·1e6) // 4 = 1386294); a
    non-ascii doc counts CODE POINTS, not bytes; empty text emits no
    row."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["xxxx", "abcd", "éé€€", ""]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    out = dq.docs_char_entropy(str(tmp_path))
    got = {r.doc_id: (int(r.n_chars), int(r.n_distinct),
                      int(r.entropy_micro))
           for r in out.itertuples(index=False)}
    assert got == {"a": (4, 1, 0),
                   "b": (4, 4, 1386294),
                   "c": (4, 2, 693147)}
    assert list(out.columns) == ["doc_id", "n_chars", "n_distinct",
                                 "entropy_micro"]

    pq.write_table(pa.Table.from_pandas(df.iloc[:0], preserve_index=False),
                   tmp_path / "documents.parquet")
    empty = dq.docs_char_entropy(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["doc_id", "n_chars", "n_distinct",
                                   "entropy_micro"]


def test_textrank_path_graph_pins_two_iterations(tmp_path):
    """Path graph x—y—z from one doc: after the two integer-ppm
    iterations y (the hub) ranks 1127500 and the leaves tie at 936250
    (hand-computed through the 850/1000 damping contract); ties order
    alphabetically; empty corpus → typed empty frame."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    df = pd.DataFrame({"doc_id": ["d1"], "text": ["x y z"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    out = dq.docs_textrank(str(tmp_path))
    got = [(r.word, int(r.rank_ppm)) for r in out.itertuples(index=False)]
    assert got == [("y", 1127500), ("x", 936250), ("z", 936250)]

    pq.write_table(pa.Table.from_pandas(df.iloc[:0], preserve_index=False),
                   tmp_path / "documents.parquet")
    empty = dq.docs_textrank(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["word", "rank_ppm"]


def test_isotropy_pins_aligned_orthogonal_opposed(tmp_path):
    """Sum-vector identity planted cases: two copies of e₁ → exactly
    10⁶ micro (quantized ‖q‖²//10⁶); e₁ vs e₂ → 0; e₁ vs −e₁ → −10⁶
    (the sign-aware trunc-div path); a zero vector is excluded from n;
    fewer than 2 kept vectors → typed empty frame."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    def write(vecs):
        arrs = [np.zeros(64, dtype=np.float32) for _ in vecs]
        for a, (d, sign) in zip(arrs, vecs):
            a[d] = sign
        df = pd.DataFrame({
            "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
            "embedding": [list(map(float, a)) for a in arrs]})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp_path / "embeddings.parquet")

    write([(0, 1.0), (0, 1.0)])
    out = dq.emb_isotropy(str(tmp_path))
    assert (int(out.iloc[0].n_vecs),
            int(out.iloc[0].mean_cos_micro)) == (2, 1_000_000)

    write([(0, 1.0), (1, 1.0)])
    out = dq.emb_isotropy(str(tmp_path))
    assert int(out.iloc[0].mean_cos_micro) == 0

    write([(0, 1.0), (0, -1.0), (1, 0.0)])   # third row is all-zero
    out = dq.emb_isotropy(str(tmp_path))
    assert (int(out.iloc[0].n_vecs),
            int(out.iloc[0].mean_cos_micro)) == (2, -1_000_000)

    write([(0, 1.0)])
    empty = dq.emb_isotropy(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["n_vecs", "mean_cos_micro"]


def test_hapax_ratio_counts_global_not_per_batch(tmp_path):
    """A word split across two docs of the same lang is NOT a hapax
    (global count 2) — the per-batch-partials-are-not-global-dedup
    regression class; distinct langs count separately; empty corpus →
    typed empty frame."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "lang": ["en", "en", "fr"],
        "text": ["alpha beta", "alpha gamma", "alpha"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    out = dq.docs_hapax_ratio(str(tmp_path))
    got = {r.lang: (int(r.n_distinct), int(r.n_hapax), int(r.hapax_ppm))
           for r in out.itertuples(index=False)}
    # en: alpha×2 (not hapax), beta, gamma → 2/3 hapax
    assert got == {"en": (3, 2, 666666), "fr": (1, 1, 1000000)}

    pq.write_table(pa.Table.from_pandas(df.iloc[:0], preserve_index=False),
                   tmp_path / "documents.parquet")
    empty = dq.docs_hapax_ratio(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["lang", "n_distinct", "n_hapax",
                                   "hapax_ppm"]


def test_simpson_diversity_pins_uniform_and_concentrated(tmp_path):
    """Simpson planted cases: all-same-word lang scores exactly 10⁶;
    all-distinct lang scores 0; {a:2, b:1} → 2·1e6 // 6 = 333333;
    counts are GLOBAL per lang across docs; a 1-token lang emits no
    row; empty corpus → typed empty frame."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d", "e"],
        "lang": ["en", "en", "fr", "de", "it"],
        "text": ["w w", "w", "p q r", "a a b", "solo"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    out = dq.docs_simpson_diversity(str(tmp_path))
    got = {r.lang: (int(r.n_tokens), int(r.simpson_ppm))
           for r in out.itertuples(index=False)}
    assert got == {"en": (3, 1_000_000), "fr": (3, 0),
                   "de": (3, 333333)}
    assert "it" not in got

    pq.write_table(pa.Table.from_pandas(df.iloc[:0], preserve_index=False),
                   tmp_path / "documents.parquet")
    empty = dq.docs_simpson_diversity(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["lang", "n_tokens", "simpson_ppm"]


def test_burstiness_separates_bursty_from_uniform(tmp_path):
    """Over D=4 docs: a word with all 4 occurrences in ONE doc has
    Fano = (D·16 − 16)·10⁶ // (D·4) = 3·10⁶; a word spread 1-per-doc
    has variance 0 → 0 ppm; ranking pins (fano DESC, word ASC)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    texts = ["x x x x y", "y", "y", "y"]
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_burstiness(str(tmp_path), min_tot=1)
    got = {r.word: (int(r.tot), int(r.df), int(r.fano_ppm))
           for r in out.itertuples(index=False)}
    assert got["x"] == (4, 1, 3_000_000)
    assert got["y"] == (4, 4, 0)
    assert list(out["word"]) == ["x", "y"]  # fano DESC then word ASC
    # min-support drops everything → typed empty with the full schema
    hi = dq.docs_burstiness(str(tmp_path), min_tot=100)
    assert len(hi) == 0
    assert list(hi.columns) == ["word", "tot", "df", "fano_ppm"]


def test_lid_excludes_zero_distance_duplicates(tmp_path):
    """A query with an EXACT duplicate among its 8 neighbors drops it
    from both k_eff and the sum (d=0 would blow up ln d_k/d_i); the
    remaining terms reproduce the hand-evaluated MLE."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    def unit(t):
        v = np.zeros(64, dtype=np.float32)
        v[0], v[1] = 1.0, t
        return (v / np.linalg.norm(v)).astype(np.float32)

    # vec 0 is the only query (vec_id % 7 == 0 among ids 0..6);
    # vec 1 duplicates it exactly; 2..6 sit at increasing angles
    ts = [0.0, 0.0, 0.1, 0.2, 0.3, 0.4, 0.5]
    vecs = [unit(t) for t in ts]
    t = pa.table({
        "vec_id": pa.array(range(7), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 7, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_lid(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.qid) == 0
    assert int(r.k_eff) == 5  # 6 candidates, duplicate excluded
    # replicate the pinned arithmetic from the raw cosines
    q = np.asarray(vecs[0], dtype=np.float64)
    ds_ = []
    for v in vecs[2:]:
        v64 = np.asarray(v, dtype=np.float64)
        cs = float(v64 @ q / (np.linalg.norm(v64) * np.linalg.norm(q)))
        ds_.append(1.0 - round(cs, 6))
    dk = max(ds_)
    s = sum(int(np.round(math.log(dk / d) * 1_000_000)) for d in ds_)
    assert int(r.sum_micro) == s
    assert int(r.lid_ppm) == 5 * 10**12 // s


def test_snn_components_mutual_k2_splits_two_triads(tmp_path):
    """Two orthogonal triads with k=2: every vector's top-2 are its own
    triad mates (mutual), so exactly two components come out, labeled
    by their min vec_id with exact id checksums."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    def unit(axis, t_axis, t):
        v = np.zeros(64, dtype=np.float64)
        v[axis], v[t_axis] = 1.0, t
        return (v / np.linalg.norm(v)).astype(np.float32)

    vecs = [unit(0, 1, 0.0), unit(0, 1, 0.1), unit(0, 1, 0.2),
            unit(2, 3, 0.0), unit(2, 3, 0.1), unit(2, 3, 0.2)]
    t = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 6, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_snn_components(str(tmp_path), k=2)
    got = {int(r.component_id): (int(r.n_vecs), int(r.vec_checksum))
           for r in out.itertuples(index=False)}
    assert got == {0: (3, 3), 3: (3, 12)}


def test_components_census_distributed_matches_driver():
    """Force the label_components branch (driver_max_edges=0) on a
    small edge set and check it matches the driver union-find census
    row-for-row — the >2M-edge path must not collect the raw node-label
    table (regression for the ADVICE r2 driver-census fold)."""
    import pandas as pd
    import ray.data as rd
    from ai_intel_web_scraper_ray.pipelines.docqueries import \
        _components_census

    # two components: {1,2,3} (chain) and {10, 11}
    edges = pd.DataFrame({
        "a_id": pd.Series([1, 2, 10], dtype="int64"),
        "b_id": pd.Series([2, 3, 11], dtype="int64"),
        "a_seq": pd.Series([1, 2, 10], dtype="int64"),
        "b_seq": pd.Series([2, 3, 11], dtype="int64")})
    e0 = rd.from_pandas(edges).materialize()
    drv = _components_census(e0)
    dist = _components_census(e0, driver_max_edges=0)
    pd.testing.assert_frame_equal(drv, dist)
    got = {int(r.component_id): (int(r.n_vecs), int(r.vec_checksum))
           for r in dist.itertuples(index=False)}
    assert got == {1: (3, 6), 10: (2, 21)}


def test_bpe_fertility_per_lang_and_empty_win_parity(tmp_path):
    """With 2 training rounds, 'aaaa' collapses to ONE symbol (fertility
    10⁶) while 'xyzw' stays 4 (4·10⁶).  And on a corpus whose training
    runs out of pairs (all 1-char words), the generated twin's
    LEFT JOIN ON TRUE replay must keep rows — verified by running the
    oracle SQL directly against the engine output."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    from __ray_entry__ import _bpe_fertility_sql
    from tools.check_correctness import compare

    def write(texts_langs):
        t = pa.table({
            "doc_id": pa.array(range(len(texts_langs)), pa.int64()),
            "text": pa.array([x[0] for x in texts_langs], pa.string()),
            "lang": pa.array([x[1] for x in texts_langs], pa.string()),
            "source": pa.array(["s"] * len(texts_langs), pa.string()),
            "n_chars": pa.array([len(x[0]) for x in texts_langs],
                                pa.int64())})
        pq.write_table(t, tmp_path / "documents.parquet")

    write([("aaaa aaaa", "en"), ("xyzw", "fr")])
    out = dq.docs_bpe_fertility(str(tmp_path), rounds=2)
    got = {r.lang: (int(r.n_word_tokens), int(r.n_bpe_tokens),
                    int(r.fertility_ppm))
           for r in out.itertuples(index=False)}
    assert got["en"] == (2, 2, 1_000_000)
    assert got["fr"] == (1, 4, 4_000_000)

    # degenerate: every word 1 char → win1..win5 all EMPTY
    write([("a b c a", "en"), ("z", "fr")])
    eng = dq.docs_bpe_fertility(str(tmp_path), rounds=5)
    assert {r.lang: int(r.fertility_ppm)
            for r in eng.itertuples(index=False)} == {
                "en": 1_000_000, "fr": 1_000_000}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{tmp_path}/documents.parquet')")
    sql = con.execute(_bpe_fertility_sql()).fetchdf()
    problems = compare("docs_bpe_fertility", eng, sql)
    assert not problems, problems


def test_pq_recall_excludes_query_and_divides_by_k(tmp_path):
    """With only 9 non-query vectors and k=10, BOTH rankings hold all 9
    candidates → n_hits 9 but recall_ppm is still 9·10⁶//10 = 900000
    (the denominator is k, not the candidate count), and vec 0 never
    appears in its own candidate sets."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    rng = np.random.RandomState(7)
    vecs = rng.randn(10, 64).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 10, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_pq_recall(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.query_vec_id), int(r.n_hits), int(r.recall_ppm)) \
        == (0, 9, 900_000)


def test_charclass_census_pins_classes(tmp_path):
    """Known mixed-class doc: counts per class are exact and n_other
    picks up punctuation + non-ascii codepoints."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "lang": pa.array(["en", "en"], pa.string()),
                  "text": pa.array(["Ab1 c!", "naïve"], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_charclass_census(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    # "Ab1 c!": A upper, b+c lower, 1 digit, 1 space, ! other (6 chars)
    # "naïve":  n,a,v,e lower, ï other (5 chars)
    assert r["n_docs"] == 2 and r["n_chars"] == 11
    assert r["n_lower"] == 6 and r["n_upper"] == 1
    assert r["n_digit"] == 1 and r["n_space"] == 1 and r["n_other"] == 2


def test_media_context_window_clipping(tmp_path):
    """Trigger tokens at the doc edges clip their windows; the context
    always spans 1-based tokens [pos-2, pos+2] ∩ [1, len]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["sun alpha beta sea gamma sky"],
                                   pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_media_context(str(tmp_path))
    got = {(int(r.pos)): r.context for r in out.itertuples()}
    assert got == {
        1: "sun alpha beta",                 # left-clipped
        4: "alpha beta sea gamma sky",       # full ±2
        6: "sea gamma sky",                  # right-clipped
    }
    assert out["media_ref"].tolist() == [
        "img://sun/1", "img://sea/4", "img://sky/6"]


def test_cluster_stats_identical_vector_zero_distortion(tmp_path):
    """A member identical to its centroid contributes 0 distortion; all
    members are assigned exactly once (sizes sum to the table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [[1.0, 0.0], [0.0, 1.0],          # seeds 0, 1
            [1.0, 0.0],                      # exact copy of seed 0
            [0.6, 0.8]]                      # closer to seed 1
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 0, 0], pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_cluster_stats(str(tmp_path), n_seeds=2)
    assert out["n_members"].sum() == 4
    c0 = out[out["cluster_id"] == 0].iloc[0]
    # seed 0 + its exact copy: both at cos==1 → distortion 0
    assert c0["n_members"] == 2 and c0["distortion_micro"] == 0
    c1 = out[out["cluster_id"] == 1].iloc[0]
    # 0.6/0.8 → cos 0.8 vs seed1, 0.6 vs seed0 → joins 1, dist 200000
    assert c1["n_members"] == 2
    assert c1["max_dist_micro"] == 200000


def test_nn_descent_refinement_improves(tmp_path):
    """Two parity-interleaved clusters: ring init gives each node one
    same-cluster neighbor; the neighbors-of-neighbors round must find
    more, so recall and the summed best score both rise and the
    neighbor-edge count stays n·k."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    n, d = 24, 8
    base = {0: np.ones(d), 1: np.concatenate([np.ones(d // 2) * -1,
                                              np.ones(d // 2)])}
    vecs = [(base[i % 2] + 0.05 * rng.randn(d)).astype(np.float32)
            for i in range(n)]
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32())),
                  "label": pa.array([i % 2 for i in range(n)], pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_nn_descent(str(tmp_path))
    r0, r1 = out.iloc[0], out.iloc[1]
    assert r1["sum_best_sm"] >= r0["sum_best_sm"]
    assert r1["recall_ppm"] > r0["recall_ppm"]
    assert r0["n_edges"] == 24 * 3
    assert r1["n_edges"] == 24 * 3


def test_chi2_terms_hand_contingency(tmp_path, monkeypatch):
    """4 docs, 2 langs, min-support lowered to 2: 'pos' appears in both
    en docs and no de doc → a·n − wt·lt = 2·4 − 2·2 = 4 for en,
    0·4 − 2·2 = −4 for de; χ² = 4·16/(2·2·2·2) = 4 → 4_000_000 both
    ways (the statistic is symmetric in the 2×2 margins); 'both'
    appears everywhere → wt = n → pinned 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    monkeypatch.setattr(dq, "_CHI2_MIN_SUPPORT", 2)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["en", "en", "de", "de"]),
        "text": pa.array(["pos both", "pos both", "both", "both x"])})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_chi2_terms(str(tmp_path))
    got = {(r.lang, r.word): int(r.chi2_micro) for r in out.itertuples()}
    assert got[("en", "pos")] == 4_000_000
    assert got[("de", "pos")] == 4_000_000
    assert got[("en", "both")] == 0
    assert got[("de", "both")] == 0


def test_dbscan_core_border_noise_trichotomy(tmp_path):
    """Two 5-vector fans (0–40° in disjoint planes) are all-core
    (each has ≥4 in-plane neighbors at cos ≥ cos 40° = 0.77); a probe
    at 105° in plane A sees only the 40° member (cos 65° = 0.42 ≥
    0.32, cos 75° = 0.26 < 0.32) → border of cluster 0; an orthogonal
    singleton is noise and emits nothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    def ang(deg, i, j):
        v = np.zeros(64)
        v[i] = np.cos(np.radians(deg))
        v[j] = np.sin(np.radians(deg))
        return v

    vecs = [ang(d, 0, 1) for d in (0, 10, 20, 30, 40)] \
        + [ang(d, 2, 5) for d in (0, 10, 20, 30, 40)] \
        + [ang(105, 0, 1), [0.0] * 3 + [1.0] + [0.0] * 60]
    ids = [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 20, 30]
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(np.asarray(v, dtype=np.float32))
                               for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_dbscan(str(tmp_path))
    got = {int(r.cluster_id): (int(r.n_core), int(r.n_border),
                               int(r.vec_checksum))
           for r in out.itertuples(index=False)}
    assert got == {0: (5, 1, 30), 10: (5, 0, 60)}


def test_dbscan_no_core_is_empty(tmp_path):
    """Three mutually orthogonal vectors: nobody reaches min_pts → no
    clusters, typed-empty frame."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    vecs = [np.eye(64)[i] for i in (0, 1, 2)]
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([list(v.astype(np.float32)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_dbscan(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["cluster_id", "n_core", "n_border",
                                 "vec_checksum"]


def test_rptree_recall_identical_cluster_always_recalled(tmp_path):
    """Six identical vectors share identical projections → the tree
    cannot separate them, so a query among them finds all five copies
    in BOTH the exact and the leaf-restricted top-10 → n_hit ≥ 5; the
    engine output also hash-matches the generated SQL twin on this
    adversarial fixture (median ties everywhere)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    from __ray_entry__ import _rptree_sql
    from tools.check_correctness import compare, to_pandas

    rng = np.random.default_rng(7)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    vecs = [u] * 6 + [rng.normal(size=64) for _ in range(6)]
    t = pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([list(np.asarray(v, dtype=np.float32))
                               for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([0] * 12, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_rptree_recall(str(tmp_path))
    assert list(out["qid"]) == [0, 3, 6, 9]
    # queries 0 and 3 sit inside the identical six: their five twins are
    # exact top-5 AND leaf-mates → at least 5 hits of kk=10
    byq = {int(r.qid): int(r.n_hit) for r in out.itertuples(index=False)}
    assert byq[0] >= 5 and byq[3] >= 5
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    sql = con.execute(_rptree_sql()).fetch_df()
    con.close()
    problems = compare("emb_rptree_recall", out, to_pandas(sql))
    assert not problems, problems


def test_lof_isolated_point_scores_highest(tmp_path):
    """A tight 5-vector fan plus one far-off probe: the probe's
    neighbors are dense (small reach sums) while its own density is
    low → its LOF tops the list and exceeds 10⁶; the fan members score
    ≈10⁶ (their neighborhoods share their density).  Engine output also
    hash-matches the SQL twin on this fixture."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    import __ray_entry__ as entrymod
    from tools.check_correctness import compare, to_pandas

    def ang(deg, i, j):
        v = np.zeros(64)
        v[i] = np.cos(np.radians(deg))
        v[j] = np.sin(np.radians(deg))
        return v

    vecs = [ang(d, 0, 1) for d in (0, 5, 10, 15, 20)] + [ang(80, 0, 1)]
    t = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([list(np.asarray(v, dtype=np.float32))
                               for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([0] * 6, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_lof(str(tmp_path))
    assert int(out.iloc[0]["vec_id"]) == 5
    assert int(out.iloc[0]["lof_ppm"]) > 1_000_000
    fan = out[out["vec_id"] != 5]["lof_ppm"]
    assert (fan < out.iloc[0]["lof_ppm"]).all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    sql = con.execute(entrymod.oracle_sql()["emb_lof"]).fetch_df()
    con.close()
    problems = compare("emb_lof", out, to_pandas(sql))
    assert not problems, problems


def test_containment_asymmetric_and_df_floor(tmp_path):
    """doc 1 = 10 words (3 distinct 8-grams), doc 2 = doc 1's text plus
    a long unique tail: every gram of doc 1 is inside doc 2 →
    containment(1→2) = 10⁶ (row emitted) while containment(2→1) is far
    below 0.8 (row absent).  A boilerplate gram shared by MANY docs is
    df-floored out on both sides: 40 copies of one sentence contribute
    no pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tail = " ".join(f"tail{i}" for i in range(30))
    texts = [base, base + " " + tail]
    # 40 identical boilerplate docs (their shared grams have df 40 > 32)
    texts += ["common one two three four five six seven eight nine"] * 40
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_containment(str(tmp_path))
    got = {(int(r.src), int(r.dst)): (int(r.co), int(r.n_src),
                                      int(r.containment_ppm))
           for r in out.itertuples(index=False)}
    assert got == {(0, 1): (3, 3, 1_000_000)}


def test_knn_calibration_vote_buckets(tmp_path):
    """Holdout 0 sits inside a tight labeled fan of label 7 → 5/5 vote,
    correct; holdout 5 is orthogonal to everything and its 5 nearest
    labeled are a mixed bag — we only assert its bucket arithmetic via
    the oracle twin (engine ≡ SQL on this fixture) and that the 5-vote
    bucket is fully correct."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    import __ray_entry__ as entrymod
    from tools.check_correctness import compare, to_pandas

    def ang(deg, i, j):
        v = np.zeros(64)
        v[i] = np.cos(np.radians(deg))
        v[j] = np.sin(np.radians(deg))
        return v

    # ids 1,2,3,4,6 labeled 7 in a tight fan; id 0 (holdout) inside it;
    # id 5 (holdout) orthogonal, true label 3 → predicted 7, wrong
    vecs = [ang(10, 0, 1), ang(0, 0, 1), ang(5, 0, 1), ang(15, 0, 1),
            ang(20, 0, 1), np.eye(64)[5], ang(25, 0, 1)]
    labels = [7, 7, 7, 7, 7, 3, 7]
    t = pa.table({
        "vec_id": pa.array(range(7), pa.int64()),
        "embedding": pa.array([list(np.asarray(v, dtype=np.float32))
                               for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = dq.emb_knn_calibration(str(tmp_path))
    got = {int(r.votes): (int(r.n), int(r.n_correct))
           for r in out.itertuples(index=False)}
    # both holdouts see only label-7 neighbors → one 5/5 bucket of 2,
    # with exactly one correct (id 0)
    assert got == {5: (2, 1)}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    sql = con.execute(entrymod.oracle_sql()["emb_knn_calibration"]).fetch_df()
    con.close()
    problems = compare("emb_knn_calibration", out, to_pandas(sql))
    assert not problems, problems


def test_dup_spans_merge_and_multiplicity(tmp_path):
    """Crafted corpus pins the span algebra: a 10-token run shared by two
    docs yields 3 overlapping 8-gram hits that merge into ONE span of 10
    covered tokens; a doc repeating the run in two separated places gets
    n_spans=2; a unique-text doc emits no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    run = " ".join(f"s{i}" for i in range(10))          # 10 shared tokens
    filler = " ".join(f"f{i}" for i in range(9))        # 9 unique tokens
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            run,                                        # exactly the run
            f"u0 {run} u1 u2 {filler} {run} u3",        # run twice, split
            "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9",            # unique text
        ], pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dq.docs_dup_spans(str(tmp_path))
    assert out["doc_id"].tolist() == [1, 2]
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert (r1["n_spans"], r1["dup_tokens"], r1["n_tokens"]) == (1, 10, 10)
    assert r1["dup_ppm"] == 1_000_000
    r2 = out[out["doc_id"] == 2].iloc[0]
    # doc 2: 24 tokens of context make the second run start far enough
    # (gap > 8 positions) that the two covered runs stay separate spans
    assert (r2["n_spans"], r2["dup_tokens"]) == (2, 20)
    assert r2["n_tokens"] == 1 + 10 + 2 + 9 + 10 + 1
