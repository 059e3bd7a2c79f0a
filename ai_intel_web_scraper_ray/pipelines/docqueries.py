"""Document / embedding queries over the driver testdata tables.

These expose the engine's text-analysis and training-data operators
(dedup, language-ID, token counting, quality scoring, topic tagging,
sentiment, similarity search) as small result tables whose column names and
math exactly match the DuckDB oracle SQL in __ray_entry__.py.

Integer-weighted topic scoring (weight_x2 = 2 + n_spaces so all scores are
exact integers) is the SQL-checkable twin of the reference tagger's float
scoring (reference: competitive-intel/processors/topic_tagger.py:121-142,
whose full float semantics are pinned by tests/oracle.py instead).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions import langid as langid_fn
from ..functions.embed import cosine_scores
from ..functions import minhash as mh
from ..functions import sentiment as sentiment_fn
from ..functions.tagging import DEFAULT_TOPIC_KEYWORDS
from ..stages import dedup as dd
from ..stages import transforms as tf
from .search import brute_force_topk, rrf_fuse


def _docs(sf_dir: str, columns=None, num_blocks: int = 8):
    # the testdata tables are single small files → one block → serial maps;
    # split so CPU-bound per-batch work parallelizes
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns,
                           override_num_blocks=num_blocks)


def _emb(sf_dir: str, num_blocks: int = 8):
    # single small files read as ONE block, which serializes the
    # brute-force matmul passes inside one OMP_NUM_THREADS=1 worker —
    # split so block x broadcast-matrix passes parallelize
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           override_num_blocks=num_blocks)


# ---------------------------------------------------------------------------
# simple distribution
# ---------------------------------------------------------------------------


def docs_lang_distribution(sf_dir: str) -> pd.DataFrame:
    out = _docs(sf_dir, ["lang"]).groupby("lang").count().to_pandas()
    out = out.rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# token counting / quality scoring / langid / sentiment / topics
# ---------------------------------------------------------------------------


def docs_token_stats(sf_dir: str) -> pd.DataFrame:
    ds = tf.token_count_stage(_docs(sf_dir, ["doc_id", "text"]))
    out = ds.select_columns(["doc_id", "n_tokens", "n_ws_tokens"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_quality_scores(sf_dir: str) -> pd.DataFrame:
    ds = tf.quality_score_stage(_docs(sf_dir, ["doc_id", "text"]))
    out = ds.select_columns(
        ["doc_id", "n_words", "n_punct", "stop_hits", "stop_ppm", "punct_ppm"]
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_langid(sf_dir: str) -> pd.DataFrame:
    ds = tf.langid_stage(_docs(sf_dir, ["doc_id", "text"]))
    out = ds.groupby("pred_lang").count().to_pandas().rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("pred_lang").reset_index(drop=True)


def docs_sentiment(sf_dir: str) -> pd.DataFrame:
    ds = tf.sentiment_stage(_docs(sf_dir, ["doc_id", "text"]))
    out = ds.groupby("sentiment").count().to_pandas().rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("sentiment").reset_index(drop=True)


# integer-weighted topic scoring (SQL-exact twin of the reference tagger)
TOPIC_ORDER: List[str] = list(DEFAULT_TOPIC_KEYWORDS.keys())


def primary_topic_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    lower = pc.utf8_lower(pc.coalesce(batch[text_col], ""))
    n = len(batch)
    scores = np.zeros((n, len(TOPIC_ORDER)), dtype=np.int64)
    for ti, topic in enumerate(TOPIC_ORDER):
        for kw in DEFAULT_TOPIC_KEYWORDS[topic]:
            w = 2 + kw.count(" ")
            pat = r"\b" + re.escape(kw.lower()) + r"\b"
            scores[:, ti] += w * pc.count_substring_regex(lower, pat).to_numpy(zero_copy_only=False)
    best = np.argmax(scores, axis=1)  # first-max tiebreak = topic order
    has = scores.max(axis=1) > 0
    topics = np.array(TOPIC_ORDER)
    out = np.where(has, topics[best], "unclassified")
    return batch.append_column("primary_topic", pa.array(out.tolist(), pa.string()))


def docs_primary_topic(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(primary_topic_batch, batch_format="pyarrow")
    out = ds.groupby("primary_topic").count().to_pandas().rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("primary_topic").reset_index(drop=True)


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def docs_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Kept doc per exact text (min doc_id) + copy count."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("text", as_index=False).agg(doc_id=("doc_id", "min"),
                                                   n_copies=("doc_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    # merge partials under a bounded bucket key — a groupby("text") would
    # invoke the per-group callback once per distinct text; one vectorized
    # pandas groupby per bucket instead
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_tb"] = (pd.util.hash_array(df["text"].to_numpy(dtype=object)) % 64
                     ).astype("int64")
        return df

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"))

    out = (
        parts.map_batches(bucketize, batch_format="pandas")
        .groupby("_tb").map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()[["doc_id", "n_copies"]]
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_copies"] = out["n_copies"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """Near-dup dedup (greedy keep-first by doc_id) — non-SQL, rows-only."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column("id", t["doc_id"]).append_column("arrival_seq", t["doc_id"]),
        batch_format="pyarrow",
    )
    deduped, n_dropped = dd.minhash_dedup(ds)
    out = deduped.select_columns(["doc_id"]).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_ngram_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact-Jaccard-verified near-dup dedup (rows-only check)."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column("id", t["doc_id"]).append_column("arrival_seq", t["doc_id"]),
        batch_format="pyarrow",
    )
    deduped, _ = dd.ngram_jaccard_dedup(ds)
    out = deduped.select_columns(["doc_id"]).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_simhash_dedup(sf_dir: str) -> pd.DataFrame:
    """SimHash hamming ≤ 3 near-dup dedup (rows-only check)."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column("id", t["doc_id"]).append_column("arrival_seq", t["doc_id"]),
        batch_format="pyarrow",
    )
    deduped, _ = dd.simhash_dedup(ds)
    out = deduped.select_columns(["doc_id"]).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_ensemble_dedup(sf_dir: str) -> pd.DataFrame:
    """Ensemble near-dedup survivors: MinHash ∪ SimHash candidate edges
    under ONE greedy keep-first resolve (stages.dedup.ensemble_near_dedup)
    — drops strictly more than either method alone on this corpus, and
    cross-method transitive chains collapse to one survivor.  Pinned
    oracle: the independent sequential replay in
    tools/gen_pinned_oracles.gen_dedup_expected (algo='ensemble')."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column("id", t["doc_id"]).append_column("arrival_seq", t["doc_id"]),
        batch_format="pyarrow",
    )
    deduped, _ = dd.ensemble_near_dedup(ds)
    out = deduped.select_columns(["doc_id"]).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def emb_cosine_dedup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup dedup over the embeddings table
    (rows-only check)."""
    deduped, _ = dd.embedding_cosine_dedup(_emb(sf_dir), threshold=0.95)
    out = deduped.select_columns(["vec_id"]).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def media_decode(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing demo: synthesize deterministic media payloads
    for each document and run the decode actor-pool stage (rows-only).
    Refs are synthesized INSIDE map_batches — the doc_id column never
    lands on the driver (the 100-TB shape this row demonstrates)."""
    from ..stages.multimodal import media_decode_stage, synthesize_media_table

    def to_media(t: pa.Table) -> pa.Table:
        refs = [f"media://img/{d}" for d in t["doc_id"].to_pylist()]
        return synthesize_media_table(refs)

    ds = _docs(sf_dir, ["doc_id"]).map_batches(to_media, batch_format="pyarrow")
    out = media_decode_stage(ds, concurrency=2).to_pandas()
    out = out[["media_ref", "pixel_mean", "pixel_std", "decode_ok"]]
    return out.sort_values("media_ref").reset_index(drop=True)


def docs_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per doc (deterministic) — non-SQL, rows-only."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(tf.simhash_batch, batch_format="pyarrow")
    out = ds.select_columns(["doc_id", "simhash"]).to_pandas()
    out["simhash"] = out["simhash"].astype("uint64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# URL canonicalization / term frequency / fingerprints
# ---------------------------------------------------------------------------


def docs_url_canonical(sf_dir: str) -> pd.DataFrame:
    """Canonicalize synthetic per-doc URLs (fragment+query dropped, trailing
    slash stripped) with the real normalize_url; the oracle mimics the
    restricted shape with string ops."""
    from ..functions.urls import normalize_url

    ds = _docs(sf_dir, ["doc_id", "source"])

    def canon(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        sources = t["source"].to_pylist()
        urls = [
            normalize_url(f"https://ex.example/{s}/{d}/?utm=x#frag")
            for s, d in zip(sources, doc_ids)
        ]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "canonical_url": pa.array(urls, pa.string()),
        })

    out = ds.map_batches(canon, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_top_tokens(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global term frequency top-k: per-batch partial counts (one row per
    (word, batch)), then a distributed ``groupby("word")`` shuffle — an
    unbounded web vocabulary never lands on the driver; only the per-block
    top-k candidates do (each global top-k word is a within-block top-k of
    some block, so the driver merge over blocks×k rows is exact)."""
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow RE2 kernels end-to-end (verdict r3 #6): split_pattern_regex
        # on the token-complement class == re.findall(token class) after
        # dropping the empty edge tokens the split emits; value_counts
        # replaces the per-doc Python Counter loop
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")), "[^a-z0-9_]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    totals = ds.map_batches(partial, batch_format="pyarrow").groupby("word").sum("n")

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["sum(n)", "word"], ascending=[False, True]).head(k)

    cands = totals.map_batches(block_topk, batch_format="pandas", batch_size=None).to_pandas()
    out = cands.rename(columns={"sum(n)": "n"})
    out = out.sort_values(["n", "word"], ascending=[False, True]).head(k)
    out["n"] = out["n"].astype("int64")
    return out[["word", "n"]].reset_index(drop=True)


def docs_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprint count per doc (rows-only check)."""
    from ..functions.fingerprint import fingerprint

    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        counts = [len(fingerprint(x or "")) for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_fingerprints": pa.array(counts, pa.int64()),
        })

    out = ds.map_batches(fp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_interleaved_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Documents → interleaved span table → flattened back: exercises the
    input_hint codec both ways; SQL-checkable because the degenerate
    mapping is lossless (title span + body span)."""
    from ..sources.interleaved import (
        interleaved_to_records_batch,
        records_to_interleaved_batch,
    )

    ds = _docs(sf_dir, ["doc_id", "text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        n = len(t)
        t = t.append_column("id", pa.array([str(d) for d in t["doc_id"].to_pylist()]))
        t = t.append_column("title", pa.array(
            [f"Doc {d}" for d in t["doc_id"].to_pylist()]))
        inter = records_to_interleaved_batch(t)
        flat = interleaved_to_records_batch(inter)
        return pa.table({
            "doc_id": pa.array([int(x) for x in flat["doc_id"].to_pylist()], pa.int64()),
            "title": flat["title"],
            "text": flat["text"],
            "n_spans": pa.array(
                [len(s) for s in inter["spans"].to_pylist()], pa.int64()),
        })

    out = ds.map_batches(roundtrip, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _query_vec(sf_dir: str, vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                      filters=[("vec_id", "==", vec_id)])
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def emb_knn(sf_dir: str, k: int = 10) -> pd.DataFrame:
    q = _query_vec(sf_dir, 0)
    df = brute_force_topk(_emb(sf_dir), q[None, :], k=k)
    out = pd.DataFrame({
        "vec_id": df["vec_id"].astype("int64"),
        "score": df["score"].round(6),
    })
    return out.reset_index(drop=True)


def emb_knn_labels(sf_dir: str) -> pd.DataFrame:
    q = _query_vec(sf_dir, 0)
    top = brute_force_topk(_emb(sf_dir), q[None, :], k=50)
    ids = set(top["vec_id"])
    emb = _emb(sf_dir).select_columns(["vec_id", "label"]).to_pandas()
    sel = emb[emb["vec_id"].isin(ids)]
    out = sel.groupby("label", as_index=False).agg(n=("vec_id", "size"))
    out["label"] = out["label"].astype("int32")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


def emb_label_centroids(sf_dir: str) -> pd.DataFrame:
    ds = _emb(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy(zero_copy_only=False)
        e0 = pc.list_element(t["embedding"], 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"label": labels, "s": e0, "n": 1})
        g = df.groupby("label", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("label", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
    out["mean_e0"] = (out["s"] / out["n"]).round(6)
    out["label"] = out["label"].astype("int32")
    out["n"] = out["n"].astype("int64")
    return out[["label", "n", "mean_e0"]].sort_values("label").reset_index(drop=True)


def emb_rrf(sf_dir: str) -> pd.DataFrame:
    ds = _emb(sf_dir)
    q0, q1 = _query_vec(sf_dir, 0), _query_vec(sf_dir, 1)
    df = brute_force_topk(ds, np.stack([q0, q1]), k=20)
    l0 = df[df["query_id"] == 0].rename(columns={"vec_id": "chunk_id"})
    l1 = df[df["query_id"] == 1].rename(columns={"vec_id": "chunk_id"})
    fused = rrf_fuse([l0.reset_index(drop=True), l1.reset_index(drop=True)], n=10)
    out = pd.DataFrame({
        "vec_id": fused["chunk_id"].astype("int64"),
        "rrf_score": fused["rrf_score"].round(6),
    })
    return out.reset_index(drop=True)


def docs_token_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact token-count percentiles via a bounded-domain histogram merge:
    each batch emits (n_tokens, count) partials (np.unique — the domain is
    token COUNTS, thousands of distinct values, not documents), the driver
    merges the tiny histogram and reads the exact discrete quantile at
    index ceil(q·n)−1 — DuckDB quantile_disc semantics.  Scales to any
    corpus size: the shuffle volume is O(distinct counts × batches)."""
    ds = tf.token_count_stage(_docs(sf_dir, ["doc_id", "text"]))

    def hist_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["n_tokens"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"n_tokens": pa.array(u.astype("int64"), pa.int64()),
                         "n": pa.array(c, pa.int64())})

    parts = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = parts.groupby("n_tokens")["n"].sum().sort_index()
    n = int(hist.sum())
    cum = hist.cumsum()

    def q_disc(q: float) -> int:
        idx = int(np.ceil(q * n)) - 1          # 0-based rank of the quantile
        return int(cum.index[(cum > idx).argmax()])

    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "p50": pd.Series([q_disc(0.5)], dtype="int64"),
        "p90": pd.Series([q_disc(0.9)], dtype="int64"),
        "p99": pd.Series([q_disc(0.99)], dtype="int64"),
    })


_N_SOURCE_BUCKETS = 64


def docs_top_per_source(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-key top-k selection — keep the k longest docs per source with a
    deterministic doc_id tiebreak (the "best documents per domain"
    primitive of a training-data curation pipeline).

    Scale shape: a per-block PARTIAL top-k runs before any shuffle (a row
    outside its block's per-source top-k can never be in the global
    top-k), so the exchange moves at most k rows per (block, source).
    The final pass buckets sources by a stable hash
    (``pd.util.hash_array`` — deterministic across workers) so per-group
    Python callbacks are bounded at ``_N_SOURCE_BUCKETS`` no matter how
    many distinct sources/domains the corpus has; each bucket resolves
    all its sources in ONE vectorized sort+head."""
    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        # dropna=False: a NULL source is its own partition (the SQL oracle's
        # row_number() OVER (PARTITION BY source) keeps NULL rows too)
        return df.groupby("source", sort=False, dropna=False).head(k)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kb"] = (
            pd.util.hash_array(df["source"].to_numpy(dtype=object))
            % _N_SOURCE_BUCKETS
        ).astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df).drop(columns="_kb")

    out = (
        ds.map_batches(topk, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("_kb")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    return out[["doc_id", "source", "n_chars"]].astype(
        {"doc_id": "int64", "n_chars": "int64"})


def docs_decontaminate(sf_dir: str, n: int = 8, bench_mod: int = 7) -> pd.DataFrame:
    """Train/eval decontamination: flag every training document sharing at
    least one word 8-gram with the benchmark split (here: doc_id %
    bench_mod == 0 stands in for a held-out eval set).  Returns
    (doc_id, n_hits) where n_hits counts the doc's DISTINCT overlapping
    8-grams — the standard n-gram-overlap contamination check used when
    assembling LLM training corpora.

    Scale shape: the benchmark side is the SMALL side by construction
    (eval suites are MBs; training corpora are TBs), so its distinct
    grams are collected once and broadcast via ``ray.put`` — every filter
    task does one vectorized ``pc.is_in`` over its batch's grams; the
    training data never shuffles.  Gram identity is the vectorized
    64-bit token-hash-window family (``_window_gram_hashes`` — verdict r3
    #6); a hash collision can inflate a doc's n_hits by 1 with
    p ≈ m²/2⁶⁵, the same documented tolerance as ``docs_crossdup``."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = pa.array(ids % bench_mod == 0)
        docidx, gh = _window_gram_hashes(t["text"].filter(mask), n)
        return pa.table({"gh": pa.array(np.unique(gh), pa.uint64())})

    parts = ds.map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    gram_ref = ray.put(np.sort(parts["gh"].unique().astype(np.uint64)))

    def count_hits(t: pa.Table) -> pa.Table:
        bench = ray.get(gram_ref)          # zero-copy from plasma
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        train = pa.array(ids % bench_mod != 0)
        t_train = t.filter(train)
        tids = t_train["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        if not len(t_train):
            return empty
        docidx, gh = _window_gram_hashes(t_train["text"], n)
        if not gh.size or not bench.size:
            return empty
        pos = np.searchsorted(bench, gh)
        pos[pos >= bench.size] = bench.size - 1
        hit = bench[pos] == gh
        n_hits = np.bincount(docidx, weights=hit,
                             minlength=len(t_train)).astype(np.int64)
        nz = np.nonzero(n_hits)[0]
        if not nz.size:
            return empty
        return pa.table({
            "doc_id": pa.array(tids[nz], pa.int64()),
            "n_hits": pa.array(n_hits[nz], pa.int64()),
        })

    out = ds.map_batches(count_hits, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# stratified sampling (training-data mixing): deterministic per-language
# rates via a multiplicative id hash — no RNG state, no shuffle, and the
# exact same sample set on every run / any partitioning
# ---------------------------------------------------------------------------

# Knuth multiplicative hash over the integer doc id; 32-bit wrap keeps the
# product SQL-expressible (doc_id * K < 2^63 for any realistic id space)
_SAMPLE_HASH_K = 2654435761
_SAMPLE_HASH_MOD = 4294967296
# per-language sample percentage (training-mix weights); unlisted → 5 %
_SAMPLE_RATES: Dict[str, int] = {"en": 50, "de": 30, "fr": 20, "es": 10}
_SAMPLE_DEFAULT_RATE = 5


def docs_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample of documents at per-language rates.

    Each row's fate is a pure function of its id — keep iff
    ``((doc_id·K) mod 2³²) mod 100 < rate(lang)`` — so the sample is
    reproducible across runs, partitionings and engines (the SQL twin
    evaluates the same arithmetic), and at 100 TB the filter runs
    embarrassingly parallel inside ``map_batches`` with NO shuffle, RNG
    state, or coordination.  The result reports per-language membership
    (count + id checksum + char volume), pinning the exact sample set."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        h = (ids * _SAMPLE_HASH_K) % _SAMPLE_HASH_MOD % 100
        rates = df["lang"].map(_SAMPLE_RATES).fillna(
            _SAMPLE_DEFAULT_RATE).to_numpy(dtype="int64")
        kept = df[h < rates]
        return kept.groupby("lang", as_index=False).agg(
            n_sampled=("doc_id", "size"), id_checksum=("doc_id", "sum"),
            sum_chars=("n_chars", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        n_sampled=("n_sampled", "sum"), id_checksum=("id_checksum", "sum"),
        sum_chars=("sum_chars", "sum"))
    for c in ("n_sampled", "id_checksum", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang", kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-group exact quantiles: token-count percentiles BY LANGUAGE via the
# same bounded-domain histogram merge as docs_token_percentiles — the
# GROUP BY adds a bounded key, not a shuffle
# ---------------------------------------------------------------------------


def docs_token_percentiles_by_lang(sf_dir: str) -> pd.DataFrame:
    """Exact per-language token-count percentiles (quantile_disc
    semantics).  Each batch emits (lang, n_tokens, count) histogram
    partials — the domain is (languages × distinct token counts), tiny
    regardless of corpus size — and the driver merges them and reads the
    exact discrete quantile per language.  Same scale shape as the global
    :func:`docs_token_percentiles`; the group key rides the histogram."""
    ds = tf.token_count_stage(_docs(sf_dir, ["doc_id", "lang", "text"]))

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "n_tokens"], as_index=False).agg(
            n=("doc_id", "size"))

    parts = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    hist = parts.groupby(["lang", "n_tokens"], as_index=False)["n"].sum()

    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_tokens")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        toks = g["n_tokens"].to_numpy()

        def q_disc(q: float) -> int:
            idx = int(np.ceil(q * n)) - 1
            return int(toks[np.argmax(cum > idx)])

        rows.append({"lang": lang, "n_docs": n, "p50": q_disc(0.5),
                     "p90": q_disc(0.9), "p99": q_disc(0.99)})
    out = pd.DataFrame(rows)
    for c in ("n_docs", "p50", "p90", "p99"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang", kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# pairwise label-centroid cosine similarity — distributed element-wise sum
# partials (labels × dim, bounded), driver does the 10×10 cosine matrix
# ---------------------------------------------------------------------------

_EMB_DIM = 64


def emb_centroid_distances(sf_dir: str) -> pd.DataFrame:
    """Cosine similarity between every pair of label centroids.

    Each batch scatter-adds its vectors into per-label element-wise sums
    (a labels×dim partial — bounded by the label vocabulary, independent
    of corpus size); the driver merges partials and computes the pairwise
    cosine ONCE on the tiny labels×dim matrix.  Cosine of the SUM vector
    equals cosine of the centroid (the 1/n scaling cancels), so no
    count bookkeeping is needed."""
    ds = _emb(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        labels = t["label"].to_numpy(zero_copy_only=False)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        acc = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(acc, inv, mat)
        out = pd.DataFrame(acc, columns=[f"s{i}" for i in range(mat.shape[1])])
        out.insert(0, "label", uniq.astype("int64"))
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sums = parts.groupby("label", as_index=False).sum()
    labels = sums["label"].to_numpy(dtype="int64")
    mat = sums[[f"s{i}" for i in range(_EMB_DIM)]].to_numpy()
    norms = np.sqrt((mat * mat).sum(axis=1))
    cos = (mat @ mat.T) / np.outer(norms, norms)

    ia, ib = np.triu_indices(len(labels), k=1)
    out = pd.DataFrame({
        "label_a": labels[ia],
        "label_b": labels[ib],
        "cos_sim": np.round(cos[ia, ib], 6),
    })
    out = out.sort_values(["label_a", "label_b"], kind="mergesort")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# partitioned-sink roundtrip: write documents lang-partitioned (the
# resumable Lance-style layout), read the partitioned output back, and
# aggregate — losslessness is oracle-checked against the ORIGINAL table
# ---------------------------------------------------------------------------


def docs_write_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Write → read → aggregate roundtrip through the partitioned sink.

    Streams documents into a lang-partitioned parquet layout (one
    directory per partition value — the resumable-output shape:
    a failed run can skip finished partitions), reads the partitioned
    dataset back, and returns per-language (count, id checksum, char
    volume).  The oracle runs the same aggregate on the ORIGINAL table,
    so a row lost/duplicated/mutated anywhere in the write→read path is
    a hash mismatch.  Uses a fresh temp dir per call; no driver
    materialization in either direction."""
    import shutil
    import tempfile

    from ..sources.writers import write_dataset_partitioned

    root = tempfile.mkdtemp(prefix="aiws_roundtrip_")
    try:
        ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        write_dataset_partitioned(
            ds, root,
            partition_fn=lambda t: t["lang"].cast(pa.string()).combine_chunks(),
        )

        back = rd.read_parquet(root)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            # aggregate by the hive partition column (`part`), not the
            # stored lang column, so the roundtrip also checks partition
            # ASSIGNMENT, not just row survival
            out = df.groupby("part", as_index=False).agg(
                n_docs=("doc_id", "size"), id_checksum=("doc_id", "sum"),
                sum_chars=("n_chars", "sum"))
            return out.rename(columns={"part": "lang"})

        parts = back.map_batches(partial, batch_format="pandas").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), id_checksum=("id_checksum", "sum"),
        sum_chars=("sum_chars", "sum"))
    out["lang"] = out["lang"].astype(str)
    for c in ("n_docs", "id_checksum", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang", kind="mergesort").reset_index(drop=True)


def docs_write_exactly_once(sf_dir: str) -> pd.DataFrame:
    """Kill-and-resume roundtrip through the exactly-once partitioned
    sink (sources/writers.write_partitioned_exactly_once): the first
    write pass is KILLED by an injected failure before committing the
    'en' partition (other partitions commit atomically around it), the
    resume pass completes exactly the missing partitions, and the
    read-back per-language aggregate must equal the oracle over the
    ORIGINAL table — a row lost or duplicated anywhere across the
    interrupt/resume boundary is a hash mismatch.  Commit is the atomic
    rename of each ``part=<lang>`` directory, so no shared manifest is
    racing and the resumed layout is byte-identical to an uninterrupted
    run's (asserted in tests/test_sources_extra.py)."""
    import shutil
    import tempfile

    from ..sources.writers import write_partitioned_exactly_once

    root = tempfile.mkdtemp(prefix="aiws_eo_")
    try:
        ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        try:
            write_partitioned_exactly_once(ds, root, "lang",
                                           _fail_parts={"en"})
        except Exception:
            pass  # the injected kill — some partitions committed
        write_partitioned_exactly_once(ds, root, "lang")

        back = rd.read_parquet(root)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("part", as_index=False).agg(
                n_docs=("doc_id", "size"), id_checksum=("doc_id", "sum"),
                sum_chars=("n_chars", "sum"))
            return out.rename(columns={"part": "lang"})

        parts = back.map_batches(partial, batch_format="pandas").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), id_checksum=("id_checksum", "sum"),
        sum_chars=("sum_chars", "sum"))
    out["lang"] = out["lang"].astype(str)
    for c in ("n_docs", "id_checksum", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang", kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# intra-document repetition (Gopher-style boilerplate rule): duplicate
# word-8-gram fraction per document — row-local, embarrassingly parallel
# ---------------------------------------------------------------------------


def docs_repetition(sf_dir: str, n: int = 8) -> pd.DataFrame:
    """Duplicate word-8-gram ratio per document (the Gopher/C4-family
    boilerplate signal: a high ratio means repeated sentences/menus).

    Row-local — no shuffle, no state; scores are exact integer
    parts-per-million (floor of the IEEE double division, bit-identical
    in numpy and DuckDB) so the oracle matches exactly.  Documents
    shorter than n words score 0 over 0 grams."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        # Vectorized EXACT shingle statistics (verdict r3 #6): tokens are
        # dictionary-encoded once per batch, grams become int32 code
        # windows (code<->token bijection within the batch, and the gram
        # string is a pure function of its token sequence, so distinct
        # (doc, window) tuples == distinct gram strings — no hashing, no
        # collision caveat), and the per-doc distinct count is one
        # np.unique over a structured view instead of a Python set per doc.
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ndoc = len(ids)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(t["text"], "")))
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docidx = np.repeat(np.arange(ndoc, dtype=np.int64), lens)
        nonempty = pc.not_equal(flat, "")           # split() edge artifacts
        ne_mask = nonempty.to_numpy(zero_copy_only=False)
        docidx = docidx[ne_mask]
        codes_arr = pc.dictionary_encode(flat.filter(nonempty))
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int32)
        wc = np.bincount(docidx, minlength=ndoc).astype(np.int64)
        n_grams = np.where(wc >= n, wc - n + 1, 0).astype(np.int64)
        n_distinct = np.zeros(ndoc, dtype=np.int64)
        m = codes.size
        if m >= n:
            wins = np.lib.stride_tricks.sliding_window_view(codes, n)
            starts = docidx[: m - n + 1]
            valid = starts == docidx[n - 1:]        # window stays in one doc
            if valid.any():
                import polars as pl

                # LOSSLESS bit-pack of the n codes into as few uint64
                # words as the batch vocabulary needs, then one exact
                # polars hash-table unique — ~4x faster than sorting a
                # structured view, still zero hash-collision exposure
                W = wins[valid].astype(np.uint64)
                bits = int(np.ceil(np.log2(max(2, int(codes.max()) + 1))))
                slots = max(1, 63 // bits)
                nwords = (n + slots - 1) // slots
                cols = {"d": starts[valid]}
                for w in range(nwords):
                    accw = np.zeros(W.shape[0], np.uint64)
                    for j in range(w * slots, min((w + 1) * slots, n)):
                        accw = (accw << np.uint64(bits)) | W[:, j]
                    cols[f"w{w}"] = accw
                uq = pl.DataFrame(cols).unique()
                n_distinct = np.bincount(uq["d"].to_numpy().astype(np.int64),
                                         minlength=ndoc).astype(np.int64)
        dup_ppm = np.floor((n_grams - n_distinct) * 1_000_000.0
                           / np.maximum(n_grams, 1)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids.astype("int64"), pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_ppm": pa.array(dup_ppm, pa.int64()),
        })

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# cross-document duplicate n-grams (substring-dedup signal): which grams
# appear in >= 2 distinct documents, and what share of each document is
# made of them — the corpus-level complement of docs_repetition
# ---------------------------------------------------------------------------


_GRAM_MIX = np.uint64(0x9E3779B97F4A7C15)   # odd golden-ratio multiplier


def _window_gram_hashes(texts, n: int):
    """(doc_index, gram_hash) pairs for the PER-DOC-DISTINCT word n-grams
    of an Arrow string column, fully vectorized (verdict r3 #6): tokens
    split/lowered with Arrow kernels, token strings hashed ONCE (polars
    64-bit, seed 0), gram hash = positional polynomial combine of the k
    token hashes (distinct odd multiplier powers), windows masked to stay
    inside one document, per-doc dedup via one lexsort.  Replaces the
    per-doc Python set(shingles()) loops; gram identity is hash-based with
    the same m²/2⁶⁵ collision tolerance docs_crossdup documents."""
    import polars as pl

    toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(texts, "")))
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ndoc = len(lens)
    docidx = np.repeat(np.arange(ndoc, dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "")        # split() edge artifacts
    docidx = docidx[nonempty.to_numpy(zero_copy_only=False)]
    flat_ne = flat.filter(nonempty)
    m = len(flat_ne)
    if m < n:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    th = pl.from_arrow(flat_ne).hash(seed=0).to_numpy().astype(np.uint64)
    nw = m - n + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(nw, dtype=np.uint64)
        mult = np.uint64(1)
        for j in range(n):
            acc += th[j : j + nw] * mult
            mult *= _GRAM_MIX
    valid = docidx[:nw] == docidx[n - 1 :]   # window within one doc
    d, g = docidx[:nw][valid], acc[valid]
    if not d.size:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    # per-doc dedup WITHOUT a sort: mix the doc index into the gram hash
    # (distinct odd multiplier) and take first-distinct via a hash table —
    # ~2.3x faster than lexsort on web-scale batches; the cross-doc mixing
    # collision adds nothing beyond the already-documented hash tolerance
    with np.errstate(over="ignore"):
        mixed = g + d.astype(np.uint64) * np.uint64(0xD1B54A32D192ED03)
    keep = pl.Series(mixed).is_first_distinct().to_numpy()
    return d[keep], g[keep]


def docs_crossdup(sf_dir: str, n: int = 8) -> pd.DataFrame:
    """Cross-document duplicate word-8-gram share per document — the
    Lee-et-al-2022-style substring-dedup signal ("Deduplicating Training
    Data Makes Language Models Better"): for each document, the ppm of its
    DISTINCT 8-grams that also occur in at least one OTHER document.
    ``docs_repetition`` measures intra-document boilerplate; this measures
    corpus-level copying (mirrors, syndication, template farms).

    Scale shape:
    - phase 1 ships only (gram_hash: uint64, partial_count) rows — grams
      are deduped per document, hashed (polars 64-bit, the MinHash
      pipeline's hasher), and pre-counted per batch, so the exchange
      volume is bounded by distinct-grams-per-batch, never raw text;
    - the per-gram count groupby runs under a bounded 64-value hash
      bucket (the repo-wide bucketed-aggregation pattern), each bucket
      emitting only grams with count >= 2;
    - the dup-gram set is assembled SORTED inside a remote task (the
      driver only holds the ObjectRef); phase 2 is a zero-copy plasma
      read + vectorized ``np.searchsorted`` membership per batch — the
      same exact-membership plumbing as the dedup drop filters.

    Partitioning assumption: the dup-gram hash array fits one worker's
    heap (8 bytes/gram → ~1 GB per 10⁸ cross-doc-duplicated grams).  At
    100 TB, keep phase 1 as-is and replace the broadcast in phase 2 with
    a (gram_hash, doc_id) shuffle join against the dup set partitioned by
    the same hash — identical semantics, one more exchange.

    The oracle compares exact gram STRINGS; the engine compares 64-bit
    hashes — a collision flips a membership with p ≈ m²/2⁶⁵ (negligible
    at any scale this runs at, and only ever inflates n_dup by 1)."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])

    def gram_partial(t: pa.Table) -> pa.Table:
        _, gh = _window_gram_hashes(t["text"], n)   # per-doc-distinct pairs
        if not gh.size:
            return pa.table({"gh": pa.array([], pa.uint64()),
                             "cnt": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        ghu, cnt = np.unique(gh, return_counts=True)  # docs-per-gram, batch
        return pa.table({
            "gh": pa.array(ghu, pa.uint64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "_b": pa.array((ghu % 64).astype(np.int64), pa.int64()),
        })

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("gh", as_index=False)["cnt"].sum()
        return agg.loc[agg["cnt"] >= 2, ["gh"]]

    dup_ds = ds.map_batches(gram_partial, batch_format="pyarrow") \
               .groupby("_b").map_groups(bucket_dups, batch_format="pandas")

    @ray.remote
    def assemble(*blocks) -> np.ndarray:
        arrs = [b["gh"].to_numpy(zero_copy_only=False).astype(np.uint64)
                for b in blocks]
        if not arrs:
            return np.empty(0, dtype=np.uint64)
        return np.sort(np.concatenate(arrs))

    dup_ref = assemble.remote(*list(dup_ds.to_arrow_refs()))

    def score(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)             # zero-copy from plasma
        ndoc = len(t)
        docidx, gh = _window_gram_hashes(t["text"], n)  # per-doc distinct
        lens = np.bincount(docidx, minlength=ndoc).astype(np.int64)
        n_dup = np.zeros(ndoc, dtype=np.int64)
        if gh.size and len(dup):
            pos = np.searchsorted(dup, gh)
            pos[pos >= len(dup)] = len(dup) - 1
            hit = (dup[pos] == gh)
            n_dup = np.bincount(docidx, weights=hit,
                                minlength=ndoc).astype(np.int64)
        ppm = np.floor(n_dup * 1_000_000.0
                       / np.maximum(lens, 1)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(
                t["doc_id"].to_numpy(zero_copy_only=False).astype("int64"),
                pa.int64()),
            "n_distinct_grams": pa.array(lens, pa.int64()),
            "crossdup_ppm": pa.array(ppm, pa.int64()),
        })

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# radius similarity search (the vector store's "all matches above a score"
# API) and per-language scaled term relevance (tf-over-df) — the training-
# data mixing view of "what characterizes each language bucket"
# ---------------------------------------------------------------------------

_RANGE_SEARCH_THRESHOLD = 0.1


def emb_range_search(sf_dir: str) -> pd.DataFrame:
    """All vectors with cosine >= threshold to the vec_id=0 query — the
    radius-search twin of ``emb_knn``.  Per-block filter, driver collects
    only matches (see ``search.range_search``)."""
    from .search import range_search

    q = _query_vec(sf_dir, 0)
    return range_search(_emb(sf_dir), q, _RANGE_SEARCH_THRESHOLD)


_TFIDF_TOP_K = 5


def docs_tfidf_top_terms(sf_dir: str, k: int = _TFIDF_TOP_K) -> pd.DataFrame:
    """Top-k most characteristic terms per language by scaled
    term-frequency-over-document-frequency: score_q = tf(lang, word) *
    1e6 // df(word) — the integer-exact monotone twin of tf-idf ranking
    (log-idf reorders nothing within a fixed word's score; the integer
    form is what makes the oracle hash-stable).

    Scale shape: one pass emits per-batch partial rows (lang, word,
    tf_partial, df_partial) — df_partial counts the batch's DISTINCT docs
    containing the word, and since every doc lives in exactly one batch
    and one lang, summing per-lang partials gives the exact global df.
    The per-word merge runs under a bounded 64-value word-hash bucket
    (the repo-wide bucketed-aggregation pattern — never one Python
    callback per word on an unbounded vocabulary); a bucket colocates
    every row of its words, computes each word's global df, scores its
    langs, and emits at most k candidate rows per (lang, bucket); the
    driver merges ≤ k × langs × 64 candidates — bounded by output size,
    not vocabulary."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs_out: List[str] = []
        words_out: List[str] = []
        tf_out: List[int] = []
        df_out: List[int] = []
        acc: Dict[tuple, list] = {}
        for lg, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            words = tx.lower().split()
            seen = set()
            for w in words:
                key = (lg, w)
                ent = acc.get(key)
                if ent is None:
                    ent = acc[key] = [0, 0]
                ent[0] += 1
                if w not in seen:
                    seen.add(w)
                    ent[1] += 1
        for (lg, w), (tf, df) in acc.items():
            langs_out.append(lg)
            words_out.append(w)
            tf_out.append(tf)
            df_out.append(df)
        buckets = (pd.util.hash_pandas_object(
            pd.Series(words_out, dtype=object), index=False)
            % 64).astype("int64")
        return pa.table({
            "lang": pa.array(langs_out, pa.string()),
            "word": pa.array(words_out, pa.string()),
            "tf": pa.array(tf_out, pa.int64()),
            "df_p": pa.array(df_out, pa.int64()),
            "_b": pa.array(buckets.to_numpy(), pa.int64()),
        })

    def word_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one group = one word-hash bucket; every row of a given word is
        # here, so per-word global df is exact
        agg = df.groupby(["lang", "word"], as_index=False).agg(
            tf=("tf", "sum"), df_p=("df_p", "sum"))
        gdf = agg.groupby("word")["df_p"].transform("sum")
        agg["df"] = gdf.astype("int64")
        agg["score_q"] = (agg["tf"] * 1_000_000) // agg["df"]
        agg = agg.sort_values(["lang", "score_q", "word"],
                              ascending=[True, False, True], kind="mergesort")
        return agg.groupby("lang", as_index=False).head(k)[
            ["lang", "word", "tf", "df", "score_q"]]

    cands = ds.map_batches(partial, batch_format="pyarrow") \
              .groupby("_b").map_groups(word_bucket, batch_format="pandas") \
              .to_pandas()
    cands = cands.sort_values(["lang", "score_q", "word"],
                              ascending=[True, False, True], kind="mergesort")
    out = cands.groupby("lang", as_index=False).head(k).copy()
    for c in ("tf", "df", "score_q"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# sequence packing (LM training batch assembly): concatenate documents in
# doc_id order, split into fixed-size token blocks, report each document's
# (pack_id, pack_offset) — a distributed exclusive prefix sum
# ---------------------------------------------------------------------------

_PACK_BLOCK_TOKENS = 256


def _pack_by_cost(proj, block_tokens: int, cost_col: str) -> pd.DataFrame:
    """The pack core shared by docs_pack_blocks / docs_interleaved_pack:
    range-sort the (doc_id, cost) projection, per-Ray-block totals →
    driver exclusive prefix offsets (O(#blocks) state), second pass over
    the SAME materialized blocks adds offset + within-block cumsum."""
    proj = proj.sort("doc_id").materialize()

    def block_total(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "first_id": pa.array([int(ids[0])], pa.int64()),
            "total": pa.array(
                [int(t[cost_col].to_numpy(zero_copy_only=False).sum())],
                pa.int64()),
        })

    parts = proj.map_batches(block_total, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    parts = parts.sort_values("first_id").reset_index(drop=True)
    offsets = parts["total"].cumsum().shift(fill_value=0).astype("int64")
    offset_of = dict(zip(parts["first_id"].astype("int64"), offsets))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             cost_col: pa.array([], pa.int64()),
                             "pack_id": pa.array([], pa.int64()),
                             "pack_offset": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nt = t[cost_col].to_numpy(zero_copy_only=False)
        start = offset_of[int(ids[0])] + np.concatenate(
            ([0], np.cumsum(nt)[:-1]))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            cost_col: pa.array(nt, pa.int64()),
            "pack_id": pa.array(start // block_tokens, pa.int64()),
            "pack_offset": pa.array(start % block_tokens, pa.int64()),
        })

    out = proj.map_batches(assign, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_pack_blocks(sf_dir: str,
                     block_tokens: int = _PACK_BLOCK_TOKENS) -> pd.DataFrame:
    """Sequence packing: where does each document land when the corpus is
    concatenated in doc_id order and cut into ``block_tokens``-sized
    training blocks (the standard "concat-then-chunk" packing used to
    assemble LM training batches)?  Returns (doc_id, n_tokens, pack_id,
    pack_offset) where pack_id/pack_offset locate the document's FIRST
    token.

    Scale shape — document text NEVER moves:
    - pass 0 projects (doc_id, n_tokens) with a vectorized Arrow regex
      count (16 bytes/doc);
    - the projection is range-sorted by doc_id — the only shuffle, over
      the 16-byte rows;
    - per-block token totals (ONE row per Ray block) reach the driver for
      the exclusive prefix-sum offsets — the ``load_crawl_records`` rank
      pattern: driver state is O(#blocks), never O(#docs);
    - a second pass over the SAME materialized sorted blocks
      (``batch_size=None`` → batch == block, so both passes see identical
      block boundaries) adds block_offset + within-block exclusive cumsum,
      entirely vectorized."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
        })

    return _pack_by_cost(ds.map_batches(project, batch_format="pyarrow"),
                         block_tokens, "n_tokens")


# ---------------------------------------------------------------------------
# spherical k-means assignment step: nearest seed centroid by cosine —
# the clustering view of the vector family (and exactly the IVF cell
# assignment, exposed as a checkable aggregate)
# ---------------------------------------------------------------------------

_KMEANS_SEEDS = 8


def emb_kmeans_assign(sf_dir: str,
                      n_seeds: int = _KMEANS_SEEDS) -> pd.DataFrame:
    """One spherical-k-means assignment pass: every vector joins its
    highest-cosine seed centroid (seeds = the vectors with vec_id <
    n_seeds, a deterministic init; ties break to the lowest centroid id).
    Returns per-cluster size and an integer member-id checksum — floats
    never aggregate, so the result is summation-order independent.

    Scale shape: the (n_seeds × dim) centroid matrix is one ``ray.put``
    broadcast; each batch computes an (n × n_seeds) cosine matrix, rounds
    to 6 (the family-wide reproducible-compare convention), takes a
    vectorized argmax, and emits ONE ≤ n_seeds-row partial; the driver
    merges ≤ n_seeds × blocks rows."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_seeds)])
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cents = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    cents_ref = ray.put(cents)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                          "n_members": pa.array([], pa.int64()),
                          "id_checksum": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        c = ray.get(cents_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        # one cosine_scores pass per centroid — the family's SQL-validated
        # (m @ q) / (|m||q|) formula, so round(6) agrees with DuckDB
        scores = np.round(np.column_stack(
            [cosine_scores(vecs, c[j]) for j in range(c.shape[0])]), 6)
        best = np.argmax(scores, axis=1)      # first max → lowest cid
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        agg = pd.DataFrame({"cluster_id": best.astype("int64"),
                            "vec_id": ids}) \
            .groupby("cluster_id", as_index=False) \
            .agg(n_members=("vec_id", "size"), id_checksum=("vec_id", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = _emb(sf_dir).map_batches(partial, batch_format="pyarrow") \
                        .to_pandas()
    out = parts.groupby("cluster_id", as_index=False).agg(
        n_members=("n_members", "sum"), id_checksum=("id_checksum", "sum"))
    for c in ("cluster_id", "n_members", "id_checksum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("cluster_id").reset_index(drop=True)


def docs_langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Label-vs-predicted language confusion matrix for the n-gram
    language-ID heuristic — the quality-control view of ``docs_langid``.

    Key space is |langs|² (bounded), so each batch emits one vectorized
    crosstab partial and the driver merge is O(|langs|²), independent of
    corpus size."""
    ds = tf.langid_stage(_docs(sf_dir, ["doc_id", "lang", "text"]))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "pred_lang"], as_index=False).agg(
            n=("lang", "size"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["lang", "pred_lang"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "pred_lang"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# kNN self-join within a co-partition key (nearest neighbor per vector,
# restricted to its own label) — the "find each example's closest sibling"
# primitive used for near-dup mining and hard-negative selection
# ---------------------------------------------------------------------------

_NN_BLOCK_ROWS = 1024


def emb_nn_within_label(sf_dir: str) -> pd.DataFrame:
    """Nearest neighbor of every vector WITHIN its label group (cosine,
    deterministic ``(score DESC, nn_id ASC)`` tie-break on the 6-dp-rounded
    score, exactly like the oracle's ROW_NUMBER ordering).

    Scale shape: this is a kNN SELF-join co-partitioned on the join key
    (label) — ``groupby(label).map_groups`` ships each label's vectors to
    one task and never compares across labels, so the exchange is one
    hash shuffle of the vectors, not an all-pairs broadcast.  Inside a
    group the scores are computed in ``_NN_BLOCK_ROWS`` row blocks
    (memory O(block × |group|), compute O(|group|²) — the intrinsic cost
    of exact NN).  PARTITIONING ASSUMPTION: one label's vectors fit in a
    worker (rows × dim floats); for web-scale labels, sub-bucket each
    label with the LSH planes from ``embedding_cosine_dedup`` and accept
    approximate NN (same plumbing, documented trade).  Singleton labels
    emit nothing (no neighbor exists) — matching the SQL, whose rn=1 row
    vanishes when the self-join partner set is empty."""

    def nn_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "nn_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        df = df.sort_values("vec_id").reset_index(drop=True)
        ids = df["vec_id"].to_numpy(dtype="int64")
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        nn_ids = np.empty(len(df), dtype="int64")
        nn_scores = np.empty(len(df), dtype="float64")
        for lo in range(0, len(df), _NN_BLOCK_ROWS):
            hi = min(lo + _NN_BLOCK_ROWS, len(df))
            sims = (mat[lo:hi] @ mat.T) / np.outer(norms[lo:hi], norms)
            sims = np.round(sims, 6)
            # exclude self before taking the max
            sims[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf
            best = sims.max(axis=1)
            # ids are sorted ascending → first max column = lowest nn_id
            nn_ids[lo:hi] = ids[np.argmax(sims == best[:, None], axis=1)]
            nn_scores[lo:hi] = best
        return pd.DataFrame({"vec_id": ids, "nn_id": nn_ids,
                             "score": nn_scores})

    out = _emb(sf_dir).groupby("label") \
        .map_groups(nn_group, batch_format="pandas").to_pandas()
    for c in ("vec_id", "nn_id"):
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# int8 scalar quantization of the embedding column — the storage-compression
# pass a 100-TB vector corpus runs before ANN indexing (4× smaller, and the
# quantized codes are what IVF/LSH partitions would store)
# ---------------------------------------------------------------------------


def emb_int8_quantize(sf_dir: str) -> pd.DataFrame:
    """Two-pass global scalar quantization: pass 1 computes per-dimension
    global (min, max) from per-block vectorized partials (the driver merges
    a dim-sized table — O(dims × blocks), never O(rows)); pass 2 maps each
    value to ``floor((x - mn) * 255 / (mx - mn))`` clipped to [0, 255].

    The quantization expression is evaluated in IEEE double with the SAME
    association order as the oracle SQL (``((x - mn) * 255) / (mx - mn)``),
    so codes are bit-identical to DuckDB's — no rounding slack needed.
    Output is one row per vector with integer code checksums (sum and
    ordinal-weighted sum), the partition-independent way to pin all 64
    codes without emitting a 500×64 table.  Constant dimensions
    (mx == mn) quantize to 0 on both sides."""
    ds = _emb(sf_dir)

    def mm_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pa.table({
            "d": pa.array(np.arange(mat.shape[1], dtype="int64")),
            "mn": pa.array(mat.min(axis=0), pa.float64()),
            "mx": pa.array(mat.max(axis=0), pa.float64())})

    parts = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    stats = parts.groupby("d").agg(mn=("mn", "min"), mx=("mx", "max")) \
        .sort_index()
    mn = stats["mn"].to_numpy()
    mx = stats["mx"].to_numpy()
    span = mx - mn
    const_dim = span == 0.0
    span_safe = np.where(const_dim, 1.0, span)
    weights = np.arange(1, len(mn) + 1, dtype="int64")

    def quantize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "code_sum": pa.array([], pa.int64()),
                             "code_checksum": pa.array([], pa.int64())})
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        codes = np.floor((mat - mn) * 255.0 / span_safe)
        codes = np.clip(codes, 0.0, 255.0).astype(np.int64)
        codes[:, const_dim] = 0
        return pa.table({
            "vec_id": t["vec_id"],
            "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
            "code_checksum": pa.array((codes * weights).sum(axis=1),
                                      pa.int64())})

    out = _emb(sf_dir).map_batches(quantize, batch_format="pyarrow") \
        .to_pandas()
    for c in ("vec_id", "code_sum", "code_checksum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# group-stats broadcast normalization: each document's token-count deviation
# from its LANGUAGE's mean — the "normalize a feature within its stratum"
# primitive of quality filtering (z-score siblings swap the denominator)
# ---------------------------------------------------------------------------


def docs_lang_centered(sf_dir: str) -> pd.DataFrame:
    """Per-document deviation from the per-language mean token count, in
    exact integer micro-tokens: ``dev_micro = n_tokens·10⁶ −
    (Σ n_tokens · 10⁶) // count`` per language.

    Scale shape: pass 1 reduces to O(|langs|) (count, sum) partials per
    block; the per-language mean (a handful of scalars) is computed with
    arbitrary-precision Python ints on the driver and BROADCAST into pass
    2's map — the document table itself never shuffles.  Keeping the mean
    in floor-divided micro units makes both sides integer-exact (a float
    mean would need a rounding contract; ``//`` is the contract)."""
    ds = tf.token_count_stage(_docs(sf_dir, ["doc_id", "lang", "text"]))

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False).agg(
            cnt=("n_tokens", "size"), total=("n_tokens", "sum"))

    parts = ds.map_batches(stat_partial, batch_format="pandas").to_pandas()
    stats = parts.groupby("lang").agg(cnt=("cnt", "sum"),
                                      total=("total", "sum"))
    mean_micro = {lang: (int(r.total) * 1_000_000) // int(r.cnt)
                  for lang, r in stats.iterrows()}

    def center(df: pd.DataFrame) -> pd.DataFrame:
        mm = df["lang"].map(mean_micro).to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"],
            "n_tokens": df["n_tokens"].astype("int64"),
            "dev_micro": df["n_tokens"].to_numpy(dtype="int64")
            * 1_000_000 - mm})

    out = ds.map_batches(center, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# duplicate-cluster size histogram — the dedup observability view (how much
# of the corpus is exact-duplicated, and in how big clusters?)
# ---------------------------------------------------------------------------

_N_CLUSTER_BUCKETS = 64


def docs_dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Histogram of exact-duplicate group sizes: group documents by
    content hash, then count groups per size.

    Scale shape: a double aggregation where BOTH keys are shuffled as
    projections — each block emits (sha256-derived bucket, hash, partial
    count); per-group sizes finish under ``_N_CLUSTER_BUCKETS`` hash
    buckets (one vectorized pandas groupby per bucket); each bucket then
    collapses to its own (size, n_groups) histogram partial, so the
    driver merge is O(buckets × distinct sizes) — independent of corpus
    size.  Document BODIES never move: only 16-hex-char hash prefixes
    (collision-free at 2⁻³² per pair × corpus) ride the exchange."""
    import hashlib

    ds = _docs(sf_dir, ["text"])

    def hash_partial(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256((x or "").encode()).hexdigest()[:16]
              for x in t["text"].to_pylist()]
        df = pd.DataFrame({"h": hs})
        agg = df.groupby("h", as_index=False).agg(n=("h", "size"))
        hb = np.frombuffer(
            bytes.fromhex("".join(x[:8] for x in agg["h"]))
            if len(agg) else b"", dtype=">u4").astype("int64")
        agg["_b"] = hb % _N_CLUSTER_BUCKETS
        return pa.Table.from_pandas(agg, preserve_index=False)

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("h")["n"].sum()
        u, c = np.unique(sizes.to_numpy(dtype="int64"), return_counts=True)
        return pd.DataFrame({"group_size": u.astype("int64"),
                             "n_groups": c.astype("int64")})

    parts = ds.map_batches(hash_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_hist, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("group_size", as_index=False)["n_groups"].sum()
    for c in ("group_size", "n_groups"):
        out[c] = out[c].astype("int64")
    return out.sort_values("group_size").reset_index(drop=True)


# ---------------------------------------------------------------------------
# global percent-rank WITHOUT a global sort: the bounded-domain histogram
# gives every row its exact global rank from a broadcast cumulative table —
# the scale-correct way to rank 10^12 rows by a low-cardinality feature
# ---------------------------------------------------------------------------


def docs_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Exact PERCENT_RANK of every document by token count, as floor-
    divided integer micro units: ``pr_micro = #strictly-smaller · 10⁶ //
    (n − 1)`` (SQL ``(RANK() − 1) · 10⁶ // (n − 1)`` — identical by the
    rank/count-smaller identity, ties share a rank).

    Scale shape: NO global sort — pass 1 merges per-block (value, count)
    histogram partials over the bounded token-count domain (the
    docs_token_percentiles pattern); the driver builds the cumulative
    below-count table (O(distinct values)) and BROADCASTS it; pass 2 is
    a searchsorted lookup per batch.  An all-to-all range sort would
    move every row twice to produce the same integer."""
    ds = tf.token_count_stage(_docs(sf_dir, ["doc_id", "text"]))

    def hist_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["n_tokens"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(u.astype("int64"), pa.int64()),
                         "n": pa.array(c, pa.int64())})

    parts = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = parts.groupby("v")["n"].sum().sort_index()
    domain = hist.index.to_numpy(dtype="int64")
    counts = hist.to_numpy(dtype="int64")
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())
    denom = max(n_total - 1, 1)

    def rank_map(t: pa.Table) -> pa.Table:
        v = t["n_tokens"].to_numpy(zero_copy_only=False).astype("int64")
        smaller = below[np.searchsorted(domain, v)]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(v, pa.int64()),
            "pr_micro": pa.array(smaller * 1_000_000 // denom, pa.int64())})

    out = ds.map_batches(rank_map, batch_format="pyarrow").to_pandas()
    for c in ("doc_id", "n_tokens", "pr_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# collocation mining: top bigrams by scaled lift — a pair-counting pass plus
# TWO word-key shuffle joins (c(w1), c(w2)) over an unbounded vocabulary
# ---------------------------------------------------------------------------

_LIFT_MIN_SUPPORT = 5
_LIFT_TOP_K = 20


def docs_bigram_lift(sf_dir: str, k: int = _LIFT_TOP_K) -> pd.DataFrame:
    """Top-k adjacent-word collocations by scaled lift:
    ``lift_q = n(w1,w2) · N · 10⁶ // (c(w1) · c(w2))`` where N is the
    corpus token count — the integer-exact monotone twin of PMI ranking
    (log reorders nothing).

    Scale shape: batch partials emit unigram AND bigram counts; the
    unigram join is TWO bucketed exchanges on the repo's 64-way word-hash
    bucket — round 1 colocates bigrams with c(w1) (bucket key hash(w1)),
    round 2 re-keys the survivors by hash(w2) — so an unbounded
    vocabulary never needs a per-word callback or a driver-side dict.
    Min-support filtering (n ≥ 5) runs BEFORE scoring, and scores are
    Python big-ints over the few surviving candidates (n·N·10⁶ can pass
    2⁶³ on a web corpus).  Each round-2 bucket emits only its top-k, so
    the driver merges ≤ 64·k candidate rows."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        uni: Dict[str, int] = {}
        big: Dict[tuple, int] = {}
        for tx in t["text"].to_pylist():
            words = (tx or "").lower().split()
            for w in words:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(words, words[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        w1 = [w for w in uni] + [p[0] for p in big]
        w2 = [""] * len(uni) + [p[1] for p in big]
        n = list(uni.values()) + list(big.values())
        kind = ["u"] * len(uni) + ["b"] * len(big)
        bucket = (pd.util.hash_pandas_object(
            pd.Series(w1, dtype=object), index=False) % 64).astype("int64")
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "n": pa.array(n, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "_b": pa.array(bucket.to_numpy(), pa.int64())})

    def join_c1(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket holds ALL rows whose w1 hashes here: every unigram
        # count for those words and every bigram keyed by them
        uni = df[df["kind"] == "u"].groupby("w1", as_index=False)["n"].sum() \
            .rename(columns={"w1": "w", "n": "c"})
        big = df[df["kind"] == "b"].groupby(["w1", "w2"], as_index=False)[
            "n"].sum()
        big = big[big["n"] >= _LIFT_MIN_SUPPORT]
        big = big.merge(uni.rename(columns={"w": "w1", "c": "c1"}), on="w1")
        # re-key the survivors and the unigram table by hash(w2)/hash(w)
        big["_b2"] = (pd.util.hash_pandas_object(
            big["w2"].astype(object), index=False) % 64).astype("int64")
        big["kind"] = "b"
        uni["_b2"] = (pd.util.hash_pandas_object(
            uni["w"].astype(object), index=False) % 64).astype("int64")
        uni["kind"] = "u"
        uni = uni.rename(columns={"w": "w2"})
        uni["w1"] = ""
        uni["c1"] = 0
        uni["n"] = uni.pop("c")
        return pd.concat(
            [big[["w1", "w2", "n", "c1", "kind", "_b2"]],
             uni[["w1", "w2", "n", "c1", "kind", "_b2"]]],
            ignore_index=True)

    def make_join_c2(total_tokens: int):
        def join_c2(df: pd.DataFrame) -> pd.DataFrame:
            uni = df[df["kind"] == "u"].groupby("w2", as_index=False)[
                "n"].sum().rename(columns={"n": "c2"})
            big = df[df["kind"] == "b"].merge(uni, on="w2")
            if not len(big):
                return pd.DataFrame({
                    "w1": pd.Series([], dtype=object),
                    "w2": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                    "c1": pd.Series([], dtype="int64"),
                    "c2": pd.Series([], dtype="int64"),
                    "lift_q": pd.Series([], dtype="int64")})
            lift = [int(n) * total_tokens * 1_000_000
                    // (int(c1) * int(c2))
                    for n, c1, c2 in zip(big["n"], big["c1"], big["c2"])]
            big = big.assign(lift_q=pd.Series(lift, index=big.index,
                                              dtype="int64"))
            big = big.sort_values(["lift_q", "w1", "w2"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(k)
            return big[["w1", "w2", "n", "c1", "c2", "lift_q"]]
        return join_c2

    # corpus token count: one tiny scalar pass (whitespace tokens)
    total_tokens = int(tf.token_count_stage(
        _docs(sf_dir, ["doc_id", "text"])).sum("n_ws_tokens"))

    cands = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(join_c1, batch_format="pandas") \
        .groupby("_b2").map_groups(make_join_c2(total_tokens),
                                   batch_format="pandas") \
        .to_pandas()
    out = cands.sort_values(["lift_q", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    for c in ("n", "c1", "c2", "lift_q"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# iterative distributed ML: TWO Lloyd iterations of spherical k-means.
# The rounded-centroid contract (ROUND(mean, 6) after every recompute) is
# what makes an ITERATIVE float algorithm reproducible across block layouts
# and engines — without it, summation-order ulps compound across iterations
# ---------------------------------------------------------------------------


def emb_kmeans_iterate(sf_dir: str,
                       n_seeds: int = _KMEANS_SEEDS) -> pd.DataFrame:
    """Spherical k-means, two full Lloyd iterations: assign to the
    vec_id < n_seeds seed centroids, recompute centroids as the member
    MEAN rounded to 6 dp, re-assign, and report per-cluster size and
    integer member-id checksums.

    Scale shape per iteration: the centroid matrix is a ``ray.put``
    broadcast; assignment is one vectorized (n × k) cosine per batch;
    the centroid recompute emits ≤ k rows of (count, Σ-vector) partials
    per block — the driver merges O(k × blocks) rows and never sees a
    vector.  The ROUND(mean, 6) between iterations is the contract that
    pins the float fixpoint: both engine and oracle round, so the
    iteration-2 input is bit-identical no matter the partial-sum order.
    Clusters emptied by iteration 1 simply vanish (matching the SQL,
    where the rn=1 join has no rows for them)."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_seeds)])
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cents = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    cents_ref = ray.put(cents)
    dim = cents.shape[1]

    def sum_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"cluster_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")}
        cols.update({f"s{i}": pd.Series([], dtype="float64")
                     for i in range(dim)})
        if len(t) == 0:
            return pd.DataFrame(cols)
        c = ray.get(cents_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        scores = np.round(np.column_stack(
            [cosine_scores(vecs, c[j]) for j in range(c.shape[0])]), 6)
        best = np.argmax(scores, axis=1)
        rows = []
        for cid in np.unique(best):
            m = vecs[best == cid]
            rows.append([int(cid), m.shape[0]] + list(m.sum(axis=0)))
        return pd.DataFrame(rows, columns=list(cols))

    parts = _emb(sf_dir).map_batches(sum_partial, batch_format="pyarrow") \
        .to_pandas()
    agg = parts.groupby("cluster_id").sum().sort_index()
    cids = agg.index.to_numpy(dtype="int64")
    n = agg["n"].to_numpy(dtype="float64")[:, None]
    sums = agg[[f"s{i}" for i in range(dim)]].to_numpy(dtype="float64")
    cents2 = np.round(sums / n, 6)           # THE inter-iteration contract
    cents2_ref = ray.put(cents2)
    cids_ref = ray.put(cids)

    def assign2(t: pa.Table) -> pa.Table:
        empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                          "n_members": pa.array([], pa.int64()),
                          "id_checksum": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        c2 = ray.get(cents2_ref)
        cid_map = ray.get(cids_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        scores = np.round(np.column_stack(
            [cosine_scores(vecs, c2[j]) for j in range(c2.shape[0])]), 6)
        best = cid_map[np.argmax(scores, axis=1)]   # first max → lowest cid
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        agg2 = pd.DataFrame({"cluster_id": best.astype("int64"),
                             "vec_id": ids}) \
            .groupby("cluster_id", as_index=False) \
            .agg(n_members=("vec_id", "size"), id_checksum=("vec_id", "sum"))
        return pa.Table.from_pandas(agg2, preserve_index=False)

    parts2 = _emb(sf_dir).map_batches(assign2, batch_format="pyarrow") \
        .to_pandas()
    out = parts2.groupby("cluster_id", as_index=False).agg(
        n_members=("n_members", "sum"), id_checksum=("id_checksum", "sum"))
    for c in ("cluster_id", "n_members", "id_checksum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("cluster_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# NTILE quartiles WITHOUT a global sort: global ROW_NUMBER (value histogram
# for the cross-value offset + per-value cumcount for the doc_id tiebreak),
# then the SQL NTILE remainder rule applied to the 0-based row number
# ---------------------------------------------------------------------------

_NTILE_N = 4


def docs_ntile(sf_dir: str, n_tiles: int = _NTILE_N) -> pd.DataFrame:
    """Quartile assignment by token count with the exact SQL semantics of
    ``NTILE(4) OVER (ORDER BY n_tokens, doc_id)``.

    Scale shape: the global ROW_NUMBER decomposes into (a) the merged
    value histogram's cumulative below-count (O(distinct values), the
    docs_percent_rank pattern) and (b) a per-value doc_id rank computed
    under 64-way value-hash buckets — one mergesort + one pandas
    ``groupby().cumcount()`` C kernel per bucket, never a per-value
    callback.  The NTILE remainder rule (first n%k tiles get one extra
    row) is pure integer arithmetic on the 0-based row number, applied
    identically on both sides — no sort, no shuffle of document rows."""
    ds = tf.token_count_stage(_docs(sf_dir, ["doc_id", "text"]))

    def hist_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["n_tokens"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(u.astype("int64"), pa.int64()),
                         "n": pa.array(c, pa.int64())})

    parts = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = parts.groupby("v")["n"].sum().sort_index()
    domain = hist.index.to_numpy(dtype="int64")
    counts = hist.to_numpy(dtype="int64")
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())
    q, rem = divmod(n_total, n_tiles)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "n_tokens"]].copy()
        df["_b"] = (df["n_tokens"].astype("int64") % 64).astype("int64")
        return df

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_tokens", "doc_id"],
                            kind="mergesort").reset_index(drop=True)
        v = df["n_tokens"].to_numpy(dtype="int64")
        within = df.groupby("n_tokens").cumcount().to_numpy()
        r0 = below[np.searchsorted(domain, v)] + within   # 0-based ROW_NUMBER
        cut = rem * (q + 1)
        tile = np.where(r0 < cut, r0 // max(q + 1, 1),
                        rem + (r0 - cut) // max(q, 1)) + 1
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": v,
            "tile": tile.astype("int64")})

    out = ds.map_batches(bucketize, batch_format="pandas") \
        .groupby("_b").map_groups(rank_bucket, batch_format="pandas") \
        .to_pandas()
    for c in ("doc_id", "n_tokens", "tile"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# cross-table enrichment join: documents ⋈ embeddings on doc_id == vec_id —
# the "attach each training document's embedding features" pass
# ---------------------------------------------------------------------------


def docs_vector_enrich(sf_dir: str) -> pd.DataFrame:
    """Inner-join documents to their embedding rows (doc_id = vec_id) and
    emit per-doc text+vector features (lang, n_chars, label, L2 norm).

    Scale shape: a fact⋈fact hash-shuffle ``Dataset.join`` on the id key —
    BOTH tables are corpus-sized so neither side broadcasts; the vector
    norm is reduced to one rounded scalar per row BEFORE the join, so the
    exchange ships (id, label, norm) projections, never the vectors."""
    emb = _emb(sf_dir)

    def vec_feats(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "vnorm": pa.array([], pa.float64())})
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pa.table({
            "doc_id": pa.array(
                t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")),
            "label": pa.array(
                t["label"].to_numpy(zero_copy_only=False).astype("int64")),
            "vnorm": pa.array(
                np.round(np.sqrt((mat * mat).sum(axis=1)), 6), pa.float64())})

    feats = emb.map_batches(vec_feats, batch_format="pyarrow")
    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    joined = docs.join(feats, join_type="inner", num_partitions=8,
                       on=("doc_id",))
    out = joined.to_pandas()
    for c in ("doc_id", "n_chars", "label"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "lang", "n_chars", "label", "vnorm"]] \
        .sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# corpus-statistics document scoring: mean token rarity — per-token corpus
# counts attached via a word-key exchange, then re-keyed by doc for the
# per-document mean (two chained shuffles on DIFFERENT keys)
# ---------------------------------------------------------------------------


def _doc_word_counts(t: pa.Table) -> pd.DataFrame:
    """Vectorized (doc_id, word, n) token partials for one batch: C-backed
    lower/split/explode + one pandas groupby — no Python loop over rows.
    Tokenization contract (whitespace split of lowercased text, empties
    dropped) matches the oracle SQL's regexp_split_to_array twin."""
    df = pd.DataFrame({"doc_id": t["doc_id"].to_pandas().astype("int64"),
                       "word": t["text"].to_pandas().fillna("")
                       .str.lower().str.split()})
    ex = df.explode("word", ignore_index=True).dropna(subset=["word"])
    return ex.groupby(["doc_id", "word"], as_index=False).size() \
        .rename(columns={"size": "n"})


def _word_bucket_col(words: pd.Series, mod: int = 64) -> np.ndarray:
    return (pd.util.hash_pandas_object(
        words.astype(object), index=False).to_numpy() % mod).astype("int64")


def docs_rarity_score(sf_dir: str) -> pd.DataFrame:
    """Mean token rarity per document: ``rarity(w) = 10⁶ // c(w)`` (corpus
    count) averaged over the document's tokens with floor division — the
    integer-exact "is this document full of rare words" quality signal.

    Scale shape: batch partials emit per-(doc, word) counts; round 1
    colocates them with the corpus word counts under the 64-way word-hash
    bucket (vocabulary never becomes a driver dict); round 2 re-keys the
    scored (doc, Σ rarity·n, n) partials by doc-hash bucket and reduces
    to one row per document.  Both exchanges ship integer projections."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        out = _doc_word_counts(t)
        out["_b"] = _word_bucket_col(out["word"])
        return out

    def word_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a word are here → exact corpus count; score each
        # (doc, word) partial and re-key by doc
        cnt = df.groupby("word")["n"].transform("sum")
        rarity = (1_000_000 // cnt).astype("int64")
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "rsum": (rarity * df["n"]).astype("int64"),
            "ntok": df["n"].astype("int64")})
        out = out.groupby("doc_id", as_index=False).sum()
        out["_d"] = (out["doc_id"] % 64).astype("int64")
        return out

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False).agg(
            rsum=("rsum", "sum"), ntok=("ntok", "sum"))
        out["avg_rarity_q"] = (out["rsum"] // out["ntok"]).astype("int64")
        return out[["doc_id", "ntok", "avg_rarity_q"]]

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(word_bucket, batch_format="pandas") \
        .groupby("_d").map_groups(doc_bucket, batch_format="pandas") \
        .to_pandas()
    for c in ("doc_id", "ntok", "avg_rarity_q"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# interleaved-payload operators: synthesize media spans deterministically
# from the text (every token with the trigger prefix becomes a media span),
# run the REAL span codec, and compute over the span table — the engine's
# canonical interleaved text+media document shape (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

_MEDIA_TRIGGER_PREFIX = "s"


def _interleaved_with_media(t: pa.Table, positional_refs: bool) -> pa.Table:
    """documents batch → interleaved span table via the codec, with one
    media span per trigger-prefixed token.  ``positional_refs`` appends the
    1-based token position to the ref (unique per occurrence); otherwise the
    ref is ``img://{word}`` (reused across docs — the CC-style shared-asset
    shape)."""
    from ..sources.interleaved import records_to_interleaved_batch

    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    recs = pa.table({
        "id": pa.array([str(d) for d in ids], pa.string()),
        "title": pa.array([f"Doc {d}" for d in ids], pa.string()),
        "text": pa.array(texts, pa.string()),
        "media_refs": pa.array(
            [[f"img://{w}/{i + 1}" if positional_refs else f"img://{w}"
              for i, w in enumerate((tx or "").lower().split())
              if w.startswith(_MEDIA_TRIGGER_PREFIX)]
             for tx in texts],
            pa.list_(pa.string())),
    })
    return records_to_interleaved_batch(recs)


def docs_interleaved_media_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document span statistics over the interleaved table: total span
    count, media-span count, and the 1-based token position of the first
    media trigger (0 when the doc has none).

    Scale shape: span synthesis + stats are one row-local Arrow batch
    transform — no exchange; the span table itself never leaves the
    workers, only the 4-int projection does."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        inter = _interleaved_with_media(t, positional_refs=True)
        doc_ids: List[int] = []
        n_spans: List[int] = []
        n_media: List[int] = []
        first_pos: List[int] = []
        for did, spans in zip(inter["doc_id"].to_pylist(),
                              inter["spans"].to_pylist()):
            media = [s for s in spans if s["kind"] == "media"]
            positions = [int(s["media_ref"].rsplit("/", 1)[1]) for s in media]
            doc_ids.append(int(did))
            n_spans.append(len(spans))
            n_media.append(len(media))
            first_pos.append(min(positions) if positions else 0)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_media": pa.array(n_media, pa.int64()),
            "first_pos": pa.array(first_pos, pa.int64())})

    out = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_media_ref_counts(sf_dir: str) -> pd.DataFrame:
    """Shared-media-asset census over the interleaved corpus: for each
    ``img://{word}`` ref, how many documents embed it and how many total
    media spans point at it — the signal an image-dedup / asset-cache stage
    keys on.

    Scale shape: per-batch partials pre-aggregate (ref, doc) occurrence
    counts and per-batch-distinct doc flags; the exchange ships ≤|refs|×
    blocks integer rows under a ref-hash bucket, and each bucket owns its
    refs end-to-end (exact distinct-doc counts, no driver sets)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        inter = _interleaved_with_media(t, positional_refs=False)
        acc: Dict[tuple, int] = {}
        for did, spans in zip(inter["doc_id"].to_pylist(),
                              inter["spans"].to_pylist()):
            for s in spans:
                if s["kind"] == "media":
                    key = (s["media_ref"], int(did))
                    acc[key] = acc.get(key, 0) + 1
        refs = [k[0] for k in acc]
        bucket = (pd.util.hash_pandas_object(
            pd.Series(refs, dtype=object), index=False) % 64).astype("int64")
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "doc_id": pa.array([k[1] for k in acc], pa.int64()),
            "n": pa.array(list(acc.values()), pa.int64()),
            "_b": pa.array(bucket.to_numpy(), pa.int64())})

    def ref_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("media_ref", as_index=False).agg(
            n_docs=("doc_id", "nunique"), n_spans=("n", "sum"))
        return out

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(ref_bucket, batch_format="pandas") \
        .to_pandas()
    for c in ("n_docs", "n_spans"):
        out[c] = out[c].astype("int64")
    return out[["media_ref", "n_docs", "n_spans"]] \
        .sort_values(["n_docs", "media_ref"], ascending=[False, True]) \
        .reset_index(drop=True)


_ASSET_INGEST_MOD = 3     # assets ingested only from doc_id % 3 == 0 docs


def docs_media_ref_integrity(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit over the interleaved corpus: the media
    ASSET table holds only the refs ingested from the ``doc_id % 3 == 0``
    slice (a partially-ingested asset store — the situation a real
    multimodal pipeline must detect), and every document's media spans
    are audited against it.  Output per language: (lang, n_refs,
    n_resolved, n_dangling) — span occurrences whose ref does / does not
    resolve to an asset row — sorted by lang.

    Scale shape: the asset side is a corpus-derived Dataset (per-batch
    distinct refs from the ingested slice, settled distinct under a
    ref-hash bucket) and resolution is a hash-shuffle ``left_semi``
    ``Dataset.join`` of the (lang, ref, n) span projection against it —
    refs never collect on the driver; totals fold from per-batch ≤|langs|
    partials and dangling = total − resolved, so only ≤2×|langs| rows
    ever reach the driver."""
    import ray.data as _rd  # noqa: F401

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    cols = ("lang", "n_refs", "n_resolved", "n_dangling")
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        **{c: pd.Series([], dtype="int64") for c in cols[1:]}})

    ref_schema = pa.schema([("lang", pa.string()),
                            ("media_ref", pa.string()),
                            ("n", pa.int64())])

    def ref_partial(t: pa.Table) -> pa.Table:
        inter = _interleaved_with_media(t, positional_refs=False)
        langs = t["lang"].to_pylist()
        acc: Dict[tuple, int] = {}
        for lg, spans in zip(langs, inter["spans"].to_pylist()):
            for s in spans:
                if s["kind"] == "media":
                    key = (lg, s["media_ref"])
                    acc[key] = acc.get(key, 0) + 1
        return pa.table({
            "lang": pa.array([k[0] for k in acc], pa.string()),
            "media_ref": pa.array([k[1] for k in acc], pa.string()),
            "n": pa.array(list(acc.values()), pa.int64())}) \
            .cast(ref_schema)

    refs = ds.map_batches(ref_partial, batch_format="pyarrow") \
        .materialize()

    asset_schema = pa.schema([("asset_ref", pa.string()),
                              ("_b", pa.int64())])

    def asset_partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype="int64")
        keep = ids % _ASSET_INGEST_MOD == 0
        inter = _interleaved_with_media(
            t.filter(pa.array(keep)), positional_refs=False)
        uniq = sorted({s["media_ref"]
                       for spans in inter["spans"].to_pylist()
                       for s in spans if s["kind"] == "media"})
        b = (pd.util.hash_pandas_object(
            pd.Series(uniq, dtype=object), index=False) % 64).astype("int64")
        return pa.table({"asset_ref": pa.array(uniq, pa.string()),
                         "_b": pa.array(b.to_numpy(), pa.int64())}) \
            .cast(asset_schema)

    def asset_distinct(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates("asset_ref")[["asset_ref"]]
        return out.astype({"asset_ref": object})

    assets = ds.map_batches(asset_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(asset_distinct, batch_format="pandas")

    def lang_total(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "lang" not in df.columns:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "n_refs": pd.Series([], dtype="int64")})
        return df.groupby("lang", as_index=False).agg(n_refs=("n", "sum"))

    totals = refs.map_batches(lang_total, batch_format="pandas") \
        .to_pandas()
    if totals.empty or "lang" not in totals.columns:
        return empty
    totals = totals.groupby("lang", as_index=False)["n_refs"].sum()

    resolved_ds = refs.join(assets, join_type="left_semi",
                            num_partitions=4,
                            on=("media_ref",), right_on=("asset_ref",))

    def lang_resolved(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "lang" not in df.columns:
            return pd.DataFrame({
                "lang": pd.Series([], dtype=object),
                "n_resolved": pd.Series([], dtype="int64")})
        return df.groupby("lang", as_index=False).agg(
            n_resolved=("n", "sum"))

    res = resolved_ds.map_batches(lang_resolved,
                                  batch_format="pandas").to_pandas()
    if len(res) and "lang" in res.columns:
        res = res.groupby("lang", as_index=False)["n_resolved"].sum()
    else:
        res = pd.DataFrame({"lang": pd.Series([], dtype=object),
                            "n_resolved": pd.Series([], dtype="int64")})
    out = totals.merge(res, on="lang", how="left")
    out["n_resolved"] = out["n_resolved"].fillna(0).astype("int64")
    out["n_refs"] = out["n_refs"].astype("int64")
    out["n_dangling"] = out["n_refs"] - out["n_resolved"]
    return out[list(cols)].sort_values("lang", kind="mergesort") \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# inverted-index build: posting lists per word over a deterministic doc
# shard (doc_id % 17 == 0 keeps postings bounded at any SF for the gate;
# a full index is the same operator fanned over shards)
# ---------------------------------------------------------------------------

_INDEX_SHARD_MOD = 17


def docs_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Posting-list construction: word → (document frequency, comma-joined
    sorted doc ids) over the ``doc_id % 17 == 0`` shard.

    Scale shape: per-batch distinct (word, doc_id) pairs are the only
    exchange; a word-hash bucket colocates each word's postings so the
    sorted list is assembled once per word inside its bucket — the driver
    receives finished postings rows, never raw pairs.  At web scale the
    shard predicate is the index partitioner (one such job per shard)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        t = t.filter(pa.array(ids % _INDEX_SHARD_MOD == 0))
        out = _doc_word_counts(t)[["word", "doc_id"]]
        out["_b"] = _word_bucket_col(out["word"])
        return out

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["word", "doc_id"]).sort_values(
            ["word", "doc_id"], kind="mergesort")
        out = df.groupby("word", as_index=False).agg(
            df_docs=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(str(x) for x in s)))
        return out

    out = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("_b").map_groups(assemble, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        # empty index shard → schema-less empty; match the oracle
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "df_docs": pd.Series([], dtype="int64"),
                             "postings": pd.Series([], dtype=object)})
    out["df_docs"] = out["df_docs"].astype("int64")
    return out[["word", "df_docs", "postings"]] \
        .sort_values(["df_docs", "word"], ascending=[False, True]) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# training-mixture reweighting: per-language upweight factors that equalize
# token contributions (the DoReMi-flavored static mixture step)
# ---------------------------------------------------------------------------


def docs_mixture_weights(sf_dir: str) -> pd.DataFrame:
    """Per-language token totals and the integer-ppm upweight factor that
    equalizes each language's token contribution to the smallest language
    (``weight_ppm = min_total * 1e6 // lang_total``).

    Scale shape: one streaming pass of per-batch (lang, token-count)
    partials into a ≤|langs|-row groupby; the min + division happen on the
    driver over that tiny frame.  No text leaves the workers."""
    ds = _docs(sf_dir, ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.split().str.len().astype("int64")
        return pd.DataFrame({"lang": df["lang"], "ntok": n}) \
            .groupby("lang", as_index=False)["ntok"].sum()

    totals = ds.map_batches(partial, batch_format="pandas") \
        .groupby("lang").sum("ntok").to_pandas()
    totals = totals.rename(columns={"sum(ntok)": "lang_tokens"})
    totals["lang_tokens"] = totals["lang_tokens"].astype("int64")
    target = int(totals["lang_tokens"].min())
    totals["weight_ppm"] = (
        target * 1_000_000 // totals["lang_tokens"]).astype("int64")
    return totals[["lang", "lang_tokens", "weight_ppm"]] \
        .sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# deterministic train/val/test split: md5-hash routing (the shared-hash
# trick from events_kmv_distinct) so membership is a pure row property —
# reproducible across runs, partitionings, and engines
# ---------------------------------------------------------------------------


def docs_train_val_test(sf_dir: str) -> pd.DataFrame:
    """Per-(lang, split) document and token counts for an 80/10/10
    train/val/test split routed by ``md5(doc_id) % 10`` — the
    deterministic split a training pipeline snapshots alongside the data.

    Scale shape: split assignment is row-local (no shuffle, no RNG state);
    one tiny (lang × 3)-row aggregate leaves the workers."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
        bucket = (h % 10).to_numpy()
        split = np.where(bucket < 8, "train",
                         np.where(bucket < 9, "val", "test"))
        ntok = df["text"].fillna("").str.split().str.len().astype("int64")
        out = pd.DataFrame({"lang": df["lang"], "split": split,
                            "ntok": ntok})
        return out.groupby(["lang", "split"], as_index=False).agg(
            n_docs=("ntok", "size"), n_tokens=("ntok", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["lang", "split"], as_index=False).sum()
    for c in ("n_docs", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# cross-corpus vocabulary overlap: set intersection over an UNBOUNDED word
# domain — the complement of events_type_overlap's bounded-domain version
# ---------------------------------------------------------------------------


def docs_lang_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Shared-vocabulary size for every language pair.

    Scale shape: per-batch distinct (lang, word) pairs are the exchange;
    each word-hash bucket sees every language a word occurs in, builds one
    boolean word×lang membership matrix, and emits a |langs|² count
    partial (``M.T @ M``) — the unbounded word domain is never globally
    collected, and the driver merges 64 tiny matrices."""
    ds = _docs(sf_dir, ["lang", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame({
            "lang": df["lang"],
            "word": df["text"].fillna("").str.lower().str.split(),
        }).explode("word", ignore_index=True).dropna(subset=["word"])
        ex = ex.drop_duplicates()
        ex["_b"] = _word_bucket_col(ex["word"])
        return ex

    def bucket_overlap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["lang", "word"])
        m = pd.crosstab(df["word"], df["lang"]).astype(bool)
        co = m.T.to_numpy().astype("int64") @ m.to_numpy().astype("int64")
        langs = list(m.columns)
        rows = []
        for i, la in enumerate(langs):
            for j, lb in enumerate(langs):
                # co == 0 pairs are omitted: the oracle's inner join on
                # word never yields a row for pairs with no shared word
                if la < lb and co[i, j] > 0:
                    rows.append({"lang_a": la, "lang_b": lb,
                                 "n_shared": int(co[i, j])})
        return pd.DataFrame(rows, columns=["lang_a", "lang_b", "n_shared"])

    parts = ds.map_batches(pairs, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_overlap, batch_format="pandas") \
        .to_pandas()
    if parts.empty:
        # every bucket empty → Ray drops the schema; return the typed
        # empty frame the oracle's inner join would produce
        return pd.DataFrame({"lang_a": pd.Series([], dtype=object),
                             "lang_b": pd.Series([], dtype=object),
                             "n_shared": pd.Series([], dtype="int64")})
    out = parts.groupby(["lang_a", "lang_b"], as_index=False)["n_shared"] \
        .sum()
    out["n_shared"] = out["n_shared"].astype("int64")
    return out.sort_values(["lang_a", "lang_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# incremental-ingest dedup: a NEW batch of documents deduped against the
# already-ingested corpus — the streaming-append shape (new data probes the
# historical index; history is never rescanned per arriving doc)
# ---------------------------------------------------------------------------


def docs_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Treat ``doc_id % 2 == 0`` as the ingested corpus and ``% 2 == 1`` as
    the arriving batch: an arriving doc survives iff its text hash is
    unseen in the corpus AND it is the first (min doc_id) arrival with
    that hash.  Returns per-language (n_incoming, n_survivors).

    Scale shape: both sides ship only (md5, …) projections; a hash bucket
    colocates each hash's corpus row with its arrivals, so membership +
    first-arrival resolve per bucket with set arithmetic — no broadcast
    corpus index, no driver sets.  md5 is the shared-hash conformance
    choice (see events_kmv_distinct)."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].fillna("").map(
            lambda t: hashlib.md5(t.encode()).hexdigest())
        out = pd.DataFrame({
            "h": h,
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"],
            "incoming": (df["doc_id"].astype("int64") % 2 == 1)})
        out["_b"] = _word_bucket_col(out["h"])
        return out

    def bucket_resolve(df: pd.DataFrame) -> pd.DataFrame:
        base = set(df.loc[~df["incoming"], "h"])
        inc = df[df["incoming"]]
        if inc.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "n_incoming": pd.Series([], dtype="int64"),
                                 "n_survivors": pd.Series([], dtype="int64")})
        fresh = inc[~inc["h"].isin(base)]
        surv = fresh.sort_values("doc_id").drop_duplicates("h", keep="first")
        n_in = inc.groupby("lang", as_index=False).agg(
            n_incoming=("h", "size"))
        n_sv = surv.groupby("lang", as_index=False).agg(
            n_survivors=("h", "size"))
        out = n_in.merge(n_sv, on="lang", how="left").fillna(0)
        out["n_survivors"] = out["n_survivors"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_resolve, batch_format="pandas") \
        .to_pandas()
    if parts.empty:
        # no arriving docs at all → schema-less empty; match the oracle
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "n_incoming": pd.Series([], dtype="int64"),
                             "n_survivors": pd.Series([], dtype="int64")})
    out = parts.groupby("lang", as_index=False).sum()
    for c in ("n_incoming", "n_survivors"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# product quantization: the vector-compression encode stage for 100-TB ANN
# (64 dims → 4 subspace codes against an 8-centroid codebook per subspace)
# ---------------------------------------------------------------------------

_PQ_SUBSPACES = 4
_PQ_K = 8


def emb_pq_codes(sf_dir: str, n_sub: int = _PQ_SUBSPACES,
                 k: int = _PQ_K) -> pd.DataFrame:
    """PQ-encode every embedding: split the 64 dims into ``n_sub``
    contiguous subspaces, code each against the deterministic codebook
    (the ``vec_id < k`` vectors restricted to that subspace) by
    ROUND(L2², 6) argmin, ties to the smaller centroid id — the rounding
    is the same float contract as ``emb_kmeans_assign``, so the DuckDB
    twin reproduces the codes exactly.

    Scale shape: the codebook is one ``ray.put`` broadcast (n_sub×k×16
    floats); encoding is a row-local vectorized einsum per batch — no
    shuffle, 64 floats compress to ``n_sub`` small ints per row (the
    whole point at 10⁹ vectors)."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", k)])
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    dim = cb.shape[1]
    sub = dim // n_sub
    cb_ref = ray.put(cb.reshape(k, n_sub, sub))

    def encode(batch: pa.Table) -> pd.DataFrame:
        cbk = ray.get(cb_ref)  # (k, n_sub, sub)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        v = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64).reshape(len(ids), n_sub, sub)
        out = {"vec_id": ids}
        for s in range(n_sub):
            diff = v[:, None, s, :] - cbk[None, :, s, :]     # (n, k, sub)
            d = np.round((diff * diff).sum(axis=-1), 6)      # (n, k)
            out[f"code_{s}"] = np.argmin(d, axis=1).astype("int64")
        return pd.DataFrame(out)

    out = _emb(sf_dir).map_batches(encode, batch_format="pyarrow") \
        .to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def emb_pq_adc_topk(sf_dir: str, n_sub: int = _PQ_SUBSPACES,
                    k_cent: int = _PQ_K, k: int = 10) -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k search over the PQ codes: the query
    (vec_id 0) precomputes one ROUND(L2², 6) lookup table per subspace
    against the codebook; each vector's approximate distance is the sum of
    its codes' table entries.  Ties break to the smaller vec_id.

    Scale shape: this is WHY PQ exists at 10⁹ vectors — search touches
    only the n_sub small-int codes per row plus a broadcast (n_sub × k)
    LUT, never the float vectors; per-block partial top-k bounds the
    driver merge at blocks × k rows (same exactness argument as
    emb_knn)."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", k_cent)])
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    dim = cb.shape[1]
    sub = dim // n_sub
    q = _query_vec(sf_dir, 0).astype(np.float64).reshape(n_sub, sub)
    cbs = cb.reshape(k_cent, n_sub, sub)
    # LUT[s, c] = ROUND(L2²(q_s, codebook[c]_s), 6) — same contract as the
    # encode stage, so the SQL twin's generated expressions match exactly
    diff = q[None, :, :] - cbs                      # (k, n_sub, sub)
    lut = np.round((diff * diff).sum(axis=-1).T, 6)  # (n_sub, k)
    cb_ref = ray.put(cbs)
    lut_ref = ray.put(lut)

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        cbk = ray.get(cb_ref)
        lt = ray.get(lut_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        v = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64).reshape(len(ids), n_sub, sub)
        adc = np.zeros(len(ids), dtype=np.float64)
        for s in range(n_sub):
            d = np.round(((v[:, None, s, :] - cbk[None, :, s, :]) ** 2)
                         .sum(axis=-1), 6)
            adc += lt[s][np.argmin(d, axis=1)]
        out = pd.DataFrame({"vec_id": ids, "adc": np.round(adc, 6)})
        return out.sort_values(["adc", "vec_id"]).head(k)

    cands = _emb(sf_dir).map_batches(block_topk, batch_format="pyarrow") \
        .to_pandas()
    out = cands.sort_values(["adc", "vec_id"]).head(k)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["vec_id", "adc"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# truncated-embedding (Matryoshka-style) search fidelity: rank by the
# 16-dim PREFIX, report both prefix and full cosine — the cheap-first
# retrieval cascade signal
# ---------------------------------------------------------------------------


def emb_prefix_fidelity(sf_dir: str, prefix: int = 16,
                        k: int = 10) -> pd.DataFrame:
    """Top-k vectors by PREFIX-cosine to query vec 0, with the full-vector
    cosine alongside — how much ranking quality a 4× cheaper first-stage
    scan retains.

    Scale shape: row-local vectorized cosines per batch + per-block
    partial top-k (driver merges blocks×k rows); at 10⁹ vectors the
    prefix scan reads a 4×-smaller column and the full cosine is computed
    only for the survivors — here both are reported for the fidelity
    check."""
    q = _query_vec(sf_dir, 0).astype(np.float64)
    qp = q[:prefix]

    def block_topk(batch: pa.Table) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        v = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        vp = v[:, :prefix]
        pcos = np.round(
            (vp @ qp) / (np.linalg.norm(vp, axis=1)
                         * np.linalg.norm(qp)), 6)
        fcos = np.round(
            (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q)), 6)
        out = pd.DataFrame({"vec_id": ids, "pcos": pcos, "fcos": fcos})
        return out.sort_values(["pcos", "vec_id"],
                               ascending=[False, True]).head(k)

    cands = _emb(sf_dir).map_batches(block_topk, batch_format="pyarrow") \
        .to_pandas()
    out = cands.sort_values(["pcos", "vec_id"],
                            ascending=[False, True]).head(k)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["vec_id", "pcos", "fcos"]].reset_index(drop=True)


def docs_interleaved_pack(sf_dir: str,
                          block_tokens: int = _PACK_BLOCK_TOKENS,
                          media_tokens: int = 64) -> pd.DataFrame:
    """Multimodal-aware sequence packing over the interleaved corpus: a
    document's cost is its text tokens PLUS a fixed ``media_tokens``
    budget per media span (the vision-token placeholder cost in an
    interleaved text+image training batch).  Same two-pass prefix-sum
    machinery as ``docs_pack_blocks`` — text and media never move, only
    the (doc_id, cost) projection.

    Both counts are single-pass Arrow regex kernels over the raw text:
    tokens = ``\\S+`` matches; media spans = trigger-prefixed tokens
    (``(?:^|\\s)[sS]``), the same synthesis rule as
    docs_interleaved_media_stats."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        ntok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                       pa.int64())
        nmed = pc.cast(pc.count_substring_regex(t["text"], r"(?:^|\s)[sS]"),
                       pa.int64())
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_cost": pc.add(ntok, pc.multiply(
                nmed, pa.scalar(media_tokens, pa.int64()))),
        })

    return _pack_by_cost(ds.map_batches(project, batch_format="pyarrow"),
                         block_tokens, "n_cost")


# ---------------------------------------------------------------------------
# PII detection / redaction: the pre-training scrub pass (emails, phone
# numbers, IPv4) as single-pass RE2 Arrow kernels.  The testdata corpus is
# synthetic word salad, so deterministic PII is first SYNTHESIZED from
# doc_id (same derive-then-compute contract as the interleaved media
# operators) — the regex kernels themselves are the real scrub engine.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"
PII_IP_RE = r"\b10\.[0-9]{1,3}\.0\.[0-9]{1,3}\b"


def _pii_augment(doc_ids: List[int], texts: List[str]) -> List[str]:
    """Deterministic PII injection: docs with doc_id divisible by 3/5/7
    gain an email / phone / IP contact block (mirrored exactly by the
    oracle SQL's string expression)."""
    out = []
    for did, tx in zip(doc_ids, texts):
        aug = tx or ""
        if did % 3 == 0:
            aug += f" contact user{did}@example.com"
        if did % 5 == 0:
            aug += f" call 555-{did % 10000:04d}"
        if did % 7 == 0:
            aug += f" from 10.{did % 256}.0.{did % 100}"
        out.append(aug)
    return out


def docs_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """Per-document PII census + redaction: counts of emails / phone
    numbers / IPv4 addresses and the post-redaction text length (each
    match replaced by a ``<KIND>`` placeholder).

    Scale shape: row-local — one Arrow batch transform, four RE2 kernels
    per category (count + chained replace), no exchange; only the 5-int
    projection leaves the workers.  Redacted bodies would be written
    column-for-column in a real scrub (kept out of the result table
    here so the gate ships integers)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        aug = pa.array(_pii_augment(ids, t["text"].to_pylist()), pa.string())
        n_emails = pc.count_substring_regex(aug, PII_EMAIL_RE)
        n_phones = pc.count_substring_regex(aug, PII_PHONE_RE)
        n_ips = pc.count_substring_regex(aug, PII_IP_RE)
        red = pc.replace_substring_regex(aug, PII_EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_PHONE_RE, "<PHONE>")
        red = pc.replace_substring_regex(red, PII_IP_RE, "<IP>")
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
            "n_ips": pc.cast(n_ips, pa.int64()),
            "clean_len": pc.cast(pc.utf8_length(red), pa.int64()),
        })

    out = ds.map_batches(scrub, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES): each
# row draws a deterministic md5 uniform u and scores ln(u)/weight; the
# global top-k by score IS a weighted sample without replacement.  The
# float score is per-row (no aggregation), so engine and SQL rank
# identically; the score itself stays out of the result table.
# ---------------------------------------------------------------------------


def docs_weighted_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Deterministic weighted sample (weight = n_chars): top-``k`` docs by
    ``ln(u)/n_chars`` with ``u = (md5_32(doc_id)+1)/2^32``.

    Scale shape: per-block top-k partials (argpartition) → driver merges
    ≤ k×blocks projection rows; document text never moves."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
        u = (h.to_numpy(dtype=np.float64) + 1.0) / 4294967296.0
        score = np.log(u) / df["n_chars"].to_numpy(dtype=np.float64)
        take = min(k, len(df))
        idx = (np.argpartition(-score, take - 1)[:take]
               if take < len(df) else np.arange(len(df)))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[idx],
            "n_chars": df["n_chars"].to_numpy()[idx],
            "score": score[idx]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k)
    parts["sample_rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    out = parts[["sample_rank", "doc_id", "n_chars"]].reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# power iteration: dominant right singular direction of the embedding
# matrix (uncentered PCA top component) in two distributed passes.  The
# inter-iteration contract is ROUND(w/||w||, 6) — identical to the
# emb_kmeans_iterate reproducibility contract — so the float partial sums
# (whose association order differs between engine and SQL) are re-pinned
# to 6 decimals before they feed the next pass.
# ---------------------------------------------------------------------------


def _power_pass(ds, v: np.ndarray, dim: int) -> np.ndarray:
    """One distributed pass w = Xᵀ(Xv): per-block partial (1×dim row),
    driver sums ≤ blocks×dim floats."""
    def partial(t: pa.Table) -> pd.DataFrame:
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        w = X.T @ (X @ v)
        return pd.DataFrame([{f"w{i}": w[i] for i in range(dim)}])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.to_numpy(dtype=np.float64).sum(axis=0)


def emb_knn_classify(sf_dir: str, holdout_mod: int = 5, k: int = 3,
                     n_queries: int = 16) -> pd.DataFrame:
    """Semi-supervised kNN label propagation audit: vectors with
    ``vec_id % holdout_mod == 0`` are treated as UNLABELED; for the
    ``n_queries`` smallest of them, predict the majority label of their
    ``k`` nearest LABELED neighbors (ROUND-6 cosine, ties → smaller
    vec_id; vote ties → smaller label) and report correctness against
    the hidden true label.

    Scale shape: one bounded pass picks the query sample (each block
    ships ≤ n_queries candidate rows); the scoring pass broadcasts the
    tiny query matrix and emits per-(query, block) top-k partials of the
    LABELED rows only — every global top-k member is a block-local
    top-k member, so the driver merge over blocks×k×queries projections
    is exact (the emb_knn argument)."""
    import ray

    ds = _emb(sf_dir)

    def q_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"vec_id": pd.Series([], dtype="int64"),
                "label": pd.Series([], dtype="int64")}
        cols.update({f"e{i}": pd.Series([], dtype="float64")
                     for i in range(64)})
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = ids % holdout_mod == 0
        if not m.any():
            return pd.DataFrame(cols)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[m]) \
            .astype(np.float64)
        sub = pd.DataFrame({"vec_id": ids[m].astype("int64"),
                            "label": t["label"].to_numpy(
                                zero_copy_only=False)[m].astype("int64")})
        for i in range(64):
            sub[f"e{i}"] = vecs[:, i]
        return sub.nsmallest(n_queries, "vec_id")

    qdf = ds.map_batches(q_partial, batch_format="pyarrow").to_pandas()
    cols = ("vec_id", "pred_label", "true_label", "correct")
    if qdf.empty:
        return pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "pred_label": pd.Series([], dtype="int32"),
            "true_label": pd.Series([], dtype="int32"),
            "correct": pd.Series([], dtype="int64")})
    qdf = qdf.nsmallest(n_queries, "vec_id").reset_index(drop=True)
    Q = qdf[[f"e{i}" for i in range(64)]].to_numpy(dtype=np.float64)
    qids = qdf["vec_id"].to_numpy(dtype="int64")
    true_labels = dict(zip(qids, qdf["label"].astype(int)))
    q_ref = ray.put(Q)

    def score_partial(t: pa.Table) -> pd.DataFrame:
        cols2 = {"qid": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "label": pd.Series([], dtype="int64"),
                 "cs": pd.Series([], dtype="float64")}
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = ids % holdout_mod != 0
        if not m.any():
            return pd.DataFrame(cols2)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[m]) \
            .astype(np.float64)
        labels = t["label"].to_numpy(zero_copy_only=False)[m] \
            .astype("int64")
        lids = ids[m].astype("int64")
        qm = ray.get(q_ref)
        rows = []
        for qi in range(qm.shape[0]):
            cs = np.round(cosine_scores(vecs, qm[qi]), 6)
            order = np.lexsort((lids, -cs))[:k]
            for j in order:
                rows.append((int(qids[qi]), int(lids[j]),
                             int(labels[j]), float(cs[j])))
        return pd.DataFrame(rows, columns=["qid", "vec_id", "label", "cs"])

    parts = ds.map_batches(score_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty:
        # held-out queries but ZERO labeled vectors: the oracle's scored
        # CTE is empty, so the result is typed-empty (degenerate-table
        # class — guard the collected driver frame)
        return pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "pred_label": pd.Series([], dtype="int32"),
            "true_label": pd.Series([], dtype="int32"),
            "correct": pd.Series([], dtype="int64")})
    out_rows = []
    for qid in qids:
        g = parts[parts["qid"] == qid]
        g = g.sort_values(["cs", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        votes = g.groupby("label").size().reset_index(name="nv") \
            .sort_values(["nv", "label"], ascending=[False, True],
                         kind="mergesort")
        pred = int(votes["label"].iloc[0])
        tl = int(true_labels[qid])
        out_rows.append((int(qid), pred, tl, int(pred == tl)))
    out = pd.DataFrame(out_rows, columns=list(cols))
    out["vec_id"] = out["vec_id"].astype("int64")
    out["pred_label"] = out["pred_label"].astype("int32")
    out["true_label"] = out["true_label"].astype("int32")
    out["correct"] = out["correct"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def emb_pca_top2(sf_dir: str, dim: int = 64, iters: int = 2) -> pd.DataFrame:
    """Top-2 principal directions of the (uncentered) Gram matrix XᵀX
    via power iteration + Hotelling deflation: v1 exactly as
    ``emb_power_iteration``; then λ1 = ROUND(Σ_rows (x·v1)², 6) and u
    iterates ``w = Cu - λ1·v1·ROUND(v1ᵀu, 6)`` with the same
    normalize-then-ROUND(,6) inter-step contract, so the iterative
    float fixpoint is reproducible in SQL.

    Scale shape: every step is one streaming pass of 1×64 per-block
    partials (``_power_pass`` / a scalar Σ(x·v1)² partial) — embeddings
    never leave their blocks, no shuffle anywhere; the driver holds two
    64-vectors and a scalar."""
    ds = _emb(sf_dir)
    v1 = np.zeros(dim, dtype=np.float64)
    v1[0] = 1.0
    for _ in range(iters):
        w = _power_pass(ds, v1, dim)
        nrm = float(np.sqrt((w * w).sum()))
        v1 = np.round(w / nrm, 6) if nrm > 0 else np.zeros(dim)

    # λ1 = Σ_rows (x·v1)² — one scalar-partial pass
    def lam_partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"l": pd.Series([], dtype="float64")})
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        d = X @ v1
        return pd.DataFrame({"l": [float((d * d).sum())]})

    lam = round(float(ds.map_batches(lam_partial, batch_format="pyarrow")
                      .to_pandas()["l"].sum()), 6)

    u = np.zeros(dim, dtype=np.float64)
    u[1] = 1.0
    for _ in range(iters):
        t = _power_pass(ds, u, dim)
        # left-to-right 64-term dot and norm — the association order the
        # SQL twin writes explicitly (_dot_ltr/_norm_ltr convention)
        dvu = round(float(_dot_ltr(v1[None, :], u)[0]), 6)
        w = t - lam * v1 * dvu
        nrm = _norm_ltr(w)
        u = np.round(w / nrm, 6) if nrm > 0 else np.zeros(dim)

    return pd.DataFrame({"dim": np.arange(dim, dtype=np.int64),
                         "loading1": v1.astype(np.float64),
                         "loading2": u.astype(np.float64)})


def emb_power_iteration(sf_dir: str, dim: int = 64,
                        iters: int = 2) -> pd.DataFrame:
    """Top principal direction via ``iters`` power iterations starting
    from the first basis vector; output = (dim, loading) with loadings
    rounded to 6 dp (the reproducibility contract).

    Scale shape: each iteration is one streaming pass emitting a 1×64
    partial per block — O(blocks×dim) floats to the driver, embeddings
    never leave their blocks; no shuffle anywhere."""
    ds = _emb(sf_dir)
    v = np.zeros(dim, dtype=np.float64)
    v[0] = 1.0
    for _ in range(iters):
        w = _power_pass(ds, v, dim)
        nrm = float(np.sqrt((w * w).sum()))
        v = np.round(w / nrm, 6) if nrm > 0 else np.zeros(dim)
    return pd.DataFrame({"dim": np.arange(dim, dtype=np.int64),
                         "loading": v.astype(np.float64)})


# ---------------------------------------------------------------------------
# IVF-ANN recall audit: the inverted-file search SHAPE (cell assignment →
# nprobe probe → in-cell rank) made gate-checkable.  Centroids follow the
# emb_kmeans_iterate contract (vec_id < 8 seeds, one Lloyd step, ROUND-6
# means) so the oracle can rebuild the identical index in SQL; the result
# compares the probed top-k against the exact top-k per query.
# ---------------------------------------------------------------------------


def emb_ivf_recall(sf_dir: str, n_seeds: int = 8, nprobe: int = 2,
                   k: int = 10, n_queries: int = 4) -> pd.DataFrame:
    """Recall@k of nprobe-cell IVF search vs brute force for the first
    ``n_queries`` corpus vectors (self excluded), with id checksums pinning
    BOTH top-k sets — the audit row for the bucket-partitioned ANN path.

    Scale shape: one pass of O(k×blocks) centroid-sum partials builds the
    index (vectors never leave their blocks), one pass emits ≤ 2k rows per
    (query, block) of top-k partials (probed + exact); the driver merges
    projections only.  At corpus scale the exact arm is the expensive one
    — the audit runs on a sample of queries, which is exactly how recall
    is monitored in production ANN systems."""
    import pyarrow.parquet as pq
    import ray

    seeds_t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"],
                            filters=[("vec_id", "<", n_seeds)])
    order = np.argsort(seeds_t["vec_id"].to_numpy(zero_copy_only=False))
    cents = np.stack(
        seeds_t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    dim = cents.shape[1]
    cents_ref = ray.put(cents)

    # ---- pass 1: one Lloyd step (identical to emb_kmeans_iterate) ----
    def sum_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"cluster_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")}
        cols.update({f"s{i}": pd.Series([], dtype="float64")
                     for i in range(dim)})
        if len(t) == 0:
            return pd.DataFrame(cols)
        c = ray.get(cents_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        scores = np.round(np.column_stack(
            [cosine_scores(vecs, c[j]) for j in range(c.shape[0])]), 6)
        best = np.argmax(scores, axis=1)
        rows = []
        for cid in np.unique(best):
            m = vecs[best == cid]
            rows.append([int(cid), m.shape[0]] + list(m.sum(axis=0)))
        return pd.DataFrame(rows, columns=list(cols))

    parts = _emb(sf_dir).map_batches(sum_partial, batch_format="pyarrow") \
        .to_pandas()
    agg = parts.groupby("cluster_id").sum().sort_index()
    cids = agg.index.to_numpy(dtype="int64")
    sums = agg[[f"s{i}" for i in range(dim)]].to_numpy(dtype="float64")
    cents2 = np.round(sums / agg["n"].to_numpy(dtype="float64")[:, None], 6)

    # ---- probe lists: nprobe best cells per query (driver-side, tiny) ----
    q_t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "<", n_queries)])
    qorder = np.argsort(q_t["vec_id"].to_numpy(zero_copy_only=False))
    queries = np.stack(
        q_t["embedding"].to_numpy(zero_copy_only=False)[qorder]) \
        .astype(np.float64)
    probed = {}
    for qi in range(queries.shape[0]):
        s = np.round(cosine_scores(cents2, queries[qi]), 6)
        # rank by (score desc, cid asc)
        top = cids[np.lexsort((cids, -s))[:nprobe]]
        probed[qi] = set(int(c) for c in top)
    cents2_ref = ray.put(cents2)
    cids_ref = ray.put(cids)
    queries_ref = ray.put(queries)
    probed_ref = ray.put(probed)

    # ---- pass 2: per-block top-k partials, probed + exact arms ----
    def topk_partial(t: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "vec_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64"),
                              "arm": pd.Series([], dtype=object)})
        if len(t) == 0:
            return empty
        c2, cid_map, qs, pr = (ray.get(cents2_ref), ray.get(cids_ref),
                               ray.get(queries_ref), ray.get(probed_ref))
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        cell_scores = np.round(np.column_stack(
            [cosine_scores(vecs, c2[j]) for j in range(c2.shape[0])]), 6)
        cell = cid_map[np.argmax(cell_scores, axis=1)]
        frames = []
        for qi in range(qs.shape[0]):
            s = np.round(cosine_scores(vecs, qs[qi]), 6)
            notself = ids != qi
            for arm, mask in (("exact", notself),
                              ("ann", notself & np.isin(
                                  cell, list(pr[qi])))):
                mids, ms = ids[mask], s[mask]
                take = min(k, len(mids))
                if take == 0:
                    continue
                idx = np.lexsort((mids, -ms))[:take]
                frames.append(pd.DataFrame({
                    "query_id": np.int64(qi), "vec_id": mids[idx],
                    "score": ms[idx], "arm": arm}))
        return pd.concat(frames, ignore_index=True) if frames else empty

    merged = _emb(sf_dir).map_batches(topk_partial, batch_format="pyarrow") \
        .to_pandas()
    rows = []
    for qi in range(queries.shape[0]):
        sub = merged[merged["query_id"] == qi]
        sets = {}
        for arm in ("exact", "ann"):
            a = sub[sub["arm"] == arm].sort_values(
                ["score", "vec_id"], ascending=[False, True]).head(k)
            sets[arm] = set(a["vec_id"].tolist())
        rows.append({
            "query_id": qi,
            "recall_hits": len(sets["exact"] & sets["ann"]),
            "exact_checksum": sum(sets["exact"]),
            "ann_checksum": sum(sets["ann"])})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("query_id").reset_index(drop=True)


def docs_media_asset_dedup(sf_dir: str) -> pd.DataFrame:
    """Shared-media-asset dedup over the interleaved corpus: each
    ``img://{word}`` ref is stored once, owned by the LOWEST doc_id that
    embeds it; every other span pointing at it is a dedup hit.  Returns
    per document its media-span total, the refs it owns, and the spans
    it borrows from other documents' assets.

    Scale shape: same two-exchange projection as docs_rarity_score —
    round 1 colocates (doc, ref, n) partials under a ref-hash bucket
    (owner = min doc_id is exact per bucket), round 2 re-keys the scored
    integer rows by doc-hash bucket and reduces; media bytes never move."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        inter = _interleaved_with_media(t, positional_refs=False)
        acc: Dict[tuple, int] = {}
        for did, spans in zip(inter["doc_id"].to_pylist(),
                              inter["spans"].to_pylist()):
            for s in spans:
                if s["kind"] == "media":
                    key = (s["media_ref"], int(did))
                    acc[key] = acc.get(key, 0) + 1
        refs = [k[0] for k in acc]
        bucket = (pd.util.hash_pandas_object(
            pd.Series(refs, dtype=object), index=False) % 64).astype("int64")
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "doc_id": pa.array([k[1] for k in acc], pa.int64()),
            "n": pa.array(list(acc.values()), pa.int64()),
            "_b": pa.array(bucket.to_numpy(), pa.int64())})

    def ref_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["media_ref", "doc_id"], as_index=False).agg(
            n=("n", "sum"))
        owner = df.groupby("media_ref")["doc_id"].transform("min")
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_media": df["n"].astype("int64"),
            "n_owned_refs": (df["doc_id"] == owner).astype("int64"),
            "n_dup_spans": df["n"].where(df["doc_id"] != owner, 0)
                .astype("int64")})
        out = out.groupby("doc_id", as_index=False).sum()
        out["_d"] = (out["doc_id"] % 64).astype("int64")
        return out

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).agg(
            n_media=("n_media", "sum"),
            n_owned_refs=("n_owned_refs", "sum"),
            n_dup_spans=("n_dup_spans", "sum"))

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(ref_bucket, batch_format="pandas") \
        .groupby("_d").map_groups(doc_bucket, batch_format="pandas") \
        .to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# end-to-end training-data build: the composed corpus pipeline
# (exact dedup → quality filter → deterministic split → per-(lang, split)
# census) as ONE gate row, so the STAGE COMPOSITION — not just each stage
# — is hash-checked against a single SQL chain.
# ---------------------------------------------------------------------------

_BUILD_MIN_WORDS = 40
_BUILD_MIN_STOP_PPM = 10_000


def docs_training_build(sf_dir: str, min_words: int = _BUILD_MIN_WORDS,
                        min_stop_ppm: int = _BUILD_MIN_STOP_PPM
                        ) -> pd.DataFrame:
    """Per-(lang, split) document and token counts of the final training
    corpus after keep-first exact dedup, quality filtering (word count ≥
    ``min_words`` AND stopword-ppm ≥ ``min_stop_ppm``), and the md5
    80/10/10 split.

    Scale shape: pass A projects per-doc integers + a 16-hex text hash
    (bodies never leave their blocks); the single exchange colocates the
    projections under a 64-way hash bucket where dedup keep-first,
    quality filter, split assignment, and the per-(lang, split) partial
    aggregation all happen vectorized; the driver reduces ≤
    |langs|×3×64 partial rows."""
    import hashlib

    from ..functions.quality import QUALITY_STOPWORDS

    stop_pat = r"\b(?:" + "|".join(QUALITY_STOPWORDS) + r")\b"

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def project(t: pa.Table) -> pd.DataFrame:
        texts = t["text"].to_pylist()
        hs = [hashlib.sha256((x or "").encode()).hexdigest()[:16]
              for x in texts]
        n_words = pc.count_substring_regex(
            t["text"], r"[A-Za-z0-9_]+").to_numpy(zero_copy_only=False) \
            .astype("int64")
        stop_hits = pc.count_substring_regex(
            pc.utf8_lower(t["text"]), stop_pat) \
            .to_numpy(zero_copy_only=False).astype("int64")
        ntok = pc.count_substring_regex(t["text"], r"\S+") \
            .to_numpy(zero_copy_only=False).astype("int64")
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
                .astype("int64"),
            "lang": t["lang"].to_pylist(),
            "h": hs,
            "n_words": n_words, "stop_hits": stop_hits, "ntok": ntok,
            "_b": np.array([int(h[:8], 16) % 64 for h in hs],
                           dtype="int64")})

    def build_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # keep-first exact dedup: all rows of a text hash are in this bucket
        df = df.sort_values("doc_id").groupby("h", as_index=False).first()
        stop_ppm = (df["stop_hits"] * 1_000_000
                    // np.maximum(df["n_words"], 1)).astype("int64")
        keep = (df["n_words"] >= min_words) & (stop_ppm >= min_stop_ppm)
        df = df[keep]
        if df.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "split": pd.Series([], dtype=object),
                                 "n_docs": pd.Series([], dtype="int64"),
                                 "n_tokens": pd.Series([], dtype="int64")})
        m = df["doc_id"].map(lambda d: int(hashlib.md5(
            str(d).encode()).hexdigest()[:8], 16) % 10)
        split = np.where(m < 8, "train", np.where(m < 9, "val", "test"))
        out = pd.DataFrame({"lang": df["lang"], "split": split,
                            "n": 1, "ntok": df["ntok"]})
        out = out.groupby(["lang", "split"], as_index=False).agg(
            n_docs=("n", "sum"), n_tokens=("ntok", "sum"))
        return out.astype({"n_docs": "int64", "n_tokens": "int64"})

    out = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("_b").map_groups(build_bucket, batch_format="pandas") \
        .to_pandas()
    out = out.groupby(["lang", "split"], as_index=False).sum()
    for c in ("n_docs", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


def emb_mips_topk(sf_dir: str, k: int = 10, query_id: int = 0) -> pd.DataFrame:
    """Maximum-inner-product top-k via the norm-augmentation reduction
    (Bachrach et al. / Shrivastava-Li asymmetric transform): each vector
    gains a dimension sqrt(M² − ‖x‖²) with M = corpus max norm, the query
    gains 0, and cosine argmax over the augmented space IS the MIPS
    answer — the transform that lets an existing cosine-ANN index serve
    inner-product queries.  The engine RANKS through the transform and
    reports the true inner products; the SQL twin ranks by inner product
    directly, so the reduction's correctness is what the gate checks.

    Scale shape: pass 1 ships one max-norm scalar per block; pass 2 is
    per-block augmented-cosine top-k partials (k×blocks projection rows
    to the driver), embeddings never move."""
    import pyarrow.parquet as pq

    q_t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "=", query_id)])
    q = np.stack(q_t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)[0]

    ds = _emb(sf_dir)

    def max_norm(t: pa.Table) -> pd.DataFrame:
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pd.DataFrame({"m": [float(np.sqrt((X * X).sum(axis=1)).max())]})

    M = float(ds.map_batches(max_norm, batch_format="pyarrow")
              .to_pandas()["m"].max())
    q_aug = np.concatenate([q, [0.0]])
    q_aug_norm = float(np.sqrt((q_aug * q_aug).sum()))

    def topk_partial(t: pa.Table) -> pd.DataFrame:
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        norms2 = (X * X).sum(axis=1)
        aug = np.sqrt(np.maximum(M * M - norms2, 0.0))
        # augmented cosine: (x·q + aug·0) / (M · ‖q_aug‖) — the augmented
        # vector norm is M BY CONSTRUCTION, so ranking by this equals
        # ranking by the raw inner product x·q
        # augmented-norm invariant: ‖(x, aug)‖ == M by construction
        assert np.allclose(norms2 + aug * aug, M * M, rtol=1e-9)
        ip = X @ q
        score = ip / (M * q_aug_norm)
        take = min(k, len(ids))
        idx = np.lexsort((ids, -score))[:take]
        return pd.DataFrame({"vec_id": ids[idx],
                             "ip": np.round(ip[idx], 6),
                             "score": score[idx]})

    parts = ds.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["score", "vec_id"],
                            ascending=[False, True]).head(k)
    out = out[["vec_id", "ip"]].reset_index(drop=True)
    out["vec_id"] = out["vec_id"].astype("int64")
    out["ip"] = out["ip"].astype("float64")
    return out


def docs_compaction_roundtrip(sf_dir: str,
                              small_blocks: int = 64,
                              target_blocks: int = 4) -> pd.DataFrame:
    """Small-file compaction — the lakehouse maintenance pass: documents
    land as ``small_blocks`` tiny parquet fragments (the shape a
    streaming crawl leaves behind), are compacted by a streaming
    read → repartition → write into ``target_blocks`` files, and the
    compacted layout is aggregated per language.  The oracle runs the
    same aggregate on the ORIGINAL table, so any row lost, duplicated or
    mutated by EITHER write, the repartition, or either read is a hash
    mismatch.  The file-count contract (fragments actually merged) is
    pinned by the pytest twin, which the gate can't see.

    Scale shape: both writes stream block-by-block (no driver
    materialization); repartition is the one exchange and moves only the
    3-column projection."""
    import glob
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="aiws_compact_")
    small_dir = f"{root}/small"
    compact_dir = f"{root}/compact"
    try:
        ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"],
                   num_blocks=small_blocks)
        ds.write_parquet(small_dir)
        n_small = len(glob.glob(f"{small_dir}/*.parquet"))

        rd.read_parquet(small_dir).repartition(target_blocks) \
            .write_parquet(compact_dir)
        n_compact = len(glob.glob(f"{compact_dir}/*.parquet"))
        # compaction must actually compact (pytest asserts the counts;
        # this guard makes a silent no-op loud in the gate too)
        assert n_compact < n_small, (n_compact, n_small)

        back = rd.read_parquet(compact_dir)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("lang", as_index=False).agg(
                n_docs=("doc_id", "size"), id_checksum=("doc_id", "sum"),
                sum_chars=("n_chars", "sum"))

        parts = back.map_batches(partial, batch_format="pandas").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), id_checksum=("id_checksum", "sum"),
        sum_chars=("sum_chars", "sum"))
    for c in ("n_docs", "id_checksum", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash-LSH recall audit: the banded-LSH candidate generator measured
# against the EXACT shingle-Jaccard pair set, with an md5-shared hash
# family so the DuckDB twin rebuilds the identical signatures — the LSH
# shape itself (shingle → signature → band → candidate) is hash-checked,
# complementing the pinned-survivor-set oracles of docs_minhash_dedup.
# ---------------------------------------------------------------------------

_MHA_PERMS = 16
_MHA_BAND_ROWS = 4


def _mha_shingles(text: str) -> List[str]:
    w = [x for x in (text or "").lower().split() if x]
    return sorted({" ".join(w[i:i + 3]) for i in range(len(w) - 2)})


def docs_minhash_recall(sf_dir: str,
                        theta_ppm: int = 500_000) -> pd.DataFrame:
    """One-row audit: exact Jaccard-≥θ pair count, banded-LSH candidate
    count, true candidates, and recall in ppm (16 md5 perms, 4 bands × 4
    rows, 3-word shingles).

    Scale shape: ONE projection pass emits both arms' keyed rows
    ("S:<shingle>" postings and "B:<band-sig>" keys) with their hash
    bucket; one bucket exchange generates pair partials vectorized per
    key, one pair-hash exchange merges them — two shuffles total, no
    row-wise filters.  Only pair AGGREGATES and the (bounded,
    near-duplicate) pair lists reach the driver; per-doc shingle counts
    broadcast as a dict at audit scale — at corpus scale that lookup
    becomes one more hash-bucket join, and hot shingles/bands need the
    MAX_GROUP cap of the dedup paths (this is the audit, run on a
    sample)."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def sizes_partial(t: pa.Table) -> pd.DataFrame:
        dids = [int(x) for x in t["doc_id"].to_pylist()]
        ns = [len(_mha_shingles(tx)) for tx in t["text"].to_pylist()]
        return pd.DataFrame({"doc_id": np.array(dids, dtype="int64"),
                             "n": np.array(ns, dtype="int64")})

    sizes = ds.map_batches(sizes_partial, batch_format="pyarrow").to_pandas()
    size_of = dict(zip(sizes["doc_id"].astype("int64"),
                       sizes["n"].astype("int64")))

    def project(t: pa.Table) -> pd.DataFrame:
        keys: List[str] = []
        dids: List[int] = []
        rows = [(int(did), _mha_shingles(tx))
                for did, tx in zip(t["doc_id"].to_pylist(),
                                   t["text"].to_pylist())]
        # hash each DISTINCT shingle once per permutation (corpora with
        # a small shared vocabulary repeat shingles hundreds of times;
        # per-posting hashing was ~240M driver-side md5 calls at the
        # synthesized sf1, this is ~500x fewer)
        distinct = sorted({s for _, shs in rows for s in shs})
        hv = {s: np.array([int(hashlib.md5(f"{i}|{s}".encode())
                               .hexdigest()[:8], 16)
                           for i in range(_MHA_PERMS)], dtype=np.int64)
              for s in distinct}
        for did, shs in rows:
            if not shs:
                continue
            sig = np.min(np.stack([hv[s] for s in shs]), axis=0).tolist()
            keys.extend("S:" + s for s in shs)
            dids.extend([did] * len(shs))
            for b in range(_MHA_PERMS // _MHA_BAND_ROWS):
                row = sig[b * _MHA_BAND_ROWS:(b + 1) * _MHA_BAND_ROWS]
                keys.append(f"B:{b}:" + ",".join(str(h) for h in row))
                dids.append(did)
        bucket = (pd.util.hash_pandas_object(
            pd.Series(keys, dtype=object), index=False) % 64).astype("int64")
        return pd.DataFrame({"key": keys,
                             "doc_id": np.array(dids, dtype="int64"),
                             "_b": bucket.to_numpy()})

    def key_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"kind": pd.Series([], dtype=object),
                              "a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "co": pd.Series([], dtype="int64"),
                              "_p": pd.Series([], dtype="int64")})
        kind_parts: List[np.ndarray] = []
        a_parts: List[np.ndarray] = []
        b_parts: List[np.ndarray] = []
        for key, sub in g.groupby("key", sort=False):
            ids = np.unique(sub["doc_id"].to_numpy(dtype=np.int64))
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            kind_parts.append(np.full(len(ia), key[0], dtype=object))
            a_parts.append(ids[ia])
            b_parts.append(ids[ib])
        if not a_parts:
            return empty
        df = pd.DataFrame({"kind": np.concatenate(kind_parts),
                           "a": np.concatenate(a_parts),
                           "b": np.concatenate(b_parts)})
        out = df.groupby(["kind", "a", "b"], as_index=False).size() \
            .rename(columns={"size": "co"})
        out["_p"] = ((out["a"] * 1_000_003 + out["b"]) % 64).astype("int64")
        return out

    import ray

    # broadcast the per-doc shingle counts so the exact-arm threshold
    # filter runs INSIDE the pair-bucket merge: only surviving exact
    # pairs and banding candidates reach the driver (the unfiltered
    # co-pair table is ~112M rows at the synthesized sf1)
    sizes_ref = ray.put(size_of)

    def pair_merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["kind", "a", "b"], as_index=False).agg(
            co=("co", "sum"))
        if not len(m):
            return m
        is_s = (m["kind"] == "S").to_numpy()
        if is_s.any():
            so = ray.get(sizes_ref)
            sub = m.loc[is_s]
            na = sub["a"].map(so).to_numpy(dtype=np.int64)
            nb = sub["b"].map(so).to_numpy(dtype=np.int64)
            co = sub["co"].to_numpy(dtype=np.int64)
            keep = co * 1_000_000 >= theta_ppm * (na + nb - co)
            m = m.drop(index=sub.index[~keep])
        return m

    pairs = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("_b").map_groups(key_pairs, batch_format="pandas") \
        .groupby("_p").map_groups(pair_merge, batch_format="pandas") \
        .to_pandas()

    exact_pairs: set = set()
    cand_pairs: set = set()
    if not pairs.empty:
        ex = pairs[pairs["kind"] == "S"]
        exact_pairs = set(zip(ex["a"].tolist(), ex["b"].tolist()))
        cd = pairs[pairs["kind"] == "B"]
        cand_pairs = set(zip(cd["a"].tolist(), cd["b"].tolist()))

    inter = len(exact_pairs & cand_pairs)
    recall_ppm = (1_000_000 * inter // len(exact_pairs)
                  if exact_pairs else 1_000_000)
    return pd.DataFrame({
        "n_exact_pairs": pd.Series([len(exact_pairs)], dtype="int64"),
        "n_candidate_pairs": pd.Series([len(cand_pairs)], dtype="int64"),
        "n_true_candidates": pd.Series([inter], dtype="int64"),
        "recall_ppm": pd.Series([recall_ppm], dtype="int64")})


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-pairwise semantic dedup, Abbas et al. 2023,
# arXiv:2303.09540): k-means-style cluster assignment bounds the pairwise
# cosine work to within-cluster blocks — the scale path the flat
# LSH-bucketed embedding_cosine_dedup (stages/dedup.py) trades recall for
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.40


def emb_semdedup(sf_dir: str, n_seeds: int = _KMEANS_SEEDS,
                 tau: float = _SEMDEDUP_TAU) -> pd.DataFrame:
    """SemDeDup: assign every vector to its highest-cosine seed centroid
    (the emb_kmeans_assign contract: round(cos,6), first-max → lowest
    cid), then WITHIN each cluster drop any vector that has a lower-id
    neighbor at cosine ≥ tau.  Survivors keep their cluster id.  tau=0.40
    is calibrated to the synthetic table (max pairwise cosine ≈ 0.51) so
    the drop path and the cluster restriction are both exercised: a
    ≥-tau pair in DIFFERENT clusters must survive.

    Scale shape: the centroid matrix is one ``ray.put`` broadcast and
    assignment is a vectorized per-batch argmax; the pairwise stage
    shuffles only on ``cluster_id`` (at real scale k ~ sqrt(n) bounds the
    group size) and each group does ONE blocked lower-triangular matmul —
    O(block × group) memory, no Python pair loop."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_seeds)])
    if len(t) == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cents = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    cents_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))})
        c = ray.get(cents_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        scores = np.round(np.column_stack(
            [cosine_scores(vecs, c[j]) for j in range(c.shape[0])]), 6)
        best = np.argmax(scores, axis=1)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "cluster_id": pa.array(best.astype("int64"), pa.int64()),
            "embedding": t["embedding"]})

    assigned = _emb(sf_dir).map_batches(assign, batch_format="pyarrow")

    def cluster_dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "cluster_id": pd.Series([], dtype="int64")})
        df = df.sort_values("vec_id").reset_index(drop=True)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        norms[norms == 0.0] = 1.0
        n = len(df)
        dropped = np.zeros(n, dtype=bool)
        block = 1024
        for lo in range(1, n, block):
            hi = min(lo + block, n)
            # rows lo:hi vs ALL lower-id rows 0:hi (strict lower via mask)
            sims = np.round(
                (vecs[lo:hi] @ vecs[:hi].T)
                / np.outer(norms[lo:hi], norms[:hi]), 6)
            idx = np.arange(lo, hi)[:, None] > np.arange(hi)[None, :]
            dropped[lo:hi] |= ((sims >= tau) & idx).any(axis=1)
        out = df.loc[~dropped, ["vec_id", "cluster_id"]].copy()
        for c in ("vec_id", "cluster_id"):
            out[c] = out[c].astype("int64")
        return out

    out = assigned.groupby("cluster_id").map_groups(
        cluster_dedup, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    for c in ("vec_id", "cluster_id"):
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# hashed-linear quality classifier (fastText-style bag-of-words scorer with
# a deterministic weight expression instead of learned weights — the model-
# based quality-filter slot in a training-data build, run as a pure
# row-local map)
# ---------------------------------------------------------------------------

_QCLS_BUCKETS = 1024
_QCLS_MULT = 2654435761
_QCLS_MOD = 2003
_QCLS_SHIFT = 1001


def _md5_32(values) -> np.ndarray:
    import hashlib

    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
         for v in values], dtype=np.int64)


def docs_quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Linear bag-of-words document scorer over hashed features:
    ``score = Σ_tokens w(md5_32(word) % 1024)`` with the pinned integer
    weight expression ``w(b) = (b·2654435761) % 2003 − 1001`` — the
    deterministic stand-in for a learned fastText-style quality model
    (weights would arrive as a broadcast table; the hash→weight→sum
    plumbing is identical).  label = keep iff score ≥ 0.

    Scale shape: entirely row-local (no shuffle) — each batch hashes its
    own vocabulary once (dict-of-uniques, not per-token), weights are an
    O(1) expression, one bounded row per doc leaves the worker."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame({
            "doc_id": df["doc_id"],
            "word": df["text"].fillna("").str.lower().str.split(),
        }).explode("word", ignore_index=True).dropna(subset=["word"])
        if len(ex) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "score_sum": pd.Series([], dtype="int64"),
                "label": pd.Series([], dtype=object)})
        uniq = ex["word"].unique()
        w = (_md5_32(uniq) % _QCLS_BUCKETS) * _QCLS_MULT % _QCLS_MOD \
            - _QCLS_SHIFT
        ex["wgt"] = ex["word"].map(dict(zip(uniq, w)))
        out = ex.groupby("doc_id", as_index=False).agg(
            n_tokens=("wgt", "size"), score_sum=("wgt", "sum"))
        out["label"] = np.where(out["score_sum"] >= 0, "keep", "drop")
        for c in ("doc_id", "n_tokens", "score_sum"):
            out[c] = out[c].astype("int64")
        return out

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64"),
                             "score_sum": pd.Series([], dtype="int64"),
                             "label": pd.Series([], dtype=object)})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): hashed-
# unigram importance ratios of a target distribution (lang='en') over the
# raw corpus — the data-selection scorer a targeted pretraining mix uses
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"


def docs_dsir_weights(sf_dir: str, n_buckets: int = _DSIR_BUCKETS,
                      target_lang: str = _DSIR_TARGET_LANG) -> pd.DataFrame:
    """Per-document DSIR importance score: hash every token into 256
    buckets (md5-shared so the SQL twin runs the identical hash), estimate
    add-one-smoothed bucket frequencies for the TARGET slice (lang='en')
    and the RAW corpus, and score each document by the sum of its tokens'
    integer ratio ``ratio_ppm(b) = ((t_b+1)·(R+B)·10⁶) // ((r_b+1)·(T+B))``
    — the exact-integer monotone twin of the log-likelihood-ratio sum
    (log reorders nothing; Python big-ints in the engine, HUGEINT in SQL).

    Scale shape: pass 1 merges per-batch bucket-count partials over the
    BOUNDED 256-bucket domain (never the raw vocabulary); the driver
    builds the 256-entry ratio table and broadcasts it; pass 2 is a
    vectorized per-batch lookup+sum.  Two streaming scans, no shuffle."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def bucket_tokens(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang": df["lang"],
            "word": df["text"].fillna("").str.lower().str.split(),
        }).explode("word", ignore_index=True).dropna(subset=["word"])
        if len(ex) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "lang": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype="int64")})
        uniq = ex["word"].unique()
        b = _md5_32(uniq) % n_buckets
        ex["b"] = ex["word"].map(dict(zip(uniq, b))).astype("int64")
        return ex[["doc_id", "lang", "b"]]

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("b", as_index=False).agg(
            r_b=("b", "size"),
            t_b=("lang", lambda s: int((s == target_lang).sum())))
        return g

    parts = ds.map_batches(bucket_tokens, batch_format="pandas") \
              .map_batches(count_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64"),
                             "dsir_sum": pd.Series([], dtype="int64")})
    counts = parts.groupby("b").agg(
        r_b=("r_b", "sum"), t_b=("t_b", "sum")).sort_index()
    R = int(counts["r_b"].sum())
    T = int(counts["t_b"].sum())
    ratio = np.full(n_buckets, 0, dtype=np.int64)
    for b, row in counts.iterrows():
        # Python big-int: (t+1)(R+B)·10⁶ can pass 2⁶³ on a web corpus
        ratio[int(b)] = (int(row["t_b"] + 1) * (R + n_buckets) * 1_000_000
                         ) // (int(row["r_b"] + 1) * (T + n_buckets))
    ratio_ref = ray.put(ratio)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(ratio_ref)
        ex = bucket_tokens(df)
        if len(ex) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "dsir_sum": pd.Series([], dtype="int64")})
        ex["ratio"] = lut[ex["b"].to_numpy(dtype=np.int64)]
        out = ex.groupby("doc_id", as_index=False).agg(
            n_tokens=("ratio", "size"), dsir_sum=("ratio", "sum"))
        for c in ("doc_id", "n_tokens", "dsir_sum"):
            out[c] = out[c].astype("int64")
        return out

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# edit-distance near-dup: batched-DP Levenshtein over normalized document
# heads — the fuzzy-dedup family member that catches small in-place edits
# (typo/whitespace/template noise) Jaccard shingles over-penalize
# ---------------------------------------------------------------------------

_EDIT_HEAD_CHARS = 32
_EDIT_MAX_DIST = 4


def _batched_levenshtein(a_codes: np.ndarray, a_len: np.ndarray,
                         b_codes: np.ndarray, b_len: np.ndarray,
                         max_dist: Optional[int] = None) -> np.ndarray:
    """Levenshtein over P string pairs at once: (P, L) padded UTF-8 BYTE
    arrays (DuckDB's ``levenshtein()`` edits bytes, not codepoints — the
    engine matches that contract), vectorized across the pair axis (the
    DP recurrence is sequential in (i, j) but every step is one P-length
    numpy op).

    With ``max_dist`` set, runs the Ukkonen ±max_dist band (cells with
    |i−j| > max_dist are provably ≥ max_dist+1) and CLAMPS any distance
    exceeding it to max_dist+1 — exact for threshold callers, ~10x
    cheaper on mostly-dissimilar pair sets: 2·band+1 inner steps per row
    instead of L, and pairs whose row minimum has left the band are
    retired early (row minima never decrease)."""
    P, L = a_codes.shape
    if max_dist is None:
        rows = np.arange(P)
        result = np.where(a_len == 0, b_len, -1).astype(np.int64)
        prev = np.tile(np.arange(L + 1, dtype=np.int64), (P, 1))
        for i in range(1, L + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            cost = (a_codes[:, i - 1][:, None] != b_codes).astype(np.int64)
            for j in range(1, L + 1):
                cur[:, j] = np.minimum(
                    np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                    prev[:, j - 1] + cost[:, j - 1])
            # pairs whose a-string ends at row i read their answer here,
            # BEFORE the DP walks on into the zero padding
            done = a_len == i
            if done.any():
                result[done] = cur[rows[done], b_len[done]]
            prev = cur
        return result

    band = int(max_dist)
    big = band + 1
    INF = np.int64(127)
    result = np.full(P, big, dtype=np.int64)
    # length difference alone already exceeds the band → stays clamped
    live = np.abs(a_len - b_len) <= band
    empty = (a_len == 0) & live
    result[empty] = np.minimum(b_len[empty], big)
    live &= a_len > 0
    idx = np.nonzero(live)[0]           # positions into the ORIGINAL arrays
    ac, bc = a_codes[idx], b_codes[idx]
    al, bl = a_len[idx], b_len[idx]
    w = 2 * band + 1
    # prev[:, o] = D[i-1][ (i-1) + (o-band) ]
    prev = np.full((idx.size, w), INF, dtype=np.int64)
    for o in range(band, w):            # row 0: D[0][j] = j for j<=band
        prev[:, o] = o - band
    for i in range(1, L + 1):
        if not idx.size:
            break
        cur = np.full((idx.size, w), INF, dtype=np.int64)
        for o in range(w):
            j = None  # j = i + o - band, per-pair constant offset
            jcol = i + o - band
            if jcol < 0 or jcol > L:
                continue
            up = prev[:, o + 1] + 1 if o + 1 < w else INF  # D[i-1][j]
            diag = prev[:, o]                              # D[i-1][j-1]
            if jcol == 0:
                cur[:, o] = i
                continue
            cost = (ac[:, i - 1] != bc[:, jcol - 1]).astype(np.int64)
            left = cur[:, o - 1] + 1 if o > 0 else INF     # D[i][j-1]
            cur[:, o] = np.minimum(np.minimum(up, left), diag + cost)
        # mask cells past each pair's own b_len (zero padding region)
        jcols = np.arange(-band, band + 1) + i
        past = jcols[None, :] > bl[:, None]
        cur[past] = INF
        done = al == i
        if done.any():
            o_fin = bl[done] - i + band          # b_len = i + (o-band)
            ok = (o_fin >= 0) & (o_fin < w)
            vals = np.full(done.sum(), INF, dtype=np.int64)
            vals[ok] = cur[np.nonzero(done)[0][ok], o_fin[ok]]
            result[idx[done]] = np.minimum(vals, big)
        # retire pairs whose banded row minimum already exceeds the band
        alive = ~done & (cur.min(axis=1) <= band)
        if not alive.all():
            idx, ac, bc, al, bl = (idx[alive], ac[alive], bc[alive],
                                   al[alive], bl[alive])
            cur = cur[alive]
        prev = cur
    return result


def docs_edit_dedup(sf_dir: str, head_chars: int = _EDIT_HEAD_CHARS,
                    max_dist: int = _EDIT_MAX_DIST) -> pd.DataFrame:
    """Keep-lowest-id fuzzy dedup on edit distance: a doc is dropped iff a
    lower-id doc in the SAME language has a normalized 32-char head
    (lowercased, whitespace collapsed) within Levenshtein distance 4 and
    head length within ±4.  Returns the survivor ids.

    Scale shape: only (doc_id, head) projections shuffle (groupby lang —
    at web scale the blocking key adds a head-length band, making groups
    bounded); within a group candidate pairs are length-band filtered
    first, then ONE batched-DP Levenshtein pass scores all pairs
    simultaneously — no per-pair Python loop."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def heads(df: pd.DataFrame) -> pd.DataFrame:
        # [\t\n\f\r ] is RE2's \s — python's \s also matches \v and
        # unicode spaces, which DuckDB's regexp_replace would keep
        h = df["text"].fillna("").str.lower() \
            .str.replace(r"[\t\n\f\r ]+", " ", regex=True) \
            .str.slice(0, head_chars)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "lang": df["lang"], "head": h})

    def group_dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_id" not in df.columns:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        df = df.sort_values("doc_id").reset_index(drop=True)
        # EXACT prefilter: collapse identical heads to their lowest-id
        # representative before the pairwise DP.  Every non-first copy is
        # dropped by its rep at distance 0, and any cross-head hit through
        # a non-rep implies the same hit through its (even lower-id) rep,
        # so surviving reps are exactly the original survivors.  On a
        # duplicate-heavy corpus this shrinks the O(n^2) pair set by the
        # square of the duplication factor (76s -> ~9s at sf0.1).
        df = df[~df["head"].duplicated()].reset_index(drop=True)
        n = len(df)
        if n <= 1:
            return df[["doc_id"]]
        texts = df["head"].tolist()
        # the ±max_dist length band is in CHARS (SQL length()); the DP
        # itself runs over UTF-8 BYTES (SQL levenshtein())
        char_lens = np.array([len(t) for t in texts], dtype=np.int64)
        raw = [t.encode("utf-8") for t in texts]
        lens = np.array([len(b) for b in raw], dtype=np.int64)
        width = max(int(lens.max()), 1)
        codes = np.zeros((n, width), dtype=np.int32)
        for i, b in enumerate(raw):
            codes[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        # pigeonhole candidate generation (mirrors the oracle twin, and
        # the docs_edit_dedup SQL comment): ed(a,b) <= k with a's head
        # split into k+1 pieces forces one piece to occur EXACTLY in b,
        # shifted at most k — so the banded DP runs only on piece-match
        # candidates.  The all-pairs length-banded triu was ~n²/2 DP
        # evaluations per language: ~10 min wall at the synthesized
        # sf1's 50k docs, seconds here.  Pieces are guaranteed nonempty
        # only for heads of length >= k+1; the (tiny) short-short block
        # is brute-forced.
        nseg = max_dist + 1
        # heads cluster into a handful of distinct lengths (almost all
        # exactly head_chars), so both the segment table and the shifted
        # probe table build as VECTORIZED str.slice calls per (length,
        # piece, shift) combination — the per-row Python loop was the
        # engine's hot spot at 50k docs (~2 min of dict churn)
        hs = pd.Series(texts, dtype="object")
        seg_frames, probe_frames = [], []
        for L in np.unique(char_lens):
            L = int(L)
            rows = np.nonzero(char_lens == L)[0]
            sub = hs.iloc[rows]
            if L >= nseg:
                for i in range(nseg):
                    s0, s1 = (i * L) // nseg, ((i + 1) * L) // nseg
                    seg_frames.append(pd.DataFrame({
                        "i": np.int64(i), "la": np.int64(L),
                        "piece": sub.str.slice(s0, s1).to_numpy(),
                        "r": rows}))
            for la in range(max(L - max_dist, nseg), L + max_dist + 1):
                for i in range(nseg):
                    s0 = (i * la) // nseg
                    m = ((i + 1) * la) // nseg - s0
                    if m <= 0:
                        continue
                    for dsh in range(-max_dist, max_dist + 1):
                        p0 = s0 + dsh
                        if p0 < 0 or p0 + m > L:
                            continue
                        probe_frames.append(pd.DataFrame({
                            "i": np.int64(i), "la": np.int64(la),
                            "piece": sub.str.slice(p0, p0 + m).to_numpy(),
                            "r": rows}))
        cand_parts = []
        if seg_frames and probe_frames:
            segf = pd.concat(seg_frames, ignore_index=True)
            prof = pd.concat(probe_frames, ignore_index=True)
            mm = segf.merge(prof, on=["i", "la", "piece"],
                            suffixes=("_s", "_p"))
            mm = mm[mm["r_s"] != mm["r_p"]]
            if len(mm):
                a = np.minimum(mm["r_s"].to_numpy(), mm["r_p"].to_numpy())
                b = np.maximum(mm["r_s"].to_numpy(), mm["r_p"].to_numpy())
                cand_parts.append(np.stack([a, b], axis=1))
        short = np.nonzero(char_lens < nseg)[0]
        if len(short) > 1:
            sa, sb = np.triu_indices(len(short), k=1)
            cand_parts.append(np.stack([short[sa], short[sb]], axis=1))
        if not cand_parts:
            return df[["doc_id"]]
        carr = np.unique(np.concatenate(cand_parts, axis=0), axis=0) \
            .astype(np.int64)
        ia, ib = carr[:, 0], carr[:, 1]  # ia < ib → a is the lower id
        band = np.abs(char_lens[ia] - char_lens[ib]) <= max_dist
        ia, ib = ia[band], ib[band]
        dropped = np.zeros(n, dtype=bool)
        block = 65536
        for lo in range(0, len(ia), block):
            sa, sb = ia[lo:lo + block], ib[lo:lo + block]
            d = _batched_levenshtein(codes[sa], lens[sa], codes[sb],
                                     lens[sb], max_dist=max_dist)
            hit = d <= max_dist
            dropped[sb[hit]] = True
        return df.loc[~dropped, ["doc_id"]]

    out = ds.map_batches(heads, batch_format="pandas") \
            .groupby("lang").map_groups(group_dedup, batch_format="pandas") \
            .to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# deterministic epoch shuffle: the dataloader-side global permutation
# (seeded, reproducible, shardable) computed WITHOUT a global sort — the
# bucket-histogram rank machinery of docs_percent_rank applied to an
# md5 shuffle key
# ---------------------------------------------------------------------------

_SHUFFLE_SEED = 1
_SHUFFLE_SHARDS = 8
_SHUFFLE_RANK_BUCKETS = 4096


def docs_epoch_shuffle(sf_dir: str, seed: int = _SHUFFLE_SEED,
                       n_shards: int = _SHUFFLE_SHARDS) -> pd.DataFrame:
    """Seeded global shuffle position and shard for every document:
    ``skey = md5_32(f"{seed}-{doc_id}")``, ``pos`` = rank of (skey,
    doc_id), ``shard = pos % n_shards`` — the reproducible epoch
    permutation a training dataloader snapshots (same seed ⇒ same order
    on any cluster shape).

    Scale shape: NO global sort.  Pass 1 merges per-block histograms over
    the TOP-12-bits-of-skey bucket domain (4096 ints); the driver
    broadcasts cumulative below-counts; pass 2 groups rows by bucket —
    key collisions can't cross buckets, so ``pos = below[bucket] +
    local_rank`` after one small in-bucket sort is the exact global
    rank."""
    import ray

    ds = _docs(sf_dir, ["doc_id"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        skey = _md5_32([f"{seed}-{d}" for d in ids])
        return pd.DataFrame({
            "doc_id": ids,
            "skey": skey,
            "_bucket": (skey >> 20).astype("int64")})

    keyed_ds = ds.map_batches(keyed, batch_format="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["_bucket"].to_numpy(), return_counts=True)
        return pd.DataFrame({"b": u.astype("int64"),
                             "n": c.astype("int64")})

    parts = keyed_ds.map_batches(hist, batch_format="pandas").to_pandas()
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "skey": pd.Series([], dtype="int64"),
                          "pos": pd.Series([], dtype="int64"),
                          "shard": pd.Series([], dtype="int64")})
    if parts.empty:
        return empty
    counts = np.zeros(_SHUFFLE_RANK_BUCKETS, dtype=np.int64)
    merged = parts.groupby("b")["n"].sum()
    counts[merged.index.to_numpy(dtype=np.int64)] = \
        merged.to_numpy(dtype=np.int64)
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    below_ref = ray.put(below)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_id" not in df.columns:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "skey": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64"),
                                 "shard": pd.Series([], dtype="int64")})
        lut = ray.get(below_ref)
        df = df.sort_values(["skey", "doc_id"]).reset_index(drop=True)
        b = int(df["_bucket"].iloc[0])
        pos = lut[b] + np.arange(len(df), dtype=np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "skey": df["skey"].astype("int64"),
            "pos": pos,
            "shard": pos % n_shards})

    out = keyed_ds.groupby("_bucket").map_groups(
        rank, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    for c in ("doc_id", "skey", "pos", "shard"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# CCNet-style LM quality score: a bigram language model TRAINED ON THE
# CORPUS ITSELF scores every document by its mean bigram probability (in
# ppm, integer-exact) — the "does this text look like the reference
# distribution" filter a web-scale pipeline runs before training
# ---------------------------------------------------------------------------


def docs_lm_score(sf_dir: str) -> pd.DataFrame:
    """Per document: bigram count and mean conditional bigram probability
    ``avg over bigrams of 10⁶·c(w1,w2) // c(w1)`` (floor-divided twice —
    integer-exact, summation-order independent).  Documents with fewer
    than two tokens have no bigrams and are absent, matching the SQL twin.

    Scale shape: the LM "training" and the scoring share one exchange —
    per-batch (doc, w1, w2, n) bigram partials and (w1, n) unigram
    partials are co-keyed by hash(w1), so each w1-bucket holds everything
    needed to finish c(w1) and c(w1,w2) exactly and score its partials;
    a doc-hash exchange then reduces to one row per document.  The
    vocabulary never becomes a driver structure, and only integer
    projections move."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ex = pd.DataFrame({
            "doc_id": t["doc_id"].to_pandas().astype("int64"),
            "word": t["text"].to_pandas().fillna("").str.lower().str.split(),
        }).explode("word", ignore_index=True).dropna(subset=["word"])
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "w1": pd.Series([], dtype=object),
            "w2": pd.Series([], dtype=object),
            "n": pd.Series([], dtype="int64"),
            "_b": pd.Series([], dtype="int64")})
        if len(ex) == 0:
            return empty
        # unigram partials: every token occurrence counts (doc-final too)
        uni = ex.groupby("word", as_index=False).size() \
            .rename(columns={"word": "w1", "size": "n"})
        uni["doc_id"] = np.int64(-1)
        uni["w2"] = ""
        # bigram partials: consecutive rows within a doc are consecutive
        # tokens (explode preserves order; docs are contiguous)
        nxt_same = ex["doc_id"].eq(ex["doc_id"].shift(-1))
        big = pd.DataFrame({"doc_id": ex["doc_id"][nxt_same],
                            "w1": ex["word"][nxt_same],
                            "w2": ex["word"].shift(-1)[nxt_same]})
        bg = big.groupby(["doc_id", "w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out = pd.concat([uni[["doc_id", "w1", "w2", "n"]],
                         bg[["doc_id", "w1", "w2", "n"]]],
                        ignore_index=True)
        out["n"] = out["n"].astype("int64")
        out["_b"] = _word_bucket_col(out["w1"])
        return out

    def w1_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all partials of a w1 colocate → exact c(w1) and c(w1,w2)
        is_uni = df["doc_id"].eq(-1)
        c1 = df[is_uni].groupby("w1")["n"].sum()
        bg = df[~is_uni]
        if len(bg) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "psum": pd.Series([], dtype="int64"),
                                 "nbig": pd.Series([], dtype="int64"),
                                 "_d": pd.Series([], dtype="int64")})
        c12 = bg.groupby(["w1", "w2"])["n"].transform("sum")
        p = (1_000_000 * c12 // bg["w1"].map(c1)).astype("int64")
        out = pd.DataFrame({
            "doc_id": bg["doc_id"].astype("int64"),
            "psum": (p * bg["n"]).astype("int64"),
            "nbig": bg["n"].astype("int64")})
        out = out.groupby("doc_id", as_index=False).sum()
        out["_d"] = (out["doc_id"] % 64).astype("int64")
        return out

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False).agg(
            psum=("psum", "sum"), nbig=("nbig", "sum"))
        out["avg_lm_q"] = (out["psum"] // out["nbig"]).astype("int64")
        return out[["doc_id", "nbig", "avg_lm_q"]]

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(w1_bucket, batch_format="pandas") \
        .groupby("_d").map_groups(doc_bucket, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "nbig": pd.Series([], dtype="int64"),
                             "avg_lm_q": pd.Series([], dtype="int64")})
    for c in ("doc_id", "nbig", "avg_lm_q"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# hard-negative mining: for each query vector, the nearest neighbors whose
# label DIFFERS from the query's — the contrastive-training sampler that
# pairs every anchor with its most confusable negatives
# ---------------------------------------------------------------------------

_HARDNEG_QUERIES = 4
_HARDNEG_K = 5


def emb_hard_negatives(sf_dir: str, n_queries: int = _HARDNEG_QUERIES,
                       k: int = _HARDNEG_K) -> pd.DataFrame:
    """Top-``k`` highest-cosine vectors with a different label, per query
    (queries = vec_id < ``n_queries``).  Scores are rounded to 6 BEFORE
    ranking (ties break on vec_id), so numpy and DuckDB order
    identically.

    Scale shape: the (n_queries × dim) query matrix + labels are one
    ``ray.put`` broadcast; each block masks label ≠ query-label, computes
    the cosine matrix, and emits a ≤ n_queries·k partial; the driver
    merges ≤ n_queries·k·blocks rows."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.embed import cosine_scores

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      filters=[("vec_id", "<", n_queries)])
    empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if len(t) == 0:
        return empty
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    qids = t["vec_id"].to_numpy(zero_copy_only=False)[order].astype("int64")
    qlabels = t["label"].to_numpy(zero_copy_only=False)[order].astype("int64")
    qvecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    bundle_ref = ray.put((qids, qlabels, qvecs))

    def partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return empty[["query_id", "vec_id", "score"]]
        qi, ql, qv = ray.get(bundle_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        labels = t["label"].to_numpy(zero_copy_only=False).astype("int64")
        frames = []
        for j in range(len(qi)):
            mask = labels != ql[j]
            if not mask.any():
                continue
            s = np.round(cosine_scores(vecs[mask], qv[j]), 6)
            take = min(k, len(s))
            idx = np.argpartition(-s, take - 1)[:take] \
                if take < len(s) else np.arange(len(s))
            frames.append(pd.DataFrame({
                "query_id": np.full(take, qi[j], dtype=np.int64),
                "vec_id": ids[mask][idx],
                "score": s[idx]}))
        if not frames:
            return empty[["query_id", "vec_id", "score"]]
        return pd.concat(frames, ignore_index=True)

    df = _emb(sf_dir).map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    if df.empty:
        return empty
    df = df.sort_values(["query_id", "score", "vec_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount().astype("int64")
    for c in ("query_id", "vec_id"):
        df[c] = df[c].astype("int64")
    return df[["query_id", "rank", "vec_id", "score"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# k-center coreset: greedy farthest-point selection — the diverse-subset
# sampler a curation pipeline uses to pick maximally spread exemplars
# (Gonzalez 2-approximation); each round is one streaming argmin over the
# corpus against the broadcast center set
# ---------------------------------------------------------------------------

_KCENTER_K = 6


def emb_kcenter(sf_dir: str, k: int = _KCENTER_K) -> pd.DataFrame:
    """Greedy max-min selection under cosine similarity: seed = vec_id 0;
    each round picks the vector whose maximum similarity to the selected
    set is LOWEST (ties → lowest vec_id).  Similarities are rounded to 6
    before the max/argmin (the family-wide reproducible-compare
    convention), so numpy and the unrolled-CTE DuckDB twin agree.

    Scale shape: k−1 streaming passes; each broadcasts the ≤ k×dim center
    matrix, recomputes every block's max-similarity column vectorized,
    and emits ONE candidate row (argmin with its vector) per block — the
    driver merges ≤ blocks rows per round and never holds the corpus.
    Selected centers score 1.0 against themselves, so they are never
    re-picked."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.embed import cosine_scores

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    empty = pd.DataFrame({"sel_rank": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "maxsim": pd.Series([], dtype="float64")})
    if len(t) == 0:
        return empty
    seed = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    centers = [seed]
    rows = [(0, 0, 1.0)]
    ds = _emb(sf_dir).select_columns(["vec_id", "embedding"])

    for r in range(1, k):
        cref = ray.put(np.stack(centers))

        def cand(t: pa.Table) -> pd.DataFrame:
            e = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                              "maxsim": pd.Series([], dtype="float64"),
                              "vec": pd.Series([], dtype=object)})
            if len(t) == 0:
                return e
            c = ray.get(cref)
            vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
            sims = np.column_stack(
                [np.round(cosine_scores(vecs, c[j]), 6)
                 for j in range(c.shape[0])])
            ms = sims.max(axis=1)
            i = int(np.lexsort((ids, ms))[0])  # (maxsim, vec_id) argmin
            return pd.DataFrame({"vec_id": [int(ids[i])],
                                 "maxsim": [float(ms[i])],
                                 "vec": [vecs[i].tolist()]})

        cands = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
        cands = cands.sort_values(["maxsim", "vec_id"]).reset_index(drop=True)
        pick = cands.iloc[0]
        centers.append(np.asarray(pick["vec"], dtype=np.float64))
        rows.append((r, int(pick["vec_id"]), float(pick["maxsim"])))

    return pd.DataFrame({
        "sel_rank": pd.Series([r[0] for r in rows], dtype="int64"),
        "vec_id": pd.Series([r[1] for r in rows], dtype="int64"),
        "maxsim": pd.Series([r[2] for r in rows], dtype="float64")})


# ---------------------------------------------------------------------------
# phrase search over positional postings: answer "w1 w2" adjacency from the
# (doc, position) posting lists alone — the retrieval-side consumer of the
# inverted index (texts never re-scanned at query time beyond the posting
# fetch)
# ---------------------------------------------------------------------------

_PHRASE_W1 = "hash"
_PHRASE_W2 = "join"


def docs_phrase_search(sf_dir: str, w1: str = _PHRASE_W1,
                       w2: str = _PHRASE_W2) -> pd.DataFrame:
    """Documents containing the exact phrase ``w1 w2`` (adjacent tokens),
    with the match count — the positional-posting-intersection query shape.

    Scale shape: the scan emits (doc, pos) postings ONLY for the two query
    words (at real scale this read comes from the persisted positional
    index — docs_inverted_index builds it — so the corpus text is never
    touched); a doc-hash bucket colocates both words' postings per
    document and ONE searchsorted per (doc-run) finds adjacencies — no
    per-position Python."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def postings(t: pa.Table) -> pd.DataFrame:
        ex = pd.DataFrame({
            "doc_id": t["doc_id"].to_pandas().astype("int64"),
            "word": t["text"].to_pandas().fillna("").str.lower().str.split(),
        }).explode("word", ignore_index=True).dropna(subset=["word"])
        if len(ex) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        ex["pos"] = ex.groupby("doc_id").cumcount() + 1  # 1-based
        hit = ex[ex["word"].isin([w1, w2])]
        out = pd.DataFrame({
            "doc_id": hit["doc_id"].astype("int64"),
            "pos": hit["pos"].astype("int64"),
            "w": (hit["word"] == w2).astype("int64")})  # 0=w1, 1=w2
        out["_b"] = (out["doc_id"] % 64).astype("int64")
        return out

    def intersect(df: pd.DataFrame) -> pd.DataFrame:
        p1 = df[df["w"] == 0].sort_values(["doc_id", "pos"])
        p2 = df[df["w"] == 1].sort_values(["doc_id", "pos"])
        if len(p1) == 0 or len(p2) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_matches": pd.Series([], dtype="int64")})
        # adjacency = membership of (doc, pos+1) of w1 in w2's postings,
        # via one searchsorted over the composite sorted key
        k1 = p1["doc_id"].to_numpy() * (1 << 32) + p1["pos"].to_numpy() + 1
        k2 = p2["doc_id"].to_numpy() * (1 << 32) + p2["pos"].to_numpy()
        i = np.searchsorted(k2, k1)
        ok = (i < len(k2)) & (k2[np.minimum(i, len(k2) - 1)] == k1)
        m = pd.DataFrame({"doc_id": p1["doc_id"].to_numpy()[ok]})
        if len(m) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_matches": pd.Series([], dtype="int64")})
        out = m.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "n_matches"})
        return out.astype({"doc_id": "int64", "n_matches": "int64"})

    out = ds.map_batches(postings, batch_format="pyarrow") \
        .groupby("_b").map_groups(intersect, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_matches": pd.Series([], dtype="int64")})
    for c in ("doc_id", "n_matches"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection: 64-dim embeddings → 16-dim ±1
# sketch — the dimensionality-reduction front end of large-scale ANN /
# clustering; the sign matrix is an md5 expression shared with the SQL twin
# ---------------------------------------------------------------------------

_RP_OUT_DIMS = 16


def _rp_sign(i: int, j: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"rp-{i}-{j}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def emb_random_projection(sf_dir: str, n_out: int = _RP_OUT_DIMS) -> pd.DataFrame:
    """±1 random projection of every embedding to ``n_out`` dims, exploded
    to (vec_id, dim, value).  Values accumulate STRICTLY in input-dim
    order (one vectorized add per dim, not a matmul) so the float64
    association order matches the SQL twin's left-to-right sum, and
    ROUND(…, 6) agrees bit-for-bit — the emb_int8_quantize contract.

    Scale shape: row-local (no shuffle); the 64×n_out sign matrix is a
    module-level constant in every worker."""
    signs = np.array([[_rp_sign(i, j) for j in range(n_out)]
                      for i in range(_EMB_DIM)], dtype=np.float64)

    def project(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "dim": pd.Series([], dtype="int64"),
                                 "value": pd.Series([], dtype="float64")})
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        n = len(t)
        acc = np.zeros((n, n_out), dtype=np.float64)
        for i in range(vecs.shape[1]):  # left-to-right, matching the SQL
            acc += vecs[:, i:i + 1] * signs[i]
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        return pd.DataFrame({
            "vec_id": np.repeat(ids, n_out),
            "dim": np.tile(np.arange(n_out, dtype=np.int64), n),
            "value": np.round(acc.ravel(), 6)})

    out = _emb(sf_dir).map_batches(project, batch_format="pyarrow") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "dim": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    for c in ("vec_id", "dim"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["vec_id", "dim"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, public): per-document word
# census — word count, mean word length, type-token ratio, longest
# same-word run — and a keep flag from banded thresholds.  All metrics are
# exact integers (centi-chars / ppm) so the SQL twin hash-matches.
# ---------------------------------------------------------------------------

_GOPHER_MIN_WORDS = 30
_GOPHER_TTR_MIN_PPM = 350_000
_GOPHER_MAX_RUN = 2


def docs_gopher_rules(sf_dir: str) -> pd.DataFrame:
    """Gopher-rule quality census: (doc_id, n_words, mean_wlen_c100,
    ttr_ppm, max_run, keep).

    Scale shape: row-local — each Arrow batch explodes to a word frame and
    reduces with C-level pandas groupbys (length sum, nunique) plus one
    run-length encoding over the ordered word array; no exchange, only the
    6-int projection leaves the workers."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def census(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
                "doc_id", "n_words", "mean_wlen_c100", "ttr_ppm",
                "max_run", "keep")})
        words = df["text"].fillna("").str.split(" ")
        ex = df[["doc_id"]].copy()
        ex["word"] = words
        ex = ex.explode("word", ignore_index=True)
        did = ex["doc_id"].to_numpy(dtype="int64")
        w = ex["word"].to_numpy(dtype=object)
        g = ex.groupby("doc_id", sort=True)
        n_words = g.size()
        sum_len = ex["word"].str.len().groupby(did).sum()
        nuniq = g["word"].nunique()
        # longest same-word run (run-length encode the ordered stream)
        same = np.concatenate(
            [[False], (w[1:] == w[:-1]) & (did[1:] == did[:-1])])
        run_id = (~same).cumsum() - 1
        run_len = np.bincount(run_id)
        run_doc = did[~same]
        max_run = pd.Series(run_len).groupby(run_doc).max()
        out = pd.DataFrame({
            "doc_id": n_words.index.to_numpy(dtype="int64"),
            "n_words": n_words.to_numpy(dtype="int64"),
            "mean_wlen_c100": (sum_len.to_numpy(dtype="int64") * 100)
            // n_words.to_numpy(dtype="int64"),
            "ttr_ppm": (nuniq.to_numpy(dtype="int64") * 1_000_000)
            // n_words.to_numpy(dtype="int64"),
            "max_run": max_run.to_numpy(dtype="int64"),
        })
        out["keep"] = ((out["n_words"] >= _GOPHER_MIN_WORDS)
                       & (out["ttr_ppm"] >= _GOPHER_TTR_MIN_PPM)
                       & (out["max_run"] <= _GOPHER_MAX_RUN)
                       ).astype("int64")
        return out

    out = ds.map_batches(census, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# C4-adapted line filtering (Raffel et al. 2020, public): the synthetic
# corpus has no newlines, so "lines" are fixed windows of LINE_WORDS
# consecutive words (the documented adaptation — the reference rule keeps
# lines with enough distinct words and a stopword).  A line is kept when
# it has ≥ LINE_MIN_DISTINCT distinct words and contains a stopword.
# ---------------------------------------------------------------------------

LINE_WORDS = 10
LINE_MIN_DISTINCT = 8
LINE_STOPWORDS = ("the", "a")


def _line_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Explode a documents batch to (doc_id, line_no, word) rows."""
    words = df["text"].fillna("").str.split(" ")
    ex = df[["doc_id"]].copy()
    ex["word"] = words
    ex = ex.explode("word", ignore_index=True)
    pos = ex.groupby("doc_id", sort=False).cumcount().to_numpy()
    ex["line_no"] = (pos // LINE_WORDS).astype("int64")
    return ex


def docs_line_filter(sf_dir: str) -> pd.DataFrame:
    """Per-document C4-style line census: (doc_id, n_lines, n_kept,
    kept_words) over fixed 10-word line windows.

    Scale shape: row-local — lines never leave their document, each batch
    reduces with two C-level pandas groupbys ((doc, line) census then per-
    doc rollup); only the 4-int projection leaves the workers."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def census(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
                "doc_id", "n_lines", "n_kept", "kept_words")})
        ex = _line_frame(df)
        ex["is_stop"] = ex["word"].isin(LINE_STOPWORDS)
        lines = ex.groupby(["doc_id", "line_no"], sort=False).agg(
            n_w=("word", "size"), n_d=("word", "nunique"),
            has_stop=("is_stop", "max"))
        lines["kept"] = ((lines["n_d"] >= LINE_MIN_DISTINCT)
                         & lines["has_stop"])
        lines["kept_w"] = lines["n_w"].where(lines["kept"], 0)
        out = lines.reset_index().groupby("doc_id", sort=True).agg(
            n_lines=("line_no", "size"), n_kept=("kept", "sum"),
            kept_words=("kept_w", "sum")).reset_index()
        return out.astype("int64")

    out = ds.map_batches(census, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Global duplicate-line removal (the C4 "dedupe repeated lines across the
# corpus" pass): a line's owner is its first occurrence by (doc_id,
# line_no); every later occurrence counts as a dup against its document.
# ---------------------------------------------------------------------------


def docs_line_dedup(sf_dir: str) -> pd.DataFrame:
    """Per-document duplicate-line counts: (doc_id, n_lines, n_dup).

    Scale shape: documents explode to (line_md5, doc_id, line_no)
    PROJECTIONS (line text never moves); occurrences co-partition under
    hash(line_md5) % 64 where one vectorized sort + shift marks every
    non-first occurrence; per-doc dup partials union with the row-local
    line counts and reduce under a doc-hash bucket.  The md5-prefix line
    key is shared with the oracle SQL, so grouping semantics (including
    any collision) are identical on both sides."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def line_occurrences(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "line_key": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
                "line_no": pd.Series([], dtype="int64"),
                "_b": pd.Series([], dtype="int64")})
        ex = _line_frame(df)
        lines = ex.groupby(["doc_id", "line_no"], sort=False)["word"] \
            .agg(" ".join).reset_index(name="line")
        key = lines["line"].map(
            lambda s: hashlib.md5(s.encode()).hexdigest()[:16])
        return pd.DataFrame({
            "line_key": key,
            "doc_id": lines["doc_id"].astype("int64"),
            "line_no": lines["line_no"].astype("int64"),
            "_b": (key.map(lambda h: int(h[:4], 16) % 64)).astype("int64")})

    occ = ds.map_batches(line_occurrences, batch_format="pandas")

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["line_key", "doc_id", "line_no"],
                            kind="mergesort").reset_index(drop=True)
        keys = df["line_key"].to_numpy(dtype=object)
        dup = np.concatenate([[False], keys[1:] == keys[:-1]])
        per_doc = pd.Series(dup.astype("int64")) \
            .groupby(df["doc_id"].to_numpy()).sum()
        return pd.DataFrame({
            "doc_id": per_doc.index.to_numpy(dtype="int64"),
            "n_lines": np.zeros(len(per_doc), dtype="int64"),
            "n_dup": per_doc.to_numpy(dtype="int64")})

    dups = occ.groupby("_b").map_groups(bucket_dups, batch_format="pandas")

    def line_counts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
                "doc_id", "n_lines", "n_dup")})
        n_words = df["text"].fillna("").str.split(" ").str.len() \
            .to_numpy(dtype="int64")
        n_lines = -(-n_words // LINE_WORDS)  # ceil division
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_lines": n_lines,
            "n_dup": np.zeros(len(df), dtype="int64")})

    counts = ds.map_batches(line_counts, batch_format="pandas")

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["doc_id"].astype("int64") % 64).astype("int64")
        return df

    def merge_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(
            n_lines=("n_lines", "sum"), n_dup=("n_dup", "sum"))
        return g.reset_index().astype("int64")

    out = counts.union(dups).map_batches(keyed, batch_format="pandas") \
        .groupby("_b").map_groups(merge_doc, batch_format="pandas") \
        .to_pandas()
    out = out[["doc_id", "n_lines", "n_dup"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sign-binarized Hamming top-k: the classic binary-code ANN baseline
# (Charikar 2002 hyperplane LSH with the identity hyperplanes).  Codes are
# one uint64 per vector, distance is XOR+popcount — the cheapest possible
# scale path for a first-stage retrieval filter.
# ---------------------------------------------------------------------------


def _sign_words(mat: np.ndarray) -> np.ndarray:
    """(rows × ceil(dim/64)) uint64 sign codes (bit i = mat[:, i] >= 0);
    tail bits zero-pad so XOR-popcount stays exact at any dimension."""
    bits = mat >= 0.0
    pad = (-bits.shape[1]) % 64
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((bits.shape[0], pad), dtype=bool)], axis=1)
    return np.packbits(bits, axis=1).copy().view(">u8") \
        .astype(np.uint64)


def emb_hamming_topk(sf_dir: str, query_vec_id: int = 0,
                     k: int = 10) -> pd.DataFrame:
    """Top-``k`` vectors by Hamming distance between sign codes
    (bit i = embedding[i] >= 0), ties broken by vec_id.

    Scale shape: each block packs signs to ONE uint64 per vector
    (np.packbits) and scores with XOR+popcount — 8 bytes/vector of
    distance state; per-block top-k partials merge on the driver
    (≤ k × blocks rows).  The query code is a closure scalar, not a
    broadcast table."""
    from ..stages.dedup import _popcount64

    q = _query_vec(sf_dir, query_vec_id)
    qcode = _sign_words(q.reshape(1, -1))[0]

    def partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        codes = _sign_words(vecs)
        ham = np.zeros(len(codes), dtype="int64")
        for w in range(codes.shape[1]):  # ceil(dim/64) words, tiny loop
            ham += _popcount64(codes[:, w] ^ qcode[w])
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        take = min(k, len(ids))
        order = np.lexsort((ids, ham))[:take]
        return pd.DataFrame({"vec_id": ids[order], "hamming": ham[order]})

    out = _emb(sf_dir).map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    out = out.sort_values(["hamming", "vec_id"]).head(k) \
        .reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype="int64")
    for c in ("vec_id", "hamming", "rank"):
        out[c] = out[c].astype("int64")
    return out[["rank", "vec_id", "hamming"]]


# ---------------------------------------------------------------------------
# Maximal marginal relevance (Carbonell & Goldstein 1998, public): greedy
# diverse top-k — each round picks argmax of
# ROUND(0.5*cos(v, query) - 0.5*max_{s in selected} cos(v, s), 6),
# ties by vec_id.  Dot products accumulate STRICTLY in dim order and
# cosine is dot / (nq * nv) on both sides, so scores are bit-identical to
# the generated SQL twin (the emb_power_iteration contract).
# ---------------------------------------------------------------------------

_MMR_K = 5
_MMR_LAMBDA = 0.5


def _dot_ltr(vecs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Left-to-right accumulated dot products (matches SQL's 64-term sum)."""
    acc = np.zeros(len(vecs), dtype=np.float64)
    for i in range(vecs.shape[1]):
        acc += vecs[:, i] * q[i]
    return acc


def _norm_ltr(v: np.ndarray) -> float:
    acc = 0.0
    for x in v:
        acc += x * x
    return float(np.sqrt(acc))


def emb_mmr(sf_dir: str, query_vec_id: int = 0) -> pd.DataFrame:
    """MMR selection of ``_MMR_K`` diverse results for the query vector
    (query excluded from candidates): (round, vec_id, score).

    Scale shape: one streaming pass per round (k passes total); each
    block computes scores against the ≤ k-vector selected set held in the
    task closure and emits its top-1 partial — the driver merges
    ≤ blocks rows per round.  Vectors never leave their blocks."""
    q = _query_vec(sf_dir, query_vec_id)
    nq = _norm_ltr(q)
    selected: list[tuple[int, np.ndarray, float]] = []  # (vec_id, vec, norm)
    rows = []
    for rnd in range(1, _MMR_K + 1):
        sel = [(v, n) for (_, v, n) in selected]
        sel_ids = {vid for (vid, _, _) in selected}

        def partial(t: pa.Table, _sel=tuple(sel), _ids=frozenset(sel_ids)
                    ) -> pd.DataFrame:
            empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                  "score": pd.Series([], dtype="float64")})
            if len(t) == 0:
                return empty
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
            keep = ~np.isin(ids, list(_ids) + [query_vec_id])
            if not keep.any():
                return empty
            vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)
                            )[keep]
            ids = ids[keep]
            norms = np.array([_norm_ltr(v) for v in vecs])
            rel = _dot_ltr(vecs, q) / (nq * norms)
            if _sel:
                sims = np.stack([_dot_ltr(vecs, sv) / (sn * norms)
                                 for (sv, sn) in _sel])
                max_sim = np.max(sims, axis=0)
            else:
                max_sim = np.zeros(len(vecs))
            score = np.round(_MMR_LAMBDA * rel
                             - (1.0 - _MMR_LAMBDA) * max_sim, 6)
            best = np.lexsort((ids, -score))[0]
            return pd.DataFrame({"vec_id": [ids[best]],
                                 "score": [score[best]]})

        cand = _emb(sf_dir).map_batches(partial, batch_format="pyarrow") \
            .to_pandas()
        if cand.empty:  # fewer candidates than rounds: emit fewer rows
            break
        cand = cand.sort_values(["score", "vec_id"],
                                ascending=[False, True])
        vid = int(cand.iloc[0]["vec_id"])
        rows.append({"round": rnd, "vec_id": vid,
                     "score": float(cand.iloc[0]["score"])})
        v = _query_vec(sf_dir, vid)
        selected.append((vid, v, _norm_ltr(v)))
    out = pd.DataFrame(rows)
    out["round"] = out["round"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson & Spärck Jones / Okapi, public): the
# standard keyword-search scorer — idf * tf·(k1+1) / (tf + k1·(1 − b +
# b·dl/avgdl)) summed over query terms in fixed term order.  Floats are
# IEEE doubles with a pinned association order and a final ROUND(…, 6),
# the emb_power_iteration contract.
# ---------------------------------------------------------------------------

BM25_TERMS = ("merge", "window", "spark")
_BM25_K1 = 1.2
_BM25_B = 0.75


def docs_bm25(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-``k`` documents by BM25 score for the fixed query terms:
    (rank, doc_id, score).

    Scale shape: pass 1 reduces per-block (n_docs, total_words, df per
    term) partials — a term-count-sized table, O(terms × blocks) to the
    driver, never O(rows); pass 2 broadcasts the 3 scalars + df map in
    the task closure and emits per-block top-k partials (argpartition),
    so only k × blocks projection rows move."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    terms = list(BM25_TERMS)

    def _tf_matrix(df: pd.DataFrame):
        """(dl vector, doc-aligned tf matrix [rows × terms]) via one
        explode + one C-level crosstab — no per-row Python."""
        words = df["text"].fillna("").str.split(" ")
        dl = words.str.len().to_numpy(dtype="int64")
        ex = df[["doc_id"]].copy()
        ex["word"] = words
        ex = ex.explode("word", ignore_index=True)
        hits = ex[ex["word"].isin(terms)]
        tf = np.zeros((len(df), len(terms)), dtype=np.int64)
        if not hits.empty:
            pos = pd.Series(np.arange(len(df)), index=df["doc_id"].to_numpy())
            ridx = pos[hits["doc_id"].to_numpy()].to_numpy()
            cidx = hits["word"].map({t: i for i, t in enumerate(terms)}) \
                .to_numpy(dtype="int64")
            np.add.at(tf, (ridx, cidx), 1)
        return dl, tf

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        dl, tf = _tf_matrix(df)
        row = {"n_docs": [int(len(df))], "total_words": [int(dl.sum())]}
        for j, t in enumerate(terms):
            row[f"df_{t}"] = [int((tf[:, j] > 0).sum())]
        return pd.DataFrame(row)

    parts = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    n_docs = int(parts["n_docs"].sum())
    avgdl = float(parts["total_words"].sum()) / n_docs
    idf = {}
    for t in terms:
        df_t = float(parts[f"df_{t}"].sum())
        idf[t] = float(np.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0))

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        dl_i, tf_mat = _tf_matrix(df)
        dl = dl_i.astype(np.float64)
        denom_dl = _BM25_K1 * (0.25 + 0.75 * dl / avgdl)
        score = np.zeros(len(df), dtype=np.float64)
        for j, t in enumerate(terms):  # fixed term order = SQL's sum
            tf = tf_mat[:, j].astype(np.float64)
            score += idf[t] * (tf * 2.2) / (tf + denom_dl)
        score = np.round(score, 6)
        ids = df["doc_id"].to_numpy(dtype="int64")
        take = min(k, len(ids))
        order = np.lexsort((ids, -score))[:take]
        return pd.DataFrame({"doc_id": ids[order], "score": score[order]})

    out = ds.map_batches(score_partial, batch_format="pandas").to_pandas()
    out = out.sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype="int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["rank", "doc_id", "score"]]


# ---------------------------------------------------------------------------
# Zipf-law fit over the corpus vocabulary: OLS slope of ln(freq) against
# ln(rank) for the global top-K words — the standard corpus-statistics
# sanity check for scraped text.  Counts and ranks are exact integers;
# the tiny K-row log-log regression happens once on the driver.
# ---------------------------------------------------------------------------

_ZIPF_TOP_K = 100


def docs_zipf_slope(sf_dir: str, k: int = _ZIPF_TOP_K) -> pd.DataFrame:
    """One-row result: (n_points, top_count, slope_ppm) where slope_ppm
    is the integer-ppm OLS fit of ln(count) ~ ln(rank) over the top-``k``
    words (rank ties broken by word).

    Logs are quantized PER ROW to fixed-point micro-units
    (round(ln·10⁶)) so every cross-row aggregate is an exact integer —
    summation-order independent, unlike a float SUM whose association
    order SQL does not pin (the events_linreg contract, including its
    truncate-toward-zero division).

    Scale shape: unbounded vocabulary counts reduce under word-hash
    buckets (the docs_top_tokens exchange); each bucket emits its top-k
    partial so the driver merges ≤ k × 64 projection rows, then runs the
    k-point regression locally — O(k), independent of corpus size."""
    ds = _docs(sf_dir, ["text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split(" ").explode()
        g = words.value_counts().reset_index()
        g.columns = ["word", "n"]
        # deterministic word-hash bucket (not Python hash(): per-process salt)
        g["_b"] = g["word"].map(
            lambda w: int.from_bytes(w.encode()[:8].ljust(8, b"\0"),
                                     "big") % 64).astype("int64")
        return g

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", as_index=False)["n"].sum()
        g = g.sort_values(["n", "word"], ascending=[False, True]).head(k)
        g["n"] = g["n"].astype("int64")
        return g[["word", "n"]]

    top = ds.map_batches(count_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_topk, batch_format="pandas") \
        .to_pandas()
    top = top.sort_values(["n", "word"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    x6 = np.round(np.log(np.arange(1, len(top) + 1, dtype=np.float64))
                  * 1_000_000).astype("int64")
    y6 = np.round(np.log(top["n"].to_numpy(dtype=np.float64))
                  * 1_000_000).astype("int64")
    n = len(top)
    sx, sy = int(x6.sum()), int(y6.sum())
    sxx = int((x6 * x6).sum())
    sxy = int((x6 * y6).sum())
    num = (n * sxy - sx * sy) * 1_000_000
    den = n * sxx - sx * sx
    if den == 0:
        slope_ppm = 0
    else:  # den > 0 (variance); mirror DuckDB's truncate-toward-zero //
        q = abs(num) // den
        slope_ppm = q if num >= 0 else -q
    return pd.DataFrame({
        "n_points": pd.Series([n], dtype="int64"),
        "top_count": pd.Series([int(top["n"].iloc[0])], dtype="int64"),
        "slope_ppm": pd.Series([slope_ppm], dtype="int64")})


# ---------------------------------------------------------------------------
# Language-mix entropy per source (corpus-diversity audit): Shannon
# entropy of each source's language distribution in fixed-point micro-
# nats — per-TERM quantization (round(-ln(p)·10⁶) with p as an exact
# count ratio) keeps every cross-row aggregate an exact integer (the
# docs_zipf_slope / events_linreg contract).
# ---------------------------------------------------------------------------


def docs_source_lang_entropy(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, n_langs, entropy_micronat) where
    entropy_micronat = Σ_lang n_l · round(-ln(n_l/n)·10⁶) // n.

    Scale shape: (source, lang) census partials reduce under a source
    bucket — the exchange is bounded by |sources| × |langs| × blocks,
    never rows; the per-term log quantization and the final floor-divide
    run where the census lives."""
    ds = _docs(sf_dir, ["source", "lang"])

    def census(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["_b"] = g["source"].map(
            lambda s: int.from_bytes(str(s).encode()[:8].ljust(8, b"\0"),
                                     "big") % 16).astype("int64")
        return g

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False)["n"].sum()
        tot = g.groupby("source")["n"].transform("sum").to_numpy(
            dtype="int64")
        n = g["n"].to_numpy(dtype="int64")
        term6 = np.round(-np.log(n / tot) * 1_000_000).astype("int64")
        # Σ n·term6 can pass int64 at web scale (n ~ 10¹², term6 ~ 10⁷):
        # Python big ints, HUGEINT in the twin (the events_linreg shape)
        g["w"] = [int(a) * int(b) for a, b in zip(n, term6)]
        out = g.groupby("source", as_index=False).agg(
            n_docs=("n", "sum"), n_langs=("lang", "size"), w=("w", "sum"))
        out["entropy_micronat"] = [
            int(w) // int(d) for w, d in zip(out["w"], out["n_docs"])]
        return out[["source", "n_docs", "n_langs", "entropy_micronat"]]

    out = ds.map_batches(census, batch_format="pandas") \
        .groupby("_b").map_groups(entropy, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype="int64"),
            "n_langs": pd.Series([], dtype="int64"),
            "entropy_micronat": pd.Series([], dtype="int64")})
    for c in ("n_docs", "n_langs", "entropy_micronat"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Binary-quantization recall audit: recall@k of the sign-code Hamming
# path against exact cosine top-k — the eval that decides whether the
# 8-byte-per-vector first stage is safe for a corpus (emb_ivf_recall's
# shape for the binary index).
# ---------------------------------------------------------------------------


def emb_hamming_recall(sf_dir: str, k: int = 10,
                       n_queries: int = 8) -> pd.DataFrame:
    """(query_vec_id, n_hits, recall_ppm): overlap between Hamming top-k
    and exact cosine top-k for the first ``n_queries`` vectors (query
    itself excluded from both candidate sets).

    Scale shape: ONE streaming pass serves all queries — each block
    scores every query against its rows (sign codes: XOR+popcount; exact:
    one matmul against the broadcast query block) and emits two top-k
    partials per query; the driver merges ≤ 2·k·blocks·queries projection
    rows."""
    import pyarrow.parquet as pq_mod

    from ..stages.dedup import _popcount64

    qt = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", n_queries)])
    empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                          for c in ("query_vec_id", "n_hits", "recall_ppm")})
    if len(qt) == 0:
        return empty
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
    q_mat = np.stack(qt["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    q_codes = _sign_words(q_mat)

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = ("query_vec_id", "vec_id", "metric", "kind")
        if len(t) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in cols})
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        codes = _sign_words(vecs)
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        frames = []
        for qi in range(len(q_ids)):
            keep = ids != q_ids[qi]
            if not keep.any():
                continue
            bid, bvec, bcode = ids[keep], vecs[keep], codes[keep]
            # Hamming partial (ascending metric)
            ham = np.zeros(len(bcode), dtype="int64")
            for w in range(bcode.shape[1]):
                ham += _popcount64(bcode[:, w] ^ q_codes[qi][w])
            take = min(k, len(bid))
            hsel = np.lexsort((bid, ham))[:take]
            frames.append(pd.DataFrame({
                "query_vec_id": q_ids[qi], "vec_id": bid[hsel],
                "metric": ham[hsel], "kind": 0}))
            # exact cosine partial (descending similarity → negate to
            # reuse the ascending merge; ppm-rounded like emb_knn ranks)
            cos = (bvec @ q_mat[qi]) / (norms[keep] * q_norm[qi])
            csel = np.lexsort((bid, -cos))[:take]
            frames.append(pd.DataFrame({
                "query_vec_id": q_ids[qi], "vec_id": bid[csel],
                "metric": -np.round(cos[csel] * 1e9).astype("int64"),
                "kind": 1}))
        if not frames:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in cols})
        return pd.concat(frames, ignore_index=True)

    parts = _emb(sf_dir).map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    if len(parts) == 0:     # every block emitted a typed empty — Ray
        return empty        # still drops the schema on all-empty output
    rows = []
    for qid in q_ids:
        sub = parts[parts["query_vec_id"] == qid]
        if len(sub) == 0:       # no candidates at all (1-row corpus):
            continue            # the SQL twin emits no row either
        ham_top = sub[sub["kind"] == 0].sort_values(["metric", "vec_id"]) \
            .head(k)["vec_id"]
        cos_top = sub[sub["kind"] == 1].sort_values(["metric", "vec_id"]) \
            .head(k)["vec_id"]
        hits = len(set(ham_top) & set(cos_top))
        rows.append({"query_vec_id": int(qid), "n_hits": hits,
                     "recall_ppm": (hits * 1_000_000) // k})
    if not rows:
        return empty
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("query_vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
# "Neural Machine Translation of Rare Words with Subword Units", public):
# learn the first N merge rules from the corpus.  The engine applies a
# pinned offline tokenizer elsewhere (functions/tokenizer.py); this is the
# missing other half — TRAINING a subword vocabulary at corpus scale.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 5
_BPE_S1, _BPE_S2 = "\x01", "\x02"   # per-symbol wrappers
_BPE_SEP = "\x03"                   # pair-key separator (< any word char)


def _bpe_wrap(sym: str) -> str:
    return _BPE_S1 + sym + _BPE_S2


def docs_bpe_merges(sf_dir: str, rounds: int = _BPE_ROUNDS) -> pd.DataFrame:
    """First ``rounds`` BPE merge rules (round, s1, s2, n) learned from
    the corpus: each round merges the adjacent symbol pair with the
    highest frequency-weighted count (ties by pair key ascending).

    Scale shape:
    - the corpus collapses ONCE to the distinct-word frequency table
      (per-batch Counter partials → distributed ``groupby("word")``, the
      docs_top_tokens exchange); every later pass is vocab-sized, never
      corpus-sized — at web scale the vocab table is millions of rows
      while the corpus is billions of documents;
    - pair counting per round: per-block Counter partials (overlapping
      adjacent pairs, weighted by word freq) under the repo-standard
      64-way pair-hash bucket groupby; each bucket emits its top-1, the
      driver picks the global winner over ≤64 rows;
    - merge application is ONE vectorized leftmost-nonoverlapping
      ``str.replace`` per round over sentinel-wrapped symbol strings
      ("\\x01sym\\x02" per symbol): wrappers make adjacent matches share
      no characters, so plain non-overlapping replace IS the BPE merge
      rule — bit-identical semantics in Python str.replace, RE2 and SQL
      ``replace`` (no lookarounds anywhere);
    - rounds are inherently sequential (each merge changes the next
      round's pair counts — the kmeans_iterate precedent), but each
      round is ONE distributed execution: instead of materializing the
      mutated vocab per round, workers re-derive it from the pinned
      merge list (≤ rounds tiny strings in the task closure, ≤ rounds
      vectorized replaces) inside the same pass that counts the next
      round's pairs.  At large R (real tokenizers train 30–50k merges)
      checkpoint the applied vocab every K rounds to bound the replay —
      same trade the crawl checkpoints make.

    Word contract: ``[a-z0-9_]+`` over lowercased text, shared with
    docs_top_tokens, so sentinel bytes can never occur inside a symbol.
    Stops early (emits fewer rows) if a round finds no pairs."""
    import polars as pl

    ds = _docs(sf_dir, ["text"])

    def word_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(re.findall(r"[a-z0-9_]+", (text or "").lower()))
        words = list(c.keys())
        return pa.table({
            "word": pa.array(words, pa.string()),
            "n": pa.array([c[w] for w in words], pa.int64()),
        })

    def wrap(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        return pa.table({
            "sym": pa.array(["".join(_bpe_wrap(ch) for ch in w)
                             for w in words], pa.string()),
            "n": pa.array(t["sum(n)"].to_numpy(zero_copy_only=False)
                          .astype("int64"), pa.int64()),
        })

    vocab = ds.map_batches(word_partial, batch_format="pyarrow") \
        .groupby("word").sum("n") \
        .map_batches(wrap, batch_format="pyarrow").materialize()

    def make_pair_partial(patreps):
        def pair_partial(df: pd.DataFrame) -> pa.Table:
            from collections import Counter

            s = df["sym"]
            for pat, rep in patreps:    # replay pinned merges so far
                s = s.str.replace(pat, rep, regex=False)
            c: Counter = Counter()
            for sym, n in zip(s, df["n"].to_numpy()):
                syms = sym[1:-1].split(_BPE_S2 + _BPE_S1)
                for a, b in zip(syms, syms[1:]):
                    c[a + _BPE_SEP + b] += int(n)
            keys = list(c.keys())
            bucket = (pl.Series(keys).hash(seed=0) % 64).to_numpy() \
                .astype(np.int64) if keys else np.array([], dtype=np.int64)
            return pa.table({
                "pair": pa.array(keys, pa.string()),
                "cnt": pa.array([c[k] for k in keys], pa.int64()),
                "_b": pa.array(bucket, pa.int64()),
            })

        return pair_partial

    def bucket_top1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"pair": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype="int64")})
        agg = df.groupby("pair", as_index=False)["cnt"].sum()
        return agg.sort_values(["cnt", "pair"], ascending=[False, True]) \
            .head(1)[["pair", "cnt"]]

    merges = []
    patreps = []
    for r in range(1, rounds + 1):
        cands = vocab.map_batches(make_pair_partial(list(patreps)),
                                  batch_format="pandas") \
            .groupby("_b").map_groups(bucket_top1, batch_format="pandas") \
            .to_pandas()
        if len(cands) == 0:
            break
        win = cands.sort_values(["cnt", "pair"],
                                ascending=[False, True]).iloc[0]
        a, b = win["pair"].split(_BPE_SEP)
        merges.append({"round": r, "s1": a, "s2": b, "n": int(win["cnt"])})
        patreps.append((_bpe_wrap(a) + _bpe_wrap(b), _bpe_wrap(a + b)))

    out = pd.DataFrame(merges, columns=["round", "s1", "s2", "n"])
    out["round"] = out["round"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["s1"] = out["s1"].astype(str)
    out["s2"] = out["s2"].astype(str)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth: prefix-distinct vocabulary curve
# ---------------------------------------------------------------------------

_VOCAB_LEVELS = 8


def docs_vocab_growth(sf_dir: str) -> pd.DataFrame:
    """(k, t_doc, vocab): the vocabulary-growth (Heaps'-law) curve —
    for 8 equal-width ``doc_id`` prefixes of the corpus, how many
    DISTINCT words first appear at-or-before each prefix boundary.

    Scale shape: per-block partials reduce each word to its block-local
    min ``doc_id``; the exact global first-occurrence finishes under the
    64-way word-hash bucket, where each bucket immediately collapses to
    an 8-bin searchsorted HISTOGRAM against the broadcast thresholds —
    the unbounded vocabulary never leaves the workers and the driver
    merges 64×8 partial counts.  First-occurrence buckets can't collide
    across words, so the cumulative curve is exact (the
    ``docs_percent_rank`` below-count argument)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def minmax(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pandas().astype("int64")
        if len(ids) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype="int64"),
                                 "hi": pd.Series([], dtype="int64")})
        return pd.DataFrame({"lo": [ids.min()], "hi": [ids.max()]})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    cols = ("k", "t_doc", "vocab")
    if mm.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    span = hi - lo + 1
    thresholds = [lo - 1 + (span * k) // _VOCAB_LEVELS
                  for k in range(1, _VOCAB_LEVELS + 1)]
    th = np.asarray(thresholds, dtype="int64")

    def partial(t: pa.Table) -> pd.DataFrame:
        out = _doc_word_counts(t)
        out = out.groupby("word", as_index=False)["doc_id"].min() \
            .rename(columns={"doc_id": "first_doc"})
        out["first_doc"] = out["first_doc"].astype("int64")
        out["_b"] = _word_bucket_col(out["word"])
        return out[["word", "first_doc", "_b"]]

    def word_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", as_index=False)["first_doc"].min()
        firsts = np.sort(g["first_doc"].to_numpy(dtype="int64"))
        counts = np.searchsorted(firsts, th, side="right")
        return pd.DataFrame({
            "k": np.arange(1, _VOCAB_LEVELS + 1, dtype="int64"),
            "vocab": counts.astype("int64")})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() == 0:
        # docs exist but none has a word: the curve is all-zero (the
        # oracle's LEFT JOIN keeps every k row)
        g = pd.DataFrame({"k": np.arange(1, _VOCAB_LEVELS + 1,
                                         dtype="int64"),
                          "vocab": np.zeros(_VOCAB_LEVELS, dtype="int64")})
    else:
        parts = partials.groupby("_b") \
            .map_groups(word_bucket, batch_format="pandas").to_pandas()
        g = parts.groupby("k", as_index=False)["vocab"].sum()
    g = g.sort_values("k").reset_index(drop=True)
    return pd.DataFrame({
        "k": g["k"].astype("int64"),
        "t_doc": pd.Series([thresholds[int(k) - 1] for k in g["k"]],
                           dtype="int64"),
        "vocab": g["vocab"].astype("int64")})


# ---------------------------------------------------------------------------
# content-defined chunking (word-level FastCDC shape) + cross-doc chunk
# dedup census
# ---------------------------------------------------------------------------

_CDC_MOD = 8  # expected chunk length ≈ 8 words


def docs_cdc_chunks(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_chunks, n_shared): content-defined chunking — each
    doc's lowercased whitespace words are cut AFTER every word whose
    md5-32 ≡ 0 (mod ``_CDC_MOD``), the FastCDC idea at word granularity:
    boundaries depend only on LOCAL content, so an insertion early in a
    doc re-chunks O(1) chunks instead of shifting every fixed-size
    window.  ``n_shared`` counts the doc's chunk instances whose chunk
    text occurs in ≥ 2 distinct docs — the dedup-friendliness census.

    Scale shape: boundaries and chunk hashes are computed once per block
    (boundary md5 cached per distinct word within the block); only
    (doc_id, chunk-md5) projections enter the chunk-hash exchange —
    chunk TEXT never moves.  Shared-ownership resolves inside each
    chunk-hash bucket (md5 keys can't collide across buckets) and the
    per-doc partials finish under a doc-hash bucket, so nothing
    vocabulary- or corpus-sized reaches the driver."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        cache: Dict[str, bool] = {}
        out_ids: List[int] = []
        out_h: List[str] = []
        for d, text in zip(ids, texts):
            words = (text or "").lower().split()
            if not words:
                continue
            start = 0
            last = len(words) - 1
            for j, w in enumerate(words):
                b = cache.get(w)
                if b is None:
                    b = int(hashlib.md5(w.encode()).hexdigest()[:8],
                            16) % _CDC_MOD == 0
                    cache[w] = b
                if b or j == last:
                    chunk = " ".join(words[start:j + 1])
                    out_ids.append(int(d))
                    out_h.append(hashlib.md5(chunk.encode()).hexdigest())
                    start = j + 1
        hb = [int(h[:8], 16) % 64 for h in out_h]
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "h": pa.array(out_h, pa.string()),
            "_hb": pa.array(hb, pa.int64())})

    def bucket_share(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                 ("doc_id", "n_chunks", "n_shared", "_db")})
        nd = df.groupby("h")["doc_id"].nunique()
        shared = nd.index[nd >= 2]
        flag = df["h"].isin(set(shared))
        g = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                          "one": np.ones(len(df), dtype="int64"),
                          "sh": flag.to_numpy().astype("int64")}) \
            .groupby("doc_id", as_index=False).sum()
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_chunks": g["one"].astype("int64"),
            "n_shared": g["sh"].astype("int64"),
            "_db": (g["doc_id"] % 64).astype("int64")})

    def doc_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[["n_chunks",
                                                  "n_shared"]].sum()
        return g.astype("int64")

    out = ds.map_batches(chunk_rows, batch_format="pyarrow") \
        .groupby("_hb").map_groups(bucket_share, batch_format="pandas") \
        .groupby("_db").map_groups(doc_merge, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                             ("doc_id", "n_chunks", "n_shared")})
    out = out[["doc_id", "n_chunks", "n_shared"]].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# readability scoring: the Flesch-reading-ease family recast as an exact
# integer contract — the document-quality signal a curation tier uses to
# bucket corpora by audience / complexity before mixing
# ---------------------------------------------------------------------------


def docs_readability(sf_dir: str) -> pd.DataFrame:
    """Per document: word / sentence / syllable-proxy counts and an
    integer Flesch-style score,

        flesch_milli = 206835 − 1015·W trunc-div S − 84600·Y trunc-div W,

    where W = ``\\S+`` runs, S = ``[.!?]+`` runs floored at 1 (an
    unpunctuated doc is one sentence), Y = ``[aeiouy]+`` vowel groups of
    the lowercased text (the standard offline syllable proxy).  All
    operands are non-negative so trunc-div ≡ floor-div on both sides.
    Documents with zero words are absent (the SQL twin's WHERE).

    Scale shape: row-local regex counts over Arrow string batches — one
    ``map_batches`` pass, three compiled-RE2-class scans per row, no
    exchange at all."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_words": pd.Series([], dtype="int64"),
            "n_sents": pd.Series([], dtype="int64"),
            "n_syll": pd.Series([], dtype="int64"),
            "flesch_milli": pd.Series([], dtype="int64")})
        if t.num_rows == 0:
            return empty
        txt = t["text"].to_pandas().fillna("")
        w = txt.str.count(r"\S+").to_numpy(dtype="int64")
        s = txt.str.count(r"[.!?]+").to_numpy(dtype="int64")
        y = txt.str.lower().str.count(r"[aeiouy]+").to_numpy(dtype="int64")
        keep = w > 0
        if not keep.any():
            return empty
        doc_id = t["doc_id"].to_pandas().to_numpy(dtype="int64")[keep]
        w, s, y = w[keep], np.maximum(s[keep], 1), y[keep]
        flesch = 206835 - 1015 * w // s - 84600 * y // w
        return pd.DataFrame({"doc_id": doc_id, "n_words": w, "n_sents": s,
                             "n_syll": y, "flesch_milli": flesch})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_words": pd.Series([], dtype="int64"),
            "n_sents": pd.Series([], dtype="int64"),
            "n_syll": pd.Series([], dtype="int64"),
            "flesch_milli": pd.Series([], dtype="int64")})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# simplified silhouette over the labeled embedding corpus: per-vector
# cohesion-vs-separation against label centroids — the clustering-quality
# audit that decides whether a labeling/clustering is worth training on
# ---------------------------------------------------------------------------


def emb_silhouette(sf_dir: str) -> pd.DataFrame:
    """Per vector: cosine to its OWN label centroid (``a_sim``), the max
    cosine to any OTHER label centroid (``b_sim``), and the simplified
    silhouette

        sil = ROUND((a − b) / (1 − LEAST(a, b)), 6)     (0 if the
        denominator is 0; b = 0 if no other label exists),

    with a and b each ROUND(…,6) first (the corpus-wide float contract).
    Cosine against the label's element-wise SUM vector equals cosine
    against its centroid (the 1/n cancels), so no count bookkeeping.

    Scale shape: batch scatter-add partials build the labels×dim sum
    matrix (bounded by the label vocabulary); the driver merges partials
    once and broadcasts the tiny matrix back through a second streaming
    pass — two linear scans, no shuffle."""
    ds = _emb(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        labels = t["label"].to_numpy(zero_copy_only=False)
        if len(labels) == 0:
            return pd.DataFrame({"label": pd.Series([], dtype="int64"),
                                 "sums": pd.Series([], dtype=object)})
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        return pd.DataFrame({"label": uniq.astype("int64"),
                             "sums": [r.tobytes() for r in sums]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "label": pd.Series([], dtype="int64"),
                          "a_sim": pd.Series([], dtype="float64"),
                          "b_sim": pd.Series([], dtype="float64"),
                          "sil": pd.Series([], dtype="float64")})
    if parts.empty or "label" not in parts.columns:
        return empty
    merged: dict = {}
    dim = None
    for lab, blob in zip(parts["label"], parts["sums"]):
        v = np.frombuffer(blob, dtype=np.float64)
        dim = len(v)
        merged[int(lab)] = merged.get(int(lab), np.zeros(dim)) + v
    labs = np.array(sorted(merged), dtype=np.int64)
    cents = np.stack([merged[int(l)] for l in labs])
    cnorm = np.sqrt((cents * cents).sum(axis=1))
    cnorm[cnorm == 0] = 1.0
    import ray as _ray
    cents_ref = _ray.put((labs, cents / cnorm[:, None]))

    def score(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return empty.copy()
        labs_b, cn = _ray.get(cents_ref)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        lab = t["label"].to_numpy(zero_copy_only=False).astype("int64")
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        n = np.sqrt((mat * mat).sum(axis=1))
        n[n == 0] = 1.0
        sims = np.round((mat / n[:, None]) @ cn.T, 6)
        pos = np.searchsorted(labs_b, lab)
        own = sims[np.arange(len(lab)), pos]
        other = sims.copy()
        other[np.arange(len(lab)), pos] = -np.inf
        b = other.max(axis=1)
        b = np.where(np.isfinite(b), b, 0.0)
        den = 1.0 - np.minimum(own, b)
        safe = np.where(den <= 0, 1.0, den)
        sil = np.where(den <= 0, 0.0, np.round((own - b) / safe, 6))
        return pd.DataFrame({"vec_id": vid, "label": lab, "a_sim": own,
                             "b_sim": b, "sil": sil})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty or "vec_id" not in out.columns:
        return empty
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010): candidate phrases are maximal
# runs of non-stopword alpha tokens; word score = degree·10⁶ // frequency;
# phrase score = Σ word scores.  The classic unsupervised keyphrase miner a
# training-data pipeline runs for corpus labeling/topic seeding.
# ---------------------------------------------------------------------------

# explicit ASCII whitespace class on BOTH sides (RE2's \s is ASCII-only;
# Python's is not — spelling the class out makes the twins identical on
# exotic whitespace)
_RAKE_TOKEN_RE = re.compile(r"[a-z]+|[^a-z\t\n\f\r ]+")
_RAKE_STOPWORDS = frozenset((
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "that", "are", "was",
    "or", "from", "but", "not", "have", "has", "had", "we", "you", "they"))
_RAKE_TOP_K = 20


def docs_rake_keywords(sf_dir: str, k: int = _RAKE_TOP_K) -> pd.DataFrame:
    """Top-k RAKE keyphrases over the corpus.

    Tokens are ``[a-z]+`` runs of lowercased text; any other non-blank run
    is a boundary token (so punctuation breaks phrases exactly as in the
    SQL twin).  A candidate phrase is a maximal run of non-stopword alpha
    tokens.  freq(w) counts word occurrences inside candidates, deg(w)
    sums the containing phrase's length per occurrence,
    ``wscore = deg·10⁶ // freq`` (non-negative — no truncation-sign
    hazard), and a phrase scores the SUM of its words' scores (duplicate
    words count per position).  Output: (phrase, n_occ, score), score
    DESC then phrase ASC, top k.

    Scale shape: one tokenize pass emits (word → freq,deg) partials and
    batch-local (phrase → occ) counts as a tagged union; exchange 1
    (64-way key-hash buckets) finishes word scores where word rows land
    and dedups phrases where phrase rows land, EXPLODING each distinct
    phrase into per-position word rows; exchange 2 attaches word scores
    under the word bucket; exchange 3 sums per-phrase partials under the
    phrase bucket and keeps its bucket's top-k — the driver merges
    ≤ 64·k rows.  Texts never move; only projections shuffle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    tag_cols = ("kind", "key", "aux", "a", "b", "_b")

    def _empty_tagged() -> pd.DataFrame:
        return pd.DataFrame({
            "kind": pd.Series([], dtype=object),
            "key": pd.Series([], dtype=object),
            "aux": pd.Series([], dtype=object),
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "_b": pd.Series([], dtype="int64")})

    def _bucket(keys: pd.Series) -> pd.Series:
        return (pd.util.hash_pandas_object(
            keys.astype(object), index=False) % 64).astype("int64")

    def partial(t: pa.Table) -> pd.DataFrame:
        wfreq: Dict[str, int] = {}
        wdeg: Dict[str, int] = {}
        pocc: Dict[str, int] = {}
        for tx in t["text"].to_pylist():
            toks = _RAKE_TOKEN_RE.findall((tx or "").lower())
            run: List[str] = []
            for tok in toks + ["."]:  # sentinel boundary flushes the tail
                if "a" <= tok[0] <= "z" and tok not in _RAKE_STOPWORDS:
                    run.append(tok)
                    continue
                if run:
                    plen = len(run)
                    for w in run:
                        wfreq[w] = wfreq.get(w, 0) + 1
                        wdeg[w] = wdeg.get(w, 0) + plen
                    p = " ".join(run)
                    pocc[p] = pocc.get(p, 0) + 1
                    run = []
        if not wfreq and not pocc:
            return _empty_tagged()
        out = pd.DataFrame({
            "kind": ["w"] * len(wfreq) + ["p"] * len(pocc),
            "key": list(wfreq) + list(pocc),
            "aux": [""] * (len(wfreq) + len(pocc)),
            "a": pd.Series(list(wfreq.values()) + list(pocc.values()),
                           dtype="int64"),
            "b": pd.Series(list(wdeg.values()) + [0] * len(pocc),
                           dtype="int64")})
        out["_b"] = _bucket(out["key"])
        return out

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        # word rows: finish freq/deg -> wscore, stay keyed by word;
        # phrase rows: dedup, then explode into per-position word rows
        # (keyed by word) + one occurrence row (keyed by phrase)
        if len(df) == 0 or "kind" not in df.columns:
            return _empty_tagged()
        parts: List[pd.DataFrame] = []
        w = df[df["kind"] == "w"]
        if len(w):
            g = w.groupby("key", as_index=False)[["a", "b"]].sum()
            ws = pd.DataFrame({
                "kind": "ws", "key": g["key"], "aux": "",
                "a": (g["b"].to_numpy(dtype="int64") * 1_000_000
                      // g["a"].to_numpy(dtype="int64")),
                "b": np.int64(0)})
            ws["_b"] = _bucket(ws["key"])
            parts.append(ws)
        p = df[df["kind"] == "p"]
        if len(p):
            g = p.groupby("key", as_index=False)["a"].sum()
            occ = pd.DataFrame({
                "kind": "occ", "key": g["key"], "aux": "",
                "a": g["a"].astype("int64"), "b": np.int64(0)})
            occ["_b"] = _bucket(occ["key"])
            parts.append(occ)
            phrases = g["key"].tolist()
            pw_phrase: List[str] = []
            pw_word: List[str] = []
            for ph in phrases:
                for wd in ph.split(" "):
                    pw_phrase.append(ph)
                    pw_word.append(wd)
            pw = pd.DataFrame({
                "kind": "pw", "key": pw_word, "aux": pw_phrase,
                "a": np.int64(0), "b": np.int64(0)})
            pw["_b"] = _bucket(pw["key"])
            parts.append(pw)
        if not parts:
            return _empty_tagged()
        return pd.concat(parts, ignore_index=True)[list(tag_cols)]

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        # word bucket: attach wscore to phrase-word rows; pass occurrence
        # rows through re-keyed by phrase
        if len(df) == 0 or "kind" not in df.columns:
            return _empty_tagged()
        parts: List[pd.DataFrame] = []
        occ = df[df["kind"] == "occ"]
        if len(occ):
            occ = occ.copy()
            occ["_b"] = _bucket(occ["key"])
            parts.append(occ[list(tag_cols)])
        pw = df[df["kind"] == "pw"]
        ws = df[df["kind"] == "ws"]
        if len(pw):
            scored = pw.merge(
                ws[["key", "a"]].rename(columns={"a": "wscore"}),
                on="key", how="inner")
            sp = pd.DataFrame({
                "kind": "sp", "key": scored["aux"], "aux": "",
                "a": scored["wscore"].astype("int64"), "b": np.int64(0)})
            sp["_b"] = _bucket(sp["key"])
            parts.append(sp[list(tag_cols)])
        if not parts:
            return _empty_tagged()
        return pd.concat(parts, ignore_index=True)

    def pass3(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "phrase": pd.Series([], dtype=object),
            "n_occ": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="int64")})
        if len(df) == 0 or "kind" not in df.columns:
            return empty
        sp = df[df["kind"] == "sp"]
        occ = df[df["kind"] == "occ"]
        if len(sp) == 0 or len(occ) == 0:
            return empty
        score = sp.groupby("key", as_index=False)["a"].sum() \
            .rename(columns={"key": "phrase", "a": "score"})
        n_occ = occ.groupby("key", as_index=False)["a"].sum() \
            .rename(columns={"key": "phrase", "a": "n_occ"})
        out = score.merge(n_occ, on="phrase", how="inner")
        out = out.sort_values(["score", "phrase"],
                              ascending=[False, True],
                              kind="mergesort").head(k)
        return out[["phrase", "n_occ", "score"]]

    cands = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(pass1, batch_format="pandas") \
        .groupby("_b").map_groups(pass2, batch_format="pandas") \
        .groupby("_b").map_groups(pass3, batch_format="pandas") \
        .to_pandas()
    if cands.empty or "phrase" not in cands.columns:
        return pd.DataFrame({
            "phrase": pd.Series([], dtype=object),
            "n_occ": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="int64")})
    out = cands.sort_values(["score", "phrase"],
                            ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    for c in ("n_occ", "score"):
        out[c] = out[c].astype("int64")
    return out[["phrase", "n_occ", "score"]]


def emb_residual_quantize(sf_dir: str, k_cent: int = 8) -> pd.DataFrame:
    """Two-level residual quantization (RQ-2): level 1 codes against the
    deterministic ``vec_id < 8`` codebook by ROUND(L2², 6) argmin (the
    kmeans/PQ float contract, ties to the smaller id); level 2 codes the
    RESIDUAL ``v − c1`` against the residual codebook built from vectors
    8..15 (each reduced by ITS OWN level-1 centroid), same contract, code
    id = the source vec_id; ``err_sq`` is the winning rounded level-2
    distance — the reconstruction-error audit a vector-compression
    pipeline ships with its codes.

    Scale shape: both codebooks (8×64 floats each) are ONE ``ray.put``
    broadcast; coding is a row-local vectorized matmul per batch — no
    shuffle, and 64 floats leave as two small ints + one rounded error
    (the additive-quantization compression path at 10⁹ vectors)."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", 2 * k_cent)])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
    if len(ids) <= k_cent:
        # no residual-codebook member exists: the SQL twin's cb2 join is
        # empty and emits zero rows
        return pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "code1": pd.Series([], dtype="int64"),
            "code2": pd.Series([], dtype="int64"),
            "err_sq": pd.Series([], dtype="float64")})
    order = np.argsort(ids)
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    cb1 = vecs[:k_cent]                       # level-1 codebook (ids 0..7)
    src2 = vecs[k_cent:2 * k_cent]            # ids 8..15

    def assign1(v: np.ndarray) -> np.ndarray:
        d = np.round(
            ((v[:, None, :] - cb1[None, :, :]) ** 2).sum(axis=-1), 6)
        return np.argmin(d, axis=1)

    rcb = src2 - cb1[assign1(src2)]           # residual codebook
    cb1_ref = ray.put(cb1)
    rcb_ref = ray.put(rcb)

    def encode(batch: pa.Table) -> pd.DataFrame:
        c1m = ray.get(cb1_ref)
        rm = ray.get(rcb_ref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        v = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        d1 = np.round(
            ((v[:, None, :] - c1m[None, :, :]) ** 2).sum(axis=-1), 6)
        code1 = np.argmin(d1, axis=1)
        r = v - c1m[code1]
        d2 = np.round(
            ((r[:, None, :] - rm[None, :, :]) ** 2).sum(axis=-1), 6)
        j = np.argmin(d2, axis=1)
        return pd.DataFrame({
            "vec_id": vid,
            "code1": code1.astype("int64"),
            "code2": (j + k_cent).astype("int64"),
            "err_sq": d2[np.arange(len(vid)), j]})

    out = _emb(sf_dir).map_batches(encode, batch_format="pyarrow") \
        .to_pandas()
    for c in ("vec_id", "code1", "code2"):
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def docs_js_divergence(sf_dir: str) -> pd.DataFrame:
    """Pairwise Jensen–Shannon divergence between language unigram
    distributions, in integer micro-nats.

    For each lang pair (l1 < l2) over the UNION vocabulary with counts
    (a, b) and totals (ta, tb): the p-side per-word log ratio is
    quantized to ``lq = round(ln((2.0·a·tb) / (a·tb + b·ta)) · 10⁶)``
    (float association written identically in engine and SQL — the
    docs_zipf_slope fixed-point-ln contract), summed as exact integers
    ``sa = Σ a·lq``, and ``jsd_micro = sa tdiv (2·ta) + sb tdiv (2·tb)``
    with truncate-toward-zero division (each half is a KL ≥ 0, but
    per-word rounding can nudge a near-zero sum negative — hence
    sign-aware).  Words are space-split, empties dropped, on both sides.

    Scale shape: unbounded vocabulary counts finish under 64-way
    word-hash buckets (the docs_zipf_slope exchange), MATERIALIZED once
    and streamed twice — a tiny per-lang totals pass, then per-bucket
    pair terms with the bounded lang-totals dict a closure broadcast.
    Bucket partials carry Python big-int sums as strings (the
    parts_degree_assortativity convention: Σ a·lq can pass 2⁶³ on a web
    corpus), so the driver merges 64 × |pairs| projection rows and never
    sees a word."""
    ds = _docs(sf_dir, ["lang", "text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["lang", "text"]].copy()
        out["word"] = out["text"].fillna("").str.split(" ")
        out = out[["lang", "word"]].explode("word")
        out = out[out["word"] != ""]
        if len(out) == 0:
            return pd.DataFrame({
                "lang": pd.Series([], dtype=object),
                "word": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "_b": pd.Series([], dtype="int64")})
        g = out.groupby(["lang", "word"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["_b"] = g["word"].map(
            lambda w: int.from_bytes(w.encode()[:8].ljust(8, b"\0"),
                                     "big") % 64).astype("int64")
        return g

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "word"], as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        out["_b"] = df["_b"].iloc[0] if len(df) else np.int64(0)
        return out

    counts = ds.map_batches(count_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_counts, batch_format="pandas") \
        .materialize()

    cols = ("lang1", "lang2", "n_words", "jsd_micro")
    empty = pd.DataFrame({
        "lang1": pd.Series([], dtype=object),
        "lang2": pd.Series([], dtype=object),
        "n_words": pd.Series([], dtype="int64"),
        "jsd_micro": pd.Series([], dtype="int64")})

    tot_parts = counts.map_batches(
        lambda df: df.groupby("lang", as_index=False)["n"].sum(),
        batch_format="pandas").to_pandas()
    if tot_parts.empty:
        return empty
    totals = {str(l): int(n) for l, n in
              tot_parts.groupby("lang")["n"].sum().items()}
    langs = sorted(totals)
    if len(langs) < 2:
        return empty

    def term_partial(df: pd.DataFrame) -> pd.DataFrame:
        pv = df.pivot_table(index="word", columns="lang", values="n",
                            aggfunc="sum", fill_value=0)
        rows = []
        for i, l1 in enumerate(langs):
            for l2 in langs[i + 1:]:
                a = pv[l1].to_numpy(dtype="float64") if l1 in pv.columns \
                    else np.zeros(len(pv))
                b = pv[l2].to_numpy(dtype="float64") if l2 in pv.columns \
                    else np.zeros(len(pv))
                mask = (a > 0) | (b > 0)
                a, b = a[mask], b[mask]
                ta, tb = float(totals[l1]), float(totals[l2])
                sa = sb = 0
                ma = a > 0
                if ma.any():
                    lq = np.round(np.log(
                        (2.0 * a[ma]) * tb / (a[ma] * tb + b[ma] * ta))
                        * 1_000_000)
                    sa = sum(int(x) * int(y)
                             for x, y in zip(a[ma], lq))
                mb = b > 0
                if mb.any():
                    lq = np.round(np.log(
                        (2.0 * b[mb]) * ta / (b[mb] * ta + a[mb] * tb))
                        * 1_000_000)
                    sb = sum(int(x) * int(y)
                             for x, y in zip(b[mb], lq))
                rows.append((l1, l2, int(mask.sum()), str(sa), str(sb)))
        return pd.DataFrame({
            "lang1": [r[0] for r in rows],
            "lang2": [r[1] for r in rows],
            "n_words": pd.Series([r[2] for r in rows], dtype="int64"),
            "sa": [r[3] for r in rows],
            "sb": [r[4] for r in rows]})

    parts = counts.groupby("_b").map_groups(
        term_partial, batch_format="pandas").to_pandas()
    if parts.empty or "lang1" not in parts.columns:
        return empty

    def tdiv(x: int, y: int) -> int:
        q = abs(x) // y
        return q if x >= 0 else -q

    out_rows = []
    for (l1, l2), g in parts.groupby(["lang1", "lang2"]):
        sa = sum(int(x) for x in g["sa"])
        sb = sum(int(x) for x in g["sb"])
        jsd = tdiv(sa, 2 * totals[l1]) + tdiv(sb, 2 * totals[l2])
        out_rows.append((l1, l2, int(g["n_words"].sum()), jsd))
    out_rows.sort()
    return pd.DataFrame({
        "lang1": [r[0] for r in out_rows],
        "lang2": [r[1] for r in out_rows],
        "n_words": pd.Series([r[2] for r in out_rows], dtype="int64"),
        "jsd_micro": pd.Series([r[3] for r in out_rows], dtype="int64")})


def docs_char_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document character-level Shannon entropy in integer
    micro-nats: (doc_id, n_chars, n_distinct, entropy_micro) where
    ``entropy_micro = (Σ_ch c·round(ln(n/c)·10⁶)) // n`` over the doc's
    code-point counts — the docs_zipf_slope fixed-point-ln contract per
    term, exact-integer sum, one trunc-div at the end.  Empty documents
    emit no row (the SQL twin's empty char split).

    Scale shape: strictly row-local — no exchange.  The per-batch kernel
    is fully vectorized and CHAR-exact without a Python per-row loop:
    one C-level join of the batch's texts, one utf-32-le encode to a
    fixed-width uint32 code-point array, doc ids repeated by pandas
    str.len, then a single lexsort + reduceat for (doc, char) counts and
    a bincount-style reduceat back to per-doc sums."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    cols = ("doc_id", "n_chars", "n_distinct", "entropy_micro")

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").astype(str)
        lens = texts.str.len().to_numpy(dtype="int64")
        keep = lens > 0
        if not keep.any():
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=object),
                "n_chars": pd.Series([], dtype="int64"),
                "n_distinct": pd.Series([], dtype="int64"),
                "entropy_micro": pd.Series([], dtype="int64")})
        ids = df["doc_id"].to_numpy()[keep]
        lens = lens[keep]
        blob = "".join(texts[keep])
        cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32) \
            .astype("int64")
        doc = np.repeat(np.arange(len(lens), dtype="int64"), lens)
        order = np.lexsort((cps, doc))
        d_s, c_s = doc[order], cps[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (d_s[1:] != d_s[:-1])
                            | (c_s[1:] != c_s[:-1]))))
        cnt = np.diff(np.append(starts, len(d_s))).astype("int64")
        grp_doc = d_s[starts]
        n_of = lens[grp_doc].astype("float64")
        lq = np.round(np.log(n_of / cnt) * 1_000_000).astype("int64")
        term = cnt * lq
        # per-doc reduceat over the (doc-major) group array
        doc_starts = np.flatnonzero(
            np.concatenate(([True], grp_doc[1:] != grp_doc[:-1])))
        tsum = np.add.reduceat(term, doc_starts)
        ndist = np.diff(np.append(doc_starts, len(grp_doc))).astype("int64")
        docs_present = grp_doc[doc_starts]
        return pd.DataFrame({
            "doc_id": ids[docs_present],
            "n_chars": lens[docs_present],
            "n_distinct": ndist,
            "entropy_micro": (tsum // lens[docs_present]).astype("int64")})

    out = ds.map_batches(per_batch, batch_format="pandas").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=object),
            "n_chars": pd.Series([], dtype="int64"),
            "n_distinct": pd.Series([], dtype="int64"),
            "entropy_micro": pd.Series([], dtype="int64")})
    out = out[list(cols)]
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_TEXTRANK_TOP = 20


def docs_textrank(sf_dir: str, k: int = _TEXTRANK_TOP) -> pd.DataFrame:
    """TextRank keyword extraction: two PageRank iterations (damping
    0.85 as integer 850/1000 ops — the parts_pagerank ppm contract) over
    the UNDIRECTED adjacent-word co-occurrence graph; top-``k`` words by
    final rank, ties pinned by (rank_ppm DESC, word).  Tokenization is
    the docs_bigram_lift contract (``lower().split()``); each adjacency
    occurrence adds weight 1 in BOTH directions, self-pairs dropped.
    Iteration 1 folds the uniform 10⁶ start rank analytically
    (contribution = 10⁶·n // outw); iteration 2 is rank·n // outw.

    Scale shape: directed-edge partials finish under a 64-way src
    word-hash bucket where outw is exact (a src's edges are colocated);
    the edge table is MATERIALIZED once for both iterations.  Rank₁
    reduces under dst-hash buckets and re-attaches to edges through a
    tagged-union exchange keyed by the SAME word hash — never a driver
    rank vector over an unbounded vocabulary.  Per-bucket top-k bounds
    the driver merge to ≤ 64·k rows."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _whash(s: pd.Series) -> pd.Series:
        return (pd.util.hash_pandas_object(
            s.astype(object), index=False).reset_index(drop=True)
            % 64).astype("int64")

    def pair_partial(t: pa.Table) -> pa.Table:
        cnt: Dict[tuple, int] = {}
        for tx in t["text"].to_pylist():
            words = (tx or "").lower().split()
            for a, b in zip(words, words[1:]):
                if a == b:
                    continue
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
                cnt[(b, a)] = cnt.get((b, a), 0) + 1
        src = [p[0] for p in cnt]
        dst = [p[1] for p in cnt]
        n = list(cnt.values())
        bucket = _whash(pd.Series(src, dtype=object))
        return pa.table({
            "src": pa.array(src, pa.string()),
            "dst": pa.array(dst, pa.string()),
            "n": pa.array(n, pa.int64()),
            "_s": pa.array(bucket.to_numpy(), pa.int64())})

    def finish_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src", "dst"], as_index=False)["n"].sum()
        out["outw"] = out.groupby("src")["n"].transform("sum")
        out["n"] = out["n"].astype("int64")
        out["outw"] = out["outw"].astype("int64")
        return out[["src", "dst", "n", "outw"]]

    edges = ds.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("_s").map_groups(finish_edges, batch_format="pandas") \
        .materialize()
    cols = ("word", "rank_ppm")
    empty = pd.DataFrame({"word": pd.Series([], dtype=object),
                          "rank_ppm": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    def contrib1(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "dst": df["dst"].astype(object),
            "c": (1_000_000 * df["n"].astype("int64"))
            // df["outw"].astype("int64")})
        out = out.groupby("dst", as_index=False)["c"].sum()
        out["_d"] = _whash(out["dst"]).to_numpy()
        return out

    def damp(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("dst", as_index=False)["c"].sum()
        return pd.DataFrame({
            "node": out["dst"].astype(object),
            "rank": (150_000 + 850 * out["c"].astype("int64") // 1_000)
            .astype("int64")})

    rank1 = edges.map_batches(contrib1, batch_format="pandas") \
        .groupby("_d").map_groups(damp, batch_format="pandas")

    # tagged union: edge rows (rank −1) + rank rows (n −1) meet under
    # the src word-hash bucket; one pandas merge per bucket
    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "dst", "n", "outw"]].copy()
        out["rank"] = np.full(len(out), -1, dtype="int64")
        out["_s"] = _whash(out["src"]).to_numpy()
        return out

    def tag_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "src": df["node"].astype(object),
            "dst": pd.Series([""] * len(df), dtype=object),
            "n": np.full(len(df), -1, dtype="int64"),
            "outw": np.full(len(df), -1, dtype="int64"),
            "rank": df["rank"].astype("int64")})
        out["_s"] = _whash(out["src"]).to_numpy()
        return out

    def contrib2(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["rank"] < 0][["src", "dst", "n", "outw"]]
        r = df[df["rank"] >= 0][["src", "rank"]]
        if e.empty or r.empty:
            return pd.DataFrame({
                "dst": pd.Series([], dtype=object),
                "c": pd.Series([], dtype="int64"),
                "_d": pd.Series([], dtype="int64")})
        m = e.merge(r, on="src", how="inner")
        out = pd.DataFrame({
            "dst": m["dst"].astype(object),
            "c": (m["rank"].astype("int64") * m["n"].astype("int64"))
            // m["outw"].astype("int64")})
        out = out.groupby("dst", as_index=False)["c"].sum()
        out["_d"] = _whash(out["dst"]).to_numpy()
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = damp(df).rename(columns={"node": "word",
                                       "rank": "rank_ppm"})
        return out.sort_values(["rank_ppm", "word"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    tops = edges.map_batches(tag_edge, batch_format="pandas") \
        .union(rank1.map_batches(tag_rank, batch_format="pandas")) \
        .groupby("_s").map_groups(contrib2, batch_format="pandas") \
        .groupby("_d").map_groups(bucket_top, batch_format="pandas") \
        .to_pandas()
    if tops.empty or "word" not in tops.columns:
        return empty
    out = tops.sort_values(["rank_ppm", "word"],
                           ascending=[False, True],
                           kind="mergesort").head(k)
    out["rank_ppm"] = out["rank_ppm"].astype("int64")
    return out[list(cols)].reset_index(drop=True)


def emb_isotropy(sf_dir: str) -> pd.DataFrame:
    """Embedding isotropy audit: the mean pairwise cosine similarity
    over all ordered pairs i ≠ j, in integer micro —
    ``mean_cos_micro = (Σ_d S_d² − T) tdiv (n(n−1)·10⁶)`` where each
    vector is unit-normalized (left-to-right float64 norm — the
    _norm_ltr SQL association contract), QUANTIZED to integer
    ``q_d = round(v̂_d·10⁶)``, ``S_d = Σᵢ q_{i,d}`` and
    ``T = Σᵢ‖qᵢ‖²`` are exact integers, and the sum-vector identity
    ``Σ_{i≠j}⟨qᵢ,qⱼ⟩ = ‖S‖² − T`` makes the all-pairs readout one
    streaming pass.  tdiv is sign-aware truncation (DuckDB ``//``
    truncates toward zero; NOTES_r2 #64).  Zero-norm vectors are
    excluded; fewer than 2 kept vectors → empty frame.

    Scale shape: each block emits a 64-int S partial plus (T, n) —
    O(blocks·dim) integers to the driver, embeddings never leave their
    blocks, no shuffle; ‖S‖² runs in Python big ints (S_d² passes 2⁶³
    near n ≈ 3·10³ already)."""
    ds = _emb(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        acc = np.zeros(len(X), dtype=np.float64)
        for i in range(X.shape[1]):
            acc += X[:, i] * X[:, i]
        keep = acc > 0.0
        X, acc = X[keep], acc[keep]
        if len(X) == 0:
            return pd.DataFrame({
                "d": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "t": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")})
        q = np.round(X / np.sqrt(acc)[:, None] * 1_000_000) \
            .astype("int64")
        s = q.sum(axis=0)
        return pd.DataFrame({
            "d": np.arange(1, q.shape[1] + 1, dtype="int64"),
            "s": s,
            "t": np.concatenate((
                [int((q * q).sum())],
                np.zeros(q.shape[1] - 1, dtype="int64"))).astype("int64"),
            "n": np.concatenate((
                [len(q)],
                np.zeros(q.shape[1] - 1, dtype="int64"))).astype("int64")})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = ("n_vecs", "mean_cos_micro")
    if parts.empty or "d" not in parts.columns:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    n = int(parts["n"].sum())
    if n < 2:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    t = int(parts["t"].sum())
    sd = parts.groupby("d")["s"].sum()
    ss = sum(int(x) * int(x) for x in sd)
    num = ss - t
    den = n * (n - 1) * 1_000_000
    mean_cos = abs(num) // den
    if num < 0:
        mean_cos = -mean_cos
    return pd.DataFrame({
        "n_vecs": pd.Series([n], dtype="int64"),
        "mean_cos_micro": pd.Series([mean_cos], dtype="int64")})


def docs_hapax_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-language hapax legomenon share: (lang, n_distinct, n_hapax,
    hapax_ppm) where a hapax is a word occurring exactly once in that
    language's corpus slice and ``hapax_ppm = 10⁶·n_hapax //
    n_distinct`` — the classic vocabulary-freshness signal next to
    docs_vocab_growth's Heaps curve.  Tokenization is the
    docs_bigram_lift contract (``lower().split()``).

    Scale shape: per-batch (lang, word) count partials finish under the
    64-way word-hash bucket (a word's global count is exact there);
    each bucket emits per-lang (distinct, hapax) partials so the driver
    merges ≤ 64·|langs| integer rows and never sees a word."""
    ds = _docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        cnt: Dict[tuple, int] = {}
        for lg, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in (tx or "").lower().split():
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        langs = [k[0] for k in cnt]
        words = [k[1] for k in cnt]
        bucket = (pd.util.hash_pandas_object(
            pd.Series(words, dtype=object), index=False) % 64) \
            .astype("int64")
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "word": pa.array(words, pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64()),
            "_b": pa.array(bucket.to_numpy(), pa.int64())})

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "word"], as_index=False)["n"].sum()
        out = g.groupby("lang", as_index=False).agg(
            n_distinct=("n", "size"),
            n_hapax=("n", lambda s: int((s == 1).sum())))
        out["n_distinct"] = out["n_distinct"].astype("int64")
        out["n_hapax"] = out["n_hapax"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_stats, batch_format="pandas") \
        .to_pandas()
    cols = ("lang", "n_distinct", "n_hapax", "hapax_ppm")
    if parts.empty or "lang" not in parts.columns:
        return pd.DataFrame({
            "lang": pd.Series([], dtype=object),
            "n_distinct": pd.Series([], dtype="int64"),
            "n_hapax": pd.Series([], dtype="int64"),
            "hapax_ppm": pd.Series([], dtype="int64")})
    out = parts.groupby("lang", as_index=False)[
        ["n_distinct", "n_hapax"]].sum()
    out["hapax_ppm"] = (1_000_000 * out["n_hapax"].astype("int64")
                        // out["n_distinct"].astype("int64"))
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("lang").reset_index(drop=True)


def docs_simpson_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-language Simpson diversity of the word distribution:
    (lang, n_tokens, simpson_ppm) with
    ``simpson_ppm = 10⁶·Σ_w n_w(n_w−1) // (N(N−1))`` — the probability
    two tokens drawn without replacement are the same word, EXACT in
    integers end to end (no ln, no floats; the concentration twin of
    docs_char_entropy).  Languages with N < 2 tokens emit no row.
    Tokenization is the docs_bigram_lift contract (lower().split()).

    Scale shape: (lang, word) count partials finish under the 64-way
    word-hash bucket; each bucket emits per-lang Σn(n−1) and Σn
    partials (Python big-int strings — n_w(n_w−1) sums pass 2⁶³ on a
    web corpus), so the driver merges ≤ 64·|langs| rows."""
    ds = _docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        cnt: Dict[tuple, int] = {}
        for lg, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in (tx or "").lower().split():
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        langs = [k[0] for k in cnt]
        words = [k[1] for k in cnt]
        bucket = (pd.util.hash_pandas_object(
            pd.Series(words, dtype=object), index=False) % 64) \
            .astype("int64")
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "word": pa.array(words, pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64()),
            "_b": pa.array(bucket.to_numpy(), pa.int64())})

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "word"], as_index=False)["n"].sum()
        rows = []
        for lg, sub in g.groupby("lang"):
            pairs = sum(int(x) * (int(x) - 1) for x in sub["n"])
            rows.append((lg, str(pairs), int(sub["n"].sum())))
        return pd.DataFrame({
            "lang": [r[0] for r in rows],
            "pairs": pd.Series([r[1] for r in rows], dtype=object),
            "tok": pd.Series([r[2] for r in rows], dtype="int64")})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_stats, batch_format="pandas") \
        .to_pandas()
    cols = ("lang", "n_tokens", "simpson_ppm")
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n_tokens": pd.Series([], dtype="int64"),
        "simpson_ppm": pd.Series([], dtype="int64")})
    if parts.empty or "lang" not in parts.columns:
        return empty
    rows = []
    for lg, sub in parts.groupby("lang"):
        n = int(sub["tok"].sum())
        if n < 2:
            continue
        pairs = sum(int(x) for x in sub["pairs"])
        rows.append((lg, n, (1_000_000 * pairs) // (n * (n - 1))))
    if not rows:
        return empty
    rows.sort()
    return pd.DataFrame({
        "lang": [r[0] for r in rows],
        "n_tokens": pd.Series([r[1] for r in rows], dtype="int64"),
        "simpson_ppm": pd.Series([r[2] for r in rows], dtype="int64")})


_BURST_MIN_TOT = 10
_BURST_TOP = 30


def docs_burstiness(sf_dir: str, min_tot: int = _BURST_MIN_TOT,
                    k: int = _BURST_TOP) -> pd.DataFrame:
    """Word burstiness as the exact-integer Fano factor of per-document
    counts over ALL D documents (zeros included):
    ``fano_ppm = (D·Σc² − tot²)·10⁶ // (D·tot)`` — var/mean of the count
    distribution, ≥10⁶ marks bursty words, <10⁶ regular ones (Church &
    Gale's adaptation signal for training-data curation).  Words with
    ``tot < min_tot`` are dropped BEFORE ranking; output is the global
    top-``k`` by (fano_ppm DESC, word ASC) with (word, tot, df,
    fano_ppm).  Tokenization is the docs_bigram_lift contract
    (``lower().split()``); a doc's counts are row-local so the per-doc
    distribution needs no dedup exchange.

    Scale shape: per-batch (word, c) per-doc count partials finish
    under the 64-way word-hash bucket (a word's tot/Σc²/df are exact
    there — doc_id never ships); each bucket ranks its own words with
    Python big-int arithmetic (D·Σc² passes 2⁶³ on a web corpus) and
    emits ≤ k candidates, so the driver merges ≤ 64·k rows."""
    n_docs = int(_docs(sf_dir, ["doc_id"]).count())
    cols = ("word", "tot", "df", "fano_ppm")
    empty = pd.DataFrame({
        "word": pd.Series([], dtype=object),
        "tot": pd.Series([], dtype="int64"),
        "df": pd.Series([], dtype="int64"),
        "fano_ppm": pd.Series([], dtype="int64")})
    if n_docs == 0:
        return empty
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        words: list = []
        counts: list = []
        for tx in t["text"].to_pylist():
            cnt: Dict[str, int] = {}
            for w in (tx or "").lower().split():
                cnt[w] = cnt.get(w, 0) + 1
            words.extend(cnt.keys())
            counts.extend(cnt.values())
        bucket = (pd.util.hash_pandas_object(
            pd.Series(words, dtype=object), index=False) % 64) \
            .astype("int64")
        return pa.table({
            "word": pa.array(words, pa.string()),
            "c": pa.array(counts, pa.int64()),
            "_b": pa.array(bucket.to_numpy(), pa.int64())})

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "word" not in df.columns:
            return empty.copy()
        df = df.copy()
        # object dtype → Python big-int sums (D·Σc² passes 2⁶³ at scale)
        df["c"] = df["c"].astype("int64").map(int).astype(object)
        df["c2"] = df["c"] * df["c"]
        g = df.groupby("word").agg(
            tot=("c", "sum"), ss=("c2", "sum"), df_=("c", "size"))
        g = g[g["tot"] >= min_tot]
        if len(g) == 0:
            return empty.copy()
        cand = []
        for word, tot, ss, dfreq in zip(g.index, g["tot"], g["ss"],
                                        g["df_"]):
            tot_i, ss_i = int(tot), int(ss)
            fano = (n_docs * ss_i - tot_i * tot_i) * 1_000_000 \
                // (n_docs * tot_i)
            cand.append((word, tot_i, int(dfreq), fano))
        cand.sort(key=lambda r: (-r[3], r[0]))
        cand = cand[:k]
        return pd.DataFrame({
            "word": [r[0] for r in cand],
            "tot": pd.Series([r[1] for r in cand], dtype="int64"),
            "df": pd.Series([r[2] for r in cand], dtype="int64"),
            "fano_ppm": pd.Series([r[3] for r in cand], dtype="int64")})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_top, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "word" not in parts.columns:
        return empty
    parts = parts.sort_values(
        ["fano_ppm", "word"], ascending=[False, True],
        kind="mergesort").head(k)
    for c in cols[1:]:
        parts[c] = parts[c].astype("int64")
    return parts[list(cols)].reset_index(drop=True)


_LID_K = 8
_LID_MOD = 7
_LID_QUERIES = 16


def emb_lid(sf_dir: str, k: int = _LID_K, mod: int = _LID_MOD,
            n_queries: int = _LID_QUERIES) -> pd.DataFrame:
    """Local intrinsic dimensionality (Levina–Bickel MLE) at sampled
    points: for the ``n_queries`` smallest vec_ids with
    ``vec_id % mod == 0``, take the ``k`` nearest OTHER vectors by
    cosine distance ``d = 1 − ROUND(cos, 6)`` (ties → smaller vec_id)
    and report ``lid_ppm = k_eff·10¹² // Σᵢ round(ln(d_k/d_i)·10⁶)``
    over neighbors with d > 0 (k_eff counts them; zero-distance
    duplicates are excluded from BOTH k and the sum, and an all-zero or
    zero-sum neighborhood scores 0).  High LID marks regions where ANN
    indexes degrade — the curation-time difficulty audit next to
    emb_isotropy's global score.  Output (qid, k_eff, sum_micro,
    lid_ppm) sorted by qid.

    Scale shape: the emb_knn contract — one bounded pass samples the
    query matrix (≤ n_queries rows per block partial), the scoring pass
    broadcasts it and emits per-(query, block) top-k projections, so
    the driver merge is ≤ blocks×k×queries rows and the integer term
    sum is order-free."""
    import ray

    ds = _emb(sf_dir)

    def q_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"vec_id": pd.Series([], dtype="int64")}
        cols.update({f"e{i}": pd.Series([], dtype="float64")
                     for i in range(64)})
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = ids % mod == 0
        if not m.any():
            return pd.DataFrame(cols)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[m]) \
            .astype(np.float64)
        sub = pd.DataFrame({"vec_id": ids[m].astype("int64")})
        for i in range(64):
            sub[f"e{i}"] = vecs[:, i]
        return sub.nsmallest(n_queries, "vec_id")

    qdf = ds.map_batches(q_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({
        "qid": pd.Series([], dtype="int64"),
        "k_eff": pd.Series([], dtype="int64"),
        "sum_micro": pd.Series([], dtype="int64"),
        "lid_ppm": pd.Series([], dtype="int64")})
    if qdf.empty or "vec_id" not in qdf.columns:
        return empty
    qdf = qdf.nsmallest(n_queries, "vec_id").reset_index(drop=True)
    Q = qdf[[f"e{i}" for i in range(64)]].to_numpy(dtype=np.float64)
    qids = qdf["vec_id"].to_numpy(dtype="int64")
    q_ref = ray.put(Q)
    qids_ref = ray.put(qids)

    def score_partial(t: pa.Table) -> pd.DataFrame:
        cols2 = {"qid": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="float64")}
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(ids) == 0:
            return pd.DataFrame(cols2)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        qm, qi_arr = ray.get(q_ref), ray.get(qids_ref)
        rows = []
        for qi in range(qm.shape[0]):
            keep = ids != qi_arr[qi]
            if not keep.any():
                continue
            d = 1.0 - np.round(cosine_scores(vecs[keep], qm[qi]), 6)
            lids = ids[keep]
            order = np.lexsort((lids, d))[:k]
            for j in order:
                rows.append((int(qi_arr[qi]), int(lids[j]), float(d[j])))
        if not rows:
            # typed empty — an all-query block (keep never true) must
            # not emit object-dtype columns into the schema unification
            return pd.DataFrame(cols2)
        return pd.DataFrame(rows, columns=["qid", "vec_id", "d"])

    parts = ds.map_batches(score_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty:
        return empty
    out_rows = []
    for qid in qids:
        g = parts[parts["qid"] == qid]
        if len(g) == 0:
            continue
        g = g.sort_values(["d", "vec_id"], kind="mergesort").head(k)
        d = g["d"].to_numpy(dtype=np.float64)
        dk = float(d.max())
        pos = d > 0
        k_eff = int(pos.sum())
        s = int(np.round(np.log(dk / d[pos]) * 1_000_000)
                .astype("int64").sum()) if k_eff else 0
        lid = k_eff * 10**12 // s if s > 0 else 0
        out_rows.append((int(qid), k_eff, s, lid))
    out = pd.DataFrame(out_rows,
                       columns=["qid", "k_eff", "sum_micro", "lid_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("qid").reset_index(drop=True)


_SNN_K = 3


def _components_auto(e0) -> pd.DataFrame:
    """(id, label) components of a materialized (a_id, b_id, a_seq,
    b_seq) edge Dataset with the dedup family's auto-switch: ≤2M edges
    fold on the driver via union-find (smaller-root-wins, so the root
    IS the min id — O(Eα) beats O(diameter) join rounds on dense
    graphs); bigger graphs run in label_components' min-label exchange.
    Returns a possibly-empty pandas frame."""
    from ..stages.dedup import label_components

    n_edges = e0.count()
    if n_edges == 0:
        return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                             "label": pd.Series([], dtype="int64")})
    if n_edges > 2_000_000:
        labels, _, _ = label_components(e0)
        return labels.to_pandas()
    ep = e0.to_pandas()
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(ep["a_id"].to_numpy(dtype="int64"),
                    ep["b_id"].to_numpy(dtype="int64")):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    node_ids = np.unique(np.concatenate([
        ep["a_id"].to_numpy(dtype="int64"),
        ep["b_id"].to_numpy(dtype="int64")]))
    return pd.DataFrame({
        "id": node_ids,
        "label": np.array([find(int(v)) for v in node_ids],
                          dtype="int64")})


def _components_census(e0, driver_max_edges: int = 2_000_000) -> pd.DataFrame:
    """(component_id, n_vecs, vec_checksum) census of the components of
    a materialized (a_id, b_id, a_seq, b_seq) edge Dataset, sorted by
    component_id (= the component's min id, both branches).  ≤2M edges
    reuse ``_components_auto``'s driver union-find and fold the census
    in place (the labels are already driver-resident); bigger graphs
    run label_components' min-label exchange and settle the census
    DISTRIBUTED — per-block (label, n, id-sum) partials merge under a
    label-hash bucket, so only ≤ #components rows ever reach the
    driver, never the raw node-label table."""
    from ..stages.dedup import label_components

    empty = pd.DataFrame({
        "component_id": pd.Series([], dtype="int64"),
        "n_vecs": pd.Series([], dtype="int64"),
        "vec_checksum": pd.Series([], dtype="int64")})
    n_edges = e0.count()
    if n_edges == 0:
        return empty
    if n_edges <= driver_max_edges:
        lab = _components_auto(e0)
        if lab.empty:
            return empty
        out = lab.groupby("label", as_index=False).agg(
            n_vecs=("id", "size"), vec_checksum=("id", "sum")) \
            .rename(columns={"label": "component_id"})
        for c in ("component_id", "n_vecs", "vec_checksum"):
            out[c] = out[c].astype("int64")
        return out.sort_values("component_id").reset_index(drop=True)

    labels, _, _ = label_components(e0)

    def census_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"component_id": pd.Series([], dtype="int64"),
                "n_vecs": pd.Series([], dtype="int64"),
                "vec_checksum": pd.Series([], dtype="int64"),
                "_lb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "label" not in df.columns:
            return pd.DataFrame(cols)
        g = df.groupby("label", as_index=False).agg(
            n_vecs=("id", "size"), vec_checksum=("id", "sum"))
        return pd.DataFrame({
            "component_id": g["label"].astype("int64"),
            "n_vecs": g["n_vecs"].astype("int64"),
            "vec_checksum": g["vec_checksum"].astype("int64"),
            "_lb": (g["label"].astype("int64") % 64)})

    def census_merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"component_id": pd.Series([], dtype="int64"),
                "n_vecs": pd.Series([], dtype="int64"),
                "vec_checksum": pd.Series([], dtype="int64")}
        if len(df) == 0 or "component_id" not in df.columns:
            return pd.DataFrame(cols)
        g = df.groupby("component_id", as_index=False).agg(
            n_vecs=("n_vecs", "sum"), vec_checksum=("vec_checksum", "sum"))
        return g.astype({"component_id": "int64", "n_vecs": "int64",
                         "vec_checksum": "int64"})

    parts = labels.map_batches(census_partial, batch_format="pandas") \
        .groupby("_lb").map_groups(census_merge,
                                   batch_format="pandas").to_pandas()
    if parts.empty or "component_id" not in parts.columns:
        return empty
    return parts.sort_values("component_id").reset_index(drop=True)


def _emb_matrix(ds):
    """Driver-assembled (ids, raw float64 matrix) from an embeddings
    Dataset — the snn-family broadcast contract (documented N·d
    object-store budget): per-block 64-column fan-out partials,
    vec_id-sorted on the driver.  Returns (None, None) with fewer than
    2 vectors.  Shared by emb_snn_components / emb_dbscan /
    emb_rptree_recall."""
    def mat_partial(t: pa.Table) -> pd.DataFrame:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        cols = {"vec_id": pd.Series(ids, dtype="int64")}
        if len(ids) == 0:
            cols.update({f"e{i}": pd.Series([], dtype="float64")
                         for i in range(64)})
            return pd.DataFrame(cols)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        out = pd.DataFrame(cols)
        for i in range(64):
            out[f"e{i}"] = vecs[:, i]
        return out

    mdf = ds.map_batches(mat_partial, batch_format="pyarrow").to_pandas()
    if len(mdf) < 2:
        return None, None
    mdf = mdf.sort_values("vec_id").reset_index(drop=True)
    ids = mdf["vec_id"].to_numpy(dtype="int64")
    m = mdf[[f"e{i}" for i in range(64)]].to_numpy(dtype=np.float64)
    return ids, m


def emb_snn_components(sf_dir: str, k: int = _SNN_K) -> pd.DataFrame:
    """Mutual-kNN (shared-nearest-neighbor) clustering: an undirected
    edge joins two vectors iff EACH is in the other's top-``k`` by
    cosine (ROUND 6, ties → smaller vec_id, self excluded); connected
    components of that graph are the clusters — the density-adaptive
    grouping used to find coherent corpus regions where a fixed-radius
    rule can't.  Vectors with no mutual edge emit no row.  Output one
    row per component: (component_id = min vec_id, n_vecs,
    vec_checksum) sorted by component_id.

    Scale shape: the normalized matrix ships ONCE via ``ray.put`` and
    each block ranks its own rows against it with one matmul — the
    documented assumption is N·d floats fit the object store (the
    crawl page-index pattern); beyond that the candidate pass swaps to
    the emb_ivf_recall bucketed scan.  Ties rank through ONE int64
    composite key ((−cs_micro)·2³³ + vec_id — exact while vec_id < 2³³)
    so per-row top-k is argpartition, not a Python loop.  Directed hits
    dedup to mutual edges under a pair-hash bucket (count == 2);
    components auto-switch (``_components_census``): ≤2M mutual edges
    fold on the driver via union-find, bigger graphs run in
    label_components' min-label exchange AND settle the census under
    label-hash buckets — only ≤ #components rows reach the driver."""
    import ray

    ds = _emb(sf_dir).materialize()
    empty = pd.DataFrame({
        "component_id": pd.Series([], dtype="int64"),
        "n_vecs": pd.Series([], dtype="int64"),
        "vec_checksum": pd.Series([], dtype="int64")})

    all_ids, M = _emb_matrix(ds)
    if all_ids is None:
        return empty
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mh = M / norms[:, None]
    m_ref = ray.put(Mh)
    ids_ref = ray.put(all_ids)

    def topk_partial(t: pa.Table) -> pd.DataFrame:
        cols2 = {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "_pb": pd.Series([], dtype="int64")}
        bids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(bids) == 0:
            return pd.DataFrame(cols2)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        bn = np.linalg.norm(vecs, axis=1)
        bn[bn == 0] = 1.0
        mh, aid = ray.get(m_ref), ray.get(ids_ref)
        cs = np.round((vecs / bn[:, None]) @ mh.T, 6)
        cs_i = np.round(cs * 1_000_000).astype(np.int64)
        # exclude self: the matrix is vec_id-sorted, so searchsorted
        # finds each block row's own column
        self_col = np.searchsorted(aid, bids)
        # sentinel below any real cs_micro (≥ −10⁶) — NOT int64 min,
        # whose negation in the composite key would overflow
        cs_i[np.arange(len(bids)), self_col] = -2_000_000
        key = (-cs_i) * (1 << 33) + aid[None, :]
        kk = min(k, key.shape[1] - 1)
        idx = np.argpartition(key, kk - 1, axis=1)[:, :kk]
        src = np.repeat(bids, kk)
        dst = aid[idx.ravel()]
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        pb = ((lo * 1_000_003 + hi) % 64).astype("int64")
        return pd.DataFrame({"a": lo, "b": hi, "_pb": pb})

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        cols3 = {"a_id": pd.Series([], dtype="int64"),
                 "b_id": pd.Series([], dtype="int64"),
                 "a_seq": pd.Series([], dtype="int64"),
                 "b_seq": pd.Series([], dtype="int64")}
        if len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame(cols3)
        g = df.groupby(["a", "b"], as_index=False).size()
        g = g[g["size"] >= 2]
        return pd.DataFrame({
            "a_id": g["a"].astype("int64"),
            "b_id": g["b"].astype("int64"),
            "a_seq": g["a"].astype("int64"),
            "b_seq": g["b"].astype("int64")})

    edges = ds.map_batches(topk_partial, batch_format="pyarrow") \
        .groupby("_pb").map_groups(mutual, batch_format="pandas") \
        .materialize()
    out = _components_census(edges)
    return out if len(out) else empty


def docs_bpe_fertility(sf_dir: str, rounds: int = _BPE_ROUNDS) -> pd.DataFrame:
    """Tokenizer fertility per language under the corpus-trained BPE:
    train the ``rounds`` pinned merges (docs_bpe_merges — the identical
    distributed training), apply them to every word occurrence and
    report ``fertility_ppm = n_bpe_tokens·10⁶ // n_word_tokens`` per
    lang — the compression audit that tells a curation pipeline which
    languages the tokenizer under-serves.  Word contract
    ``[a-z0-9_]+`` over lowercased text (the BPE/top_tokens contract);
    langs whose slice has no words emit no row.  Output (lang,
    n_word_tokens, n_bpe_tokens, fertility_ppm) sorted by lang.

    Scale shape: training is docs_bpe_merges' vocab-table exchange;
    application needs NO word exchange at all — symbol counts are
    additive over occurrences, so each batch tokenizes, replays the ≤
    ``rounds`` pinned merges with vectorized sentinel replaces on its
    batch-distinct words, and emits per-lang (Σwords, Σsymbols)
    partials; the driver merges ≤ |langs|·blocks rows."""
    merges = docs_bpe_merges(sf_dir, rounds=rounds)
    patreps = [(_bpe_wrap(r.s1) + _bpe_wrap(r.s2), _bpe_wrap(r.s1 + r.s2))
               for r in merges.itertuples(index=False)]
    ds = _docs(sf_dir, ["lang", "text"])
    cols = ("lang", "n_word_tokens", "n_bpe_tokens", "fertility_ppm")
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n_word_tokens": pd.Series([], dtype="int64"),
        "n_bpe_tokens": pd.Series([], dtype="int64"),
        "fertility_ppm": pd.Series([], dtype="int64")})

    def partial(t: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for lg, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in re.findall(r"[a-z0-9_]+", (tx or "").lower()):
                c[(lg, w)] += 1
        if not c:
            return pd.DataFrame({
                "lang": pd.Series([], dtype=object),
                "nw": pd.Series([], dtype="int64"),
                "nb": pd.Series([], dtype="int64")})
        langs = [k[0] for k in c]
        words = [k[1] for k in c]
        n = np.array(list(c.values()), dtype="int64")
        s = pd.Series(["".join(_bpe_wrap(ch) for ch in w)
                       for w in words], dtype=object)
        for pat, rep in patreps:
            s = s.str.replace(pat, rep, regex=False)
        syms = s.str.count(_BPE_S1).to_numpy(dtype="int64")
        df = pd.DataFrame({"lang": langs, "nw": n, "nb": n * syms})
        out = df.groupby("lang", as_index=False)[["nw", "nb"]].sum()
        out["nw"] = out["nw"].astype("int64")
        out["nb"] = out["nb"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or "lang" not in parts.columns:
        return empty
    # object-dtype Python ints: nb·10⁶ passes 2⁶³ on a web corpus (the
    # SQL side is HUGEINT automatically via SUM(BIGINT))
    parts["nw"] = parts["nw"].map(int).astype(object)
    parts["nb"] = parts["nb"].map(int).astype(object)
    g = parts.groupby("lang", as_index=False)[["nw", "nb"]].sum()
    g["fertility_ppm"] = [int(b) * 1_000_000 // int(w)
                          for b, w in zip(g["nb"], g["nw"])]
    g = g.rename(columns={"nw": "n_word_tokens", "nb": "n_bpe_tokens"})
    for c in cols[1:]:
        g[c] = g[c].astype("int64")
    return g[list(cols)].sort_values("lang").reset_index(drop=True)


def emb_pq_recall(sf_dir: str, n_sub: int = _PQ_SUBSPACES,
                  k_cent: int = _PQ_K, k: int = 10) -> pd.DataFrame:
    """Recall@``k`` of PQ/ADC search vs exact L2 for query vec 0 — the
    third leg of the quantization-audit family (emb_hamming_recall,
    emb_ivf_recall): how many of the true ``k`` nearest survive the
    64-float → ``n_sub``-byte compression.  The query is excluded from
    both candidate sets; both rankings round to 6 decimals and break
    ties by vec_id (the emb_pq_codes float contract).  Output one row
    (query_vec_id, n_hits, recall_ppm).

    Scale shape: ONE streaming pass emits per-block top-k partials for
    BOTH metrics (ADC touches only the broadcast codebook + LUT; the
    exact leg is a row-local vectorized distance), so the driver merge
    is ≤ 2·k·blocks projection rows — the emb_knn argument."""
    import pyarrow.parquet as pq_mod
    import ray

    t = pq_mod.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", k_cent)])
    empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                          for c in ("query_vec_id", "n_hits",
                                    "recall_ppm")})
    if len(t) == 0:
        return empty
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    dim = cb.shape[1]
    sub = dim // n_sub
    q = _query_vec(sf_dir, 0).astype(np.float64).reshape(n_sub, sub)
    cbs = cb.reshape(cb.shape[0], n_sub, sub)
    diff = q[None, :, :] - cbs
    lut = np.round((diff * diff).sum(axis=-1).T, 6)  # (n_sub, k_cent)
    cb_ref = ray.put(cbs)
    lut_ref = ray.put(lut)
    q_ref = ray.put(q)

    def block_partial(batch: pa.Table) -> pd.DataFrame:
        cols = ("vec_id", "metric", "kind")
        ids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype("int64")
        keep = ids != 0
        if not keep.any():
            return pd.DataFrame(
                {c: pd.Series([], dtype="float64" if c == "metric"
                              else "int64") for c in cols})
        ids = ids[keep]
        v = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)
                     [keep]).astype(np.float64) \
            .reshape(len(ids), n_sub, sub)
        cbk, lt, qq = ray.get(cb_ref), ray.get(lut_ref), ray.get(q_ref)
        adc = np.zeros(len(ids), dtype=np.float64)
        exact = np.zeros(len(ids), dtype=np.float64)
        for s in range(n_sub):
            d = np.round(((v[:, None, s, :] - cbk[None, :, s, :]) ** 2)
                         .sum(axis=-1), 6)
            adc += lt[s][np.argmin(d, axis=1)]
            exact += ((v[:, s, :] - qq[s]) ** 2).sum(axis=-1)
        adc = np.round(adc, 6)
        exact = np.round(exact, 6)
        take = min(k, len(ids))
        asel = np.lexsort((ids, adc))[:take]
        esel = np.lexsort((ids, exact))[:take]
        return pd.concat([
            pd.DataFrame({"vec_id": ids[asel], "metric": adc[asel],
                          "kind": 0}),
            pd.DataFrame({"vec_id": ids[esel], "metric": exact[esel],
                          "kind": 1})], ignore_index=True)

    parts = _emb(sf_dir).map_batches(block_partial,
                                     batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or "vec_id" not in parts.columns:
        return empty
    approx = parts[parts["kind"] == 0] \
        .sort_values(["metric", "vec_id"]).head(k)["vec_id"]
    exact10 = parts[parts["kind"] == 1] \
        .sort_values(["metric", "vec_id"]).head(k)["vec_id"]
    hits = len(set(approx) & set(exact10))
    return pd.DataFrame({
        "query_vec_id": pd.Series([0], dtype="int64"),
        "n_hits": pd.Series([hits], dtype="int64"),
        "recall_ppm": pd.Series([hits * 1_000_000 // k], dtype="int64")})


# ---------------------------------------------------------------------------
# character-class census (encoding-hygiene signal: a corpus slice whose
# non-ascii / digit / punctuation mass drifts is the first symptom of
# mojibake or template spam in a web crawl)
# ---------------------------------------------------------------------------


def docs_charclass_census(sf_dir: str) -> pd.DataFrame:
    """Per-language character-class counts over the corpus: lowercase,
    uppercase, digit, space, and everything else, plus doc/char totals.

    Scale shape: per-batch RE2 count kernels (pyarrow
    ``count_substring_regex`` — the same RE2 engine DuckDB's regexes run
    on, so class semantics match by construction) collapse each block to
    ≤ |langs| partial rows; one tiny groupby merges partials.  No
    exchange carries text."""
    ds = _docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = ("lang", "n_docs", "n_chars", "n_lower", "n_upper",
                "n_digit", "n_space", "n_other")
        if len(t) == 0:
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c == "lang" else "int64") for c in cols})
        df = pd.DataFrame({"lang": t["lang"].to_pandas()})
        df["n_chars"] = pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype("int64")
        for col, pat in (("n_lower", "[a-z]"), ("n_upper", "[A-Z]"),
                         ("n_digit", "[0-9]"), ("n_space", " ")):
            df[col] = pc.count_substring_regex(t["text"], pat).to_numpy(
                zero_copy_only=False).astype("int64")
        df["n_other"] = (df["n_chars"] - df["n_lower"] - df["n_upper"]
                         - df["n_digit"] - df["n_space"])
        df["n_docs"] = 1
        return df.groupby("lang", as_index=False)[list(cols[1:])].sum()

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "lang" else "int64")
            for c in ("lang", "n_docs", "n_chars", "n_lower", "n_upper",
                      "n_digit", "n_space", "n_other")})
    out = out.groupby("lang", as_index=False).sum()
    for c in out.columns:
        if c != "lang":
            out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# media context windows: the alt-text-style ±2-token window around every
# media span of the interleaved corpus — the extraction step an
# image-caption training pipeline runs before caption filtering
# ---------------------------------------------------------------------------


def docs_media_context(sf_dir: str) -> pd.DataFrame:
    """For every media span in the interleaved corpus (one span per
    trigger-prefixed token, positional refs — the
    docs_interleaved_media_stats synthesis), emit the surrounding ±2-token
    text window: (doc_id, pos, media_ref, context).

    Scale shape: span synthesis through the REAL codec plus window
    extraction are one row-local Arrow batch transform — media spans and
    their contexts leave the workers as finished projection rows; text
    bodies never enter an exchange."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    cols = ("doc_id", "pos", "media_ref", "context")

    def windows(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "media_ref": pd.Series([], dtype=object),
                "context": pd.Series([], dtype=object)})
        inter = _interleaved_with_media(t, positional_refs=True)
        texts = t["text"].to_pylist()
        dids, poss, refs, ctxs = [], [], [], []
        for did, tx, spans in zip(inter["doc_id"].to_pylist(), texts,
                                  inter["spans"].to_pylist()):
            toks = (tx or "").lower().split()
            for s in spans:
                if s["kind"] != "media":
                    continue
                pos = int(s["media_ref"].rsplit("/", 1)[1])  # 1-based
                lo = max(0, pos - 3)
                ctx = " ".join(toks[lo:pos + 2])
                dids.append(int(did))
                poss.append(pos)
                refs.append(s["media_ref"])
                ctxs.append(ctx)
        return pd.DataFrame({"doc_id": pd.Series(dids, dtype="int64"),
                             "pos": pd.Series(poss, dtype="int64"),
                             "media_ref": pd.Series(refs, dtype=object),
                             "context": pd.Series(ctxs, dtype=object)})

    out = ds.map_batches(windows, batch_format="pyarrow").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "pos": pd.Series([], dtype="int64"),
            "media_ref": pd.Series([], dtype=object),
            "context": pd.Series([], dtype=object)})
    return out[list(cols)].sort_values(["doc_id", "pos"]) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-cluster fit statistics on top of the spherical k-means assignment
# contract: size + integer-micro cosine distortion (sum and max) — the
# cluster-balance / quantization-error audit a curriculum or IVF build reads
# ---------------------------------------------------------------------------


def emb_cluster_stats(sf_dir: str, n_seeds: int = 8) -> pd.DataFrame:
    """Per-cluster fit of the one-pass spherical k-means assignment
    (seeds = vec_id < n_seeds): member count, summed and max cosine
    distortion in integer micro units (1e6 − round(cos·1e6)).

    The assignment argmax runs on ``round(cos·1e6)`` (ties → lowest
    centroid id) so the distortion integers and the cluster membership
    derive from ONE rounding of each score — summation-order
    independent, and int64-safe (1e9 members × 1e6 ≈ 1e15 < 2⁶³).

    Scale shape: the (n_seeds × dim) centroid matrix is one ``ray.put``
    broadcast; each block emits ≤ n_seeds partial rows (count / sum /
    max merge associatively); the driver folds ≤ n_seeds × blocks rows."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_seeds)])
    cols = ("cluster_id", "n_members", "distortion_micro", "max_dist_micro")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    if len(t) == 0:
        return empty
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    cents = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]) \
        .astype(np.float64)
    cents_ref = ray.put(cents)

    def partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return empty
        c = ray.get(cents_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        sm = np.round(np.column_stack(
            [cosine_scores(vecs, c[j]) for j in range(c.shape[0])])
            * 1_000_000).astype("int64")
        best = np.argmax(sm, axis=1)          # first max → lowest cid
        dist = 1_000_000 - sm[np.arange(len(sm)), best]
        agg = pd.DataFrame({"cluster_id": best.astype("int64"),
                            "dist": dist}) \
            .groupby("cluster_id", as_index=False) \
            .agg(n_members=("dist", "size"),
                 distortion_micro=("dist", "sum"),
                 max_dist_micro=("dist", "max"))
        return agg

    parts = _emb(sf_dir).map_batches(partial,
                                     batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or "cluster_id" not in parts.columns:
        return empty
    out = parts.groupby("cluster_id", as_index=False).agg(
        n_members=("n_members", "sum"),
        distortion_micro=("distortion_micro", "sum"),
        max_dist_micro=("max_dist_micro", "max"))
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("cluster_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# NN-descent: one neighbors-of-neighbors refinement round over a trivially
# seeded k-NN graph (ring init), audited on a FIXED 16-query sample — the
# graph-ANN construction step (NN-descent / HNSW-family) expressed as
# bucketed exchanges + per-bucket top-k.
# ---------------------------------------------------------------------------

_NND_K = 3
_NND_NQ = 16


def emb_nn_descent(sf_dir: str, k: int = _NND_K,
                   n_q: int = _NND_NQ) -> pd.DataFrame:
    """Audit of one NN-descent round: per round r ∈ {0 = ring init,
    1 = refined with candidates = neighbors ∪ reverse neighbors ∪
    neighbors-of-neighbors, keep top-k by ``round(cos·10⁶)`` with
    nb-asc ties}, emit (round, n_queries, recall_ppm, sum_best_sm,
    n_edges): recall@k vs exact top-k on the fixed ``vec_id < 16``
    query sample, the summed per-query best neighbor score (monotone
    non-decreasing across rounds BY CONSTRUCTION — the live signal even
    when recall stays 0 on an unclustered corpus), and the round's
    total neighbor-edge count (observes the full distributed build, not
    just the sample).

    Scale shape: the neighbor table is O(n·k) rows; refinement is one
    int-keyed hash join (neighbors-of-neighbors) plus two bucketed
    tagged-union exchanges that gather endpoint vectors as opaque
    float64 bytes (pyarrow's acero join rejects list payloads, and a
    pandas union of tensor-typed and absent columns won't concat) and a
    src-bucket top-k.  Only the exact audit (bounded query sample,
    broadcast query matrix, per-block partial top-k) touches every pair
    for the sampled queries; the driver folds sample-sized frames."""
    import ray

    emb = _emb(sf_dir).materialize()
    n = emb.count()
    if n == 0:
        # SQL twin semantics: the two audit rows survive an empty table
        return pd.DataFrame({
            "round": pd.Series([0, 1], dtype="int64"),
            "n_queries": pd.Series([0, 0], dtype="int64"),
            "recall_ppm": pd.Series([0, 0], dtype="int64"),
            "sum_best_sm": pd.Series([0, 0], dtype="int64"),
            "n_edges": pd.Series([0, 0], dtype="int64")})

    def ring(t: pa.Table) -> pd.DataFrame:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        src = np.repeat(ids, k)
        nb = (src + np.tile(np.arange(1, k + 1, dtype="int64"),
                            len(ids))) % n
        keep = nb != src
        return pd.DataFrame({"src": src[keep],
                             "nb": nb[keep]}).drop_duplicates()

    nb0 = emb.select_columns(["vec_id"]) \
        .map_batches(ring, batch_format="pyarrow").materialize()
    n_edges0 = nb0.count()

    n_parts = max(1, min(8, n // 100_000 + 1))

    def flip(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df["nb"].astype("int64"),
                             "nb": df["src"].astype("int64")})

    rev = nb0.map_batches(flip, batch_format="pandas")
    nb0r = nb0.map_batches(
        lambda df: pd.DataFrame({"s2": df["src"].astype("int64"),
                                 "n2": df["nb"].astype("int64")}),
        batch_format="pandas").materialize()
    non = nb0.join(nb0r, join_type="inner", num_partitions=n_parts,
                   on=("nb",), right_on=("s2",)) \
        .map_batches(lambda df: pd.DataFrame(
            {"src": df["src"].astype("int64"),
             "nb": df["n2"].astype("int64")}), batch_format="pandas")

    def tag0(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "nb"]].copy()
        out["is0"] = np.int64(1)
        return out

    def tag_other(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "nb"]].copy()
        out["is0"] = np.int64(0)
        return out

    def cand_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["nb"]]
        out = df.groupby(["src", "nb"], as_index=False)["is0"].max()
        return out

    def bucket_s(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_s"] = (df["src"].astype("int64") % 64).astype("int64")
        return df

    cand = nb0.map_batches(tag0, batch_format="pandas") \
        .union(rev.map_batches(tag_other, batch_format="pandas"),
               non.map_batches(tag_other, batch_format="pandas")) \
        .map_batches(bucket_s, batch_format="pandas") \
        .groupby("_s").map_groups(cand_bucket, batch_format="pandas") \
        .materialize()

    # gather both endpoint vectors through two bucketed tagged-union
    # exchanges; vectors ride as opaque float64 bytes
    def emb_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"a": df["vec_id"].astype("int64")})
        out["b"] = np.int64(-1)
        out["is0"] = np.int64(0)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        out["vec"] = [v.tobytes() for v in vecs]
        out["kind"] = np.int64(0)
        out["_g"] = (out["a"] % 64).astype("int64")
        return out

    emb_tagged = emb.map_batches(emb_rows, batch_format="pandas") \
        .materialize()

    def cand_by_nb(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"a": df["nb"].astype("int64"),
                            "b": df["src"].astype("int64"),
                            "is0": df["is0"].astype("int64")})
        out["vec"] = b""
        out["kind"] = np.int64(1)
        out["_g"] = (out["a"] % 64).astype("int64")
        return out

    def attach_vec(df: pd.DataFrame) -> pd.DataFrame:
        """kind-0 = (a=vec_id, vec); kind-1 = (a=key, b=other endpoint).
        Emits flipped rows keyed on the other endpoint, carrying the
        looked-up vector."""
        e = df[df["kind"] == 0][["a", "vec"]]
        c = df[df["kind"] == 1][["a", "b", "is0"]]
        m = c.merge(e, on="a", how="inner")
        out = pd.DataFrame({"a": m["b"].astype("int64"),
                            "b": m["a"].astype("int64"),
                            "is0": m["is0"].astype("int64")})
        out["vec"] = m["vec"]
        out["kind"] = np.int64(1)
        out["_g"] = (out["a"] % 64).astype("int64")
        return out

    with_nbv = cand.map_batches(cand_by_nb, batch_format="pandas") \
        .union(emb_tagged) \
        .groupby("_g").map_groups(attach_vec, batch_format="pandas")

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["kind"] == 0][["a", "vec"]].rename(
            columns={"vec": "sv"})
        c = df[df["kind"] == 1][["a", "b", "is0", "vec"]]
        m = c.merge(e, on="a", how="inner")
        if len(m) == 0:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "nb": pd.Series([], dtype="int64"),
                                 "is0": pd.Series([], dtype="int64"),
                                 "sm": pd.Series([], dtype="int64")})
        a = np.frombuffer(b"".join(m["sv"].tolist()),
                          dtype=np.float64).reshape(len(m), -1)
        b = np.frombuffer(b"".join(m["vec"].tolist()),
                          dtype=np.float64).reshape(len(m), -1)
        sims = np.einsum("ij,ij->i", a, b) / (
            np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1)))
        return pd.DataFrame({"src": m["a"].astype("int64"),
                             "nb": m["b"].astype("int64"),
                             "is0": m["is0"].astype("int64"),
                             "sm": np.round(sims * 1_000_000)
                             .astype("int64")})

    scored = with_nbv.union(emb_tagged) \
        .groupby("_g").map_groups(score_bucket, batch_format="pandas") \
        .materialize()

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["src", "sm", "nb"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("src", sort=False).head(k)[["src", "nb"]]

    n_edges1 = scored.map_batches(bucket_s, batch_format="pandas") \
        .groupby("_s").map_groups(topk_bucket, batch_format="pandas") \
        .count()

    # exact top-k for the fixed query sample (broadcast query matrix,
    # per-block partial top-k — the emb_knn audit shape)
    def q_filter(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        return t.filter(pa.array(ids < n_q))

    qt = emb.map_batches(q_filter, batch_format="pyarrow").to_pandas()
    q_ids = qt["vec_id"].to_numpy(dtype="int64")
    q_mat = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    q_ref = ray.put((q_ids, q_mat))

    def exact_partial(t: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "nb": pd.Series([], dtype="int64"),
                              "sm": pd.Series([], dtype="int64")})
        if len(t) == 0:
            return empty
        qids, qm = ray.get(q_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        sims = (m @ qm.T) / np.outer(
            np.sqrt((m * m).sum(axis=1)), np.sqrt((qm * qm).sum(axis=1)))
        sm = np.round(sims * 1_000_000).astype("int64")
        frames = []
        for j, qid in enumerate(qids):
            keep = ids != qid
            take = min(k, int(keep.sum()))
            if take == 0:
                continue
            order = np.lexsort((ids[keep], -sm[keep, j]))[:take]
            frames.append(pd.DataFrame({
                "src": np.full(take, qid, dtype="int64"),
                "nb": ids[keep][order], "sm": sm[keep, j][order]}))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    ex_parts = emb.map_batches(exact_partial,
                               batch_format="pyarrow").to_pandas()
    if len(ex_parts) == 0 or "src" not in ex_parts.columns:
        ex = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                           "nb": pd.Series([], dtype="int64")})
    else:
        ex = ex_parts.sort_values(
            ["src", "sm", "nb"], ascending=[True, False, True],
            kind="mergesort").groupby("src", sort=False).head(k)[
            ["src", "nb"]]
    denom = len(ex)

    # bounded sample frame: every scored candidate row of the 16 queries
    def sample_filter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["src"].astype("int64") < n_q]

    smp = scored.map_batches(sample_filter,
                             batch_format="pandas").to_pandas()
    if len(smp) == 0 or "src" not in smp.columns:
        smp = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                            "nb": pd.Series([], dtype="int64"),
                            "is0": pd.Series([], dtype="int64"),
                            "sm": pd.Series([], dtype="int64")})
    smp0 = smp[smp["is0"] == 1]
    smp1 = smp.sort_values(["src", "sm", "nb"],
                           ascending=[True, False, True],
                           kind="mergesort") \
        .groupby("src", sort=False).head(k)
    hits0 = len(smp0[["src", "nb"]].merge(ex, on=["src", "nb"]))
    hits1 = len(smp1[["src", "nb"]].merge(ex, on=["src", "nb"]))
    best0 = int(smp0.groupby("src")["sm"].max().sum())
    best1 = int(smp1.groupby("src")["sm"].max().sum())
    nq_eff = len(q_ids)
    return pd.DataFrame({
        "round": pd.Series([0, 1], dtype="int64"),
        "n_queries": pd.Series([nq_eff, nq_eff], dtype="int64"),
        "recall_ppm": pd.Series(
            [hits0 * 1_000_000 // denom if denom else 0,
             hits1 * 1_000_000 // denom if denom else 0], dtype="int64"),
        "sum_best_sm": pd.Series([best0, best1], dtype="int64"),
        "n_edges": pd.Series([n_edges0, n_edges1], dtype="int64")})


# ---------------------------------------------------------------------------
# chi-square term selection per language: which words are most
# ASSOCIATED with each language's documents (the classic feature-
# selection statistic over doc-presence contingency tables)
# ---------------------------------------------------------------------------

_CHI2_MIN_SUPPORT = 25
_CHI2_TOP_K = 5


def docs_chi2_terms(sf_dir: str) -> pd.DataFrame:
    """Top-5 words per language by χ² over the 2×2 doc-presence table,
    (lang, word, chi2_micro) ordered (lang, chi2_micro desc, word).
    With a = |docs of lang with word|, wt = |docs with word|,
    lt = |docs of lang|, n = |docs|, the statistic reduces to
    ``χ² = n·(a·n − wt·lt)² / (wt(n−wt)·lt(n−lt))`` — reported as
    ``chi2_micro = ⌊χ²·10⁶⌋`` with degenerate margins (wt or lt ∈
    {0, n}) pinned to 0.  Low-support words (wt < 25) are excluded
    BEFORE scoring (the docs_bigram_lift ordering).

    Scale shape: per-block distinct-(word, lang) presence partials merge
    under the 64-way word-hash bucket (a word's full contingency row
    assembles in exactly one bucket; the vocabulary never reaches the
    driver); language totals are a bounded broadcast.  χ² numerators are
    Python big-ints (n·(a·n)²·10⁶ passes 2⁶³ on a web corpus — the SQL
    twin is HUGEINT) over the min-support-filtered candidate set only,
    and each bucket emits at most top-k×|langs| candidate rows, so the
    driver merge is exact and bounded."""
    ds = _docs(sf_dir, ["lang", "text"])

    lp = _docs(sf_dir, ["lang"]).map_batches(
        lambda df: df.groupby("lang", as_index=False).size()
        .rename(columns={"size": "c"}),
        batch_format="pandas").to_pandas()
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "word": pd.Series([], dtype=object),
        "chi2_micro": pd.Series([], dtype="int64")})
    if lp.empty:
        return empty
    lt_map = lp.groupby("lang")["c"].sum().to_dict()
    n = int(sum(lt_map.values()))
    langs = sorted(lt_map)

    def partial(t: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for lg, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in set(re.findall(r"[a-z0-9_]+", (tx or "").lower())):
                c[(w, lg)] += 1
        out = pd.DataFrame({
            "word": [k[0] for k in c],
            "lang": [k[1] for k in c],
            "a": pd.Series([c[k] for k in c], dtype="int64")})
        out["_b"] = _word_bucket_col(out["word"])
        return out

    def word_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"lang": pd.Series([], dtype=object),
                "word": pd.Series([], dtype=object),
                "chi2_micro": pd.Series([], dtype="int64")}
        if len(df) == 0 or "word" not in df.columns:
            return pd.DataFrame(cols)
        g = df.groupby(["word", "lang"])["a"].sum()
        wt = g.groupby(level="word").sum()
        keep = wt[wt >= _CHI2_MIN_SUPPORT]
        rows = []
        for word, w_total in keep.items():
            w_total = int(w_total)
            for lg in langs:
                lt = lt_map[lg]
                if w_total in (0, n) or lt in (0, n):
                    chi2 = 0
                else:
                    a = int(g.get((word, lg), 0))
                    num = n * (a * n - w_total * lt) ** 2 * 1_000_000
                    den = w_total * (n - w_total) * lt * (n - lt)
                    chi2 = num // den
                rows.append((lg, word, chi2))
        if not rows:
            return pd.DataFrame(cols)
        out = pd.DataFrame(rows, columns=["lang", "word", "chi2_micro"])
        out["chi2_micro"] = out["chi2_micro"].astype("int64")
        # bounded candidate emission: global per-lang top-k is a subset
        # of the per-bucket per-lang top-k (words live in one bucket)
        out = out.sort_values(["lang", "chi2_micro", "word"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby("lang", as_index=False).head(_CHI2_TOP_K)

    cands = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(word_bucket, batch_format="pandas") \
        .to_pandas()
    if cands.empty or "lang" not in cands.columns:
        return empty
    cands = cands.sort_values(["lang", "chi2_micro", "word"],
                              ascending=[True, False, True],
                              kind="mergesort")
    out = cands.groupby("lang", as_index=False).head(_CHI2_TOP_K) \
        .reset_index(drop=True)
    out["chi2_micro"] = out["chi2_micro"].astype("int64")
    return out[["lang", "word", "chi2_micro"]]


# ---------------------------------------------------------------------------
# DBSCAN over embeddings: density-based clustering under cosine
# similarity — the radius-rule sibling of emb_snn_components' mutual-kNN
# (fixed eps instead of adaptive k; core/border/noise trichotomy)
# ---------------------------------------------------------------------------

_DBSCAN_COS = 0.32        # neighbor ⇔ ROUND(cos, 6) ≥ this (eps in cos space)
_DBSCAN_MINPTS = 4        # core ⇔ ≥ this many neighbors (self excluded)


def emb_dbscan(sf_dir: str, thr: float = _DBSCAN_COS,
               min_pts: int = _DBSCAN_MINPTS) -> pd.DataFrame:
    """(cluster_id, n_core, n_border, vec_checksum) sorted: DBSCAN under
    cosine similarity — a neighbor is any OTHER vector with
    ``ROUND(cos, 6) ≥ thr``; core points have ≥ ``min_pts`` neighbors;
    clusters are connected components of the core–core neighbor graph
    labeled by their minimum core vec_id; border points (non-core with
    ≥1 core neighbor) join the MINIMUM cluster label among their core
    neighbors — the deterministic pin replacing classical DBSCAN's
    arrival-order border assignment; noise emits nothing.
    ``vec_checksum`` sums core+border member ids.  Thresholds are
    calibrated to the synthetic table so clusters, border AND noise are
    all live at both gate scales (0.32/4 → ~11 clusters, ~200 border,
    ~180 noise on 500 vectors).

    Scale shape: the emb_snn_components broadcast contract — the unit
    matrix ships ONCE via ``ray.put`` and each block does one matmul
    per pass (documented N·d object-store budget; beyond it the
    neighbor pass swaps to the emb_ivf_recall bucketed scan).  Pass 1
    computes exact global neighbor counts (block rows × all columns);
    pass 2 emits a tagged union — core–core edges (with per-core
    self-rows so singleton-core clusters survive) and border→core
    links.  Components auto-switch like the dedup resolver: ≤2M
    core-core edges fold on the driver via union-find (smaller-root
    wins, so the root IS the min id — O(Eα) beats O(diameter)
    join-rounds on dense cores); bigger graphs run in
    label_components' min-label exchange.  The core-id set and the
    (≤ n_core)-row label table fold on the driver: the same
    bounded-side budget the snn matrix assembly already spends."""
    import ray

    ds = _emb(sf_dir).materialize()
    empty = pd.DataFrame({
        "cluster_id": pd.Series([], dtype="int64"),
        "n_core": pd.Series([], dtype="int64"),
        "n_border": pd.Series([], dtype="int64"),
        "vec_checksum": pd.Series([], dtype="int64")})

    all_ids, M = _emb_matrix(ds)
    if all_ids is None:
        return empty
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mh = M / norms[:, None]
    m_ref = ray.put(Mh)
    ids_ref = ray.put(all_ids)

    def block_cos(t: pa.Table):
        """(bids, cs) for a block vs the broadcast matrix, self = −2."""
        bids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(bids) == 0:
            return bids, None, None
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        bn = np.linalg.norm(vecs, axis=1)
        bn[bn == 0] = 1.0
        mh, aid = ray.get(m_ref), ray.get(ids_ref)
        cs = np.round((vecs / bn[:, None]) @ mh.T, 6)
        self_col = np.searchsorted(aid, bids)
        cs[np.arange(len(bids)), self_col] = -2.0
        return bids, cs, aid

    def nbr_counts(t: pa.Table) -> pd.DataFrame:
        bids, cs, _ = block_cos(t)
        if cs is None:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "n_nbrs": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "vec_id": pd.Series(bids, dtype="int64"),
            "n_nbrs": pd.Series((cs >= thr).sum(axis=1), dtype="int64")})

    deg = ds.map_batches(nbr_counts, batch_format="pyarrow").to_pandas()
    core_ids = np.sort(deg[deg["n_nbrs"] >= min_pts]["vec_id"]
                       .to_numpy(dtype="int64"))
    if len(core_ids) == 0:
        return empty
    core_ref = ray.put(core_ids)

    def tagged(t: pa.Table) -> pd.DataFrame:
        cols = {"kind": pd.Series([], dtype="int64"),
                "x": pd.Series([], dtype="int64"),
                "y": pd.Series([], dtype="int64")}
        bids, cs, aid = block_cos(t)
        if cs is None:
            return pd.DataFrame(cols)
        cset = ray.get(core_ref)
        pos = np.searchsorted(cset, aid)
        pos[pos >= len(cset)] = len(cset) - 1
        col_core = cset[pos] == aid
        rpos = np.searchsorted(cset, bids)
        rpos[rpos >= len(cset)] = len(cset) - 1
        row_core = cset[rpos] == bids
        hitc = (cs >= thr) & col_core[None, :]
        parts = []
        if row_core.any():
            ii, jj = np.where(hitc[row_core])
            src = bids[row_core][ii]
            dst = aid[jj]
            parts.append(pd.DataFrame({
                "kind": np.zeros(len(src), dtype="int64"),
                "x": np.minimum(src, dst), "y": np.maximum(src, dst)}))
            selfs = bids[row_core]
            parts.append(pd.DataFrame({
                "kind": np.zeros(len(selfs), dtype="int64"),
                "x": selfs, "y": selfs}))
        if (~row_core).any():
            ii, jj = np.where(hitc[~row_core])
            parts.append(pd.DataFrame({
                "kind": np.ones(len(ii), dtype="int64"),
                "x": bids[~row_core][ii], "y": aid[jj]}))
        if not parts:
            return pd.DataFrame(cols)
        out = pd.concat(parts, ignore_index=True).drop_duplicates()
        return out.astype({"kind": "int64", "x": "int64", "y": "int64"})

    tg = ds.map_batches(tagged, batch_format="pyarrow").materialize()

    def as_edges(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a_id": pd.Series([], dtype="int64"),
                "b_id": pd.Series([], dtype="int64"),
                "a_seq": pd.Series([], dtype="int64"),
                "b_seq": pd.Series([], dtype="int64")}
        if len(df) == 0 or "kind" not in df.columns:
            return pd.DataFrame(cols)
        d = df[df["kind"] == 0]
        return pd.DataFrame({"a_id": d["x"].astype("int64"),
                             "b_id": d["y"].astype("int64"),
                             "a_seq": d["x"].astype("int64"),
                             "b_seq": d["y"].astype("int64")})

    e0 = tg.map_batches(as_edges, batch_format="pandas").materialize()
    lab = _components_auto(e0)
    if lab.empty:
        return empty
    lab_ids = lab["id"].to_numpy(dtype="int64")
    order = np.argsort(lab_ids)
    lab_ids = lab_ids[order]
    lab_lab = lab["label"].to_numpy(dtype="int64")[order]
    lid_ref = ray.put(lab_ids)
    llb_ref = ray.put(lab_lab)

    def border_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"v": pd.Series([], dtype="int64"),
                "cid": pd.Series([], dtype="int64")}
        if len(df) == 0 or "kind" not in df.columns:
            return pd.DataFrame(cols)
        d = df[df["kind"] == 1]
        if len(d) == 0:
            return pd.DataFrame(cols)
        li, ll = ray.get(lid_ref), ray.get(llb_ref)
        cid = ll[np.searchsorted(li, d["y"].to_numpy(dtype="int64"))]
        out = pd.DataFrame({"v": d["x"].to_numpy(dtype="int64"),
                            "cid": cid})
        return out.groupby("v", as_index=False)["cid"].min()

    bparts = tg.map_batches(border_partial, batch_format="pandas") \
        .to_pandas()
    members = [pd.DataFrame({"v": lab_ids, "cid": lab_lab,
                             "is_core": np.ones(len(lab_ids),
                                                dtype="int64")})]
    if len(bparts) and "v" in bparts.columns and len(bparts["v"]):
        bb = bparts.groupby("v", as_index=False)["cid"].min()
        bb["is_core"] = np.zeros(len(bb), dtype="int64")
        members.append(bb)
    mem = pd.concat(members, ignore_index=True)
    out = mem.groupby("cid", as_index=False).agg(
        n_core=("is_core", "sum"),
        n_border=("v", "size"),
        vec_checksum=("v", "sum"))
    out["n_border"] = out["n_border"] - out["n_core"]
    out = out.rename(columns={"cid": "cluster_id"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("cluster_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Random-projection-tree ANN recall audit: a 2-level RP tree (pinned ±1
# hyperplanes, median splits) is the tree-index family next to the
# hashing (emb_hamming_recall), quantization (emb_pq_recall) and
# inverted-list (emb_ivf_recall) audits — same recall@k contract
# ---------------------------------------------------------------------------

_RPT_K = 10
_RPT_QUERY_MOD = 3
_RPT_QUERIES = 8


def _rpt_sign(i: int, node: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"rpt-{node}-{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def _rpt_median(vals: np.ndarray) -> float:
    """quantile_disc(…, 0.5): the element at ceil(n/2)−1 of the sorted
    values — the repo-wide discrete-median contract."""
    s = np.sort(vals)
    return float(s[(len(s) + 1) // 2 - 1])


def emb_rptree_recall(sf_dir: str, k: int = _RPT_K,
                      mod: int = _RPT_QUERY_MOD,
                      n_queries: int = _RPT_QUERIES) -> pd.DataFrame:
    """(qid, leaf_id, n_leaf, n_hit, recall_ppm) sorted by qid: build a
    2-level random-projection tree — root plane and one plane per child,
    ±1 signs pinned by md5 (`_rpt_sign`), each node split at the
    quantile_disc MEDIAN of the projections of the vectors reaching it
    (projections accumulate left-to-right in input-dim order and ROUND
    6, the emb_random_projection association contract) — then audit
    recall@k of leaf-restricted search: for each of the ``n_queries``
    smallest vec_ids ≡ 0 (mod ``mod``), compare exact cosine top-k
    (ROUND 6, ties → smaller vec_id, self excluded) against the same
    ranking restricted to the query's leaf.  ``n_leaf`` is the leaf's
    candidate-pool size (self excluded); ``recall_ppm =
    n_hit·10⁶ // kk`` with kk = min(k, N−1).

    Scale shape: the emb_pq_recall contract — ONE streaming pass serves
    every query with two bounded top-k partials per (query, block)
    (full-pool and leaf-restricted), merged on the driver (≤
    2·k·queries·blocks rows).  The projection table (N×3) folds on the
    driver to take the three median order statistics — smaller than
    the snn family's N×64 matrix assembly, same documented budget; at
    web scale the medians would come from the docs_token_percentiles
    histogram exchange instead."""
    import ray

    ds = _emb(sf_dir).materialize()
    cols = ("qid", "leaf_id", "n_leaf", "n_hit", "recall_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    all_ids, M = _emb_matrix(ds)
    if all_ids is None:
        return empty

    signs = np.array([[_rpt_sign(i, node) for node in range(3)]
                      for i in range(64)], dtype=np.float64)
    acc = np.zeros((len(M), 3), dtype=np.float64)
    for i in range(64):        # left-to-right: the SQL association order
        acc += M[:, i:i + 1] * signs[i]
    P = np.round(acc, 6)
    t0 = _rpt_median(P[:, 0])
    right = P[:, 0] > t0
    # the left child always holds the median element; the right child
    # can be EMPTY (all-equal projections) — its threshold is then never
    # consulted (no member evaluates the comparison)
    t1 = _rpt_median(P[~right, 1])
    t2 = _rpt_median(P[right, 2]) if right.any() else 0.0
    leaf = np.where(right, 2 + (P[:, 2] > t2).astype("int64"),
                    (P[:, 1] > t1).astype("int64")).astype("int64")

    qmask = all_ids % mod == 0
    qids = all_ids[qmask][:n_queries]
    if len(qids) == 0:
        return empty
    qpos = np.searchsorted(all_ids, qids)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mh = M / norms[:, None]
    kk = min(k, len(all_ids) - 1)

    q_ref = ray.put(Mh[qpos])
    meta_ref = ray.put((qids, leaf[qpos], all_ids, leaf))

    def score_partial(t: pa.Table) -> pd.DataFrame:
        pcols = {"qid": pd.Series([], dtype="int64"),
                 "cand": pd.Series([], dtype="int64"),
                 "key": pd.Series([], dtype="int64"),
                 "variant": pd.Series([], dtype="int64")}
        bids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(bids) == 0:
            return pd.DataFrame(pcols)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        bn = np.linalg.norm(vecs, axis=1)
        bn[bn == 0] = 1.0
        qU = ray.get(q_ref)
        qids_, qleaf_, aid_, leaf_ = ray.get(meta_ref)
        bleaf = leaf_[np.searchsorted(aid_, bids)]
        cs_i = np.round(np.round(qU @ (vecs / bn[:, None]).T, 6)
                        * 1_000_000).astype(np.int64)
        cs_i[qids_[:, None] == bids[None, :]] = -2_000_000   # self
        key = (-cs_i) * (1 << 33) + bids[None, :]
        rows = []
        for vi, mask in ((0, np.ones_like(cs_i, dtype=bool)),
                         (1, qleaf_[:, None] == bleaf[None, :])):
            kmask = np.where(mask, key, np.iinfo(np.int64).max)
            kt = min(kk, kmask.shape[1])
            idx = np.argpartition(kmask, kt - 1, axis=1)[:, :kt]
            kv = np.take_along_axis(kmask, idx, axis=1)
            keep = kv < np.iinfo(np.int64).max
            rows.append(pd.DataFrame({
                "qid": np.repeat(qids_, kt)[keep.ravel()],
                "cand": bids[idx.ravel()][keep.ravel()],
                "key": kv.ravel()[keep.ravel()],
                "variant": np.full(int(keep.sum()), vi, dtype="int64")}))
        out = pd.concat(rows, ignore_index=True)
        return out[out["key"] < (2_000_000 * (1 << 33))]  # drop self rows

    parts = ds.map_batches(score_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty or "qid" not in parts.columns:
        parts = pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                              "cand": pd.Series([], dtype="int64"),
                              "key": pd.Series([], dtype="int64"),
                              "variant": pd.Series([], dtype="int64")})
    rows = []
    leaf_sizes = {int(lf): int((leaf == lf).sum()) for lf in range(4)}
    for qi, ql in zip(qids, leaf[qpos]):
        g = parts[parts["qid"] == qi] if len(parts) else parts
        exact = set()
        ann = set()
        if len(g):
            ge = g[g["variant"] == 0].nsmallest(kk, "key")
            exact = set(ge["cand"].tolist())
            ga = g[g["variant"] == 1].nsmallest(kk, "key")
            ann = set(ga["cand"].tolist())
        n_hit = len(exact & ann)
        rows.append((int(qi), int(ql), leaf_sizes[int(ql)] - 1, n_hit,
                     n_hit * 1_000_000 // kk))
    out = pd.DataFrame({
        "qid": pd.Series([r[0] for r in rows], dtype="int64"),
        "leaf_id": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_leaf": pd.Series([r[2] for r in rows], dtype="int64"),
        "n_hit": pd.Series([r[3] for r in rows], dtype="int64"),
        "recall_ppm": pd.Series([r[4] for r in rows], dtype="int64")})
    return out.sort_values("qid").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Local Outlier Factor over embeddings: density-based anomaly scoring
# (the events_anomaly_mad sibling for vector space) — exact fixed-point
# contract so the twin hash-matches an inherently ratio-heavy statistic
# ---------------------------------------------------------------------------

_LOF_K = 3
_LOF_TOP = 10


def emb_lof(sf_dir: str, k: int = _LOF_K, top: int = _LOF_TOP) -> pd.DataFrame:
    """(vec_id, kdist_micro, lrd_ppm, lof_ppm) — the ``top`` highest-LOF
    vectors (ties → smaller vec_id): classic LOF with kk = min(k, N−1)
    neighbors under cosine distance ``d_micro = 10⁶ − cs_micro`` (cs
    ROUND 6, neighbor ties → smaller vec_id, self excluded), pinned
    fixed-point: reach(p,o) = max(d(p,o), kdist(o)); ``lrd_ppm =
    kk·10¹² // max(Σ reach, 1)`` (the max(…,1) keeps duplicate-cluster
    densities finite on both sides); ``lof_ppm = Σ lrd(o)·10⁶ //
    (kk·lrd(p))`` — >10⁶ marks points less dense than their neighbors.
    Σ lrd ≤ kk·kk·10¹² keeps the ·10⁶ product inside int64 for kk = 3;
    the twin computes in HUGEINT.

    Scale shape: the snn broadcast contract — every block ranks its own
    rows against the unit matrix ONCE and emits exact top-kk neighbor
    rows (full-matrix columns make the per-row top-k exact in-block, no
    cross-block merge); the N·kk neighbor-list fold (kdist join, reach
    sums, the two ratio levels) runs on the driver in Python ints —
    bounded by the same N·d budget the matrix broadcast already
    spends."""
    import ray

    ds = _emb(sf_dir).materialize()
    cols = ("vec_id", "kdist_micro", "lrd_ppm", "lof_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    all_ids, M = _emb_matrix(ds)
    if all_ids is None:
        return empty
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mh = M / norms[:, None]
    kk = min(k, len(all_ids) - 1)
    m_ref = ray.put(Mh)
    ids_ref = ray.put(all_ids)

    def knn_partial(t: pa.Table) -> pd.DataFrame:
        pcols = {"vec_id": pd.Series([], dtype="int64"),
                 "nbr": pd.Series([], dtype="int64"),
                 "d_micro": pd.Series([], dtype="int64")}
        bids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(bids) == 0:
            return pd.DataFrame(pcols)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        bn = np.linalg.norm(vecs, axis=1)
        bn[bn == 0] = 1.0
        mh, aid = ray.get(m_ref), ray.get(ids_ref)
        cs_i = np.round(np.round((vecs / bn[:, None]) @ mh.T, 6)
                        * 1_000_000).astype(np.int64)
        self_col = np.searchsorted(aid, bids)
        cs_i[np.arange(len(bids)), self_col] = -2_000_000
        key = (-cs_i) * (1 << 33) + aid[None, :]
        idx = np.argpartition(key, kk - 1, axis=1)[:, :kk]
        kv = np.take_along_axis(cs_i, idx, axis=1)
        return pd.DataFrame({
            "vec_id": np.repeat(bids, kk),
            "nbr": aid[idx.ravel()],
            "d_micro": (1_000_000 - kv.ravel()).astype("int64")})

    nn = ds.map_batches(knn_partial, batch_format="pyarrow").to_pandas()
    if nn.empty or "vec_id" not in nn.columns:
        return empty
    kdist = nn.groupby("vec_id")["d_micro"].max()
    kd = {int(i): int(v) for i, v in kdist.items()}
    reach_sum: dict = {}
    nbrs: dict = {}
    for r in nn.itertuples(index=False):
        p, o, d = int(r.vec_id), int(r.nbr), int(r.d_micro)
        reach_sum[p] = reach_sum.get(p, 0) + max(d, kd[o])
        nbrs.setdefault(p, []).append(o)
    lrd = {p: kk * 10**12 // max(s, 1) for p, s in reach_sum.items()}
    rows = []
    for p, os_ in nbrs.items():
        lof = sum(lrd[o] for o in os_) * 1_000_000 // (kk * lrd[p])
        rows.append((p, kd[p], lrd[p], lof))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:top]
    return pd.DataFrame({
        "vec_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "kdist_micro": pd.Series([r[1] for r in rows], dtype="int64"),
        "lrd_ppm": pd.Series([r[2] for r in rows], dtype="int64"),
        "lof_ppm": pd.Series([r[3] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# Broder CONTAINMENT pairs: the asymmetric near-subset signal — a doc
# whose 8-gram set lives ≥80% inside another is a quote/mirror/subset
# even when symmetric Jaccard (docs_ngram_dedup) stays low.  Boilerplate
# grams (df > floor) are dropped from the signal on BOTH sides, which is
# also what bounds per-gram pair generation at scale
# ---------------------------------------------------------------------------

_CONTAIN_N = 8
_CONTAIN_PPM = 800_000
_CONTAIN_DF_MAX = 32


def docs_containment(sf_dir: str, n: int = _CONTAIN_N,
                     thr_ppm: int = _CONTAIN_PPM,
                     df_max: int = _CONTAIN_DF_MAX) -> pd.DataFrame:
    """(src, dst, co, n_src, containment_ppm) sorted by (src, dst):
    DIRECTED pairs with ``co·10⁶ // n_src ≥ thr_ppm`` where co = shared
    distinct word-``n``-grams and n_src = the SOURCE doc's distinct
    grams — Broder containment, the asymmetric sibling of
    docs_ngram_dedup's resemblance.  Grams occurring in more than
    ``df_max`` documents are excluded from BOTH co and n_src (the
    pinned boilerplate floor): it keeps the signal about copying rather
    than stock phrases AND caps per-gram pair fan-out at df_max² —
    the scale bound that makes the gram-bucket pair generation safe on
    a web corpus.

    Scale shape: per-doc-distinct (gram-hash, doc) projections (text
    never ships) settle df under the gram-hash bucket; each surviving
    gram emits its ordered doc pairs (≤ df_max² each) into a pair-hash
    bucket where co settles exactly; kept-gram sizes settle under a
    doc-hash bucket and broadcast sorted via ray.put for the final
    threshold (the docs_crossdup plasma-membership budget — at 100 TB
    swap the broadcast for a shuffle join on src).  Hash collisions:
    the oracle compares exact gram strings, the engine 64-bit hashes —
    the docs_crossdup-documented negligible-inflation class, PLUS a
    second failure mode unique to the df floor: two distinct grams
    colliding into one 64-bit hash pool their document frequencies, and
    if the pooled df crosses ``df_max`` the engine silently DROPS both
    grams (pair deflation, surfacing as a gate hash mismatch rather
    than a caught error).  At 64-bit width the expected collision count
    over a test-scale vocabulary is ≪1; a paranoid deployment shrinks
    the surface further by salting the hash with the gram byte-length
    ((hash, len) as the key), which only same-length grams can
    collide."""
    import polars as pl
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])
    cols = ("src", "dst", "co", "n_src", "containment_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def gram_partial(t: pa.Table) -> pa.Table:
        grams: List[str] = []
        docs: List[int] = []
        for did, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            gs = set(mh.shingles(tx, n))
            grams.extend(gs)
            docs.extend([int(did)] * len(gs))
        if not grams:
            return pa.table({"gh": pa.array([], pa.uint64()),
                             "doc": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        gh = pl.Series(grams).hash(seed=0).to_numpy().astype(np.uint64)
        return pa.table({
            "gh": pa.array(gh, pa.uint64()),
            "doc": pa.array(docs, pa.int64()),
            "_b": pa.array((gh % 64).astype(np.int64), pa.int64())})

    def gram_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pcols = {"kind": pd.Series([], dtype="int64"),
                 "x": pd.Series([], dtype="int64"),
                 "y": pd.Series([], dtype="int64"),
                 "_k": pd.Series([], dtype="int64")}
        if len(df) == 0 or "gh" not in df.columns:
            return pd.DataFrame(pcols)
        dfreq = df["gh"].map(df["gh"].value_counts())
        keep = df[dfreq <= df_max]
        if len(keep) == 0:
            return pd.DataFrame(pcols)
        parts = []
        # per-doc kept-gram count partials (kind 1, routed by doc)
        sz = keep.groupby("doc", as_index=False).size()
        parts.append(pd.DataFrame({
            "kind": np.ones(len(sz), dtype="int64"),
            "x": sz["doc"].to_numpy(dtype="int64"),
            "y": sz["size"].to_numpy(dtype="int64"),
            "_k": (sz["doc"].to_numpy(dtype="int64") % 64)}))
        # ordered co-occurrence pairs (kind 0, routed by pair hash)
        m = keep.merge(keep, on="gh")
        m = m[m["doc_x"] != m["doc_y"]]
        if len(m):
            px = m["doc_x"].to_numpy(dtype="int64")
            py = m["doc_y"].to_numpy(dtype="int64")
            parts.append(pd.DataFrame({
                "kind": np.zeros(len(px), dtype="int64"),
                "x": px, "y": py,
                "_k": ((px * 1_000_003 + py) % 64)}))
        out = pd.concat(parts, ignore_index=True)
        out["_k"] = out["_k"].astype("int64")
        return out

    tagged = ds.map_batches(gram_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(gram_bucket, batch_format="pandas") \
        .materialize()

    def size_merge(df: pd.DataFrame) -> pd.DataFrame:
        scols = {"doc": pd.Series([], dtype="int64"),
                 "n_src": pd.Series([], dtype="int64")}
        if len(df) == 0 or "kind" not in df.columns:
            return pd.DataFrame(scols)
        d = df[df["kind"] == 1]
        if len(d) == 0:
            return pd.DataFrame(scols)
        g = d.groupby("x", as_index=False)["y"].sum()
        return pd.DataFrame({"doc": g["x"].astype("int64"),
                             "n_src": g["y"].astype("int64")})

    sizes = tagged.map_batches(size_merge, batch_format="pandas") \
        .to_pandas()
    if sizes.empty or "doc" not in sizes.columns or len(sizes) == 0:
        return empty
    sizes = sizes.groupby("doc", as_index=False)["n_src"].sum()
    sdocs = sizes["doc"].to_numpy(dtype="int64")
    order = np.argsort(sdocs)
    sdocs = sdocs[order]
    ssz = sizes["n_src"].to_numpy(dtype="int64")[order]
    d_ref = ray.put(sdocs)
    s_ref = ray.put(ssz)

    def pair_merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "kind" not in df.columns:
            return empty.copy()
        d = df[df["kind"] == 0]
        if len(d) == 0:
            return empty.copy()
        g = d.groupby(["x", "y"], as_index=False).size() \
            .rename(columns={"size": "co"})
        docs_, szs_ = ray.get(d_ref), ray.get(s_ref)
        n_src = szs_[np.searchsorted(docs_, g["x"].to_numpy(dtype="int64"))]
        cont = g["co"].to_numpy(dtype="int64") * 1_000_000 // n_src
        m = cont >= thr_ppm
        return pd.DataFrame({
            "src": g["x"].to_numpy(dtype="int64")[m],
            "dst": g["y"].to_numpy(dtype="int64")[m],
            "co": g["co"].to_numpy(dtype="int64")[m],
            "n_src": n_src[m],
            "containment_ppm": cont[m]})

    out = tagged.groupby("_k").map_groups(
        pair_merge, batch_format="pandas").to_pandas()
    if out.empty or "src" not in out.columns or len(out) == 0:
        return empty
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values(["src", "dst"]) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# kNN calibration (reliability table): does a 5/5 neighbor vote actually
# mean more than a 2/5 vote?  The evaluation layer over
# emb_knn_classify's prediction contract
# ---------------------------------------------------------------------------

_CAL_K = 5
_CAL_MOD = 5


def emb_knn_calibration(sf_dir: str, k: int = _CAL_K,
                        holdout_mod: int = _CAL_MOD) -> pd.DataFrame:
    """(votes, n, n_correct, acc_ppm) sorted by votes: hold out every
    vector with ``vec_id % holdout_mod == 0``, predict each one's label
    as the majority of its ``k`` nearest LABELED neighbors (ROUND-6
    cosine, neighbor ties → smaller vec_id, vote ties → smaller label —
    the emb_knn_classify pins), then bucket ALL holdout points by the
    winning vote count and report per-bucket accuracy — the reliability
    table that says whether vote share is a usable confidence signal.

    Scale shape: the labeled matrix broadcasts once (snn budget); each
    block classifies its own holdout rows against the full labeled
    column set (exact in-block top-k — no cross-block merge), reduces
    them to a ≤ k-row (votes, n, n_correct) partial via a one-hot
    label-count matrix (labels are a bounded domain; no per-row Python),
    and the driver folds ≤ k·blocks rows."""
    import ray

    ds = _emb(sf_dir).materialize()
    cols = ("votes", "n", "n_correct", "acc_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    meta = ds.select_columns(["vec_id", "label"]).to_pandas()
    if len(meta) < 2:
        return empty
    meta = meta.sort_values("vec_id").reset_index(drop=True)
    all_ids = meta["vec_id"].to_numpy(dtype="int64")
    all_labels = meta["label"].to_numpy(dtype="int64")
    labeled = all_ids % holdout_mod != 0
    if not labeled.any() or labeled.all():
        return empty
    lab_ids = all_ids[labeled]
    lab_labels = all_labels[labeled]
    n_classes = int(all_labels.max()) + 1

    ids2, M = _emb_matrix(ds)
    if ids2 is None:
        return empty
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mh = M / norms[:, None]
    lab_m = Mh[labeled]
    m_ref = ray.put(lab_m)
    meta_ref = ray.put((lab_ids, lab_labels))
    kk = min(k, len(lab_ids))

    def block_partial(t: pa.Table) -> pd.DataFrame:
        pcols = {"votes": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "n_correct": pd.Series([], dtype="int64")}
        bids = t["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        hm = bids % holdout_mod == 0
        if not hm.any():
            return pd.DataFrame(pcols)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)[hm]
        true = t["label"].to_numpy(zero_copy_only=False) \
            .astype("int64")[hm]
        bn = np.linalg.norm(vecs, axis=1)
        bn[bn == 0] = 1.0
        lm = ray.get(m_ref)
        lids, llabels = ray.get(meta_ref)
        cs_i = np.round(np.round((vecs / bn[:, None]) @ lm.T, 6)
                        * 1_000_000).astype(np.int64)
        key = (-cs_i) * (1 << 33) + lids[None, :]
        idx = np.argpartition(key, kk - 1, axis=1)[:, :kk]
        nl = llabels[idx]                       # (rows, kk) neighbor labels
        counts = (nl[:, :, None]
                  == np.arange(n_classes)[None, None, :]).sum(axis=1)
        pred = counts.argmax(axis=1)            # first max = smallest label
        votes = counts.max(axis=1)
        correct = (pred == true).astype("int64")
        g = pd.DataFrame({"votes": votes.astype("int64"),
                          "c": correct}) \
            .groupby("votes", as_index=False) \
            .agg(n=("c", "size"), n_correct=("c", "sum"))
        for c in ("votes", "n", "n_correct"):
            g[c] = g[c].astype("int64")
        return g

    parts = ds.map_batches(block_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty or "votes" not in parts.columns or len(parts) == 0:
        return empty
    out = parts.groupby("votes", as_index=False).agg(
        n=("n", "sum"), n_correct=("n_correct", "sum"))
    out["acc_ppm"] = (out["n_correct"].astype("int64") * 1_000_000
                      // out["n"].astype("int64"))
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("votes").reset_index(drop=True)


# ---------------------------------------------------------------------------
# duplicated-substring SPANS (Lee et al. 2021, arXiv:2107.06499
# "Deduplicating Training Data Makes Language Models Better"): the
# span-granular sibling of docs_crossdup — not just WHICH documents share
# grams, but the maximal token runs inside each document that are covered
# by cross-document duplicate 8-grams (the spans ExactSubstr would cut)
# ---------------------------------------------------------------------------

_SPAN_W = 8
_SPAN_BUCKETS = 64


def docs_dup_spans(sf_dir: str, w: int = _SPAN_W) -> pd.DataFrame:
    """(doc_id, n_spans, dup_tokens, n_tokens, dup_ppm) for every document
    containing at least one duplicated span, sorted by doc_id.

    A word-``w``-gram is *duplicated* when it occurs in >= 2 DISTINCT
    documents; each occurrence covers token positions [pos, pos+w-1], and
    a document's duplicated spans are the maximal runs of consecutive
    covered positions (adjacent/overlapping gram hits merge — the
    ExactSubstr span semantics at word granularity, reference dedup
    context: competitive-intel/processors/deduplicator.py:37-70 which
    only ever dropped whole records).  ``dup_tokens`` is the number of
    covered token positions, ``dup_ppm = dup_tokens·10⁶ // n_tokens``.

    Scale shape (two bounded shuffles, text never ships past the first
    map):
    - map pass: per-batch tokenize once; emit (gram_hash: 64-bit polars
      seed-0, doc, pos) projections routed by gram-hash bucket, plus one
      (doc, n_tokens) row routed by doc bucket (rides the same tagged
      exchange);
    - gram buckets: distinct-doc count per hash settles exactly in its
      bucket; only positions of duplicated grams re-emit, routed by doc;
    - doc buckets: per-doc sorted positions fold into maximal spans with
      one vectorized diff (break iff gap > w, covered += min(diff, w)) —
      no per-row Python, no whole-corpus state anywhere; the driver
      collects only the per-document result rows.
    Hash note: a 64-bit collision can only INFLATE coverage (mark a
    unique gram duplicated) — the docs_crossdup-documented negligible
    class; there is no df-floor deflation mode here."""
    import polars as pl

    ds = _docs(sf_dir, ["doc_id", "text"])
    cols = ("doc_id", "n_spans", "dup_tokens", "n_tokens", "dup_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def gram_partial(t: pa.Table) -> pa.Table:
        ghs: List[np.ndarray] = []
        docs: List[np.ndarray] = []
        poss: List[np.ndarray] = []
        tok_docs: List[int] = []
        tok_ns: List[int] = []
        for did, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = (tx or "").lower().split()
            tok_docs.append(int(did))
            tok_ns.append(len(words))
            if len(words) < w:
                continue
            grams = [" ".join(words[i:i + w])
                     for i in range(len(words) - w + 1)]
            gh = pl.Series(grams).hash(seed=0).to_numpy().astype(np.uint64)
            ghs.append(gh)
            docs.append(np.full(len(gh), int(did), dtype=np.int64))
            poss.append(np.arange(1, len(gh) + 1, dtype=np.int64))
        n0 = sum(len(x) for x in ghs)
        kind = np.concatenate([np.zeros(n0, dtype=np.int64),
                               np.ones(len(tok_docs), dtype=np.int64)])
        if n0:
            gh_all = np.concatenate(ghs)
            a = np.concatenate([gh_all.view(np.int64),
                                np.asarray(tok_docs, dtype=np.int64)])
            b = np.concatenate([np.concatenate(docs),
                                np.asarray(tok_ns, dtype=np.int64)])
            c = np.concatenate([np.concatenate(poss),
                                np.zeros(len(tok_docs), dtype=np.int64)])
            k = np.concatenate([
                (gh_all % _SPAN_BUCKETS).astype(np.int64),
                np.asarray(tok_docs, dtype=np.int64) % _SPAN_BUCKETS])
        else:
            a = np.asarray(tok_docs, dtype=np.int64)
            b = np.asarray(tok_ns, dtype=np.int64)
            c = np.zeros(len(tok_docs), dtype=np.int64)
            k = a % _SPAN_BUCKETS
        return pa.table({"kind": pa.array(kind, pa.int64()),
                         "a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "_k": pa.array(k, pa.int64())})

    def gram_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"kind": pd.Series([], dtype="int64"),
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "_k2": pd.Series([], dtype="int64")}
        if len(df) == 0 or "kind" not in df.columns:
            return pd.DataFrame(out_cols)
        parts = []
        tok = df[df["kind"] == 1]
        if len(tok):
            parts.append(pd.DataFrame({
                "kind": np.ones(len(tok), dtype="int64"),
                "a": tok["a"].to_numpy(dtype="int64"),
                "b": tok["b"].to_numpy(dtype="int64"),
                "_k2": tok["a"].to_numpy(dtype="int64") % _SPAN_BUCKETS}))
        g = df[df["kind"] == 0]
        if len(g):
            # grams duplicated across >= 2 distinct docs (exact within the
            # bucket: every occurrence of a hash lands here)
            ndoc = g.drop_duplicates(["a", "b"]).groupby("a").size()
            dup = ndoc[ndoc >= 2].index
            hits = g[g["a"].isin(dup)]
            if len(hits):
                hd = hits["b"].to_numpy(dtype="int64")
                parts.append(pd.DataFrame({
                    "kind": np.zeros(len(hits), dtype="int64"),
                    "a": hd,
                    "b": hits["c"].to_numpy(dtype="int64"),
                    "_k2": hd % _SPAN_BUCKETS}))
        if not parts:
            return pd.DataFrame(out_cols)
        out = pd.concat(parts, ignore_index=True)
        for c in ("kind", "a", "b", "_k2"):
            out[c] = out[c].astype("int64")
        return out

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {c: pd.Series([], dtype="int64") for c in cols}
        if len(df) == 0 or "kind" not in df.columns:
            return pd.DataFrame(out_cols)
        hits = df[df["kind"] == 0]
        if len(hits) == 0:
            return pd.DataFrame(out_cols)
        tok = df[df["kind"] == 1]
        ntok = dict(zip(tok["a"].to_numpy(dtype="int64"),
                        tok["b"].to_numpy(dtype="int64")))
        h = hits.sort_values(["a", "b"])
        doc = h["a"].to_numpy(dtype="int64")
        pos = h["b"].to_numpy(dtype="int64")
        new = np.empty(len(doc), dtype=bool)
        new[0] = True
        new[1:] = doc[1:] != doc[:-1]
        diff = np.zeros(len(doc), dtype=np.int64)
        diff[1:] = pos[1:] - pos[:-1]
        contrib = np.where(new, w, np.minimum(diff, w)).astype(np.int64)
        brk = (new | (diff > w)).astype(np.int64)
        per = pd.DataFrame({"doc": doc, "contrib": contrib, "brk": brk}) \
            .groupby("doc", as_index=False).agg(
                dup_tokens=("contrib", "sum"), n_spans=("brk", "sum"))
        nt = per["doc"].map(ntok).to_numpy(dtype="int64")
        dup_tok = per["dup_tokens"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": per["doc"].astype("int64"),
            "n_spans": per["n_spans"].astype("int64"),
            "dup_tokens": dup_tok,
            "n_tokens": nt,
            "dup_ppm": (dup_tok * 1_000_000 // np.maximum(nt, 1))
            .astype("int64")})

    out = ds.map_batches(gram_partial, batch_format="pyarrow") \
        .groupby("_k") \
        .map_groups(gram_bucket, batch_format="pandas") \
        .groupby("_k2") \
        .map_groups(doc_bucket, batch_format="pandas") \
        .to_pandas()
    if out.empty or "doc_id" not in out.columns or len(out) == 0:
        return empty
    return out[list(cols)].sort_values("doc_id").reset_index(drop=True)


def media_frames(sf_dir: str) -> pd.DataFrame:
    """(media_ref, frame_index, frame_bytes, byte_sum) through the REAL
    frame-sampling actor pool: one synthesized 4096-byte video payload
    per document flat-maps into 4 deterministic frame slices whose byte
    sums the oracle recomputes in PURE SQL — the payload is a repeated
    sha256(ref) digest stream, so each 1024-byte frame is the 32-byte
    digest tiled 32×, and DuckDB's ``sha256()`` (hex) rebuilds the
    digest byte sum with no pinned table.

    This makes the frame-sample stage (stages/multimodal.py:
    FrameSampleStage — the video analogue of the chunker, reference
    chunking context vectorstore/chunker.py) a first-class gate row next
    to media_decode's pinned-replay check: actor-pool flat-map fan-out,
    byte-budgeted batches, per-frame payload slicing all exercised
    end-to-end."""
    from ..stages.multimodal import FrameSampleStage, synthesize_media_table

    doc_ids = _docs(sf_dir, ["doc_id"]).to_pandas()["doc_id"].tolist()
    refs = [f"media://img/{d}" for d in doc_ids]
    ds = rd.from_arrow(synthesize_media_table(refs, media_type="video"))
    frames = ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 2), max_restarts=-1, max_task_retries=8)

    def stats(t: pa.Table) -> pa.Table:
        pays = t["payload"].to_pylist()
        sums = np.fromiter(
            (int(np.frombuffer(p, dtype=np.uint8).sum()) for p in pays),
            dtype=np.int64, count=len(pays))
        lens = np.fromiter((len(p) for p in pays), dtype=np.int64,
                           count=len(pays))
        return pa.table({
            "media_ref": t["media_ref"],
            "frame_index": pc.cast(t["frame_index"], pa.int64()),
            "frame_bytes": pa.array(lens, pa.int64()),
            "byte_sum": pa.array(sums, pa.int64())})

    out = frames.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values(["media_ref", "frame_index"]) \
        .reset_index(drop=True)


def media_resize_decode(sf_dir: str) -> pd.DataFrame:
    """(media_ref, width, height, pixel_sum, pixel_sq_sum) through the
    REAL resize actor pool followed by the decode kernel: resize rewrites
    the typed metadata to 32×24, decode tiles the payload into
    (24, 32, 3) = 2304 bytes — exactly 72 repetitions of the 32-byte
    sha256(ref) digest — so the oracle rebuilds the integer pixel sums in
    PURE SQL (pixel_sum = 72·Σdigest, pixel_sq_sum = 72·Σdigest²).
    Completes the multimodal trio: decode (pinned replay), frame-sample
    (pure-SQL frames), resize (this row)."""
    from ..stages.multimodal import (MediaResizeStage, _decode_fake,
                                     synthesize_media_table)

    doc_ids = _docs(sf_dir, ["doc_id"]).to_pandas()["doc_id"].tolist()
    refs = [f"media://img/{d}" for d in doc_ids]
    ds = rd.from_arrow(synthesize_media_table(refs))
    resized = ds.map_batches(
        MediaResizeStage, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 2), max_restarts=-1, max_task_retries=8)

    def stats(t: pa.Table) -> pa.Table:
        pays = t["payload"].to_pylist()
        ws = t["width"].to_pylist()
        hs = t["height"].to_pylist()
        sums = np.zeros(len(pays), dtype=np.int64)
        sqs = np.zeros(len(pays), dtype=np.int64)
        for i, (p, w, h) in enumerate(zip(pays, ws, hs)):
            img = _decode_fake(p, w, h).astype(np.int64)
            sums[i] = int(img.sum())
            sqs[i] = int((img * img).sum())
        return pa.table({
            "media_ref": t["media_ref"],
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "pixel_sq_sum": pa.array(sqs, pa.int64())})

    out = resized.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("media_ref").reset_index(drop=True)


def docs_objection_handlers(sf_dir: str) -> pd.DataFrame:
    """(handler_idx, objection, response, evidence) through the REAL
    objection-generator dataflow (reference objection_generator.py:40-91):
    documents mapped into two-origin source records (origin kx/acme by
    doc_id%3, credibility official/community by doc_id%2 so the
    credibility sort reorders within each origin), distributed
    credibility-ranked char-budget packing of BOTH source sets
    (format_sources_ds — sort + bounded streaming prefix), prompt
    assembly, deterministic digest LLM stub, and the alt-field-name
    normalization (theme/rebuttal, concern/counter, question/
    kx_positioning).  The stub makes the handler set a pure function of
    the packed prompt, so the oracle twin rebuilds the identical strings
    in PURE SQL (take-while via a cumulative-length window + sha256)."""
    import shutil
    import tempfile

    from .generate import generate_objections

    def adapt(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        return pa.table({
            "origin": pa.array(
                ["kx" if d % 3 == 0 else "acme" for d in ids], pa.string()),
            "credibility": pa.array(
                ["official" if d % 2 == 0 else "community" for d in ids],
                pa.string()),
            "source_type": pa.array(["official_docs"] * len(ids), pa.string()),
            "title": pa.array([f"Doc {d}" for d in ids], pa.string()),
            "url": pa.array(
                [f"https://testdata.example/{s}/{d}" for s, d in zip(srcs, ids)],
                pa.string()),
            "text": t["text"],
            "arrival_seq": pa.array(ids, pa.int64()),
        })

    records = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        adapt, batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="objgen_gate_")
    try:
        handlers = generate_objections(records, "kx", "acme", out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return pd.DataFrame({
        "handler_idx": pd.array(range(len(handlers)), dtype="int64"),
        "objection": [h["objection"] for h in handlers],
        "response": [h["response"] for h in handlers],
        "evidence": ["|".join(h.get("supporting_evidence", [])) for h in handlers],
    })


#: char budget for the comparison-pairing gate row; the SQL twin derives
#: from this constant (no-drift rule).
COMPARISON_PAIR_BUDGET = 2000
#: doc_id % 4 → credibility class; index == CREDIBILITY_RANK value, so the
#: twin's rank column is simply doc_id % 4.
COMPARISON_CRED_CYCLE = ("official", "third_party", "community", "unknown")


def docs_comparison_pairs(sf_dir: str) -> pd.DataFrame:
    """(topic, primary_digest, competitor_digest, n_primary, n_competitor)
    through the scale-safe comparison pairing
    (stages.grouping.pair_origins_by_topic — per-block budget prune +
    count carriers + bounded topic groups; reference semantics
    comparison_generator.py:190-248,266-299).  Documents become two-origin
    records: origin kx/acme by doc_id%3, credibility cycling the 4 rank
    classes by doc_id%4 (so the rank sort genuinely reorders), topics
    ['t{doc_id%5}'] plus ['u{doc_id%3}'] on even doc_ids (multi-topic
    explode), arrival_seq = doc_id.  The twin rebuilds the identical
    packed strings in PURE SQL: per-(topic, side) cumulative-length window
    in (rank, doc_id) order — full rows where c <= budget, the unique
    overflow row clipped to budget-cb when room > 0, chr(10)x2 joins, the
    TRUNCATION_MARKER appended whenever an overflow row exists — then
    sha256 digests so no megabyte string ever crosses the compare."""
    import hashlib

    from ..stages.grouping import pair_origins_by_topic

    def adapt(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "origin": pa.array(
                ["kx" if d % 3 == 0 else "acme" for d in ids], pa.string()),
            "credibility": pa.array(
                [COMPARISON_CRED_CYCLE[d % 4] for d in ids], pa.string()),
            "topics": pa.array(
                [[f"t{d % 5}"] + ([f"u{d % 3}"] if d % 2 == 0 else [])
                 for d in ids],
                pa.list_(pa.string())),
            "text": t["text"],
            "arrival_seq": pa.array(ids, pa.int64()),
        })

    recs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        adapt, batch_format="pyarrow")
    pairs = pair_origins_by_topic(
        recs, "kx", char_budget=COMPARISON_PAIR_BUDGET).to_pandas()
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()
    out = pd.DataFrame({
        "topic": pairs["topic"],
        "primary_digest": [sha(s) for s in pairs["primary_context"]],
        "competitor_digest": [sha(s) for s in pairs["competitor_context"]],
        "n_primary": pairs["n_primary"].astype("int64"),
        "n_competitor": pairs["n_competitor"].astype("int64"),
    })
    return out.sort_values("topic").reset_index(drop=True)
