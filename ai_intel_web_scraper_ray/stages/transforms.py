"""Stateless / lightly-stateful batch transforms.

All hot paths are vectorized: pyarrow.compute regex-count kernels for the
counting transforms, per-keyword vectorized scoring for the tagger
(one C-level regex pass per keyword over the whole batch rather than a Python
loop per row).  Per-row Python appears only where semantics are genuinely
row-local string surgery (clean_text), and then only *inside* a batch.

Stage semantics mirror:
- clean:    reference competitive-intel/processors/content_extractor.py:45-105
- tag:      reference competitive-intel/processors/topic_tagger.py:75-142
- filter:   reference competitive-intel/processors/quality_filter.py:43-138
- sentiment:reference competitive-intel/scrapers/community_scraper.py:294-319
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import langid as langid_fn
from ..functions import minhash as mh
from ..functions import quality as quality_fn
from ..functions import sentiment as sentiment_fn
from ..functions import simhash as simhash_fn
from ..functions import tagging
from ..functions import textclean
from ..functions import tokenizer as tok

# ---------------------------------------------------------------------------
# Clean (M9)
# ---------------------------------------------------------------------------


def clean_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    cleaned = [textclean.clean_text(t or "") for t in texts]
    new_text = pa.array([c[0] for c in cleaned], pa.string())
    new_wc = pa.array([c[1] for c in cleaned], pa.int32())
    idx = batch.schema.get_field_index(text_col)
    batch = batch.set_column(idx, text_col, new_text)
    if "word_count" in batch.schema.names:
        widx = batch.schema.get_field_index("word_count")
        batch = batch.set_column(widx, "word_count", new_wc)
    else:
        batch = batch.append_column("word_count", new_wc)
    return batch


def clean_stage(ds, text_col: str = "text", batch_size: int = 4096):
    return ds.map_batches(
        lambda t: clean_batch(t, text_col), batch_format="pyarrow", batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# Topic tagging (M10) — actor pool; pattern bank compiled once per actor
# ---------------------------------------------------------------------------


class TopicTagStage:
    """Vectorized keyword tagger.

    Scoring is one ``pc.count_substring_regex`` pass per keyword over the
    whole batch (C regex over Arrow memory), then a numpy top-3 per row with
    the reference's stable tiebreak (topic insertion order).
    """

    def __init__(
        self,
        topic_keywords: Optional[Dict[str, Sequence[str]]] = None,
        competitor_keywords: Optional[Dict[str, Sequence[str]]] = None,
        max_topics: int = 3,
        min_score_threshold: float = 0.01,
        title_col: str = "title",
        text_col: str = "text",
        out_col: str = "topics",
    ):
        bank = tagging.KeywordBank(
            topic_keywords if topic_keywords is not None else tagging.DEFAULT_TOPIC_KEYWORDS,
            competitor_keywords,
            max_topics,
            min_score_threshold,
        )
        self.topics: List[str] = list(bank.topic_keywords.keys())
        # (topic_idx, regex, weight, n_keywords_for_topic)
        self.kw_specs: List[Tuple[int, str, float, int]] = []
        for ti, topic in enumerate(self.topics):
            kws = bank.topic_keywords[topic]
            for kw in kws:
                # RE2-compatible, case-insensitive word-bounded pattern
                self.kw_specs.append(
                    (ti, r"(?i)\b" + re.escape(kw) + r"\b", 1.0 + kw.count(" ") * 0.5, len(kws))
                )
        self.max_topics = max_topics
        self.threshold = min_score_threshold
        self.title_col, self.text_col, self.out_col = title_col, text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.title_col in batch.schema.names:
            full = pc.binary_join_element_wise(
                pc.coalesce(batch[self.title_col], ""), pc.coalesce(batch[self.text_col], ""), " "
            )
        else:
            full = pc.coalesce(batch[self.text_col], "")
        n = len(batch)
        scores = np.zeros((n, len(self.topics)), dtype=np.float64)
        for ti, pat, weight, nkw in self.kw_specs:
            counts = pc.count_substring_regex(full, pat).to_numpy(zero_copy_only=False)
            scores[:, ti] += counts * (weight / nkw)

        # top-k with stable tiebreak on topic order: sort by (-score, topic_idx)
        order = np.argsort(-scores, axis=1, kind="stable")
        topics_out: List[List[str]] = []
        for i in range(n):
            row = []
            for j in order[i, : self.max_topics]:
                s = scores[i, j]
                if s > 0 and s >= self.threshold:
                    row.append(self.topics[j])
            topics_out.append(row if row else [tagging.UNCLASSIFIED])
        arr = pa.array(topics_out, pa.list_(pa.string()))
        if self.out_col in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(self.out_col), self.out_col, arr)
        return batch.append_column(self.out_col, arr)


def tag_stage(ds, concurrency: int = 4, batch_size: int = 4096, **kwargs):
    # autoscaling pool (min 1): a fixed-size pool that reserves every CPU
    # can starve the read stage and deadlock on small sessions
    return ds.map_batches(
        TopicTagStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(1, concurrency)),
        # a 256-node run WILL lose actors: replace them without limit
        # (transient node loss), but bound per-task retries so a POISON
        # batch (one that deterministically kills its worker, e.g. an
        # OOM-sized document) fails the stage after 8 attempts instead of
        # livelocking kill/restart forever (tests/test_fault_tolerance.py)
        max_restarts=-1,
        max_task_retries=8,
    )


# ---------------------------------------------------------------------------
# Quality filter (F1)
# ---------------------------------------------------------------------------


def quality_reason_batch(
    batch: pa.Table,
    min_word_count: int = 100,
    max_code_ratio: float = 0.85,
    require_topics: bool = True,
) -> pa.Table:
    """Append ``removal_reason`` ('' = keep).  Vectorized masks for the cheap
    rules; row-local checks only on still-alive rows."""
    n = len(batch)
    wc = batch["word_count"].to_numpy(zero_copy_only=False)
    reason = np.array([""] * n, dtype=object)
    reason[wc < min_word_count] = "too_short"

    stype = batch["source_type"].to_pylist() if "source_type" in batch.schema.names else ["official_docs"] * n
    if require_topics and "topics" in batch.schema.names:
        joined = pc.coalesce(pc.binary_join(batch["topics"], ","), "").to_pylist()
        for i in range(n):
            if reason[i]:
                continue
            if stype[i] not in quality_fn.TOPIC_EXEMPT_TYPES and joined[i] in ("", tagging.UNCLASSIFIED):
                reason[i] = "no_topics"

    texts = batch["text"].to_pylist()
    for i in range(n):
        if reason[i]:
            continue
        t = texts[i] or ""
        if stype[i] == "official_docs" and quality_fn.code_ratio(t) > max_code_ratio:
            reason[i] = "mostly_code"
        elif quality_fn.is_boilerplate(t):
            reason[i] = "boilerplate"
    return batch.append_column("removal_reason", pa.array(list(reason), pa.string()))


def quality_filter_stage(ds, keep_reason_col: bool = False, **kwargs):
    ds = ds.map_batches(lambda t: quality_reason_batch(t, **kwargs), batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["removal_reason"], "")), batch_format="pyarrow"
    )
    if not keep_reason_col:
        ds = ds.map_batches(lambda t: t.drop_columns(["removal_reason"]), batch_format="pyarrow")
    return ds


def removal_histogram(ds, **kwargs):
    """reason→count over removed rows (reference quality_filter.py:50-64
    side statistic), as a small Dataset groupby."""
    tagged = ds.map_batches(lambda t: quality_reason_batch(t, **kwargs), batch_format="pyarrow")
    removed = tagged.map_batches(
        lambda t: t.filter(pc.not_equal(t["removal_reason"], "")).select(["removal_reason"]),
        batch_format="pyarrow",
    )
    return removed.groupby("removal_reason").count()


# ---------------------------------------------------------------------------
# Sentiment (M13)
# ---------------------------------------------------------------------------


def sentiment_batch(batch: pa.Table, text_col: str = "text", out_col: str = "sentiment") -> pa.Table:
    lower = pc.utf8_lower(pc.coalesce(batch[text_col], ""))
    n = len(batch)
    neg = np.zeros(n, dtype=np.int64)
    pos = np.zeros(n, dtype=np.int64)
    for s in sentiment_fn.NEGATIVE_SIGNALS:
        neg += pc.match_substring(lower, s).to_numpy(zero_copy_only=False).astype(np.int64)
    for s in sentiment_fn.POSITIVE_SIGNALS:
        pos += pc.match_substring(lower, s).to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.where(
        neg > pos + 1,
        "negative",
        np.where(pos > neg + 1, "positive", np.where((neg > 0) & (pos > 0), "mixed", "neutral")),
    )
    return batch.append_column(out_col, pa.array(out.tolist(), pa.string()))


def sentiment_stage(ds, **kwargs):
    return ds.map_batches(lambda t: sentiment_batch(t, **kwargs), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Language ID / token counting / quality scoring (training-data additions)
# ---------------------------------------------------------------------------


def langid_batch(batch: pa.Table, text_col: str = "text", out_col: str = "pred_lang") -> pa.Table:
    lower = pc.utf8_lower(pc.coalesce(batch[text_col], ""))
    n = len(batch)
    score_mat = np.zeros((n, len(langid_fn.LANG_STOPWORDS)), dtype=np.int64)
    for li, (lang, words) in enumerate(langid_fn.LANG_STOPWORDS):
        pat = r"\b(?:" + "|".join(words) + r")\b"
        score_mat[:, li] = pc.count_substring_regex(lower, pat).to_numpy(zero_copy_only=False)
    best = np.argmax(score_mat, axis=1)  # first max → language-order tiebreak
    has_hits = score_mat.max(axis=1) > 0
    langs = np.array([lang for lang, _ in langid_fn.LANG_STOPWORDS])
    out = np.where(has_hits, langs[best], "und")
    return batch.append_column(out_col, pa.array(out.tolist(), pa.string()))


def langid_stage(ds, **kwargs):
    return ds.map_batches(lambda t: langid_batch(t, **kwargs), batch_format="pyarrow")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = pc.coalesce(batch[text_col], "")
    bpe = pc.count_substring_regex(text, tok.TOKEN_PATTERN)
    ws = pc.count_substring_regex(text, r"\S+")
    batch = batch.append_column("n_tokens", pc.cast(bpe, pa.int64()))
    return batch.append_column("n_ws_tokens", pc.cast(ws, pa.int64()))


def token_count_stage(ds, **kwargs):
    return ds.map_batches(lambda t: token_count_batch(t, **kwargs), batch_format="pyarrow")


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact count features (SQL-verifiable): word count, punct count,
    stopword hits, ratios as exact integer parts-per-million (floor of the
    IEEE double division — bit-identical in numpy and DuckDB, unlike
    decimal rounding whose half-way rule differs)."""
    text = pc.coalesce(batch[text_col], "")
    lower = pc.utf8_lower(text)
    n_words = pc.count_substring_regex(text, r"[A-Za-z0-9_]+").to_numpy(zero_copy_only=False).astype(np.int64)
    n_punct = pc.count_substring_regex(text, r"[^A-Za-z0-9_\s]").to_numpy(zero_copy_only=False).astype(np.int64)
    stop_pat = r"\b(?:" + "|".join(quality_fn.QUALITY_STOPWORDS) + r")\b"
    stop_hits = pc.count_substring_regex(lower, stop_pat).to_numpy(zero_copy_only=False).astype(np.int64)
    safe = np.maximum(n_words, 1)
    stop_ppm = np.floor(stop_hits * 1_000_000.0 / safe).astype(np.int64)
    punct_ppm = np.floor(n_punct * 1_000_000.0 / safe).astype(np.int64)
    batch = batch.append_column("n_words", pa.array(n_words, pa.int64()))
    batch = batch.append_column("n_punct", pa.array(n_punct, pa.int64()))
    batch = batch.append_column("stop_hits", pa.array(stop_hits, pa.int64()))
    batch = batch.append_column("stop_ppm", pa.array(stop_ppm, pa.int64()))
    return batch.append_column("punct_ppm", pa.array(punct_ppm, pa.int64()))


def quality_score_stage(ds, **kwargs):
    return ds.map_batches(lambda t: quality_score_batch(t, **kwargs), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Fingerprints: minhash signature / simhash columns
# ---------------------------------------------------------------------------


def minhash_signature_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sigs = mh.signatures_batch([t or "" for t in batch[text_col].to_pylist()])
    arr = pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1), pa.uint64()), mh.NUM_PERM)
    return batch.append_column("minhash_sig", arr)


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = simhash_fn.simhash_batch([t or "" for t in batch[text_col].to_pylist()])
    return batch.append_column("simhash", pa.array(vals, pa.uint64()))


def benchmark_extract_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from ..functions.benchmarkx import extract_benchmark_data

    texts = batch[text_col].to_pylist()
    data = [extract_benchmark_data(t or "") for t in texts]
    batch = batch.append_column(
        "databases_mentioned", pa.array([d["databases_mentioned"] for d in data], pa.list_(pa.string()))
    )
    batch = batch.append_column(
        "performance_numbers", pa.array([d["performance_numbers"] for d in data], pa.list_(pa.string()))
    )
    return batch.append_column(
        "hardware_specs", pa.array([d["hardware_specs"] for d in data], pa.list_(pa.string()))
    )
