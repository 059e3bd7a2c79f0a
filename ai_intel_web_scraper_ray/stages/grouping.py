"""Topic grouping, pairing, and ordering operators.

Mirrors the reference generators' relational steps:
- J1 multi-key topic grouping: each record appears under EVERY topic it
  carries (reference: generators/comparison_generator.py:301-311) —
  a flat_map explode to (topic, record) + groupby.
- J2 per-topic pairing of two origins (KX × competitor,
  comparison_generator.py:190-248) — same explode with an origin column,
  paired inside map_groups.
- O1 relevance sort (blog_scraper.py:76) — Dataset.sort desc.
- O5 credibility-ordered prompt packing (comparison_generator.py:266-299):
  sort official > third_party > community, greedily pack texts to a char
  budget, truncate with a marker.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

CREDIBILITY_RANK = {"official": 0, "third_party": 1, "community": 2}

#: appended after the packed parts when the char budget clipped the input
#: (comparison_generator.py:266-299); the SQL oracle twin derives from this.
TRUNCATION_MARKER = "\n[... additional context truncated ...]"


def explode_topics(ds, topic_col: str = "topics", out_col: str = "topic"):
    """(record with topics list) → one row per (record, topic)."""

    def explode(t: pa.Table) -> pa.Table:
        topics = t[topic_col].to_pylist()
        counts = [len(x or []) for x in topics]
        idx = np.repeat(np.arange(len(t)), counts)
        flat = [tp for row in topics for tp in (row or [])]
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(out_col, pa.array(flat, pa.string()))

    return ds.map_batches(explode, batch_format="pyarrow")


def topic_group_counts(ds, topic_col: str = "topics"):
    """A2 topic distribution: explode → groupby(topic).count()."""
    return explode_topics(ds, topic_col).groupby("topic").count()


#: sorts after every real credibility rank; marks count-carrier rows.
_CARRIER_RANK = np.int64(2**62)


def _pack_ranked(texts: List[str], char_budget: int) -> str:
    """Greedy char-budget packing over ALREADY (rank, seq)-sorted texts —
    the inner loop of the reference's prompt packer
    (comparison_generator.py:266-299): append until the first text that
    would overflow, clip that one to the remaining room, mark truncation."""
    parts: List[str] = []
    used = 0
    truncated = False
    for text in texts:
        text = text or ""
        if used + len(text) > char_budget:
            room = char_budget - used
            if room > 0:
                parts.append(text[:room])
            truncated = True
            break
        parts.append(text)
        used += len(text)
    packed = "\n\n".join(parts)
    if truncated:
        packed += TRUNCATION_MARKER
    return packed


def pair_origins_by_topic(
    ds,
    primary_origin: str,
    topic_col: str = "topics",
    text_col: str = "text",
    char_budget: int = 4000,
    seq_col: str = "arrival_seq",
):
    """J2: for each topic, pack the primary origin's records and the other
    origins' records into one row of packed context strings.  Returns a
    small Dataset (one row per topic).

    Scale shape (reference semantics: comparison_generator.py:190-248,
    266-299): the naive form — gather every record carrying a topic into
    one ``map_groups`` group, then keep ~``char_budget`` chars — is an
    unbounded single-group exchange on a skewed topic.  Instead a
    per-block combiner prunes each (topic, side) to the (credibility
    rank, ``seq_col``)-ordered PREFIX that can still influence the packed
    output: a row whose block-local cumulative length *before* it already
    exceeds the budget has a global cumulative-before at least as large
    (block order is a subsequence of the global (rank, seq) order), so it
    can be neither packed nor the clipped overflow row.  Kept texts are
    clipped to ``char_budget + 1`` chars — non-overflow rows pack at most
    ``char_budget`` chars of one text, the overflow row contributes at
    most ``char_budget`` chars, and the +1 preserves the ``len(text) >
    budget`` overflow test for clipped rows.  Dropped rows travel as one
    count-carrier row per (topic, side) per block so ``n_primary`` /
    ``n_competitor`` stay exact.  The topic exchange therefore ships
    O(blocks × budget) bytes per topic instead of every hot-topic record.

    Tie order within a credibility class is ``seq_col`` (the reference's
    stable sort preserves its JSON load order; ``arrival_seq`` IS that
    load order in this engine), which also makes the output deterministic
    under any block arrival order — the old whole-group form inherited
    whatever order the shuffle delivered."""
    exploded = explode_topics(ds, topic_col)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "topic": df["topic"].astype(str),
            "is_primary": (df["origin"] == primary_origin).to_numpy(),
            "rank": df["credibility"].map(
                lambda c: CREDIBILITY_RANK.get(c, 3)).astype("int64"),
            "seq": df[seq_col].astype("int64"),
            "text": df[text_col].fillna("").astype(str),
        })
        out["_len"] = out["text"].str.len().astype("int64")
        out = out.sort_values(["topic", "is_primary", "rank", "seq"],
                              kind="stable")
        grp = out.groupby(["topic", "is_primary"], sort=False)
        cum_before = grp["_len"].cumsum() - out["_len"]
        keep = out[cum_before <= char_budget].copy()
        keep["text"] = keep["text"].str.slice(0, char_budget + 1)
        keep["n_sub"] = np.int64(1)
        keep["carrier"] = False
        dropped = out[cum_before > char_budget]
        if len(dropped):
            cnt = (dropped.groupby(["topic", "is_primary"], sort=False)
                   .size().reset_index(name="n_sub"))
            cnt["rank"] = _CARRIER_RANK
            cnt["seq"] = _CARRIER_RANK
            cnt["text"] = ""
            cnt["n_sub"] = cnt["n_sub"].astype("int64")
            cnt["carrier"] = True
            keep = pd.concat(
                [keep.drop(columns=["_len"]),
                 cnt[["topic", "is_primary", "rank", "seq", "text",
                      "n_sub", "carrier"]]],
                ignore_index=True)
        else:
            keep = keep.drop(columns=["_len"])
        return keep.reset_index(drop=True)

    def pair(group: pd.DataFrame) -> pd.DataFrame:
        topic = group["topic"].iloc[0]
        real = group[~group["carrier"]]

        def packed(is_primary: bool) -> str:
            side = real[real["is_primary"] == is_primary]
            side = side.sort_values(["rank", "seq"], kind="stable")
            return _pack_ranked(side["text"].tolist(), char_budget)

        return pd.DataFrame(
            {
                "topic": [topic],
                "primary_context": [packed(True)],
                "competitor_context": [packed(False)],
                "n_primary": [int(group.loc[group["is_primary"], "n_sub"].sum())],
                "n_competitor": [int(group.loc[~group["is_primary"], "n_sub"].sum())],
            }
        )

    combined = exploded.map_batches(combine, batch_format="pandas")
    return combined.groupby("topic").map_groups(pair, batch_format="pandas")


def pack_by_credibility(df: pd.DataFrame, text_col: str = "text",
                        char_budget: int = 4000) -> str:
    """O5: credibility-ranked greedy packing to a char budget with a
    truncation marker (comparison_generator.py:266-299)."""
    if not len(df):
        return ""
    ranked = df.assign(
        _rank=df["credibility"].map(lambda c: CREDIBILITY_RANK.get(c, 3))
    ).sort_values(["_rank"], kind="stable")
    parts: List[str] = []
    used = 0
    truncated = False
    for text in ranked[text_col]:
        text = text or ""
        if used + len(text) > char_budget:
            room = char_budget - used
            if room > 0:
                parts.append(text[:room])
            truncated = True
            break
        parts.append(text)
        used += len(text)
    packed = "\n\n".join(parts)
    if truncated:
        packed += TRUNCATION_MARKER
    return packed


def relevance_sort(ds, score_col: str = "relevance_score", descending: bool = True):
    """O1: full sort by relevance score."""
    return ds.sort(score_col, descending=descending)


def status_counts(ds, stage_col: str = "source_type") -> pd.DataFrame:
    """A1: records per stage/type (reference pipeline.py:358-414)."""
    out = ds.groupby(stage_col).count().to_pandas().rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(stage_col).reset_index(drop=True)


def store_breakdowns(chunks_ds) -> Dict[str, pd.DataFrame]:
    """A4: chunk-store breakdowns by competitor / source_type / primary
    topic / credibility, each count-desc (reference vectorstore/store.py:258-316)."""

    def primary_topic(t: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.list_slice(t["topic_ids"], 0, 1, return_fixed_size_list=False), 0
        )
        return t.append_column("primary_topic", first)

    with_pt = chunks_ds.map_batches(primary_topic, batch_format="pyarrow")
    out: Dict[str, pd.DataFrame] = {}
    for col in ("competitor", "source_type", "primary_topic", "credibility"):
        df = with_pt.groupby(col).count().to_pandas().rename(columns={"count()": "n"})
        df["n"] = df["n"].astype("int64")
        out[col] = df.sort_values(["n", col], ascending=[False, True]).reset_index(drop=True)
    return out
