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


def pair_origins_by_topic(
    ds,
    primary_origin: str,
    topic_col: str = "topics",
    text_col: str = "text",
    char_budget: int = 4000,
):
    """J2: for each topic, pack the primary origin's records and the other
    origins' records into one row of packed context strings.  Returns a
    small Dataset (one row per topic)."""
    exploded = explode_topics(ds, topic_col)

    def pair(group: pd.DataFrame) -> pd.DataFrame:
        topic = group["topic"].iloc[0]
        prim = group[group["origin"] == primary_origin]
        comp = group[group["origin"] != primary_origin]
        return pd.DataFrame(
            {
                "topic": [topic],
                "primary_context": [pack_by_credibility(prim, text_col, char_budget)],
                "competitor_context": [pack_by_credibility(comp, text_col, char_budget)],
                "n_primary": [len(prim)],
                "n_competitor": [len(comp)],
            }
        )

    return exploded.groupby("topic").map_groups(pair, batch_format="pandas")


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
        packed += "\n[... additional context truncated ...]"
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
