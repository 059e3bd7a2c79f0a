"""Generation surface: per-topic competitive entries with a deterministic
LLM stub and per-topic file resume.

Mirrors the reference generators' dataflow
(reference: competitive-intel/generators/comparison_generator.py):
- topic grouping (every record under each of its topics, :301-311);
- per-topic pairing of the primary origin vs competitors with
  credibility-ranked context packing to a char budget (:190-248, :266-299);
- LLM synthesis per topic — here a deterministic stub whose "output" is a
  seeded digest of its prompt, keeping the full pipeline testable offline
  (the real client slots into ``llm_fn``);
- per-topic JSON resume files: topics with an existing file are skipped on
  rerun (:195-214) — the generate-stage checkpoint unit;
- combined JSON + human-readable export (reference: pipeline.py:344-348,
  :421-530).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Dict, List, Optional

import pandas as pd

from ..stages.grouping import pair_origins_by_topic


def stub_llm(prompt: str) -> dict:
    """Deterministic stand-in for the LLM call: digest-derived fields with
    the same shape as a CompetitiveEntry summary."""
    h = hashlib.sha256(prompt.encode()).hexdigest()
    return {
        "summary": f"synthetic-summary-{h[:16]}",
        "strengths": [f"strength-{h[16:24]}", f"strength-{h[24:32]}"],
        "limitations": [f"limitation-{h[32:40]}"],
    }


def generate_comparisons(
    ds,
    primary_origin: str,
    out_dir: str,
    llm_fn: Callable[[str], dict] = stub_llm,
    char_budget: int = 4000,
) -> List[dict]:
    """records Dataset → one comparison entry per topic, resumable.

    Returns the full entry list (loaded from files for skipped topics)."""
    os.makedirs(out_dir, exist_ok=True)
    pairs = pair_origins_by_topic(ds, primary_origin, char_budget=char_budget).to_pandas()
    pairs = pairs.sort_values("topic").reset_index(drop=True)

    entries: List[dict] = []
    for row in pairs.itertuples(index=False):
        path = os.path.join(out_dir, f"topic_{row.topic}.json")
        if os.path.exists(path):  # resume: skip finished topics
            with open(path) as f:
                entries.append(json.load(f))
            continue
        prompt = (
            f"topic: {row.topic}\n"
            f"primary ({primary_origin}):\n{row.primary_context}\n"
            f"competitors:\n{row.competitor_context}\n"
        )
        result = llm_fn(prompt)
        entry = {
            "topic": row.topic,
            "n_primary": int(row.n_primary),
            "n_competitor": int(row.n_competitor),
            **result,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, path)
        entries.append(entry)

    combined = os.path.join(out_dir, "combined.json")
    with open(combined, "w") as f:
        json.dump(entries, f, indent=2)
    return entries


def export_markdown(entries: List[dict], path: str) -> None:
    """Human-readable export (reference pipeline.py:421-530 shape)."""
    lines = ["# Competitive comparison\n"]
    for e in sorted(entries, key=lambda x: x["topic"]):
        lines.append(f"## {e['topic']}\n")
        lines.append(f"{e['summary']}\n")
        if e.get("strengths"):
            lines.append("Strengths:")
            lines.extend(f"- {s}" for s in e["strengths"])
        if e.get("limitations"):
            lines.append("Limitations:")
            lines.extend(f"- {s}" for s in e["limitations"])
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
