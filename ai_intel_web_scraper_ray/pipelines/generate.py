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
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.grouping import CREDIBILITY_RANK, pair_origins_by_topic


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


# ---------------------------------------------------------------------------
# Objection + summary generator family (reference:
# competitive-intel/generators/objection_generator.py:1-239 and
# summary_generator.py:1-223, driven per-competitor by pipeline.py:240-349).
# The LLM call is the documented deterministic stub (no network); everything
# around it — source formatting, credibility-ordered char-budget packing,
# response normalization, resume files — is the real dataflow.
# ---------------------------------------------------------------------------

# prompt templates (reference keeps these in generators/prompts/*.txt; the
# engine's are deterministic stand-ins — the CONTRACT is the dataflow that
# assembles them, and the SQL oracle twin rebuilds the same strings)
OBJECTION_TEMPLATE = (
    "cross-cutting objections for {competitor_name}\n"
    "primary sources:\n{kx_sources}\n"
    "competitor sources:\n{competitor_sources}\n"
)
CROSS_CUTTING_TEMPLATE = (
    "cross-cutting themes for {competitor_name}\n"
    "primary sources:\n{kx_sources}\n"
    "competitor sources:\n{competitor_sources}\n"
)
NARRATIVE_TEMPLATE = (
    "positioning narrative for {competitor_name}\n"
    "topic entries:\n{topic_entries_summary}\n"
    "primary sources:\n{kx_sources}\n"
    "competitor sources:\n{competitor_sources}\n"
)

# reference _format_sources entry shape (objection_generator.py:204-228);
# text clip 3000 for objections, 2000 for the narrative (summary_generator
# .py:190-212); budget = max_source_tokens * 3 chars
SOURCE_ENTRY_TEMPLATE = "### [{source_type}] {title}\n**URL**: {url}\n\n{text}\n\n---\n\n"
NO_SOURCES = "[No sources available]"
DEFAULT_MAX_SOURCE_TOKENS = 80_000
OBJECTION_TEXT_CLIP = 3000
NARRATIVE_TEXT_CLIP = 2000


def _filter_origin(ds, origin: str):
    """Vectorized origin filter (Arrow kernel inside map_batches)."""
    return ds.map_batches(
        lambda t, o=origin: t.filter(pc.equal(t["origin"], o)),
        batch_format="pyarrow")


def format_sources_ds(
    ds,
    text_clip: int = OBJECTION_TEXT_CLIP,
    max_source_tokens: int = DEFAULT_MAX_SOURCE_TOKENS,
) -> str:
    """Distributed mirror of the reference's ``_format_sources``
    (objection_generator.py:204-228): credibility-ranked records formatted
    into prompt entries and greedily packed to ``max_source_tokens * 3``
    chars, stopping at the first entry that would overflow (take-while, not
    filter — a later shorter entry does NOT slip in).

    Scale shape: entry strings + lengths are built vectorized per batch,
    the sort runs distributed on (credibility rank, arrival_seq), and the
    driver consumes a STREAMING prefix bounded by the char budget —
    backpressure stops the read after ~budget chars no matter how large
    the corpus is.  Tie order within a credibility class is arrival_seq
    (the reference's stable sort preserves its JSON load order; arrival_seq
    IS that load order in this engine)."""
    max_chars = max_source_tokens * 3

    def fmt(t: pa.Table) -> pa.Table:
        sts = t["source_type"].to_pylist()
        titles = t["title"].to_pylist()
        urls = t["url"].to_pylist()
        texts = t["text"].to_pylist()
        entries = [
            SOURCE_ENTRY_TEMPLATE.format(
                source_type=st or "", title=ti or "", url=u or "",
                text=(tx or "")[:text_clip])
            for st, ti, u, tx in zip(sts, titles, urls, texts)
        ]
        ranks = [CREDIBILITY_RANK.get(c, 3) for c in t["credibility"].to_pylist()]
        return pa.table({
            "entry": pa.array(entries, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "arrival_seq": pc.cast(t["arrival_seq"], pa.int64()),
        })

    ranked = ds.map_batches(fmt, batch_format="pyarrow").sort(["rank", "arrival_seq"])
    parts: List[str] = []
    total = 0
    done = False
    for batch in ranked.iter_batches(batch_format="pyarrow", batch_size=256):
        for entry in batch["entry"].to_pylist():
            if total + len(entry) > max_chars:
                done = True
                break
            parts.append(entry)
            total += len(entry)
        if done:
            break
    return "".join(parts) if parts else NO_SOURCES


def normalize_handler(item: dict) -> dict:
    """Normalize an LLM objection-handler dict to the (objection, response,
    supporting_evidence) schema — the alt-field-name tolerance the reference
    needs because the LLM drifts (objection_generator.py:152-202)."""
    item = dict(item)
    if "objection" not in item:
        for alt in ("theme", "concern", "pushback", "question"):
            if alt in item:
                item["objection"] = item.pop(alt)
                break
    if "response" not in item:
        for alt in ("rebuttal", "counter", "counter_argument",
                    "talking_points", "kx_positioning"):
            if alt in item:
                val = item.pop(alt)
                if isinstance(val, dict):
                    item["response"] = "; ".join(
                        f"{k}: {v}" for k, v in val.items()
                        if isinstance(v, str))
                elif isinstance(val, list):
                    item["response"] = " ".join(str(v) for v in val)
                else:
                    item["response"] = str(val)
                break
    if "response" not in item:
        item["response"] = item.get("objection", "See supporting evidence.")
    if "supporting_evidence" not in item:
        evidence = item.pop("evidence", None)
        if isinstance(evidence, list):
            item["supporting_evidence"] = [str(e) for e in evidence]
        elif isinstance(evidence, dict):
            item["supporting_evidence"] = [f"{k}: {v}" for k, v in evidence.items()]
        elif isinstance(evidence, str):
            item["supporting_evidence"] = [evidence]
    return item


def normalize_comparison_row(row: dict, competitor_name: str) -> dict:
    """Normalize a comparison-table row to (dimension, kx_rating,
    competitor_rating) against the LLM's alt field names
    (summary_generator.py:145-174)."""
    row = dict(row)
    if "kx_rating" not in row:
        for alt in ("kx", "kdb", "kdb_plus", "kx_assessment",
                    "kdb_assessment", "kx_score"):
            if alt in row:
                row["kx_rating"] = row.pop(alt)
                break
        else:
            row["kx_rating"] = ""
    if "competitor_rating" not in row:
        comp_lower = competitor_name.lower().replace(" ", "_")
        for alt in (comp_lower, "competitor", "competitor_assessment",
                    "competitor_score", competitor_name.lower()):
            if alt in row:
                row["competitor_rating"] = row.pop(alt)
                break
        else:
            row["competitor_rating"] = ""
    return row


def stub_llm_objections(prompt: str) -> list:
    """Deterministic objection-handler stand-in.  Returns ALT-NAMED fields
    on purpose (theme/rebuttal/evidence, concern/counter,
    question/kx_positioning) so ``normalize_handler`` exercises every
    mapping class the reference tolerates.  Pure function of the prompt —
    each field a sha256-hex slice — so a SQL oracle can rebuild the exact
    output from the same prompt string."""
    h = hashlib.sha256(prompt.encode()).hexdigest()
    return [
        {"theme": f"objection-{h[0:8]}",
         "rebuttal": [f"point-{h[8:16]}", f"point-{h[16:24]}"],
         "evidence": {"doc": f"ev-{h[24:32]}"}},
        {"concern": f"objection-{h[32:40]}",
         "counter": f"resp-{h[40:48]}"},
        {"question": f"objection-{h[48:56]}",
         "kx_positioning": {"speed": f"fast-{h[56:64]}"}},
    ]


def stub_llm_narrative(prompt: str) -> dict:
    """Deterministic narrative stand-in with the drifty shapes the
    reference normalizes: comparison_table wrapped in {rows}, rows using
    alt rating keys, deal_stage_talking_points as a flat list."""
    h = hashlib.sha256(prompt.encode()).hexdigest()
    return {
        "sixty_second_pitch": f"pitch-{h[0:16]}",
        "comparison_table": {"rows": [
            {"dimension": f"dim-{h[16:24]}", "kx": f"kx-{h[24:32]}",
             "competitor": f"comp-{h[32:40]}"},
            {"dimension": f"dim-{h[40:48]}", "kdb": f"kx-{h[48:56]}",
             "competitor_assessment": f"comp-{h[56:64]}"},
        ]},
        "cross_cutting_objections": [
            {"theme": f"objection-{h[0:8]}", "rebuttal": f"resp-{h[8:16]}"},
        ],
        "deal_stage_talking_points": [f"talk-{h[16:24]}"],
    }


def generate_objections(
    ds,
    primary_origin: str,
    competitor: str,
    out_dir: str,
    llm_fn: Callable[[str], list] = stub_llm_objections,
    max_source_tokens: int = DEFAULT_MAX_SOURCE_TOKENS,
    cross_cutting: bool = False,
) -> List[dict]:
    """Cross-cutting objection handlers for one competitor (reference
    objection_generator.generate_objections / generate_cross_cutting,
    pipeline.py:309-334): ALL primary sources vs ALL of that competitor's
    sources, packed once each, one LLM call, normalized handler list,
    atomic resume file ``{competitor}_objection_handlers.json`` (or
    ``_cross_cutting.json``)."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = "cross_cutting" if cross_cutting else "objection_handlers"
    path = os.path.join(out_dir, f"{competitor}_{suffix}.json")
    if os.path.exists(path):  # resume: per-competitor file is the unit
        with open(path) as f:
            return json.load(f)

    kx_text = format_sources_ds(
        _filter_origin(ds, primary_origin),
        OBJECTION_TEXT_CLIP, max_source_tokens)
    comp_text = format_sources_ds(
        _filter_origin(ds, competitor),
        OBJECTION_TEXT_CLIP, max_source_tokens)
    template = CROSS_CUTTING_TEMPLATE if cross_cutting else OBJECTION_TEMPLATE
    prompt = template.format(
        competitor_name=competitor, kx_sources=kx_text,
        competitor_sources=comp_text)
    raw = llm_fn(prompt)
    if isinstance(raw, dict):
        raw = raw.get("objection_handlers", raw.get("handlers", []))
    handlers = [normalize_handler(it) for it in raw if isinstance(it, dict)]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(handlers, f, indent=2)
    os.replace(tmp, path)
    return handlers


def summarize_entries(entries: List[dict]) -> str:
    """Compact per-topic context block for the narrative prompt
    (summary_generator.py:176-188), over this engine's comparison-entry
    shape (topic / summary / strengths / limitations)."""
    parts = []
    for e in sorted(entries, key=lambda x: x["topic"]):
        parts.append(
            f"### {e['topic']}\n"
            f"**Summary**: {e.get('summary', '')}\n"
            f"**Strengths**: {len(e.get('strengths') or [])} identified\n"
            f"**Limitations**: {len(e.get('limitations') or [])} identified\n"
        )
    return "\n".join(parts) if parts else "[No topic entries generated yet]"


def generate_narrative(
    ds,
    primary_origin: str,
    competitor: str,
    topic_entries: List[dict],
    out_dir: str,
    llm_fn: Callable[[str], dict] = stub_llm_narrative,
    max_source_tokens: int = DEFAULT_MAX_SOURCE_TOKENS,
) -> dict:
    """Positioning narrative for one competitor (reference
    summary_generator.generate_narrative, pipeline.py:335-349): topic-entry
    summary + both packed source sets → one LLM call → normalized
    (pitch, comparison table, cross-cutting objections, deal-stage talking
    points) → ``{competitor}_narrative.json``."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{competitor}_narrative.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)

    kx_text = format_sources_ds(
        _filter_origin(ds, primary_origin),
        NARRATIVE_TEXT_CLIP, max_source_tokens)
    comp_text = format_sources_ds(
        _filter_origin(ds, competitor),
        NARRATIVE_TEXT_CLIP, max_source_tokens)
    prompt = NARRATIVE_TEMPLATE.format(
        competitor_name=competitor,
        topic_entries_summary=summarize_entries(topic_entries),
        kx_sources=kx_text, competitor_sources=comp_text)
    data = llm_fn(prompt)

    ct = data.get("comparison_table", {})
    ct_rows = ct if isinstance(ct, list) else (
        ct.get("rows", []) if isinstance(ct, dict) else [])
    ct_rows = [normalize_comparison_row(r, competitor)
               for r in ct_rows if isinstance(r, dict)]
    raw_obj = data.get("cross_cutting_objections", [])
    if isinstance(raw_obj, list):
        raw_obj = [normalize_handler(it) if isinstance(it, dict) else it
                   for it in raw_obj]
    dstp = data.get("deal_stage_talking_points", {})
    if isinstance(dstp, list):  # flat list → discovery stage
        dstp = {"discovery": dstp}

    narrative = {
        "competitor": competitor,
        "sixty_second_pitch": data.get("sixty_second_pitch", ""),
        "cross_cutting_objections": raw_obj,
        "comparison_table": {"competitor": competitor, "rows": ct_rows},
        "deal_stage_talking_points": dstp,
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(narrative, f, indent=2)
    os.replace(tmp, path)
    return narrative


def generate_all(
    ds,
    primary_origin: str,
    competitor: str,
    out_dir: str,
    step: Optional[str] = None,
    llm_fn: Callable[[str], dict] = stub_llm,
    objection_llm_fn: Callable[[str], list] = stub_llm_objections,
    narrative_llm_fn: Callable[[str], dict] = stub_llm_narrative,
) -> dict:
    """The reference `generate` verb end-to-end (pipeline.py:240-349):
    step 1 per-topic comparison entries (resumable per topic), step 2
    objection handlers + cross-cutting themes (resumable per competitor),
    step 3 positioning narrative.  ``step`` in (None, 'topics',
    'objections', 'narrative') selects like the reference's --step."""
    run_topics = step in (None, "topics")
    run_objections = step in (None, "objections")
    run_narrative = step in (None, "narrative")

    entries: List[dict] = []
    if run_topics:
        entries = generate_comparisons(ds, primary_origin, out_dir, llm_fn=llm_fn)
    else:  # downstream steps reload the topic entries from disk
        combined = os.path.join(out_dir, "combined.json")
        if os.path.exists(combined):
            with open(combined) as f:
                entries = json.load(f)

    objections: List[dict] = []
    themes: List[dict] = []
    if run_objections:
        objections = generate_objections(
            ds, primary_origin, competitor, out_dir, llm_fn=objection_llm_fn)
        themes = generate_objections(
            ds, primary_origin, competitor, out_dir, llm_fn=objection_llm_fn,
            cross_cutting=True)

    narrative: dict = {}
    if run_narrative:
        narrative = generate_narrative(
            ds, primary_origin, competitor, entries, out_dir,
            llm_fn=narrative_llm_fn)

    return {"entries": entries, "objections": objections,
            "cross_cutting": themes, "narrative": narrative}


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
