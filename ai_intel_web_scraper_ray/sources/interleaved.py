"""Interleaved text+media documents — the engine's canonical payload
(BASELINE.json input_hint):

    doc_id : string
    spans  : list<struct<kind, text, media_ref, offset:int32>>

Mapping from the reference's flat SourceRecord (FIXTURES.md §1): title →
span 0, extracted body → body span, each metadata.top_comments[i] → comment
span, accepted answer → answer span, non-html links → media spans with
``media_ref`` and empty text.  The per-row conformance invariant vs the
reference is span-sequence equality on (kind, text, media_ref, order) per
doc_id.

Both directions are vectorized batch transforms (Arrow list-of-struct in /
out, zero-copy friendly).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from ..schemas import INTERLEAVED_DOC_SCHEMA, SPAN_TYPE


def record_to_spans(rec: dict) -> List[dict]:
    """One SourceRecord-shaped dict → ordered span dicts."""
    spans: List[dict] = []

    def add(kind: str, text: str = "", media_ref: str = ""):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    add("title", rec.get("title") or "")
    add("body", rec.get("text") or "")
    meta = rec.get("metadata") or {}
    for c in meta.get("top_comments") or []:
        add("comment", c)
    if meta.get("is_answered") and meta.get("answer_body"):
        add("answer", meta["answer_body"])
    for ref in rec.get("media_refs") or []:
        add("media", media_ref=ref)
    return spans


def records_to_interleaved_batch(batch: pa.Table) -> pa.Table:
    """SourceRecord batch → interleaved-docs batch."""
    rows = batch.to_pylist()
    doc_ids = [r.get("id") or str(r.get("doc_id")) for r in rows]
    spans = [record_to_spans(r) for r in rows]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
        }
    )


def interleaved_to_records_batch(batch: pa.Table) -> pa.Table:
    """Interleaved docs → flat (doc_id, title, text, comments, answer,
    media_refs) — the inverse degenerate-case mapping."""
    doc_ids = batch["doc_id"].to_pylist()
    all_spans = batch["spans"].to_pylist()
    titles, bodies, comments, answers, media = [], [], [], [], []
    for spans in all_spans:
        spans = sorted(spans or [], key=lambda s: s["offset"])
        title = body = answer = ""
        cs: List[str] = []
        ms: List[str] = []
        for s in spans:
            kind = s["kind"]
            if kind == "title" and not title:
                title = s["text"]
            elif kind == "body":
                body = body + s["text"] if body else s["text"]
            elif kind == "comment":
                cs.append(s["text"])
            elif kind == "answer":
                answer = s["text"]
            elif kind == "media":
                ms.append(s["media_ref"])
        titles.append(title)
        bodies.append(body)
        comments.append(cs)
        answers.append(answer)
        media.append(ms)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "title": pa.array(titles, pa.string()),
            "text": pa.array(bodies, pa.string()),
            "top_comments": pa.array(comments, pa.list_(pa.string())),
            "answer_body": pa.array(answers, pa.string()),
            "media_refs": pa.array(media, pa.list_(pa.string())),
        }
    )


def spans_to_rows(batch: pa.Table) -> pa.Table:
    """Interleaved docs → one flat row per span
    (doc_id, span_offset, kind, text, media_ref) in offset order — the
    SQL-comparable form of the span-sequence invariant (offset as int64 so
    a DuckDB twin's BIGINT hashes match)."""
    doc_ids: List[str] = []
    offs: List[int] = []
    kinds: List[str] = []
    texts: List[str] = []
    refs: List[str] = []
    for did, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
        for s in sorted(spans or [], key=lambda s: s["offset"]):
            doc_ids.append(did)
            offs.append(int(s["offset"]))
            kinds.append(s["kind"])
            texts.append(s["text"])
            refs.append(s["media_ref"])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "span_offset": pa.array(offs, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
        }
    )


def span_sequences(batch: pa.Table) -> Dict[str, List[Tuple[str, str, str]]]:
    """doc_id → [(kind, text, media_ref), ...] in offset order — the
    conformance comparison form."""
    out: Dict[str, List[Tuple[str, str, str]]] = {}
    for doc_id, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
        seq = [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(spans or [], key=lambda s: s["offset"])
        ]
        out[doc_id] = seq
    return out


def assert_span_equality(a: pa.Table, b: pa.Table) -> None:
    """Raise AssertionError naming the first differing doc/span."""
    sa, sb = span_sequences(a), span_sequences(b)
    if set(sa) != set(sb):
        missing = set(sa) ^ set(sb)
        raise AssertionError(f"doc_id sets differ: {sorted(missing)[:5]}")
    for doc_id in sa:
        if sa[doc_id] != sb[doc_id]:
            for i, (x, y) in enumerate(zip(sa[doc_id], sb[doc_id])):
                if x != y:
                    raise AssertionError(f"doc {doc_id} span {i}: {x!r} != {y!r}")
            raise AssertionError(
                f"doc {doc_id}: span counts {len(sa[doc_id])} != {len(sb[doc_id])}"
            )


def crawl_records_to_interleaved(records: Sequence[dict], origin: str = "crawl") -> pa.Table:
    """Crawled page records (url/title/text, optional media_refs from
    ``crawl_scalable(capture_media_refs=True)``) → interleaved docs with
    deterministic ids (reference id scheme, scrapers/utils.py:249-252)."""
    from ..functions.urls import record_id

    rows = []
    for r in records:
        rows.append(
            {
                "id": record_id(origin, "official_docs", r["url"]),
                "title": r.get("title") or "",
                "text": r.get("text") or "",
                "media_refs": r.get("media_refs") or [],
                "metadata": {},
            }
        )
    doc_ids = [r["id"] for r in rows]
    spans = [record_to_spans(r) for r in rows]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
        }
    )
