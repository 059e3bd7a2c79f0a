"""End-to-end flagship: crawl → interleaved payload → process → vectorize.

The complete north-rule data flow over the mock web graph:
1. strict crawl (reference-order-equal) emits page records in crawl order;
2. records become BOTH the interleaved text+media payload table
   (input_hint shape, the archival store) and the SourceRecord table
   (arrival_seq = crawl rank — the dedup order anchor);
3. process pipeline (clean → tag → filter → dedup shuffles);
4. vectorize pipeline (chunk → embed actor pools).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import pyarrow as pa

import ray.data as rd

from ..functions.urls import record_id
from ..schemas import METADATA_TYPE
from ..sources.interleaved import crawl_records_to_interleaved
from .crawl import crawl_strict
from .process import process_pipeline
from .vectorize import vectorize_pipeline


def crawl_records_to_source_table(records, origin: str = "crawl",
                                  source_type: str = "official_docs") -> pa.Table:
    """Crawled page records → SourceRecord-shaped Arrow table
    (arrival_seq = crawl_rank, deterministic reference ids)."""
    meta_fields = [f.name for f in METADATA_TYPE]
    rows = []
    for r in records:
        rows.append(
            {
                "id": record_id(origin, source_type, r["url"]),
                "origin": origin,
                "source_type": source_type,
                "url": r["url"],
                "title": r.get("title") or "",
                "text": r.get("text") or "",
                "scraped_date": None,
                "content_date": None,
                "topics": [],
                "subtopics": [],
                "credibility": "official",
                "sentiment": "neutral",
                "word_count": len((r.get("text") or "").split()),
                "arrival_seq": r["crawl_rank"],
                "metadata": dict.fromkeys(meta_fields),
            }
        )
    cols: Dict[str, pa.Array] = {}
    from ..schemas import SOURCE_RECORD_SCHEMA

    for field in SOURCE_RECORD_SCHEMA:
        cols[field.name] = pa.array([row.get(field.name) for row in rows], field.type)
    return pa.table(cols)


def crawl_process_vectorize(
    pages,
    base_url: str,
    content_selector: str = "article",
    max_depth: int = 3,
    max_pages: int = 200,
    exclude_patterns: Sequence[str] = (),
    topic_keywords=None,
    min_word_count: int = 10,
    out_dir: Optional[str] = None,
) -> Dict:
    """Returns {"crawl": crawl result, "interleaved": Table,
    "chunks": Dataset} — the full pipeline."""
    res = crawl_strict(
        pages, base_url, content_selector, max_depth, max_pages, exclude_patterns
    )
    interleaved = crawl_records_to_interleaved(res["records"])
    source_table = crawl_records_to_source_table(res["records"])
    ds = rd.from_arrow(source_table)
    ds = process_pipeline(ds, topic_keywords=topic_keywords,
                          min_word_count=min_word_count, tagger_concurrency=2)
    chunks = vectorize_pipeline(ds, chunk_concurrency=2, embed_concurrency=2)
    if out_dir:
        import pyarrow.parquet as pq
        import os

        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(interleaved, f"{out_dir}/interleaved.parquet")
        chunks.write_parquet(f"{out_dir}/chunks")
    return {"crawl": res, "interleaved": interleaved, "chunks": chunks}


def crawl_dataset_to_interleaved(ds, origin: str = "crawl"):
    """Streamed crawl records (``load_crawl_records`` output, or any
    Dataset with url/title/text and optional media_refs) → interleaved
    text+media docs Dataset in the input_hint shape (doc_id, spans) — the
    distributed twin of :func:`crawl_records_to_interleaved`.

    This is the north-star archival flow at scale: fetched pages stream
    from the worker-written fragments through one ``map_batches``
    conversion per block into the span table; record bodies never touch
    the driver.  The codec's empty batch still carries the full typed
    schema, so all-empty blocks can't drop it.

    Fragments carry media refs packed as a \\x1f-joined string column
    (``media_refs_packed`` — flat so the pandas block stages in
    ``load_crawl_records`` can't mangle a list column); unpacked here."""

    def convert(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        for r in rows:
            packed = r.pop("media_refs_packed", None)
            if packed:
                r["media_refs"] = packed.split("\x1f")
        return crawl_records_to_interleaved(rows, origin=origin)

    return ds.map_batches(convert, batch_format="pyarrow")


def write_interleaved_from_crawl(records_dir: str, out_dir: str,
                                 origin: str = "crawl",
                                 max_pages: Optional[int] = None) -> str:
    """Streamed crawl fragments → partitioned interleaved-docs table on
    disk (a directory of parquet fragments, the Lance-style layout
    ``sources.readers.read_interleaved_docs`` reads; Lance itself is
    unavailable in this environment — see writers.py).  Returns out_dir."""
    from .crawl import load_crawl_records

    ds = load_crawl_records(records_dir, max_pages=max_pages)
    crawl_dataset_to_interleaved(ds, origin=origin).write_parquet(out_dir)
    return out_dir


def crawl_dataset_to_source_records(ds):
    """Streamed crawl fragments (url, depth, title, text, crawl_rank — see
    ``load_crawl_records``) → SourceRecord-shaped Dataset, one vectorized
    batch conversion per block (the distributed twin of
    :func:`crawl_records_to_source_table`, which takes driver-side lists).

    Rank-derived ``arrival_seq`` comes straight from ``crawl_rank``, so the
    downstream keep-first dedup order matches an in-memory run's."""
    def convert(t):
        if "crawl_rank" not in t.column_names:
            # frag_row alone is only unique WITHIN a fragment — a silent
            # fallback would make keep-first dedup pick arbitrary winners
            raise ValueError(
                "crawl_dataset_to_source_records needs load_crawl_records "
                "output (with crawl_rank), not raw fragments")
        return crawl_records_to_source_table(t.to_pylist())

    return ds.map_batches(convert, batch_format="pyarrow")
