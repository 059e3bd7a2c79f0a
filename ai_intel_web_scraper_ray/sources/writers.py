"""Partitioned, resumable sinks.

The north rule calls for Lance tables; the lance package is not installed in
this environment, so the layout is a Lance-style fragmented dataset on
parquet: one fragment directory per (partition key), written atomically
(temp dir + rename) with a JSON manifest of completed partitions.  A rerun
skips partitions already in the manifest — that is what "resumable from
checkpoint" means for a batch sink (reference analogue: per-topic resume
files, generators/comparison_generator.py:195-214).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "_manifest.json"


class PartitionedWriter:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, MANIFEST)

    def completed(self) -> set:
        if not os.path.exists(self._manifest_path):
            return set()
        with open(self._manifest_path) as f:
            return set(json.load(f)["partitions"])

    def _mark(self, partition: str) -> None:
        done = self.completed()
        done.add(partition)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partitions": sorted(done)}, f)
        os.replace(tmp, self._manifest_path)

    def write_partition(self, partition: str, table: pa.Table) -> bool:
        """Atomically write one partition; returns False if already done."""
        if partition in self.completed():
            return False
        final = os.path.join(self.root, f"part={partition}")
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(table, os.path.join(tmp, "data.parquet"))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        self._mark(partition)
        return True


def write_dataset_partitioned(
    ds,
    root: str,
    partition_fn: Callable[[pa.Table], pa.Array],
    max_rows_per_file: int = 500_000,
) -> List[str]:
    """Write a Dataset as a partitioned resumable layout.  ``partition_fn``
    maps a batch to a string partition id per row; rows are grouped and
    appended per partition via Dataset.write_parquet on the partition
    column (streaming, no driver materialization)."""
    import ray.data  # noqa: F401

    # the column must NOT start with "_": hive dirs are named
    # "<col>=<value>" and pyarrow dataset discovery skips underscore-
    # prefixed paths, so "_part=..." partitions would be invisible on read
    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", partition_fn(t))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    ds.write_parquet(root, partition_cols=["part"],
                     min_rows_per_file=max_rows_per_file)
    return [root]


def write_partitioned_exactly_once(
    ds,
    root: str,
    part_col: str,
    sort_cols: Optional[List[str]] = None,
    schema: Optional[pa.Schema] = None,
    _fail_parts: Optional[set] = None,
):
    """Distributed exactly-once partitioned sink with kill-and-resume.

    Each partition's rows co-locate via ``groupby(part_col)`` and the
    worker writes its partition directory ATOMICALLY (unique temp dir +
    ``os.replace``); the presence of the final ``part=<id>`` directory IS
    the commit record, so there is no shared manifest file for concurrent
    writers to race on — a rerun after a mid-stage kill skips every
    committed partition and rewrites only the missing ones.  Rows are
    sorted by all columns before writing, so the bytes of each committed
    partition are DETERMINISTIC: an interrupted-then-resumed run is
    byte-identical to an uninterrupted one (the exactly-once contract the
    crawl checkpoints already provide, extended to the relational sinks —
    reference analogue: per-topic resume files,
    generators/comparison_generator.py:195-214).

    ``sort_cols``: the columns that define the deterministic row order
    inside each partition (default: every column — pass an explicit
    unique key, e.g. ``["chunk_id"]``, for tables carrying list/array
    columns pandas cannot sort on).  ``schema``: optional pinned Arrow
    schema for the partition BODY (without ``part_col``) — REQUIRED for
    tables carrying sparse struct columns, where per-partition schema
    inference would otherwise type an all-null child as ``null`` in one
    partition and e.g. ``bool`` in another, making the partitions
    unreadable as one dataset.  ``_fail_parts`` is a test hook: a
    worker about to write one of these partitions raises instead,
    simulating a kill AFTER other partitions committed.  Returns the
    per-partition (part, n_rows, wrote) audit frame; ``wrote`` is False
    for partitions skipped as already committed."""
    import pandas as pd

    os.makedirs(root, exist_ok=True)
    # sweep orphaned temp dirs from a previous KILLED run (a worker that
    # died between write and rename leaves _tmp-...; the underscore
    # prefix keeps pyarrow dataset discovery from ever reading one as
    # data even if this sweep is skipped).  Single-writer contract: two
    # concurrent writers on one root are not supported.
    for d in os.listdir(root):
        if d.startswith("_tmp-"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    fail_parts = _fail_parts or set()

    def write_group(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = {"part": pd.Series([], dtype=object),
                "n_rows": pd.Series([], dtype="int64"),
                "wrote": pd.Series([], dtype=bool)}
        if len(df) == 0 or part_col not in df.columns:
            return pd.DataFrame(cols)
        part = str(df[part_col].iloc[0])
        final = os.path.join(root, f"part={part}")
        if os.path.exists(final):
            return pd.DataFrame({"part": [part], "n_rows": [len(df)],
                                 "wrote": [False]})
        if part in fail_parts:
            raise RuntimeError(f"injected failure before commit of {part}")
        body = df.drop(columns=[part_col])
        order = sort_cols or list(body.columns)
        body = body.sort_values(order, kind="mergesort") \
            .reset_index(drop=True)
        tmp = os.path.join(root, f"_tmp-{os.getpid()}-{part}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        if schema is not None:
            # from_pandas(schema=...) silently DROPS columns missing
            # from the schema — make that a loud contract violation
            extra = set(body.columns) - set(schema.names)
            if extra:
                raise ValueError(
                    "write_partitioned_exactly_once: columns "
                    f"{sorted(extra)} not covered by the pinned schema "
                    "(from_pandas would silently drop them)")
            body_t = pa.Table.from_pandas(body, schema=schema,
                                          preserve_index=False)
        else:
            body_t = pa.Table.from_pandas(body, preserve_index=False)
        pq.write_table(body_t, os.path.join(tmp, "data.parquet"))
        os.replace(tmp, final)
        return pd.DataFrame({"part": [part], "n_rows": [len(df)],
                             "wrote": [True]})

    return ds.groupby(part_col).map_groups(
        write_group, batch_format="pandas").to_pandas()
