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
