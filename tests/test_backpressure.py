"""Streaming execution must survive an object store SMALLER than the
data in flight — the single-node stand-in for the 100-TB claim that
pipelines stream blocks with backpressure/spill rather than
materializing.

The pipeline runs in a SUBPROCESS with its own tiny-store Ray session
(the shared test session's store is deliberately large), generates ~1.5
GB through a map_batches chain, reduces it to per-block partials, and
must finish with exact results.
"""

from __future__ import annotations

import json
import subprocess
import sys

_SCRIPT = r"""
import json, sys
import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

ray.init(address="local", num_cpus=4, include_dashboard=False,
         object_store_memory=256 * 1024 * 1024, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

N_BLOCKS = 64
ROWS_PER_BLOCK = 3_000
PAYLOAD = 8_192          # 8 KiB/row -> ~24 MB/block, ~1.5 GB total

def inflate(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy()
    blob = np.random.RandomState(int(ids[0]) % 2**31).bytes(PAYLOAD)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "payload": pa.array([blob] * len(ids), pa.binary()),
    })

def digest(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy()
    sizes = pa.compute.binary_length(batch["payload"]).to_numpy()
    return pa.table({
        "n": pa.array([len(ids)], pa.int64()),
        "id_sum": pa.array([int(ids.sum())], pa.int64()),
        "bytes": pa.array([int(sizes.sum())], pa.int64()),
    })

total_rows = N_BLOCKS * ROWS_PER_BLOCK
out = (
    rd.range(total_rows, override_num_blocks=N_BLOCKS)
    .map_batches(inflate, batch_format="pyarrow", batch_size=ROWS_PER_BLOCK)
    .map_batches(digest, batch_format="pyarrow", batch_size=ROWS_PER_BLOCK)
    .to_pandas()
)
print(json.dumps({
    "rows": int(out["n"].sum()),
    "id_sum": int(out["id_sum"].sum()),
    "bytes": int(out["bytes"].sum()),
}))
ray.shutdown()
"""


def test_streaming_exceeds_object_store():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    total_rows = 64 * 3_000
    assert got["rows"] == total_rows
    assert got["id_sum"] == total_rows * (total_rows - 1) // 2
    assert got["bytes"] == total_rows * 8_192      # ~1.5 GB streamed
