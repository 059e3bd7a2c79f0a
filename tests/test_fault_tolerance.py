"""Ray-level fault injection: a pipeline on a 256-node cluster WILL lose
workers mid-stage, and the engine's answer is Ray's task/actor retry — not
the application-level checkpoints (those are covered by the crawl and
exactly-once-sink kill-resume tests).  These tests kill a worker process
from INSIDE a running map_batches task/actor and assert the stage retries
to a correct, complete result.

The kill coordination is a create-exclusive sentinel file: exactly one
attempt wins the O_CREAT|O_EXCL race and dies via ``os._exit`` (no Python
teardown, indistinguishable from an OOM-killed or preempted worker); every
other attempt — including the retry of the killed task — sees the sentinel
and runs normally.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _claim_kill(marker: str) -> bool:
    """True for exactly one caller across all processes on this node."""
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        return True
    except FileExistsError:
        return False


def test_task_stage_survives_worker_kill(tmp_path):
    """Stateless map_batches task: the worker executing the first batch
    that contains id 0 dies hard; Ray retries the task on another worker
    and the doubled-ids result is exact and complete."""
    marker = str(tmp_path / "task_killed")
    ds = rd.range(10_000, override_num_blocks=8)

    def double(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        if 0 in ids and _claim_kill(marker):
            os._exit(1)
        return pa.table({"id2": pa.array(ids * 2, pa.int64())})

    got = ds.map_batches(double, batch_format="pyarrow") \
        .sum("id2")
    assert os.path.exists(marker), "fault was never injected"
    assert got == 2 * (10_000 * 9_999) // 2


def test_actor_stage_survives_actor_kill(tmp_path):
    """Actor-pool map_batches: one actor dies mid-__call__.  With
    ``max_task_retries=-1`` + ``max_restarts=-1`` remote args the pool
    replaces the actor and re-runs the lost batch — the stateful-stage
    (model-holding) fault story at cluster scale."""
    marker = str(tmp_path / "actor_killed")
    ds = rd.range(10_000, override_num_blocks=8)

    class Doubler:
        def __init__(self):
            self.state = 2  # stands in for a loaded model

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy()
            if 0 in ids and _claim_kill(marker):
                os._exit(1)
            return pa.table(
                {"id2": pa.array(ids * self.state, pa.int64())})

    got = ds.map_batches(
        Doubler, batch_format="pyarrow", concurrency=2,
        max_task_retries=-1, max_restarts=-1,
    ).sum("id2")
    assert os.path.exists(marker), "fault was never injected"
    assert got == 2 * (10_000 * 9_999) // 2


def test_shuffle_survives_worker_kill(tmp_path):
    """A groupby (all-to-all exchange) whose upstream map loses a worker:
    the retried task must re-emit its partials exactly once — per-key
    sums match the no-fault ground truth."""
    marker = str(tmp_path / "shuffle_killed")
    ds = rd.range(10_000, override_num_blocks=8)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        if 0 in ids and _claim_kill(marker):
            os._exit(1)
        return pa.table({"k": pa.array(ids % 7, pa.int64()),
                         "v": pa.array(ids, pa.int64())})

    out = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("k").sum("v").to_pandas().sort_values("k")
    assert os.path.exists(marker), "fault was never injected"
    ids = np.arange(10_000, dtype=np.int64)
    for k in range(7):
        want = int(ids[ids % 7 == k].sum())
        assert int(out[out["k"] == k]["sum(v)"].iloc[0]) == want
