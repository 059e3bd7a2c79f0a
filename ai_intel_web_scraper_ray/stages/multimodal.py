"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata (the
interleaved docs' media spans carry ``media_ref`` pointers into such a
table).  The decode kernels themselves are STUBBED — no image/audio codecs
exist in this container — behind deterministic fakes, but all the Ray-side
plumbing is real and tested: schema, actor-pool signature, per-batch
vectorization, byte-budgeted batch sizing.

Production swap: replace ``_decode_fake`` with PIL/torchvision/ffmpeg calls
in the actor's ``__init__``-loaded codec; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),      # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),            # nullable typed metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


# Stage defaults, hoisted so the SQL oracle twins in __ray_entry__ can
# derive their constants from HERE (advisor r3: hardcoded twin constants
# silently desynchronize when a stage default changes).  The pure-SQL
# frame/resize twins additionally assume DEFAULT_PAYLOAD_BYTES and the
# resize pixel count are multiples of the 32-byte sha256 digest length.
DEFAULT_PAYLOAD_BYTES = 4096
DEFAULT_FRAMES_PER_VIDEO = 4
DEFAULT_RESIZE_W = 32
DEFAULT_RESIZE_H = 24


def synthesize_media_table(refs, media_type: str = "image", payload_bytes: int = DEFAULT_PAYLOAD_BYTES) -> pa.Table:
    """Deterministic fake media payloads for tests/bench: payload =
    sha256-stream of the ref."""
    payloads = []
    for r in refs:
        seed = hashlib.sha256(r.encode()).digest()
        buf = (seed * (payload_bytes // len(seed) + 1))[:payload_bytes]
        payloads.append(buf)
    n = len(refs)
    return pa.table(
        {
            "media_ref": pa.array(list(refs), pa.string()),
            "media_type": pa.array([media_type] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([48] * n, pa.int32()),
            "duration_ms": pa.array([None] * n, pa.int32()),
        }
    )


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: payload bytes tiled
    into an (h, w, 3) uint8 array.  A real decoder raises on corrupt
    input; the fake mirrors that for empty payloads."""
    if not payload:
        raise ValueError("empty media payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    tiled = np.resize(arr, need)
    return tiled.reshape(height, width, 3)


class MediaDecodeStage:
    """Actor-pool stage: binary payload → decoded feature columns.

    Emits per-row mean/std channel statistics (the feature-extract step) —
    with a real codec these become embedding-model inputs.  Batch sizes
    must be BYTE-budgeted by the caller: batch_size ≈ heap_budget /
    payload_size (large payloads ⇒ small batches)."""

    def __init__(self, fail_policy: str = "skip"):
        assert fail_policy in ("skip", "raise")
        self.fail_policy = fail_policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        means, stds, ok = [], [], []
        for p, w, h in zip(payloads, widths, heights):
            try:
                img = _decode_fake(p, w or 64, h or 48)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                ok.append(True)
            except ValueError:
                if self.fail_policy == "raise":
                    raise
                means.append(0.0)
                stds.append(0.0)
                ok.append(False)
        batch = batch.append_column("pixel_mean", pa.array(means, pa.float64()))
        batch = batch.append_column("pixel_std", pa.array(stds, pa.float64()))
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        return batch.drop_columns(["payload"])  # decoded stage drops raw bytes


class MediaResizeStage:
    """Actor-pool stage: emit resized payload dimensions (fake resize keeps
    the deterministic payload, rescales metadata)."""

    def __init__(self, target_width: int = DEFAULT_RESIZE_W,
                 target_height: int = DEFAULT_RESIZE_H):
        self.tw, self.th = target_width, target_height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width",
            pa.array([self.tw] * n, pa.int32()),
        )
        return batch.set_column(
            batch.schema.get_field_index("height"), "height",
            pa.array([self.th] * n, pa.int32()),
        )


class FrameSampleStage:
    """Actor-pool flat-map: one video row → N frame rows (deterministic
    frame offsets); the video analogue of the chunker."""

    def __init__(self, frames_per_video: int = DEFAULT_FRAMES_PER_VIDEO):
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_refs, out_frames, out_payloads = [], [], []
        for r, p in zip(refs, payloads):
            for f in range(self.k):
                out_refs.append(r)
                out_frames.append(f)
                # deterministic per-frame slice of the payload
                step = max(1, len(p) // self.k)
                out_payloads.append(p[f * step : (f + 1) * step] or p[:1])
        return pa.table(
            {
                "media_ref": pa.array(out_refs, pa.string()),
                "frame_index": pa.array(out_frames, pa.int32()),
                "payload": pa.array(out_payloads, pa.binary()),
            }
        )


def media_decode_stage(ds, concurrency: int = 4, batch_size: int = 64, **kwargs):
    """Byte-aware default: 64 rows/batch assumes ~1 MB payloads and a
    ~64 MB per-actor budget; callers with bigger media pass smaller."""
    return ds.map_batches(
        MediaDecodeStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, max(1, concurrency)),
        # a 256-node run WILL lose actors: replace them without limit
        # (transient node loss), but bound per-task retries so a POISON
        # batch (one that deterministically kills its worker, e.g. an
        # OOM-sized document) fails the stage after 8 attempts instead of
        # livelocking kill/restart forever (tests/test_fault_tolerance.py)
        max_restarts=-1,
        max_task_retries=8,
    )
