"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as Arrow ``binary`` columns with metadata
columns (media_type, width/height or sample_rate, codec).  Decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages.  The actual codec libraries are not in this container, so the
decode kernel is STUBBED: ``real=True`` raises ``NotImplementedError``
(clearly marked); the default is a deterministic fake decoder whose
output is a pure function of the payload bytes — which keeps the
Ray-side plumbing (schema, batch sizing, actor signature, output
layout) real and testable.

Batch-size note: binary payloads dominate block bytes; callers should
pass a small ``batch_size`` (e.g. 64-256) so batch × concurrency fits
worker heaps — the opposite of the narrow-column aggregate stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def synth_media_table(n: int, *, seed: int = 42,
                      payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (binary payload + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(kinds, pa.string()),
        "width": pa.array(rng.integers(64, 1920, n), pa.int32()),
        "height": pa.array(rng.integers(64, 1080, n), pa.int32()),
    })


class MediaDecoder:
    """Actor-pool stage: payload → fixed-dim feature vector.

    ``real=True`` is the seam where a real codec (PIL/ffmpeg/soundfile)
    would load in ``__init__`` — NOT AVAILABLE in this environment.
    """

    FEATURE_DIM = 32

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; use real=False for the deterministic "
                "fake decoder")
        self.real = real

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic pure function of bytes: blake2 → unit floats
        h = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM * 2).digest()
        raw = np.frombuffer(h, dtype=np.uint16).astype(np.float32)
        return raw / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._fake_features(p)
                 for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
            "payload_size": pa.array(
                [len(p) for p in batch["payload"].to_pylist()], pa.int64()),
        })


class Resizer:
    """Actor-pool stage: resize plan/execution for image payloads.

    Real resampling needs the absent codec libs; the stub computes the
    REAL metadata transform (target dims preserving aspect ratio,
    scale factors) and emits a deterministic fake resized payload (a
    size-proportional slice of the original bytes) — schema, batch
    sizing, and output layout match what a PIL-backed version returns.
    """

    def __init__(self, max_side: int = 256, real: bool = False):
        if real:
            raise NotImplementedError(
                "real image resizing requires PIL/opencv, not present in "
                "this environment; use real=False for the metadata-true "
                "stub")
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        new_w = np.maximum(1, np.round(w * scale).astype(np.int32))
        new_h = np.maximum(1, np.round(h * scale).astype(np.int32))
        payloads = batch["payload"].to_pylist()
        ratio = (new_w.astype(np.float64) * new_h) / np.maximum(w * h, 1)
        resized = [p[: max(1, int(len(p) * r))]
                   for p, r in zip(payloads, ratio)]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "width": pa.array(new_w, pa.int32()),
            "height": pa.array(new_h, pa.int32()),
            "scale": pa.array(scale, pa.float64()),
            "payload": pa.array(resized, pa.binary()),
        })


class FrameSampler:
    """Actor-pool stage: deterministic frame/segment sampling plan.

    Emits (media_id, frame_index) rows — every_n sampling over a fake
    frame count derived from payload size (stands in for container
    parsing, which needs the absent codec libs)."""

    def __init__(self, every_n: int = 10, frame_bytes: int = 256):
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(f)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_index": pa.array(frames, pa.int32())})
