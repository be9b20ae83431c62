"""Multimodal (image / audio / video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``media_bytes``); decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages. The decode libraries
(Pillow, ffmpeg, torchaudio, …) are NOT in this container, so the decoder
is STUBBED: ``fake=True`` (default) produces a deterministic fake decode
derived from the payload bytes; ``fake=False`` raises ``NotImplementedError``
at the exact point a real decoder would plug in. Everything Ray-side —
schema, batch size, actor signature, output layout — is real and tested.

Scale notes: media batches must be SMALL (payload bytes dominate, not
rows); callers pass ``batch_size`` ≤ a few hundred so batch × concurrency
fits a worker heap, and the actor pool (``concurrency=(1, N)``) amortizes
model/codec load across batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),
    ("media_bytes", pa.int64()),
])

FEATURE_DIM = 16


def media_from_documents_batch(batch: pa.Table) -> pa.Table:
    """Adapter: documents → media rows (text bytes stand in for an opaque
    payload; deterministic)."""
    payload = pc.cast(batch["text"], pa.binary())
    kind_idx = (batch["doc_id"].to_numpy() % 3).astype(np.int64)
    kinds = pa.array(["image", "audio", "video"], type=pa.string())
    return pa.table({
        "media_id": pc.cast(batch["doc_id"], pa.int64()),
        "media_type": kinds.take(pa.array(kind_idx)),
        "payload": payload,
        "media_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
    })


def _fake_u64(payload: pa.Array) -> np.ndarray:
    from ..functions.hashing import fnv1a64

    # codepoint-FNV so the driver's DuckDB oracle reproduces the fake
    # decode arithmetic exactly (see functions/hashing.fnv1a64)
    return fnv1a64(pc.cast(payload, pa.large_string()))


class MediaDecoder:
    """Actor-pool stage: payload → decoded metadata (width/height/duration/
    n_frames). State (the codec / model handle) loads once per actor in
    ``__init__`` — here a no-op for the stub."""

    def __init__(self, fake: bool = True):
        self.fake = fake
        # real path would open codecs / load a model here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires Pillow/ffmpeg — not in this container")
        h = _fake_u64(batch["payload"])
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int64)
        height = ((h >> np.uint64(16)) % np.uint64(1080) + np.uint64(16)).astype(np.int64)
        n_frames = ((h >> np.uint64(32)) % np.uint64(300) + np.uint64(1)).astype(np.int64)
        duration_s = np.round(n_frames / 30.0, 3)
        return (batch.append_column("width", pa.array(width))
                .append_column("height", pa.array(height))
                .append_column("n_frames", pa.array(n_frames))
                .append_column("duration_s", pa.array(duration_s)))


class MediaResizer:
    """Actor-pool stage: decoded media → resized payload metadata. The stub
    rewrites width/height to the target box (aspect-preserving) without
    touching bytes."""

    def __init__(self, max_w: int = 256, max_h: int = 256, fake: bool = True):
        self.max_w, self.max_h, self.fake = max_w, max_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real resize requires an image library")
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, np.minimum(self.max_w / w, self.max_h / h))
        return (batch.append_column("resized_w", pa.array((w * scale).astype(np.int64)))
                .append_column("resized_h", pa.array((h * scale).astype(np.int64))))


class FrameSampler:
    """Actor-pool stage: video rows → one row per sampled frame (flat-map
    shape: output rows ≠ input rows). Deterministic every-k-th sampling."""

    def __init__(self, every: int = 30, max_frames: int = 8, fake: bool = True):
        self.every, self.max_frames, self.fake = every, max_frames, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        n_frames = batch["n_frames"].to_numpy().astype(np.int64)
        n_samp = np.minimum((n_frames + self.every - 1) // self.every, self.max_frames)
        is_video = np.asarray(pc.equal(batch["media_type"], "video").to_numpy(zero_copy_only=False))
        n_samp = np.where(is_video, n_samp, 0)
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), n_samp)
        offs = np.concatenate([[0], np.cumsum(n_samp)])
        frame_idx = (np.arange(int(n_samp.sum()), dtype=np.int64) - offs[:-1][rows]) * self.every
        sub = batch.select(["media_id"]).take(pa.array(rows))
        return sub.append_column("frame_idx", pa.array(frame_idx))


class FeatureExtractor:
    """Actor-pool stage: payload → fixed-dim feature vector (list<float>).
    The stub derives a deterministic pseudo-embedding from the payload hash;
    a real model would batch-infer here."""

    def __init__(self, dim: int = FEATURE_DIM, fake: bool = True):
        self.dim, self.fake = dim, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real feature extraction requires a model runtime")
        h = _fake_u64(batch["payload"])
        shifts = np.arange(self.dim, dtype=np.uint64) * np.uint64(4)
        feat = (((h[:, None] >> shifts[None, :]) & np.uint64(0xF)).astype(np.float64) / 15.0)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(feat.ravel()), self.dim)
        return batch.select(["media_id", "media_type"]).append_column("feature", arr)
