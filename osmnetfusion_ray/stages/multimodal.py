"""Multimodal (image / audio / video) column stages — REAL decode.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``media_bytes``); decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages. Round 1 stubbed the
decoders behind a ``fake=True`` hash-derived decode; that is RETIRED — the
stages here are rebased on the repo's real dependency-free codecs
(``stages/ppm.py`` P6, ``stages/wav.py`` RIFF/WAVE PCM16, ``stages/y4m.py``
YUV4MPEG2), so every stage genuinely parses bytes and wrong bytes raise.

- generator: documents → one REAL payload per row by modality
  (doc_id % 3 → P6 image / WAV clip / Y4M clip, each from its codec's
  deterministic content formula — the same fields the per-codec pipelines
  use, so the DuckDB oracles recompute everything from the formulas
  without ever seeing bytes);
- ``MediaDecoder``: magic-dispatched REAL parse → unified
  (width, height, n_frames, duration_s) metadata + the decoded content
  buffer (pixels / PCM / planes) that flows to downstream stages;
- ``MediaResizer``: REAL nearest-neighbor resize of the decoded pixel
  buffers (images per se, videos per frame) re-encoded through the real
  writers; audio passes through (resized dims 0);
- ``FrameSampler``: every-k-th frame selection over REAL decoded frame
  counts;
- ``FeatureExtractor``: 16-bin CONTENT histogram of the decoded units
  (pixel bytes >> 4 / (sample+32768) >> 12 / plane bytes >> 4) — exact
  integer counts, the classic content feature that the oracle recomputes
  from the generation formulas.

Scale notes: media batches must be SMALL (payload bytes dominate, not
rows); callers pass ``batch_size`` ≤ a few hundred so batch × concurrency
fits a worker heap, and the actor pool (``concurrency=(1, N)``) amortizes
codec setup across batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import ppm as PPM
from . import wav as WAV
from . import y4m as Y4M

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),
    ("media_bytes", pa.int64()),
])

FEATURE_DIM = 16
RESIZE_BOX = 8   # nearest-neighbor target box (same as PpmResizer)


def media_from_documents_batch(batch: pa.Table) -> pa.Table:
    """Adapter: documents → media rows with REAL encoded payloads —
    doc_id % 3 picks the modality and the payload is actual P6 / WAV /
    Y4M bytes from the codec generators (deterministic content fields)."""
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    kinds = []
    payloads = []
    for i in ids:
        i = int(i)
        m = i % 3
        if m == 0:
            w, h = PPM.ppm_dims(np.array([i]))
            payloads.append(PPM.encode_ppm(
                PPM.ppm_pixels(i, int(w[0]), int(h[0]))))
            kinds.append("image")
        elif m == 1:
            n = int(WAV.wav_lengths(np.array([i]))[0])
            payloads.append(WAV.encode_wav(WAV.wav_samples(i, n)))
            kinds.append("audio")
        else:
            w, h, nf = Y4M.y4m_dims(np.array([i]))
            payloads.append(Y4M.encode_y4m(
                Y4M.y4m_planes(i, int(w[0]), int(h[0]), int(nf[0]))))
            kinds.append("video")
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": pa.array(ids),
        "media_type": pa.array(kinds, type=pa.string()),
        "payload": pay,
        "media_bytes": pa.array(
            np.fromiter((len(p) for p in payloads), np.int64, len(payloads))),
    })


def _decode_one(kind: str, buf: bytes):
    """(width, height, n_frames, duration_s, content_bytes) via the REAL
    parser for the modality; magic/type mismatch raises."""
    if kind == "image":
        w, h, pix = PPM.decode_ppm(buf)
        return w, h, 1, 0.0, pix.tobytes()
    if kind == "audio":
        rate, s = WAV.decode_wav(buf)
        return 0, 0, 0, len(s) / float(rate), s.tobytes()
    if kind == "video":
        fps, planes = Y4M.decode_y4m(buf)
        nf, _, h, w = planes.shape
        return w, h, nf, nf / float(fps), planes.tobytes()
    raise ValueError(f"unknown media_type {kind!r}")


class MediaDecoder:
    """Actor-pool stage: payload → decoded metadata (width/height/
    n_frames/duration_s) + the decoded content buffer. REAL parse — the
    codec dispatch state lives once per actor in ``__init__``."""

    def __init__(self):
        # codec table built once per actor (a real model/codec load site)
        self.decode = _decode_one

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        kinds = batch["media_type"].to_pylist()
        width = np.empty(n, np.int64)
        height = np.empty(n, np.int64)
        n_frames = np.empty(n, np.int64)
        duration = np.empty(n, np.float64)
        content = []
        for k in range(n):
            w, h, nf, dur, buf = self.decode(
                kinds[k], batch["payload"][k].as_py())
            width[k], height[k], n_frames[k], duration[k] = w, h, nf, dur
            content.append(buf)
        return (batch.append_column("width", pa.array(width))
                .append_column("height", pa.array(height))
                .append_column("n_frames", pa.array(n_frames))
                .append_column("duration_s", pa.array(duration))
                .append_column("content", pa.array(content, type=pa.binary())))


def _nn_resize(pix: np.ndarray, rw: int, rh: int) -> np.ndarray:
    """Nearest-neighbor (src = i*src_dim // dst_dim — the PpmResizer /
    oracle formula) over an (h, w, c) array."""
    h, w = pix.shape[0], pix.shape[1]
    ri = (np.arange(rh) * h) // rh
    rj = (np.arange(rw) * w) // rw
    return pix[ri][:, rj]


class MediaResizer:
    """Actor-pool stage: REAL resize of the decoded content — images and
    video frames are nearest-neighbor-resampled into the ``max_w × max_h``
    box and re-encoded through the real writers; audio passes through
    with resized dims 0."""

    def __init__(self, max_w: int = RESIZE_BOX, max_h: int = RESIZE_BOX):
        self.max_w, self.max_h = max_w, max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        kinds = batch["media_type"].to_pylist()
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        nf = batch["n_frames"].to_numpy().astype(np.int64)
        rw = np.minimum(w, self.max_w)
        rh = np.minimum(h, self.max_h)
        out_payloads = []
        for k in range(n):
            buf = batch["content"][k].as_py()
            if kinds[k] == "image":
                pix = np.frombuffer(buf, np.uint8).reshape(h[k], w[k], 3)
                out_payloads.append(PPM.encode_ppm(
                    np.ascontiguousarray(_nn_resize(pix, int(rw[k]), int(rh[k])))))
            elif kinds[k] == "video":
                planes = np.frombuffer(buf, np.uint8).reshape(
                    nf[k], 3, h[k], w[k])
                # per-frame, per-plane NN resample (plane-last layout map)
                small = planes[:, :, ((np.arange(rh[k]) * h[k]) // rh[k])][
                    :, :, :, ((np.arange(rw[k]) * w[k]) // rw[k])]
                out_payloads.append(Y4M.encode_y4m(
                    np.ascontiguousarray(small)))
            else:
                rw[k] = rh[k] = 0
                # keep the column self-consistent: every modality's
                # resized_payload is a file its own codec can parse, so
                # audio re-encodes the decoded PCM as real WAV (dims 0)
                out_payloads.append(WAV.encode_wav(
                    np.frombuffer(buf, "<i2")))
        return (batch.drop_columns(["content"])
                .append_column("resized_w", pa.array(rw))
                .append_column("resized_h", pa.array(rh))
                .append_column("resized_payload",
                               pa.array(out_payloads, type=pa.binary())))


class FrameSampler:
    """Actor-pool stage: video rows → one row per sampled frame (flat-map
    shape: output rows ≠ input rows). Deterministic every-k-th sampling
    over the REAL decoded frame count."""

    def __init__(self, every: int = 2, max_frames: int = 8):
        self.every, self.max_frames = every, max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_frames = batch["n_frames"].to_numpy().astype(np.int64)
        n_samp = np.minimum((n_frames + self.every - 1) // self.every,
                            self.max_frames)
        is_video = np.asarray(pc.equal(batch["media_type"], "video")
                              .to_numpy(zero_copy_only=False))
        n_samp = np.where(is_video, n_samp, 0)
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), n_samp)
        offs = np.concatenate([[0], np.cumsum(n_samp)])
        frame_idx = (np.arange(int(n_samp.sum()), dtype=np.int64)
                     - offs[:-1][rows]) * self.every
        sub = batch.select(["media_id"]).take(pa.array(rows))
        return sub.append_column("frame_idx", pa.array(frame_idx))


class FeatureExtractor:
    """Actor-pool stage: payload → fixed-dim CONTENT feature vector
    (list<float>): the 16-bin histogram of the REAL decoded units —
    pixel bytes >> 4 (image), (sample + 32768) >> 12 (audio), plane
    bytes >> 4 (video). Exact integer counts (oracle recomputes them from
    the generation formulas); a real model would batch-infer here."""

    def __init__(self, dim: int = FEATURE_DIM):
        if dim != FEATURE_DIM:
            raise ValueError("content histogram is fixed at 16 bins")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        kinds = batch["media_type"].to_pylist()
        feat = np.zeros((n, self.dim), np.float64)
        for k in range(n):
            buf = batch["payload"][k].as_py()
            if kinds[k] == "audio":
                _, s = WAV.decode_wav(buf)
                bins = (s.astype(np.int64) + 32768) >> 12
            elif kinds[k] == "image":
                _, _, pix = PPM.decode_ppm(buf)
                bins = pix.reshape(-1).astype(np.int64) >> 4
            else:
                _, planes = Y4M.decode_y4m(buf)
                bins = planes.reshape(-1).astype(np.int64) >> 4
            feat[k] = np.bincount(bins, minlength=self.dim).astype(np.float64)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(feat.ravel()), self.dim)
        return (batch.select(["media_id", "media_type"])
                .append_column("feature", arr))
