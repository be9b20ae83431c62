"""REAL (dependency-free) video path for the multimodal stages: a
YUV4MPEG2 (Y4M) codec written on numpy, completing the image (ppm.py) /
audio (wav.py) / video triple — decode / frame-sample / feature-stats run
on ACTUAL video bytes.

Y4M is a real published interchange format and needs no library: an ASCII
stream header (``YUV4MPEG2 W<w> H<h> F<fps>:1 Ip A1:1 C444\\n``) followed
by frames, each a ``FRAME\\n`` marker plus raw Y, U, V planes (C444 → all
planes w·h bytes). The pipeline exercises every real multimodal mechanic
end-to-end: a deterministic generator writes real Y4M payloads (binary
column), an actor-pool decoder PARSES them (header tokens + per-frame
markers validated — wrong bytes raise), a frame sampler consumes the
decoded plane buffer column, keeps every 2nd frame (the brief's
frame-sample op) and re-encodes a real Y4M clip, and the stats are exact
integers over the decoded planes. The DuckDB oracle never sees the bytes:
it recomputes the expected stats from the same generation formula, so a
bit-equal match PROVES the encode→decode→frame-sample roundtrip lossless.

Plane field (all int64, both engines): video ``id`` has
``w = 4 + id % 5``, ``h = 4 + id % 3``, ``nf = 3 + id % 5`` frames, and
plane value ``v(id, f, y, x, p) = (id·7919 + f·251 + y·131 + x·31 + p·85)
% 256`` for plane p ∈ {0: Y, 1: U, 2: V}.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

Y4M_MULT = 7919
F_STEP, Y_STEP, X_STEP, P_STEP = 251, 131, 31, 85
FPS = 25
SAMPLE_STRIDE = 2


def y4m_dims(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = ids.astype(np.int64)
    return 4 + ids % 5, 4 + ids % 3, 3 + ids % 5


def y4m_planes(doc_id: int, w: int, h: int, nf: int) -> np.ndarray:
    """The deterministic (nf, 3, h, w) uint8 plane field for one video."""
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    p = np.arange(3, dtype=np.int64)[None, :, None, None]
    y = np.arange(h, dtype=np.int64)[None, None, :, None]
    x = np.arange(w, dtype=np.int64)[None, None, None, :]
    v = (doc_id * Y4M_MULT + f * F_STEP + y * Y_STEP + x * X_STEP
         + p * P_STEP) % 256
    return v.astype(np.uint8)


def encode_y4m(planes: np.ndarray, fps: int = FPS) -> bytes:
    """REAL Y4M writer: stream header + FRAME-marked raw C444 planes."""
    nf, _, h, w = planes.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for k in range(nf):
        out.append(b"FRAME\n")
        out.append(planes[k].tobytes())
    return b"".join(out)


def decode_y4m(buf: bytes) -> tuple[int, np.ndarray]:
    """REAL Y4M parser: validates the magic and parameter tokens, walks
    the FRAME markers, and views the raw plane buffers — raises on
    malformed bytes."""
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("missing Y4M stream header")
    tokens = buf[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    c444 = False
    for t in tokens[1:]:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"F":
            fps = int(t[1:].split(b":")[0])
        elif t[:1] == b"C":
            c444 = t == b"C444"
    if not w or not h or not fps:
        raise ValueError("incomplete Y4M header")
    if not c444:
        raise ValueError("unsupported chroma subsampling")
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    while pos < len(buf):
        if buf[pos : pos + 6] != b"FRAME\n":
            raise ValueError("corrupt FRAME marker")
        pos += 6
        pl = np.frombuffer(buf, np.uint8, count=frame_bytes, offset=pos)
        if len(pl) != frame_bytes:
            raise ValueError("truncated frame planes")
        frames.append(pl.reshape(3, h, w))
        pos += frame_bytes
    if not frames:
        raise ValueError("empty Y4M stream")
    return fps, np.stack(frames)


def y4m_payloads_batch(batch: pa.Table) -> pa.Table:
    """Generator stage: documents → real Y4M payloads (binary column)."""
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    ws, hs, nfs = y4m_dims(ids)
    payloads = [encode_y4m(y4m_planes(int(i), int(w), int(h), int(nf)))
                for i, w, h, nf in zip(ids, ws, hs, nfs)]
    return pa.table({"doc_id": pa.array(ids),
                     "payload": pa.array(payloads, type=pa.binary())})


class Y4mDecoder:
    """Actor-pool stage: parse REAL Y4M bytes → dims, frame count, exact
    per-plane int64 sums, and the decoded plane buffer (flows to the
    frame sampler)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ws = np.empty(n, np.int64)
        hs = np.empty(n, np.int64)
        nfs = np.empty(n, np.int64)
        sums = np.empty((n, 3), np.int64)
        bufs = []
        for k, payload in enumerate(batch["payload"]):
            fps, planes = decode_y4m(payload.as_py())
            nf, _, h, w = planes.shape
            ws[k], hs[k], nfs[k] = w, h, nf
            sums[k] = planes.reshape(nf, 3, -1).sum(
                axis=(0, 2), dtype=np.int64)
            bufs.append(planes.tobytes())
        return pa.table({
            "doc_id": batch["doc_id"],
            "w": pa.array(ws), "h": pa.array(hs), "n_frames": pa.array(nfs),
            "sum_y": pa.array(sums[:, 0]),
            "sum_u": pa.array(sums[:, 1]),
            "sum_v": pa.array(sums[:, 2]),
            "planes": pa.array(bufs, type=pa.binary()),
        })


class Y4mFrameSampler:
    """Actor-pool stage: keep every ``stride``-th frame of the decoded
    plane buffer (the frame-sample op), re-encoded as a REAL Y4M clip,
    plus the exact luma (Y-plane) sum of the sampled frames."""

    def __init__(self, stride: int = SAMPLE_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        s_nf = np.empty(n, np.int64)
        s_luma = np.empty(n, np.int64)
        clips = []
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        nfs = batch["n_frames"].to_numpy()
        for k, buf in enumerate(batch["planes"]):
            w, h, nf = int(ws[k]), int(hs[k]), int(nfs[k])
            planes = np.frombuffer(buf.as_py(), np.uint8).reshape(nf, 3, h, w)
            samp = planes[:: self.stride]
            s_nf[k] = samp.shape[0]
            s_luma[k] = int(samp[:, 0].astype(np.int64).sum())
            clips.append(encode_y4m(samp, fps=max(FPS // self.stride, 1)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "w": batch["w"], "h": batch["h"], "n_frames": batch["n_frames"],
            "sum_y": batch["sum_y"], "sum_u": batch["sum_u"],
            "sum_v": batch["sum_v"],
            "sampled_frames": pa.array(s_nf),
            "sampled_luma": pa.array(s_luma),
            "clip": pa.array(clips, type=pa.binary()),
        })


def y4m_stats_batch(batch: pa.Table) -> pd.DataFrame:
    """Terminal projection: drop the byte columns, keep the exact-integer
    stats the oracle recomputes from the plane formula."""
    cols = ["doc_id", "w", "h", "n_frames", "sum_y", "sum_u", "sum_v",
            "sampled_frames", "sampled_luma"]
    return batch.select(cols).to_pandas()


CUT_MULT = 4   # cut iff |Δ luma sum| > CUT_MULT · w · h


def y4m_scene_cuts_batch(batch: pa.Table) -> pd.DataFrame:
    """Scene-cut detection over the REAL decoded plane buffer (consumes
    Y4mDecoder output): per-frame luma (plane 0) sums, consecutive-frame
    absolute deltas, cut iff ``|Δ| > CUT_MULT·w·h`` — all integer, so the
    oracle recomputes the cuts from the plane formula. The standard
    video-curation pre-pass (segmenting on luma discontinuities) on real
    parsed bytes."""
    n = len(batch)
    ws = batch["w"].to_numpy()
    hs = batch["h"].to_numpy()
    nfs = batch["n_frames"].to_numpy()
    n_cuts = np.zeros(n, np.int64)
    max_d = np.zeros(n, np.int64)
    for k, buf in enumerate(batch["planes"]):
        w, h, nf = int(ws[k]), int(hs[k]), int(nfs[k])
        planes = np.frombuffer(buf.as_py(), np.uint8).reshape(nf, 3, h, w)
        fs = planes[:, 0].reshape(nf, -1).sum(axis=1, dtype=np.int64)
        if nf > 1:
            d = np.abs(np.diff(fs))
            n_cuts[k] = int((d > CUT_MULT * w * h).sum())
            max_d[k] = int(d.max())
    return pd.DataFrame({
        "media_id": batch["doc_id"].to_numpy().astype(np.int64),
        "n_frames": nfs.astype(np.int64),
        "n_cuts": n_cuts, "max_abs_delta": max_d})
