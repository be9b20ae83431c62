"""REAL (dependency-free) image path for the multimodal stages: a P6 PPM
codec written on numpy, so decode / resize / feature-stats run on ACTUAL
image bytes (and since round 3, ``multimodal.py`` itself is rebased
on these codecs — no hash-derived fakes remain).

The reference brief allows stubbing media decode because no image library
ships in this container — PPM needs none: the P6 format is an ASCII header
(``P6\\n<w> <h>\\n255\\n``) followed by the raw interleaved RGB buffer,
parseable with ``np.frombuffer``. The pipeline therefore exercises every
real multimodal mechanic end-to-end: a deterministic generator writes real
P6 payloads (binary column), an actor-pool decoder PARSES the bytes
(header + pixel buffer — wrong bytes raise), a resizer consumes the
decoded pixel buffer column and re-encodes real P6 thumbnails, and the
stats are exact integers over the decoded pixels. The DuckDB oracle never
sees the bytes: it recomputes the expected stats from the same generation
formula, so a bit-equal match PROVES the encode→decode→resize roundtrip is
lossless (the same oracle style as doc_dbscan's hash point field).

Pixel field (all int64, both engines): image ``id`` has
``w = 8 + id % 9``, ``h = 8 + id % 7``, and channel value
``v(id, y, x, c) = (id·7919 + y·131 + x·31 + c·17) % 256``.

Scale notes: payloads dominate rows — callers use small ``batch_size`` so
batch × concurrency fits the worker heap, and the pixel-buffer column
flows BETWEEN actor stages (decode → resize) exactly as a real
image-processing pipeline's would.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PPM_MULT = 7919
Y_STEP, X_STEP, C_STEP = 131, 31, 17


def ppm_dims(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = ids.astype(np.int64)
    return 8 + ids % 9, 8 + ids % 7


def ppm_pixels(doc_id: int, w: int, h: int) -> np.ndarray:
    """The deterministic (h, w, 3) uint8 pixel field for one image."""
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    v = (doc_id * PPM_MULT + y * Y_STEP + x * X_STEP + c * C_STEP) % 256
    return v.astype(np.uint8)


def encode_ppm(pix: np.ndarray) -> bytes:
    """REAL P6 writer: ASCII header + raw RGB buffer."""
    h, w, _ = pix.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()


def decode_ppm(buf: bytes) -> tuple[int, int, np.ndarray]:
    """REAL P6 parser: validates the magic, reads the ASCII dimensions and
    maxval, and views the raw pixel buffer — raises on malformed bytes."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens: magic, w, h, maxval; the
    # pixel buffer starts after the single whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(buf[start:pos]))
    pos += 1  # the single whitespace terminating the maxval token
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    pix = np.frombuffer(buf, np.uint8, count=need, offset=pos)
    if len(pix) != need:
        raise ValueError("truncated PPM pixel buffer")
    return w, h, pix.reshape(h, w, 3)


def ppm_payloads_batch(batch: pa.Table) -> pa.Table:
    """Generator stage: documents → real P6 payloads (binary column)."""
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    ws, hs = ppm_dims(ids)
    payloads = [encode_ppm(ppm_pixels(int(i), int(w), int(h)))
                for i, w, h in zip(ids, ws, hs)]
    return pa.table({"doc_id": pa.array(ids),
                     "payload": pa.array(payloads, type=pa.binary())})


class PpmDecoder:
    """Actor-pool stage: parse REAL P6 bytes → dims, exact per-channel
    int64 sums, and the decoded pixel buffer (flows to the resizer)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        ws = np.empty(len(ids), np.int64)
        hs = np.empty(len(ids), np.int64)
        sums = np.empty((len(ids), 3), np.int64)
        bufs = []
        for k, payload in enumerate(batch["payload"]):
            w, h, pix = decode_ppm(payload.as_py())
            ws[k], hs[k] = w, h
            sums[k] = pix.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            bufs.append(pix.tobytes())
        return pa.table({
            "doc_id": pa.array(ids),
            "w": pa.array(ws), "h": pa.array(hs),
            "sum_r": pa.array(sums[:, 0]),
            "sum_g": pa.array(sums[:, 1]),
            "sum_b": pa.array(sums[:, 2]),
            "pix": pa.array(bufs, type=pa.binary()),
        })


class PpmResizer:
    """Actor-pool stage: nearest-neighbor thumbnail of the decoded buffer
    (src index = (dst·src_dim) // dst_dim — exact integer arithmetic the
    oracle mirrors), re-encoded as a REAL P6 payload, plus the exact
    grayscale sum ((r+g+b)//3 per pixel) of the thumbnail."""

    def __init__(self, max_w: int = 8, max_h: int = 8):
        self.max_w, self.max_h = max_w, max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        rws = np.minimum(ws, self.max_w)
        rhs = np.minimum(hs, self.max_h)
        rsum = np.empty(n, np.int64)
        thumbs = []
        for k, buf in enumerate(batch["pix"]):
            w, h, rw, rh = int(ws[k]), int(hs[k]), int(rws[k]), int(rhs[k])
            pix = np.frombuffer(buf.as_py(), np.uint8).reshape(h, w, 3)
            sy = (np.arange(rh, dtype=np.int64) * h) // rh
            sx = (np.arange(rw, dtype=np.int64) * w) // rw
            t = pix[sy[:, None], sx[None, :]]
            rsum[k] = int((t.astype(np.int64).sum(axis=2) // 3).sum())
            thumbs.append(encode_ppm(t))
        return pa.table({
            "doc_id": batch["doc_id"],
            "w": batch["w"], "h": batch["h"],
            "sum_r": batch["sum_r"], "sum_g": batch["sum_g"],
            "sum_b": batch["sum_b"],
            "rw": pa.array(rws.astype(np.int64)),
            "rh": pa.array(rhs.astype(np.int64)),
            "rsum_gray": pa.array(rsum),
            "thumb": pa.array(thumbs, type=pa.binary()),
        })


def ppm_stats_batch(batch: pa.Table) -> pd.DataFrame:
    """Terminal projection: drop the byte columns, keep the exact-integer
    stats the oracle recomputes from the pixel formula."""
    cols = ["doc_id", "w", "h", "sum_r", "sum_g", "sum_b",
            "rw", "rh", "rsum_gray"]
    return batch.select(cols).to_pandas()
