"""REAL (dependency-free) audio path for the multimodal stages: a RIFF/
WAVE PCM16 codec written on numpy, so decode / downsample / feature-stats
run on ACTUAL audio bytes — the audio analog of ``stages/ppm.py``
(and since round 3 ``multimodal.py`` itself is rebased on these codecs;
no hash-derived fakes remain).

No audio library ships in this container, and none is needed: a canonical
PCM WAV file is a fixed 44-byte RIFF header (chunk ids + little-endian
sizes/format fields) followed by the raw int16 sample buffer, writable and
parseable with ``np.frombuffer``. The pipeline exercises every real
multimodal mechanic end-to-end: a deterministic generator writes real WAV
payloads (binary column), an actor-pool decoder PARSES the bytes (all
header fields validated — wrong bytes raise), a downsampler consumes the
decoded PCM buffer column and re-encodes real WAV clips, and the stats are
exact integers over the decoded samples. The DuckDB oracle never sees the
bytes: it recomputes the expected stats from the same generation formula,
so a bit-equal match PROVES the encode→decode→downsample roundtrip
lossless.

Sample field (all int64, both engines): clip ``id`` has
``n = 64 + id % 97`` samples at 8 kHz mono, and sample value
``s(id, t) = (id·7919 + t·t·13 + t·101) % 65536 − 32768``.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

WAV_MULT = 7919
T2_STEP, T_STEP = 13, 101
RATE = 8000
DS_STRIDE = 4


def wav_lengths(ids: np.ndarray) -> np.ndarray:
    return 64 + ids.astype(np.int64) % 97


def wav_samples(doc_id: int, n: int) -> np.ndarray:
    """The deterministic length-n int16 sample vector for one clip."""
    t = np.arange(n, dtype=np.int64)
    v = (doc_id * WAV_MULT + t * t * T2_STEP + t * T_STEP) % 65536 - 32768
    return v.astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int = RATE) -> bytes:
    """REAL RIFF/WAVE writer: canonical 44-byte header + raw PCM16 LE."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """REAL RIFF/WAVE parser: validates every header field of a canonical
    mono PCM16 file and views the raw sample buffer — raises on malformed
    bytes."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if buf[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    fmt_size, audio_fmt, channels, rate, byterate, block, bits = \
        struct.unpack("<IHHIIHH", buf[16:36])
    if fmt_size != 16 or audio_fmt != 1:
        raise ValueError("not canonical PCM")
    if channels != 1 or bits != 16:
        raise ValueError(f"unsupported layout: {channels}ch {bits}bit")
    if byterate != rate * 2 or block != 2:
        raise ValueError("inconsistent PCM frame fields")
    if buf[36:40] != b"data":
        raise ValueError("missing data chunk")
    (nbytes,) = struct.unpack("<I", buf[40:44])
    if nbytes % 2 or len(buf) < 44 + nbytes:
        raise ValueError("truncated PCM data")
    samples = np.frombuffer(buf, "<i2", count=nbytes // 2, offset=44)
    return rate, samples


def wav_payloads_batch(batch: pa.Table) -> pa.Table:
    """Generator stage: documents → real WAV payloads (binary column)."""
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    ns = wav_lengths(ids)
    payloads = [encode_wav(wav_samples(int(i), int(n)))
                for i, n in zip(ids, ns)]
    return pa.table({"doc_id": pa.array(ids),
                     "payload": pa.array(payloads, type=pa.binary())})


class WavDecoder:
    """Actor-pool stage: parse REAL WAV bytes → exact int64 stats (sum of
    |s|, peak |s|, strict zero crossings) and the decoded PCM buffer
    (flows to the downsampler)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        k_n = np.empty(len(ids), np.int64)
        k_sum = np.empty(len(ids), np.int64)
        k_peak = np.empty(len(ids), np.int64)
        k_zc = np.empty(len(ids), np.int64)
        bufs = []
        for k, payload in enumerate(batch["payload"]):
            rate, s = decode_wav(payload.as_py())
            v = s.astype(np.int64)
            k_n[k] = len(v)
            k_sum[k] = np.abs(v).sum()
            k_peak[k] = np.abs(v).max() if len(v) else 0
            k_zc[k] = int((v[:-1] * v[1:] < 0).sum()) if len(v) > 1 else 0
            bufs.append(s.tobytes())
        return pa.table({
            "doc_id": pa.array(ids),
            "n_samples": pa.array(k_n),
            "sum_abs": pa.array(k_sum),
            "peak": pa.array(k_peak),
            "zero_cross": pa.array(k_zc),
            "pcm": pa.array(bufs, type=pa.binary()),
        })


class WavDownsampler:
    """Actor-pool stage: stride-4 downsample of the decoded PCM buffer,
    re-encoded as a REAL WAV clip, plus the exact |s| sum of the
    downsampled signal (the oracle mirrors t % 4 = 0)."""

    def __init__(self, stride: int = DS_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ds_n = np.empty(len(batch), np.int64)
        ds_sum = np.empty(len(batch), np.int64)
        clips = []
        for k, buf in enumerate(batch["pcm"]):
            s = np.frombuffer(buf.as_py(), "<i2")[:: self.stride]
            ds_n[k] = len(s)
            ds_sum[k] = np.abs(s.astype(np.int64)).sum()
            clips.append(encode_wav(s, rate=RATE // self.stride))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_samples": batch["n_samples"],
            "sum_abs": batch["sum_abs"],
            "peak": batch["peak"],
            "zero_cross": batch["zero_cross"],
            "ds_n": pa.array(ds_n),
            "ds_sum_abs": pa.array(ds_sum),
            "clip": pa.array(clips, type=pa.binary()),
        })


def wav_stats_batch(batch: pa.Table) -> pd.DataFrame:
    """Terminal projection: drop the byte columns, keep the exact-integer
    stats the oracle recomputes from the sample formula."""
    cols = ["doc_id", "n_samples", "sum_abs", "peak", "zero_cross",
            "ds_n", "ds_sum_abs"]
    return batch.select(cols).to_pandas()


SIL_WIN = 16        # window length (samples)
SIL_THR = 131072    # silent iff Σ|s| over the window < SIL_THR (mean 8192)


def wav_silence_batch(batch: pa.Table) -> pd.DataFrame:
    """Silence-window detection over the REAL decoded PCM buffer (consumes
    WavDecoder output): non-overlapping ``SIL_WIN``-sample windows (tail
    partial window dropped), window energy = Σ|s|, silent iff energy <
    ``SIL_THR`` — all integer, so the oracle recomputes the windows from
    the sample formula. The standard audio-curation VAD-style pre-pass on
    real parsed bytes."""
    n = len(batch)
    n_win = np.zeros(n, np.int64)
    n_sil = np.zeros(n, np.int64)
    emin = np.zeros(n, np.int64)
    emax = np.zeros(n, np.int64)
    for k, buf in enumerate(batch["pcm"]):
        s = np.frombuffer(buf.as_py(), "<i2").astype(np.int64)
        nw = len(s) // SIL_WIN
        n_win[k] = nw
        if nw:
            e = np.abs(s[: nw * SIL_WIN]).reshape(nw, SIL_WIN).sum(axis=1)
            n_sil[k] = int((e < SIL_THR).sum())
            emin[k] = int(e.min())
            emax[k] = int(e.max())
    return pd.DataFrame({
        "media_id": batch["doc_id"].to_numpy().astype(np.int64),
        "n_windows": n_win, "n_silent": n_sil,
        "min_energy": emin, "max_energy": emax})
