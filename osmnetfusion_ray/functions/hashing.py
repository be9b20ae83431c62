"""Vectorized deterministic hashing / geocoding kernels.

All hot-path hashing is C-speed (``pd.util.hash_array`` — SipHash-1-3 with a
fixed key, deterministic across processes and machines) — never a Python
``for row`` loop (prompt rule: no row loops in hot stages).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import polars as pl

    _HAS_POLARS = True
except Exception:  # pragma: no cover
    _HAS_POLARS = False

DEFAULT_BBOX = (11.54, 48.12, 11.62, 48.18)


def hash64(values) -> np.ndarray:
    """uint64 hash of a string column (pa.Array / ChunkedArray / ndarray /
    list). Deterministic within this environment; used for url→coords
    geocoding, text checksums, and hash-partitioned dedup keys.

    Fast path: polars ``.hash()`` — vectorized over Arrow buffers, zero
    Python objects (allocation churn is the scarce resource on this host).
    Fallback: ``pd.util.hash_array`` (SipHash, also C-speed but needs an
    object array).
    """
    if _HAS_POLARS:
        if isinstance(values, pa.ChunkedArray):
            arr = values
        elif isinstance(values, pa.Array):
            arr = pa.chunked_array([values])
        else:
            arr = pa.chunked_array([pa.array(np.asarray(values, dtype=object), type=pa.string())])
        s = pl.from_arrow(arr.cast(pa.large_string()))
        return s.hash(seed=0).to_numpy().astype(np.uint64)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a NONLINEAR uint64 mix. Use it
    whenever a second hash must be INDEPENDENT of a first (Bloom double
    hashing, HLL register split): an affine h2 = a*h1+b keeps h2 congruent
    whenever h1 is congruent mod a power of two, which collapses k probe
    positions into one collision event."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)


def fnv1a64(values) -> np.ndarray:
    """FNV-1a 64-bit over UNICODE CODEPOINTS (one mix step per character,
    not per utf-8 byte) — the variant is chosen so an ANSI-SQL oracle can
    reproduce it EXACTLY: DuckDB's ``unicode(c)`` yields the codepoint and
    HUGEINT holds ``h * prime`` (< 2^104) before the mod-2^64 wrap. Used by
    the fingerprinting kernels (SimHash token hash, MinHash shingle hash,
    the DSIR bucket hash) that are oracle-checked by the driver.

    Vectorized ACROSS strings by character position: the input is viewed as
    a UCS4 codepoint matrix and each position updates all still-live rows
    in one masked numpy op — no per-row Python in the hot path.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype.kind != "U":
        arr = arr.astype("U")
    n = len(arr)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0 or arr.dtype.itemsize == 0:
        return h
    arr = np.ascontiguousarray(arr)
    w = arr.dtype.itemsize // 4
    cp = arr.view(np.uint32).reshape(n, w)
    lens = np.char.str_len(arr).astype(np.int64)
    with np.errstate(over="ignore"):
        for p in range(w):
            m = lens > p
            if not m.any():
                break
            h[m] = (h[m] ^ cp[m, p].astype(np.uint64)) * FNV_PRIME
    return h


def geocode(urls, bbox: tuple[float, float, float, float] = DEFAULT_BBOX) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic url → (lon, lat) inside ``bbox``.

    Stands in for the reference's geocoding of page entities (north_star:
    pages "are geocoded, H3/S2-cell-encoded in map_batches"); a stable hash
    keeps the join reproducible at any scale and across parallelism levels.
    """
    lon0, lat0, lon1, lat1 = bbox
    h = hash64(urls)
    fx = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
    fy = (h >> np.uint64(32)).astype(np.float64) / 2**32
    return lon0 + fx * (lon1 - lon0), lat0 + fy * (lat1 - lat0)


def text_checksum(text_col) -> np.ndarray:
    """Per-row uint64 checksum of the ``text`` column — asserted equal at
    source and sink to evidence the byte-identical-text invariant
    (BASELINE.json input_hint)."""
    return hash64(text_col)
