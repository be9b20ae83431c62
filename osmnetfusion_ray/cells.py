"""Hierarchical spatial cell codec (H3/S2-style), pure numpy, uint64.

A cell id packs (resolution, Morton-interleaved x/y index) of an
equirectangular grid over (lon, lat). At resolution ``r`` the world is a
``2^r x 2^r`` grid; ids are stable across resolutions and support
``parent`` / ``children`` / ``neighbors`` like H3/S2 (see BASELINE.json
north_star: "H3/S2-cell-encoded in map_batches over zero-copy Arrow").

Layout (64 bits):  [ res:6 | morton:58 ]  — supports res <= 29.

All functions are vectorized over numpy arrays and are deterministic; the
codec is the single partitioning key reused across every shuffle in the
engine (SURVEY.md §7.5).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29
_RES_SHIFT = 58

# Default working resolutions (tunable per pipeline):
#   res 15 ≈ 1.2 km cells at the equator  (clustering / joins)
#   res 13 ≈ 4.9 km cells                 (coarse partitioning)
RES_JOIN = 15
RES_COARSE = 13


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 29 bits of ``v`` (Morton spread)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits`."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def xy_index(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coordinates of (lon, lat) at resolution ``res``."""
    n = np.uint64(1) << np.uint64(res)
    nf = float(2**res)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nf).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * nf).astype(np.int64)
    ix = np.clip(ix, 0, int(n) - 1).astype(np.uint64)
    iy = np.clip(iy, 0, int(n) - 1).astype(np.uint64)
    return ix, iy


def encode_xy(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Pack grid coordinates into cell ids."""
    m = _spread_bits(ix) | (_spread_bits(iy) << np.uint64(1))
    return (np.uint64(res) << np.uint64(_RES_SHIFT)) | m


def cell_of(lon: np.ndarray, lat: np.ndarray, res: int = RES_JOIN) -> np.ndarray:
    """Vectorized (lon, lat) → uint64 cell id at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix, iy = xy_index(lon, lat, res)
    return encode_xy(ix, iy, res)


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (ix, iy, res)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(_RES_SHIFT)).astype(np.int64)
    m = cell & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
    ix = _compact_bits(m)
    iy = _compact_bits(m >> np.uint64(1))
    return ix, iy, res


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(_RES_SHIFT)).astype(np.int64)


def parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent cell ``steps`` resolutions coarser."""
    ix, iy, res = decode(cell)
    new_res = res - steps
    if np.any(new_res < 0):
        raise ValueError("parent below resolution 0")
    s = np.uint64(steps)
    return encode_xy(ix >> s, iy >> s, 0) | (new_res.astype(np.uint64) << np.uint64(_RES_SHIFT))


def children(cell: int) -> np.ndarray:
    """The 4 children of a single cell, one resolution finer."""
    ix, iy, res = decode(np.asarray([cell], dtype=np.uint64))
    r = int(res[0]) + 1
    if r > MAX_RES:
        raise ValueError("children beyond max resolution")
    cx = (np.repeat(ix << np.uint64(1), 4) + np.tile(np.array([0, 1, 0, 1], np.uint64), 1))
    cy = (np.repeat(iy << np.uint64(1), 4) + np.tile(np.array([0, 0, 1, 1], np.uint64), 1))
    return encode_xy(cx, cy, r)


_NBR_DX = np.array([-1, 0, 1, -1, 1, -1, 0, 1], dtype=np.int64)
_NBR_DY = np.array([-1, -1, -1, 0, 0, 1, 1, 1], dtype=np.int64)


def neighbors(cell: np.ndarray, include_self: bool = False) -> np.ndarray:
    """8-ring neighbors of each cell (clipped at grid borders → duplicates
    possible at the edge of the world; callers dedup).

    Returns shape ``(len(cell), 8)`` (or 9 with self).
    """
    ix, iy, res = decode(cell)
    n = (np.uint64(1) << res.astype(np.uint64)).astype(np.int64)
    dx = np.concatenate([[0], _NBR_DX]) if include_self else _NBR_DX
    dy = np.concatenate([[0], _NBR_DY]) if include_self else _NBR_DY
    nx = np.clip(ix.astype(np.int64)[:, None] + dx[None, :], 0, (n - 1)[:, None]).astype(np.uint64)
    ny = np.clip(iy.astype(np.int64)[:, None] + dy[None, :], 0, (n - 1)[:, None]).astype(np.uint64)
    rr = np.repeat(res.astype(np.uint64)[:, None], dx.size, axis=1)
    m = _spread_bits(nx.ravel()) | (_spread_bits(ny.ravel()) << np.uint64(1))
    out = (rr.ravel() << np.uint64(_RES_SHIFT)) | m
    return out.reshape(len(np.atleast_1d(np.asarray(cell))), dx.size)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each cell."""
    ix, iy, res = decode(cell)
    nf = np.power(2.0, res.astype(np.float64))
    lon_min = ix.astype(np.float64) / nf * 360.0 - 180.0
    lat_min = iy.astype(np.float64) / nf * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / nf, lat_min + 180.0 / nf


def cell_size_m(res: int, lat: float = 0.0) -> tuple[float, float]:
    """Approximate (width_m, height_m) of a cell at ``res`` near ``lat``."""
    width_deg = 360.0 / 2**res
    height_deg = 180.0 / 2**res
    m_per_deg_lat = 111_320.0
    m_per_deg_lon = m_per_deg_lat * np.cos(np.radians(lat))
    return width_deg * m_per_deg_lon, height_deg * m_per_deg_lat


def res_for_radius(radius_m: float, lat: float = 48.0) -> int:
    """Finest resolution whose cell height still covers ``radius_m`` — so a
    radius query only needs the 1-ring of neighbor cells (SURVEY.md §7.5)."""
    for r in range(MAX_RES, -1, -1):
        w, h = cell_size_m(r, lat)
        if min(w, h) >= radius_m:
            return r
    return 0


def covering_cells_bbox(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, res: int
) -> np.ndarray:
    """All cells at ``res`` intersecting a bbox (driver-side, small counts)."""
    ix0, iy0 = xy_index(np.array([lon_min]), np.array([lat_min]), res)
    ix1, iy1 = xy_index(np.array([lon_max]), np.array([lat_max]), res)
    xs = np.arange(int(ix0[0]), int(ix1[0]) + 1, dtype=np.uint64)
    ys = np.arange(int(iy0[0]), int(iy1[0]) + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return encode_xy(gx.ravel(), gy.ravel(), res)


def salt_hot_cells(
    cell: np.ndarray, lon: np.ndarray, lat: np.ndarray, threshold: int
) -> np.ndarray:
    """Skew control (north_rule: "explicit salting/splitting of skewed urban
    H3 cells"): any cell whose row count within this batch context exceeds
    ``threshold`` is replaced by its child cell (one resolution finer) for
    partitioning purposes. Deterministic — same rows → same salted key.
    """
    cell = np.asarray(cell, dtype=np.uint64)
    uniq, inv, counts = np.unique(cell, return_inverse=True, return_counts=True)
    hot = counts[inv] > threshold
    if not hot.any():
        return cell
    out = cell.copy()
    res = cell_res(cell[hot])
    finer = np.minimum(res + 1, MAX_RES)
    # re-encode hot rows at one resolution finer
    sub = np.empty(hot.sum(), dtype=np.uint64)
    for r in np.unique(finer):
        m = finer == r
        sub[m] = cell_of(np.asarray(lon)[hot][m], np.asarray(lat)[hot][m], int(r))
    out[hot] = sub
    return out
