"""Pure-numpy geometry kernels over Arrow-friendly layouts.

The environment has no shapely / pyproj / scipy; every geometric operation
the reference performs with those libraries (buffering, point-in-polygon,
nearest-point, geodesic length — see SURVEY.md §2.8) is re-implemented here
as vectorized numpy over either

- flat coordinate buffers ``(coords[N,2] float64, offsets[M+1] int64)`` for
  polylines/polygons (zero-copy compatible with ``pa.list_(pa.list_(f64))``
  / ``pa.list_(f64)`` list offsets), or
- WKB ``bytes`` for interop at IO boundaries (Point, LineString, Polygon —
  little-endian, no SRID), matching what geopandas would write.

Reference parity notes are cited per function (file:line in /root/reference).
"""

from __future__ import annotations

import struct

import numpy as np

EARTH_R = 6_371_008.8  # mean Earth radius, meters
M_PER_DEG_LAT = 111_132.0


# ---------------------------------------------------------------------------
# distance / bearing
# ---------------------------------------------------------------------------

def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, vectorized.

    Stands in for the reference's ``pyproj.Geod(ellps='WGS84').line_length``
    (p3_functions.py:130,503,596); the ellipsoidal/spherical delta is <0.5%
    and both sides of every comparison use the same metric.
    """
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def m_per_deg(lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(m/deg lon, m/deg lat) of the local equirectangular projection —
    replaces the reference's temporary EPSG:3043/3857 reprojections
    (p2_enrichData.py:85,449; buffering only needs local metric accuracy)."""
    lat = np.asarray(lat, dtype=np.float64)
    return M_PER_DEG_LAT * np.cos(np.radians(lat)), np.full_like(lat, M_PER_DEG_LAT, dtype=np.float64)


def bearing_deg(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Planar bearing in degrees in (-180, 180], via atan2 on local-meter
    deltas — semantics of ``np.angle(complex(dx, dy), deg=True)`` at
    p3_simplification.py:329."""
    mx, my = m_per_deg(np.asarray(lat1, dtype=np.float64))
    dx = (np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64)) * mx
    dy = (np.asarray(lat2, dtype=np.float64) - np.asarray(lat1, dtype=np.float64)) * my
    return np.degrees(np.arctan2(dy, dx))


def angle_diff_deg(a, b) -> np.ndarray:
    """Absolute angular difference folded to [0, 180]."""
    d = np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)) % 360.0
    return np.where(d > 180.0, 360.0 - d, d)


# ---------------------------------------------------------------------------
# polyline kernels (flat coords + offsets)
# ---------------------------------------------------------------------------

def polyline_lengths(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Geodesic length in meters of each polyline (p3_functions.py:173)."""
    seg = haversine_m(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1])
    # zero out virtual segments that span two polylines
    keep = np.ones(len(coords) - 1, dtype=bool) if len(coords) > 1 else np.zeros(0, dtype=bool)
    keep[offsets[1:-1] - 1] = False
    csum = np.concatenate([[0.0], np.cumsum(seg * keep)])
    return csum[offsets[1:] - 1] - csum[offsets[:-1]]


def segment_bearings(coords: np.ndarray) -> np.ndarray:
    """Bearing of each consecutive coordinate pair."""
    return bearing_deg(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1])


def point_segment_dist_m(px, py, ax, ay, bx, by, ref_lat: float) -> tuple[np.ndarray, np.ndarray]:
    """Distance (m) from points to segments + the projection parameter t∈[0,1].

    All inputs broadcastable; coordinates in degrees, metricized with a local
    equirectangular scale at ``ref_lat`` (sufficient for ≤200 m radii used by
    every kNN join in the reference, p2_enrichData.py:454,506,561).
    """
    mx = M_PER_DEG_LAT * np.cos(np.radians(ref_lat))
    my = M_PER_DEG_LAT
    px_, py_ = np.asarray(px) * mx, np.asarray(py) * my
    ax_, ay_ = np.asarray(ax) * mx, np.asarray(ay) * my
    bx_, by_ = np.asarray(bx) * mx, np.asarray(by) * my
    dx, dy = bx_ - ax_, by_ - ay_
    ll = dx * dx + dy * dy
    t = np.where(ll > 0, ((px_ - ax_) * dx + (py_ - ay_) * dy) / np.where(ll > 0, ll, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax_ + t * dx, ay_ + t * dy
    return np.hypot(px_ - cx, py_ - cy), t


# ---------------------------------------------------------------------------
# point-in-polygon (winding / crossing number), vectorized points × 1 polygon
# ---------------------------------------------------------------------------

def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Crossing-number PIP test of many points against one ring ``poly[K,2]``
    (closed or open). Replaces shapely ``within`` (p2_enrichData.py:112)."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = poly[:-1, 0][None, :], poly[:-1, 1][None, :]
    x1, y1 = poly[1:, 0][None, :], poly[1:, 1][None, :]
    cond = (y0 <= py) != (y1 <= py)
    dy = np.where(y1 != y0, y1 - y0, 1.0)
    xint = x0 + (py - y0) * (x1 - x0) / dy
    return (np.sum(cond & (px < xint), axis=1) % 2).astype(bool)


def points_in_polygons_grid(px, py, polys: list[np.ndarray]) -> np.ndarray:
    """(N_points, N_polys) boolean containment matrix for small poly sets."""
    out = np.zeros((len(px), len(polys)), dtype=bool)
    for j, poly in enumerate(polys):
        out[:, j] = points_in_polygon(px, py, poly)
    return out


# ---------------------------------------------------------------------------
# buffers (disks / capsules) — polygon approximations in degree space
# ---------------------------------------------------------------------------

def disk_polygon(lon, lat, radius_m, n: int = 16) -> np.ndarray:
    """n-gon approximating a metric disk around one point, in degrees.

    The reference buffers nodes in EPSG:3043 (p3_functions.py:304,330-334);
    a local-scale ellipse in degree space is the same disk in meters.
    """
    mx = M_PER_DEG_LAT * np.cos(np.radians(lat))
    ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    xs = lon + radius_m * np.cos(ang) / mx
    ys = lat + radius_m * np.sin(ang) / M_PER_DEG_LAT
    ring = np.stack([xs, ys], axis=1)
    return np.vstack([ring, ring[:1]])


def capsule_polygon(ax, ay, bx, by, radius_m, n: int = 8) -> np.ndarray:
    """Capsule (buffered segment) around segment a→b, closed ring [K,2]."""
    ref_lat = 0.5 * (ay + by)
    mx = M_PER_DEG_LAT * np.cos(np.radians(ref_lat))
    axm, aym = ax * mx, ay * M_PER_DEG_LAT
    bxm, bym = bx * mx, by * M_PER_DEG_LAT
    th = np.arctan2(bym - aym, bxm - axm)
    ang_a = th + np.pi / 2 + np.linspace(0, np.pi, n)
    ang_b = th - np.pi / 2 + np.linspace(0, np.pi, n)
    pts_m = np.concatenate(
        [
            np.stack([axm + radius_m * np.cos(ang_a), aym + radius_m * np.sin(ang_a)], axis=1),
            np.stack([bxm + radius_m * np.cos(ang_b), bym + radius_m * np.sin(ang_b)], axis=1),
        ]
    )
    ring = np.stack([pts_m[:, 0] / mx, pts_m[:, 1] / M_PER_DEG_LAT], axis=1)
    return np.vstack([ring, ring[:1]])


# ---------------------------------------------------------------------------
# WKB codec (little-endian; Point=1, LineString=2, Polygon=3)
# ---------------------------------------------------------------------------

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3


def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, lon, lat)


def wkb_points(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    n = len(lon)
    head = struct.pack("<BI", 1, _WKB_POINT)
    buf = np.empty((n, 2), dtype="<f8")
    buf[:, 0], buf[:, 1] = lon, lat
    raw = buf.tobytes()
    return [head + raw[i * 16 : i * 16 + 16] for i in range(n)]


def wkb_linestring(coords: np.ndarray) -> bytes:
    k = len(coords)
    return struct.pack("<BII", 1, _WKB_LINESTRING, k) + np.ascontiguousarray(coords, dtype="<f8").tobytes()


def wkb_polygon(ring: np.ndarray) -> bytes:
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return (
        struct.pack("<BIII", 1, _WKB_POLYGON, 1, len(ring))
        + np.ascontiguousarray(ring, dtype="<f8").tobytes()
    )


def wkb_parse(b: bytes) -> tuple[int, np.ndarray]:
    """Parse one WKB blob → (geom_type, coords[K,2]). Polygons: outer ring."""
    little = b[0] == 1
    order = "<" if little else ">"
    (gtype,) = struct.unpack_from(order + "I", b, 1)
    gtype = gtype & 0xFF
    if gtype == _WKB_POINT:
        xy = np.frombuffer(b, dtype=order + "f8", count=2, offset=5)
        return gtype, xy.reshape(1, 2)
    if gtype == _WKB_LINESTRING:
        (k,) = struct.unpack_from(order + "I", b, 5)
        return gtype, np.frombuffer(b, dtype=order + "f8", count=2 * k, offset=9).reshape(k, 2)
    if gtype == _WKB_POLYGON:
        (k,) = struct.unpack_from(order + "I", b, 9)
        return gtype, np.frombuffer(b, dtype=order + "f8", count=2 * k, offset=13).reshape(k, 2)
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_linestrings_to_flat(blobs) -> tuple[np.ndarray, np.ndarray]:
    """Vector of LineString WKB → (coords[N,2], offsets[M+1])."""
    parts, offsets, total = [], [0], 0
    for b in blobs:
        _, c = wkb_parse(b)
        parts.append(c)
        total += len(c)
        offsets.append(total)
    coords = np.concatenate(parts) if parts else np.zeros((0, 2))
    return coords, np.asarray(offsets, dtype=np.int64)


def flat_to_wkb_linestrings(coords: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    return [wkb_linestring(coords[offsets[i] : offsets[i + 1]]) for i in range(len(offsets) - 1)]


# ---------------------------------------------------------------------------
# small numeric algorithms (union-find, Lloyd's KMeans) — deterministic
# ---------------------------------------------------------------------------

class UnionFind:
    """Array union-find with path halving; used for connected components of
    node-buffer intersection graphs (reference uses scipy.sparse.csgraph
    connected_components at p3_functions.py:417-423)."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return i

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb

    def labels(self) -> np.ndarray:
        return np.asarray([self.find(i) for i in range(len(self.parent))], dtype=np.int64)


def kmeans_lloyd(xy: np.ndarray, k: int, seed: int = 42, iters: int = 25) -> np.ndarray:
    """Deterministic Lloyd's KMeans labels — stands in for
    ``sklearn.KMeans(n_clusters=k, random_state=42)`` used to split giant
    node clusters (p3_functions.py:447-454). Returns int labels[len(xy)].
    """
    n = len(xy)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    centers = xy[rng.choice(n, size=k, replace=False)]
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        d = ((xy[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for j in range(k):
            m = labels == j
            if m.any():
                centers[j] = xy[m].mean(axis=0)
    return labels
