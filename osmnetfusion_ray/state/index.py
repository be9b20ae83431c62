"""Cell-bucketed spatial index over points / segments — pure numpy.

This is the engine's replacement for the reference's ad-hoc shapely STRtree
rebuilds (``gdf.sindex`` at p2_enrichData.py:140, p3_functions.py:406): build
once (inside an actor's ``__init__`` or broadcast once via ``ray.put``),
query per batch, fully vectorized.

Design for scale: the big side (10^12 page rows) streams through
``map_batches`` and NEVER shuffles; the network side (10^5–10^8 segments per
region) is held in one of these indexes — flat numpy arrays sorted by cell
id, zero-copy when read back out of the Ray object store. Queries look at the
1-ring of the query point's cell, so the build resolution must satisfy
``cell_size >= max_query_radius`` (see ``cells.res_for_radius``).
"""

from __future__ import annotations

import numpy as np

from .. import cells, geom


def _multi_range_gather(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized gather of many [lo, hi) ranges: returns (range_row, flat_pos)
    — no Python loop (this is the hot path of every query batch)."""
    counts = (hi - lo).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], counts) + np.repeat(lo, counts)
    return rows, pos


class SegmentGridIndex:
    """kNN / radius index over line segments (points = degenerate segments).

    Two-level layout: a FINE grid answers the common case (a genuinely
    nearby neighbor) with tiny candidate sets; a COARSE grid sized to
    ``max_radius_m`` catches the long tail. A fine answer is only accepted
    when its distance is within the fine ring's coverage guarantee
    (min cell dimension), so results are exactly the true nearest.
    Segments are assigned to every cell their bbox covers, sorted by cell;
    a query gathers 1-ring candidates with two ``searchsorted`` calls —
    no Python loops per row.
    """

    def __init__(self, ax, ay, bx, by, ids, res: int | None = None,
                 max_radius_m: float = 200.0, fine_radius_m: float | None = None,
                 ref_lat: float | None = None):
        ax, ay, bx, by = (np.asarray(a, dtype=np.float64) for a in (ax, ay, bx, by))
        ids = np.asarray(ids, dtype=np.int64)
        # ref_lat governs the equirectangular metric of every distance this
        # index returns. Per-BATCH indexes must receive a fixed global value
        # (e.g. PipelineConfig.ref_lat): a batch-local median would make
        # threshold comparisons depend on how rows were partitioned.
        self.ref_lat = float(ref_lat) if ref_lat is not None else (
            float(np.median(ay)) if len(ay) else 0.0)
        if res is None:
            res = cells.res_for_radius(max_radius_m, lat=self.ref_lat)
        self.res = res
        self.ax, self.ay, self.bx, self.by, self.ids = ax, ay, bx, by, ids

        if fine_radius_m is None:
            # size the fine level to the data density: typical nearest-neighbor
            # spacing ≈ sqrt(area / n); 2× that keeps the fallback rate low
            # while keeping candidate sets small.
            if len(ax):
                mx = geom.M_PER_DEG_LAT * float(np.cos(np.radians(self.ref_lat)))
                my = geom.M_PER_DEG_LAT
                w_m = max(float(max(ax.max(), bx.max()) - min(ax.min(), bx.min())) * mx, 1.0)
                h_m = max(float(max(ay.max(), by.max()) - min(ay.min(), by.min())) * my, 1.0)
                spacing = float(np.sqrt(w_m * h_m / max(len(ax), 1)))
                fine_radius_m = min(max(10.0, 1.5 * spacing), max_radius_m)
            else:
                fine_radius_m = max_radius_m
        fine_res = max(res, cells.res_for_radius(fine_radius_m, lat=self.ref_lat))
        self.fine_res = fine_res
        self._fine_guarantee = min(cells.cell_size_m(fine_res, self.ref_lat))
        self._coarse = self._build_level(res)
        self._fine = self._build_level(fine_res) if fine_res > res else self._coarse

    def _build_level(self, res: int) -> tuple[np.ndarray, np.ndarray]:
        """Replicate each segment into every cell its bbox covers at ``res``
        and sort by cell id → (cell_sorted, seg_sorted)."""
        ax, ay, bx, by = self.ax, self.ay, self.bx, self.by
        ix0, iy0 = cells.xy_index(np.minimum(ax, bx), np.minimum(ay, by), res)
        ix1, iy1 = cells.xy_index(np.maximum(ax, bx), np.maximum(ay, by), res)
        spans = ((ix1 - ix0 + 1) * (iy1 - iy0 + 1)).astype(np.int64)
        seg_idx = np.repeat(np.arange(len(ax), dtype=np.int64), spans)
        offs = np.concatenate([[0], np.cumsum(spans)])
        local = np.arange(int(spans.sum()), dtype=np.int64) - offs[seg_idx]
        w = (ix1 - ix0 + 1)[seg_idx].astype(np.int64)
        cx = ix0[seg_idx] + (local % w).astype(np.uint64)
        cy = iy0[seg_idx] + (local // w).astype(np.uint64)
        cell_ids = cells.encode_xy(cx, cy, res)
        order = np.argsort(cell_ids, kind="stable")
        return cell_ids[order], seg_idx[order]

    @classmethod
    def from_points(cls, x, y, ids, res: int | None = None, max_radius_m: float = 200.0,
                    ref_lat: float | None = None):
        return cls(x, y, x, y, ids, res=res, max_radius_m=max_radius_m, ref_lat=ref_lat)

    def _candidates(self, px, py, level: tuple[np.ndarray, np.ndarray], res: int,
                    dedup: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """(point_row, segment_row) candidate pairs from 1-ring cells."""
        cell_sorted, seg_sorted = level
        qcells = cells.neighbors(cells.cell_of(px, py, res), include_self=True)  # (N, 9)
        flat = qcells.ravel()
        lo = np.searchsorted(cell_sorted, flat, side="left")
        hi = np.searchsorted(cell_sorted, flat, side="right")
        rng_row, take = _multi_range_gather(lo, hi)
        if len(take) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        pt = rng_row // qcells.shape[1]
        seg = seg_sorted[take]
        if dedup:  # replicas of a segment in several queried cells
            key = pt * np.int64(len(self.ax) + 1) + seg
            _, uniq_idx = np.unique(key, return_index=True)
            pt, seg = pt[uniq_idx], seg[uniq_idx]
        return pt, seg

    def _nearest_pairs(self, px, py, pt, seg):
        """Per-point argmin over candidate pairs: (rows, ids, dists).
        ``pt`` is nondecreasing by construction → O(n) grouped reduceat,
        no sort. Ties → smallest id, deterministic."""
        d, _ = geom.point_segment_dist_m(
            px[pt], py[pt], self.ax[seg], self.ay[seg], self.bx[seg], self.by[seg], self.ref_lat
        )
        ids = self.ids[seg]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(pt)) + 1])
        rows = pt[starts]
        counts = np.diff(np.concatenate([starts, [len(pt)]]))
        dmin = np.minimum.reduceat(d, starts)
        is_min = d == np.repeat(dmin, counts)
        ids_masked = np.where(is_min, ids, np.iinfo(np.int64).max)
        idmin = np.minimum.reduceat(ids_masked, starts)
        return rows, idmin, dmin

    def nearest(self, px, py, max_dist_m: float = np.inf) -> tuple[np.ndarray, np.ndarray]:
        """Nearest segment id per point (or -1), with distance (m).
        Exact: fine-level answers beyond the fine guarantee radius are
        re-resolved on the coarse level."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out_id = np.full(len(px), -1, dtype=np.int64)
        out_d = np.full(len(px), np.inf)

        pt, seg = self._candidates(px, py, self._fine, self.fine_res)
        if len(seg):
            rows, ids, dist = self._nearest_pairs(px, py, pt, seg)
            ok = dist <= min(self._fine_guarantee, max_dist_m)
            out_id[rows[ok]] = ids[ok]
            out_d[rows[ok]] = dist[ok]

        if self._fine is not self._coarse:
            todo = np.flatnonzero(out_id == -1)
            if len(todo):
                pt, seg = self._candidates(px[todo], py[todo], self._coarse, self.res)
                if len(seg):
                    rows, ids, dist = self._nearest_pairs(px[todo], py[todo], pt, seg)
                    ok = dist <= max_dist_m
                    out_id[todo[rows[ok]]] = ids[ok]
                    out_d[todo[rows[ok]]] = dist[ok]
        return out_id, out_d

    def within(self, px, py, radius_m: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All (point_row, segment_id, dist_m) pairs with dist <= radius.
        Uses the level sized for ``radius_m`` (fine if it covers it)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if radius_m <= self._fine_guarantee:
            level, res = self._fine, self.fine_res
        else:
            level, res = self._coarse, self.res
        pt, seg = self._candidates(px, py, level, res, dedup=True)
        if len(seg) == 0:
            return pt[:0], np.zeros(0, dtype=np.int64), np.zeros(0)
        d, _ = geom.point_segment_dist_m(
            px[pt], py[pt], self.ax[seg], self.ay[seg], self.bx[seg], self.by[seg], self.ref_lat
        )
        m = d <= radius_m
        return pt[m], self.ids[seg[m]], d[m]


class PolygonGridIndex:
    """Cell-bucketed point-in-polygon index over small polygon sets
    (node-cluster buffers, landuse polygons). Polygons are stored as flat
    ring coords; candidates selected by bbox cell overlap, then exact
    crossing-number test (geom.points_in_polygon)."""

    def __init__(self, rings: list[np.ndarray], ids, res: int | None = None, max_radius_m: float = 50.0):
        ids = np.asarray(ids, dtype=np.int64)
        self.ids = ids
        rings = [np.asarray(r, dtype=np.float64) for r in rings]
        if res is None:
            ref_lat = float(np.median([r[:, 1].mean() for r in rings])) if rings else 0.0
            res = cells.res_for_radius(max_radius_m, lat=ref_lat)
        self.res = res

        # flat edge arrays per polygon: edges of ring i live in
        # [edge_off[i], edge_off[i+1]) — enables one fully-vectorized
        # crossing-number test over every (candidate point, polygon) pair
        n_edges = np.asarray([len(r) - 1 for r in rings], dtype=np.int64)
        self._edge_off = np.concatenate([[0], np.cumsum(n_edges)])
        if rings:
            allc = np.concatenate(rings)
            keep = np.ones(len(allc) - 1, dtype=bool)
            ring_off = np.concatenate([[0], np.cumsum([len(r) for r in rings])])
            keep[ring_off[1:-1] - 1] = False
            self._ex0 = allc[:-1, 0][keep]
            self._ey0 = allc[:-1, 1][keep]
            self._ex1 = allc[1:, 0][keep]
            self._ey1 = allc[1:, 1][keep]
        else:
            self._ex0 = self._ey0 = self._ex1 = self._ey1 = np.zeros(0)

        # bbox per polygon → covering cells (polygons are buffer-sized, tiny);
        # bboxes also kept for the per-pair prefilter in contains()
        cell_list, poly_list = [], []
        bb = np.zeros((len(rings), 4))
        for i, r in enumerate(rings):
            bb[i] = (r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max())
            cc = cells.covering_cells_bbox(bb[i, 0], bb[i, 1], bb[i, 2], bb[i, 3], res)
            cell_list.append(cc)
            poly_list.append(np.full(len(cc), i, dtype=np.int64))
        self._bb = bb
        cell_ids = np.concatenate(cell_list) if cell_list else np.zeros(0, dtype=np.uint64)
        poly_idx = np.concatenate(poly_list) if poly_list else np.zeros(0, dtype=np.int64)
        order = np.argsort(cell_ids, kind="stable")
        self._cell_sorted = cell_ids[order]
        self._poly_sorted = poly_idx[order]

    def contains(self, px, py) -> tuple[np.ndarray, np.ndarray]:
        """All (point_row, polygon_id) containment pairs — fully vectorized:
        candidate pairs from the cell buckets, then one crossing-number pass
        over the flattened (pair, polygon-edge) expansion."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        qc = cells.cell_of(px, py, self.res)
        lo = np.searchsorted(self._cell_sorted, qc, side="left")
        hi = np.searchsorted(self._cell_sorted, qc, side="right")
        pt, take = _multi_range_gather(lo, hi)
        if len(take) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        cand = self._poly_sorted[take]

        # exact-bbox prefilter: a covering cell overlaps many points whose
        # coordinates lie outside the polygon's bbox; dropping those pairs
        # BEFORE the per-edge expansion cuts the (pair x polygon-edge)
        # temporaries severalfold in dense tiles
        bb = self._bb
        ok = ((px[pt] >= bb[cand, 0]) & (px[pt] <= bb[cand, 2])
              & (py[pt] >= bb[cand, 1]) & (py[pt] <= bb[cand, 3]))
        pt, cand = pt[ok], cand[ok]
        if len(cand) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)

        # expand each surviving pair over that polygon's edges — CHUNKED so
        # the expansion temporaries stay inside a reusable allocator arena
        # (one unbounded expansion in a dense tile is GBs of fresh pages;
        # first-touch faults are globally serialized on some hosts)
        n_edges_per = self._edge_off[cand + 1] - self._edge_off[cand]
        total_exp = int(n_edges_per.sum())
        budget = 2_000_000
        out_pt, out_poly = [], []
        n_chunks = max(1, (total_exp + budget - 1) // budget)
        cuts = np.linspace(0, len(cand), n_chunks + 1).astype(np.int64)
        for a, b in zip(cuts[:-1], cuts[1:]):
            if a == b:
                continue
            c_pt, c_cand = pt[a:b], cand[a:b]
            e_rows, e_pos = _multi_range_gather(self._edge_off[c_cand],
                                                self._edge_off[c_cand + 1])
            qx = px[c_pt[e_rows]]
            qy = py[c_pt[e_rows]]
            x0, y0 = self._ex0[e_pos], self._ey0[e_pos]
            x1, y1 = self._ex1[e_pos], self._ey1[e_pos]
            cond = (y0 <= qy) != (y1 <= qy)
            dy = np.where(y1 != y0, y1 - y0, 1.0)
            xint = x0 + (qy - y0) * (x1 - x0) / dy
            crossing = (cond & (qx < xint)).astype(np.int64)
            n_cross = np.bincount(e_rows, weights=crossing,
                                  minlength=len(c_cand)).astype(np.int64)
            inside = (n_cross % 2) == 1
            out_pt.append(c_pt[inside])
            out_poly.append(self.ids[c_cand[inside]])
        return np.concatenate(out_pt), np.concatenate(out_poly)
