"""Oracle-checkable network-chain queries: each runs ONE reference operator
(or a small composition) through the real distributed kernels over the
deterministic synth city, shaped so a DuckDB oracle can recompute the exact
result from the parquet fixture (netfixture.ensure_city_fixture).

These flip the previously rows-only network semantics (rank M1, importance
J8, gradient J7, landuse J1, bike labels M2/M3, reverse edges M4, PT stops
J5, amenities J4, widths J6, curve splits M8, clustering A1) to hard
row/schema/value checks in the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .. import netfixture
from ..config import DEFAULT
from ..rayctx import ensure_tuned
from ..stages import enrich as E
from ..stages import simplify as S
from . import enrich as PE
from . import simplify as PS

REF_LAT = netfixture.REF_LAT


def _city():
    netfixture.ensure_city_fixture()
    return netfixture.city_tables()


def _edges_ds(edges_t: pa.Table, parallelism: int = 8) -> rd.Dataset:
    ensure_tuned()
    return rd.from_arrow(edges_t).repartition(parallelism)


def network_rank(sf_dir: str) -> rd.Dataset:
    """M1: highway → rank (p3_functions.py:62-97)."""
    _, edges_t, _ = _city()
    ds = _edges_ds(edges_t).map_batches(PS._rank_batch, batch_format="pandas")
    return ds.select_columns(["osmid", "highway", "highway_rank"])


def network_importance(sf_dir: str) -> rd.Dataset:
    """J8: per-node mean rank of the 2 highest-rank incident edges + the
    top edge's highway + the resulting buffer radius (p3_functions.py:236-341)
    — the distributed combiner + grouped-top-2 path."""
    nodes_t, edges_t, _ = _city()
    edges = _edges_ds(edges_t).map_batches(PS._rank_batch, batch_format="pandas")
    nodes = rd.from_arrow(pa.table({"osmid": nodes_t["osmid"],
                                    "x": nodes_t["x"], "y": nodes_t["y"]}))
    out = PS._attach_importance(nodes, edges, None)
    return out.select_columns(["osmid", "highway_rank", "highway_conn", "buffer_r"])


def network_gradient(sf_dir: str) -> rd.Dataset:
    """J7: u/v elevation lookup + gradient/severity (p2_enrichData.py:357-420)."""
    nodes_t, edges_t, dims = _city()
    ds = PE.add_gradient(_edges_ds(edges_t), dims["elevations"],
                         nodes_t["osmid"].to_numpy())
    return ds.select_columns(["osmid", "height_difference", "gradient", "severity"])


def network_landuse_points(sf_dir: str) -> rd.Dataset:
    """J1: landuse point counts within 10 m of the edge polyline + the
    count-based ratio, for all three kinds (p2_enrichData.py:108-118).
    Polygon landuse rows are excluded here — the polygon path has its own
    oracle (network_landuse_poly)."""
    import pyarrow.compute as pc

    _, edges_t, dims = _city()
    dims = dict(dims)
    g = dims["landuse_green"]
    if "geom_type" in g.schema.names:
        dims["landuse_green"] = g.filter(pc.equal(g["geom_type"], "Point"))
    ds = PE.add_landuse_ratios(_edges_ds(edges_t), dims, ref_lat=REF_LAT)
    return ds.select_columns(["osmid", "green_points", "retail_points",
                              "building_points", "green_ratio", "retail_ratio",
                              "building_ratio"])


def network_landuse_poly(sf_dir: str) -> rd.Dataset:
    """J2: fraction of each edge's arc length inside landuse polygons
    (deterministic 2 m arc-length sampling + crossing-number PIP —
    p2_enrichData.py:119-151), plus the combined point+polygon ratio."""
    import ray

    _, edges_t, dims = _city()
    lon, lat, rings = PE._dim_geoms(dims["landuse_green"])
    ref = ray.put((lon, lat, rings))

    def _b(df: pd.DataFrame) -> pd.DataFrame:
        lo, la, rg = ray.get(ref)
        out = E.landuse_ratio(df, lo, la, "green", poly_rings=rg, ref_lat=REF_LAT)
        return pd.DataFrame({
            "osmid": out["osmid"].astype(np.int64),
            "green_poly_r": out["green_ratio_poly"].astype(float).round(6),
            "green_ratio_r": out["green_ratio"].astype(float).round(6),
        })

    return _edges_ds(edges_t).map_batches(_b, batch_format="pandas")


def network_bike_labels(sf_dir: str) -> rd.Dataset:
    """M2+M3: bike_access + the cycleway_category overwrite cascade
    (p2_enrichData.py:159-324)."""
    _, edges_t, _ = _city()
    ds = PE.add_bike_labels(_edges_ds(edges_t))
    return ds.select_columns(["osmid", "bike_access", "cycleway_category"])


def network_reverse_bike(sf_dir: str) -> rd.Dataset:
    """M4: generated reverse bike_only rows + bike_access fixups, via the
    canonical-pair groupby anti-join (p2_enrichData.py:179-211)."""
    _, edges_t, _ = _city()
    ds = PE.add_reverse_bike_edges(PE.add_bike_labels(_edges_ds(edges_t)))
    return ds.select_columns(["osmid", "u", "v", "bike_access"])


def network_pt_stops(sf_dir: str) -> rd.Dataset:
    """J5: stops snap to nearest car edge ≤30 m; per-edge count + joined
    names (p2_enrichData.py:559-602), two-pass distributed argmin."""
    _, edges_t, dims = _city()
    ds = PE.add_pt_stops(_edges_ds(edges_t), dims["pt_stops"],
                         max_distance_m=30.0, ref_lat=REF_LAT)
    return ds.select_columns(["osmid", "pt_stop_on", "pt_stop_count", "pt_stop_routes"])


def network_pt_stops_rel(sf_dir: str) -> rd.Dataset:
    """S4 + J10 + J5 off PARSED relations: the PBF-shaped pre-extracted
    tables (synth.synth_pt_relations — the osmium handler's dicts
    flattened) are parsed by the distributed ``parse_pt_relations``
    (marker co-location exchanges only), J10-filtered by the distributed
    ``filter_pt_stops_ds``, and the surviving POINT stops — sorted by
    (relation_id, seq) for a deterministic stop_row order — feed the same
    add_pt_stops kNN as network_pt_stops. Way-member platforms survive the
    parse (LineString WKB, exercised by pytest) but are excluded from the
    point-snap join. The DuckDB oracle mirrors the ENTIRE chain — parse
    (joins over the raw relation parquet), name fallback, J10, kNN — so a
    match verifies the parser itself, not just the join."""
    from .. import synth
    from . import network as PN

    ensure_tuned()
    nodes_t, edges_t, dims = _city()
    rels = synth.synth_pt_relations(nodes_t, seed=netfixture.CITY_SEED)
    stops = PN.parse_pt_relations(
        rd.from_arrow(rels["rel_tags"]), rd.from_arrow(rels["rel_members"]),
        rd.from_arrow(rels["osm_nodes"]), rd.from_arrow(rels["osm_ways"]))
    filt = PN.filter_pt_stops_ds(stops).to_pandas()
    filt = (filt[filt["geom_type"] == "Point"]
            .sort_values(["relation_id", "seq"], kind="mergesort")
            .reset_index(drop=True))
    stops_t = pa.Table.from_pandas(filt[["name", "geometry"]],
                                   preserve_index=False)
    ds = PE.add_pt_stops(_edges_ds(edges_t), stops_t,
                         max_distance_m=30.0, ref_lat=REF_LAT)
    return ds.select_columns(["osmid", "pt_stop_on", "pt_stop_count",
                              "pt_stop_routes"])


def network_amenities(sf_dir: str) -> rd.Dataset:
    """J4: nearest bike-accessible edge ≤200 m gets amenity_on; all within
    get amenity_nearby (p2_enrichData.py:495-557)."""
    _, edges_t, dims = _city()
    ds = PE.add_bicycle_parking(PE.add_bike_labels(_edges_ds(edges_t)),
                                dims["bike_amenities"], radius_m=200.0,
                                ref_lat=REF_LAT)
    return ds.select_columns(["osmid", "amenity_on", "amenity_nearby"])


def network_widths(sf_dir: str) -> rd.Dataset:
    """J6: per-edge min cycle-path width (p2_enrichData.py:472-493)."""
    _, edges_t, dims = _city()
    ds = PE.add_cycle_path_widths(_edges_ds(edges_t), dims["cycle_path_widths"])
    return ds.select_columns(["osmid", "width_cycle_path"])


def network_split_curves(sf_dir: str) -> rd.Dataset:
    """M8: sub-edges after sharp-angle curve splitting, with the
    deterministic derived ids (p3_functions.py:99-234)."""
    _, edges_t, _ = _city()
    ds = _edges_ds(edges_t).map_batches(PS._split_curves_batch, batch_format="pandas")

    def _shape(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "osmid": df["osmid"].astype(np.int64),
            "u": df["u"].astype(np.int64),
            "v": df["v"].astype(np.int64),
            "length_r": df["length"].astype(float).round(6),
        })

    return ds.map_batches(_shape, batch_format="pandas")


def network_cluster(sf_dir: str) -> rd.Dataset:
    """A1: the full distributed clustering chain (cell pair-gen → iterative
    min-label propagation → per-component merge map) over a dense
    deterministic point cloud (p3_functions.py:371-484). Components stay
    below the KMeans threshold by construction, so the merge map is exactly
    the connected-components semantics a recursive-CTE oracle recomputes."""
    netfixture.ensure_cluster_fixture()
    ensure_tuned()
    pts = netfixture.cluster_points()
    nodes = rd.from_arrow(pts).repartition(8)
    mm = PS.cluster_merge_map_ds(nodes, threshold=S.CLUSTER_THRESHOLD,
                                 res=PS.pair_gen_res(None, REF_LAT),
                                 ref_lat=REF_LAT,
                                 join_partitions=PS._num_partitions(pts.num_rows))

    def _shape(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "osmid": df["osmid"].astype(np.int64),
            "merged_by": df["merged_by"].astype(np.int64),
            "mx_r": df["mx"].astype(float).round(9),
            "my_r": df["my"].astype(float).round(9),
            "merged": df["merged"].astype(str),
        })

    return mm.map_batches(_shape, batch_format="pandas")


def network_landuse_raster(sf_dir: str, nx: int = 64, ny: int = 64) -> rd.Dataset:
    """VECTOR→RASTER burn — the raster leg of the raster↔vector pair (the
    DEM sampler `stages/elevation.py` is raster→vector): rasterize the
    green landuse polygons onto a fixed nx×ny grid over the city bbox,
    each cell carrying how many polygons contain its center
    (crossing-number parity, the same predicate as the J2 sampled clip,
    p2_enrichData.py:119-151) — the coverage-grid product a tiling engine
    feeds to downstream ML rasters.

    Shape: the GRID is the big side and is enumerated as a range dataset
    (at real scale: 10^8+ cells, embarrassingly parallel blocks); the
    polygon set is the broadcast small side (`ray.put` once). Zero
    shuffle — each block burns its own cells against the shared edge
    table, vectorized as one (cells × ring-edges) crossing matrix.

    Exactness: cell centers come from one fixed IEEE tree
    (x0 + (i+0.5)·(x1−x0)/nx, bbox = node coord min/max) mirrored by the
    SQL, and the crossing predicate matches the J2 oracle's expression
    term-for-term, so the per-cell counts are bit-checkable."""
    import ray

    nodes_t, _, dims = _city()
    lon, lat, rings = PE._dim_geoms(dims["landuse_green"])
    x = nodes_t["x"].to_numpy()
    y = nodes_t["y"].to_numpy()
    x0, x1 = float(np.min(x)), float(np.max(x))
    y0, y1 = float(np.min(y)), float(np.max(y))
    # flat ring-edge table (few polys × few edges — the broadcast side)
    ex0, ey0, ex1, ey1, epoly = [], [], [], [], []
    for p, r in enumerate(rings):
        ex0.append(r[:-1, 0]); ey0.append(r[:-1, 1])
        ex1.append(r[1:, 0]);  ey1.append(r[1:, 1])
        epoly.append(np.full(len(r) - 1, p, np.int64))
    edges = (np.concatenate(ex0), np.concatenate(ey0),
             np.concatenate(ex1), np.concatenate(ey1),
             np.concatenate(epoly), len(rings))
    ref = ray.put(edges)

    def burn(df: pd.DataFrame) -> pd.DataFrame:
        gx0, gy0, gx1, gy1, gp, npoly = ray.get(ref)
        cid = df["id"].to_numpy().astype(np.int64)
        ix = cid % nx
        iy = cid // nx
        cx = x0 + (ix.astype(np.float64) + 0.5) * (x1 - x0) / nx
        cy = y0 + (iy.astype(np.float64) + 0.5) * (y1 - y0) / ny
        # (cells × ring-edges) crossing-number matrix, same expression as
        # the J2 oracle: half-open y straddle + x-intercept compare (the
        # horizontal-edge 1.0 guard is inert — the straddle is False)
        Y0, Y1 = gy0[None, :], gy1[None, :]
        X0, X1 = gx0[None, :], gx1[None, :]
        CY, CX = cy[:, None], cx[:, None]
        den = np.where(gy1 != gy0, gy1 - gy0, 1.0)[None, :]
        hit = (((Y0 <= CY) != (Y1 <= CY))
               & (CX < X0 + (CY - Y0) * (X1 - X0) / den))
        # per-(cell, poly) crossing parity -> per-cell covering-poly count
        # (loop over the BROADCAST side only — #polys, never #cells)
        cross = np.zeros((len(cid), npoly), np.int64)
        for p in range(npoly):
            cross[:, p] = hit[:, gp == p].sum(axis=1)
        inside = (cross % 2 == 1)
        return pd.DataFrame({
            "ix": ix, "iy": iy,
            "n_polys": inside.sum(axis=1).astype(np.int64),
            "covered": inside.any(axis=1).astype(np.int64),
        })

    ensure_tuned()
    grid = rd.range(nx * ny).repartition(8)
    return grid.map_batches(burn, batch_format="pandas")
