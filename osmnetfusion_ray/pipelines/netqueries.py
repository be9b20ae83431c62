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
