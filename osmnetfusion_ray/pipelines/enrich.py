"""p2 enrichment as a Ray Data pipeline (reference driver:
p2_enrichData.py:706-756).

Execution model: the network edge/node tables stream through
``map_batches``; every dim table (landuse, signals, stops, amenities,
widths, elevations) is small and broadcast once via ``ray.put``.

The kNN joins (signal→node, stop→edge, amenity→edge) need a GLOBAL argmin
per dim row, which a single batch can't decide. Two-pass pattern
(SURVEY.md §2.4 J3-J5): pass 1 streams the network and emits candidate
(dim, element, dist) pairs within the radius against a per-batch local
index; the candidates are dim-sized (small), so the argmin resolution is a
tiny reduction; pass 2 streams the network again appending the resolved
columns from a broadcast map. Per-edge aggregations (landuse counts) need
no second pass — each edge lives in exactly one batch.

The reverse-bike-edge generation (M4) is an anti-join on the directed pair
(v,u): distributed as a canonical-pair groupby — no broadcast of the edge
key set needed at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .. import geom
from ..stages import enrich as E
from ..state.index import SegmentGridIndex


def _dim_points(tab: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    lons, lats = [], []
    for w in tab["geometry"].to_pylist():
        _, c = geom.wkb_parse(w)
        lons.append(float(c[0, 0]))
        lats.append(float(c[0, 1]))
    return np.asarray(lons), np.asarray(lats)


def _dim_geoms(tab: pa.Table) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Split a mixed-geometry dim table into point coords + polygon rings
    (the J2 path, p2_enrichData.py:119-151)."""
    lons, lats, rings = [], [], []
    for w in tab["geometry"].to_pylist():
        t, c = geom.wkb_parse(w)
        if t == geom._WKB_POLYGON:
            rings.append(c)
        else:
            lons.append(float(c[0, 0]))
            lats.append(float(c[0, 1]))
    return np.asarray(lons), np.asarray(lats), rings


# per-worker-process cache of the landuse bundle (point arrays + polygon
# grid indexes): task workers are reused across Dataset executions, so the
# unpickle happens once per process, not once per batch
_LANDUSE_CACHE: dict = {}


def _cached_landuse(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    b = _LANDUSE_CACHE.get(key)
    if b is None:
        b = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        _LANDUSE_CACHE.clear()  # hold at most one bundle per worker
        _LANDUSE_CACHE[key] = b
    return b


# ---------------------------------------------------------------------------
# candidate pass helpers
# ---------------------------------------------------------------------------

def _edge_candidates_batch(df: pd.DataFrame, dim_lon, dim_lat, radius_m, id_col="osmid",
                           subset_mask=None, ref_lat: float | None = None) -> pd.DataFrame:
    """(dim_row, element_id, dist) pairs within radius for one edge batch."""
    sub = df if subset_mask is None else df[subset_mask(df)]
    if len(sub) == 0 or len(dim_lon) == 0:
        return pd.DataFrame({"dim_row": [], "elem": [], "dist": []})
    idx = E._edge_index(sub, max_radius_m=radius_m, ref_lat=ref_lat)
    rows, seg_pos, dist = idx.within(dim_lon, dim_lat, radius_m)
    elem = sub[id_col].to_numpy()[seg_pos]
    out = pd.DataFrame({"dim_row": rows, "elem": elem, "dist": dist})
    # keep best (min dist) per (dim, elem) within the batch — combiner
    return out.sort_values(["dim_row", "elem", "dist"]).groupby(
        ["dim_row", "elem"], sort=False).head(1).reset_index(drop=True)


def _node_candidates_batch(df: pd.DataFrame, dim_lon, dim_lat, radius_m,
                           ref_lat: float | None = None) -> pd.DataFrame:
    if len(df) == 0 or len(dim_lon) == 0:
        return pd.DataFrame({"dim_row": [], "elem": [], "dist": []})
    idx = SegmentGridIndex.from_points(
        df["x"].to_numpy(), df["y"].to_numpy(),
        np.arange(len(df), dtype=np.int64), max_radius_m=radius_m, ref_lat=ref_lat)
    rows, pos, dist = idx.within(dim_lon, dim_lat, radius_m)
    return pd.DataFrame({"dim_row": rows, "elem": df["osmid"].to_numpy()[pos], "dist": dist})


def _resolve_argmin(cand: pd.DataFrame) -> pd.DataFrame:
    """Global nearest element per dim row; ties → smallest element id."""
    if len(cand) == 0:
        return cand
    return cand.sort_values(["dim_row", "dist", "elem"]).groupby(
        "dim_row", sort=False).head(1).reset_index(drop=True)


# ---------------------------------------------------------------------------
# enrichment stages
# ---------------------------------------------------------------------------

def add_landuse_ratios(edges_ds: rd.Dataset, dims: dict[str, pa.Table],
                       ref_lat: float | None = None) -> rd.Dataset:
    """J1/J2 ×3 (green / retail / building) in ONE fused per-batch kernel —
    per-edge aggregation, no second pass needed."""
    from ..state.index import PolygonGridIndex

    kinds = [("green", "landuse_green"), ("retail", "landuse_retail"),
             ("building", "buildings")]
    pts = {}
    for kind, tab_name in kinds:
        tab = dims.get(tab_name)
        lon, lat, rings = (_dim_geoms(tab) if tab is not None and tab.num_rows
                           else (np.zeros(0), np.zeros(0), []))
        # the polygon index is built ONCE here and broadcast — rebuilding
        # it per batch (a per-ring bbox-cover loop) was the enrich wall at
        # city scale
        pidx = (PolygonGridIndex(rings, np.arange(len(rings), dtype=np.int64),
                                 max_radius_m=200.0) if rings else None)
        # broadcast the INDEX only — its internals are a handful of flat
        # arrays (near-zero unpickle cost); the raw ring list is thousands
        # of small numpy objects that every actor would deserialize
        pts[kind] = (lon, lat, pidx)
    bundles_ref = ray.put([(kind, *pts[kind]) for kind, _ in kinds])

    # stateless cached task, NOT an actor pool: with one ~2800-row block
    # per task every pool actor is a FRESH process that pays this host's
    # globally-serialized first-touch page faults on its single batch
    # (measured 17 s mean UDF vs 0.4 s warm); task workers are already
    # warm from the upstream stages and the per-process bundle unpickle
    # is cached below (same pattern as pagejoin._cached_join)
    def _landuse_batch(df: pd.DataFrame) -> pd.DataFrame:
        return E.landuse_ratio_multi(df, _cached_landuse(bundles_ref),
                                     ref_lat=ref_lat)

    return edges_ds.map_batches(_landuse_batch, batch_format="pandas",
                                batch_size=4096)


def add_bike_labels(edges_ds: rd.Dataset) -> rd.Dataset:
    """M3 (bike_access) + M2 (cycleway_category) — stateless kernels."""

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bike_access"] = E.bike_access_label(df)
        df["cycleway_category"] = E.cycleway_category(df)
        return df

    return edges_ds.map_batches(_batch, batch_format="pandas")


def _reverse_bike_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized M4 over a canonical-pair-partitioned block: both (u,v)
    and (v,u) of every pair are fully local, so directed-pair existence is
    one sorted-key membership test — no per-group Python loop
    (p2_enrichData.py:179-209 semantics; the loop was the enrich wall #2)."""
    if len(df) == 0:
        return df.drop(columns=["pair_lo", "pair_hi"], errors="ignore")
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    # directed-pair membership via a sorted structured array (osmids may
    # exceed 2^31 so no bit-packing)
    keys = np.empty(len(u), dtype=[("u", np.int64), ("v", np.int64)])
    keys["u"], keys["v"] = u, v
    keys_sorted = np.sort(keys, order=("u", "v"))
    q = np.empty(len(u), dtype=keys.dtype)
    q["u"], q["v"] = v, u
    pos = np.clip(np.searchsorted(keys_sorted, q), 0, len(keys_sorted) - 1)
    opp_exists = keys_sorted[pos] == q

    cand = E.reverse_bike_candidates(df).to_numpy()
    df = df.copy()
    # opposites of candidates-with-opposite become bike_access=yes: a row is
    # such an opposite iff its reversed key matches a candidate's key
    cand_keys = np.sort(keys[cand], order=("u", "v"))
    if len(cand_keys):
        p2 = np.clip(np.searchsorted(cand_keys, q), 0, len(cand_keys) - 1)
        is_opp_of_cand = cand_keys[p2] == q
        df.loc[is_opp_of_cand, "bike_access"] = "yes"

    gen_mask = cand & ~opp_exists
    if gen_mask.any():
        new_df = df[gen_mask].copy()
        new_df["u"] = v[gen_mask]
        new_df["v"] = u[gen_mask]
        new_df["bike_access"] = "bike_only"
        new_df["reversed"] = ~new_df["reversed"].astype(bool)
        new_df["osmid"] = E.REV_BIKE_BASE + new_df["osmid"].astype(np.int64)
        df = pd.concat([df, new_df], ignore_index=True)
    return df.drop(columns=["pair_lo", "pair_hi"], errors="ignore")


def add_reverse_bike_edges(edges_ds: rd.Dataset) -> rd.Dataset:
    """M4: anti-join on the opposite directed pair via canonical-pair
    groupby — both (u,v) and (v,u) land in one group."""

    def _key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        df["pair_lo"] = np.minimum(u, v)
        df["pair_hi"] = np.maximum(u, v)
        return df

    from ..rayctx import grouped

    return grouped(edges_ds.map_batches(_key, batch_format="pandas"),
                   ["pair_lo", "pair_hi"], _reverse_bike_block, small=True)


def add_gradient(edges_ds: rd.Dataset, elevations: pa.Table, node_osmids: np.ndarray) -> rd.Dataset:
    """J7: elevation lookup on u and v + gradient/severity arithmetic.
    ``elevations`` is keyed by node INDEX (p1_getOtherData.py:79-80); the
    osmid order array maps it onto node ids."""
    idx = elevations["idx"].to_numpy()
    elev = elevations["elevation"].to_numpy()
    lookup = {int(node_osmids[i]): float(e) for i, e in zip(idx, elev) if i < len(node_osmids)}
    ref = ray.put(lookup)

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        return E.add_gradient(df, ray.get(ref))

    return edges_ds.map_batches(_batch, batch_format="pandas")


def add_gradient_from_dem(nodes_ds: rd.Dataset, edges_ds: rd.Dataset) -> rd.Dataset:
    """J7 via ST3: node elevations sampled from the actor-resident DEM
    raster (stages/elevation.py), then the same gradient arithmetic. The
    sampling streams the node table through an actor pool; the (node →
    elevation) result is node-sized and broadcast for the edge pass."""
    from ..stages.elevation import DEMSampler

    sampled = nodes_ds.select_columns(["osmid", "x", "y"]).map_batches(
        DEMSampler, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    lookup = dict(zip(sampled["osmid"].astype(int), sampled["elevation"].astype(float)))
    ref = ray.put(lookup)

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        return E.add_gradient(df, ray.get(ref))

    return edges_ds.map_batches(_batch, batch_format="pandas")


def add_traffic_lights(nodes_ds: rd.Dataset, signals: pa.Table, max_distance_m=20.0,
                       ref_lat: float | None = None) -> rd.Dataset:
    """J3: signals snap to nearest node ≤20 m (two-pass argmin)."""
    sig_lon, sig_lat = _dim_points(signals)
    sig_ids = np.asarray(signals["id"].to_pylist())
    dims_ref = ray.put((sig_lon, sig_lat))

    def _cand(df: pd.DataFrame) -> pd.DataFrame:
        lo, la = ray.get(dims_ref)
        return _node_candidates_batch(df, lo, la, max_distance_m, ref_lat=ref_lat)

    cand = nodes_ds.map_batches(_cand, batch_format="pandas").to_pandas()
    best = _resolve_argmin(cand)
    node_map: dict[int, list[str]] = {}
    for r in best.sort_values("dim_row").itertuples(index=False):
        node_map.setdefault(int(r.elem), []).append(str(sig_ids[int(r.dim_row)]))
    ref = ray.put({k: ",".join(v) for k, v in node_map.items()})

    def _apply(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        df = df.copy()
        df["traffic_signals"] = df["osmid"].map(lambda o: m.get(int(o), ""))
        return df

    return nodes_ds.map_batches(_apply, batch_format="pandas")


def add_pt_stops(edges_ds: rd.Dataset, stops: pa.Table, max_distance_m=30.0,
                 ref_lat: float | None = None) -> rd.Dataset:
    """J5: stops snap to nearest car-highway edge ≤30 m; per edge count +
    joined names (p2_enrichData.py:559-602). Stop prefilter (boundary +
    frequency semi-join, J10) happens in the dim-table builder."""
    lon, lat = _dim_points(stops)
    names = np.asarray(stops["name"].to_pylist())
    dims_ref = ray.put((lon, lat))

    def _cand(df: pd.DataFrame) -> pd.DataFrame:
        lo, la = ray.get(dims_ref)
        return _edge_candidates_batch(
            df, lo, la, max_distance_m,
            subset_mask=lambda d: d["highway"].isin(E.CAR_HIGHWAYS), ref_lat=ref_lat)

    cand = edges_ds.map_batches(_cand, batch_format="pandas").to_pandas()
    best = _resolve_argmin(cand)
    per_edge: dict[int, list[str]] = {}
    for r in best.sort_values("dim_row").itertuples(index=False):
        per_edge.setdefault(int(r.elem), []).append(str(names[int(r.dim_row)]))
    ref = ray.put({k: ", ".join(v) for k, v in per_edge.items()})

    def _apply(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        df = df.copy()
        routes = df["osmid"].map(lambda o: m.get(int(o), ""))
        df["pt_stop_routes"] = routes
        df["pt_stop_on"] = (routes != "").astype(int)
        df["pt_stop_count"] = routes.map(lambda s: len(s.split(", ")) if s else 0)
        return df

    return edges_ds.map_batches(_apply, batch_format="pandas")


def add_bicycle_parking(edges_ds: rd.Dataset, amenities: pa.Table, radius_m=200.0,
                        ref_lat: float | None = None) -> rd.Dataset:
    """J4: nearest bike-accessible edge gets amenity_on; all within 200 m
    get amenity_nearby (p2_enrichData.py:495-557)."""
    lon, lat = _dim_points(amenities)
    names = np.asarray(
        [f"{a} {c}" for a, c in zip(amenities["amenity"].to_pylist(),
                                    amenities["capacity"].to_pylist())]
        if "capacity" in amenities.schema.names else amenities["amenity"].to_pylist())
    dims_ref = ray.put((lon, lat))

    def _cand(df: pd.DataFrame) -> pd.DataFrame:
        lo, la = ray.get(dims_ref)
        return _edge_candidates_batch(
            df, lo, la, radius_m, subset_mask=lambda d: d["bike_access"] == "yes",
            ref_lat=ref_lat)

    cand = edges_ds.map_batches(_cand, batch_format="pandas").to_pandas()
    best = _resolve_argmin(cand)
    # vectorized label maps (an itertuples loop here cost ~20 s at 1M
    # candidate pairs): names attached by fancy-indexing, the join-order
    # semantics preserved by sorting before the groupby agg
    bs = best.sort_values("dim_row")
    on_ser = (pd.Series(names[bs["dim_row"].to_numpy().astype(np.int64)],
                        index=bs["elem"].to_numpy().astype(np.int64))
              .groupby(level=0).agg(", ".join))
    cs = cand.assign(name=names[cand["dim_row"].to_numpy().astype(np.int64)])
    nearby_ser = (cs.sort_values("name").groupby(cs["elem"].astype(np.int64))["name"]
                  .agg(", ".join))
    ref = ray.put((on_ser.to_dict(), nearby_ser.to_dict()))

    def _apply(df: pd.DataFrame) -> pd.DataFrame:
        on, nearby = ray.get(ref)
        df = df.copy()
        ids = df["osmid"].astype(np.int64)
        df["amenity_on"] = ids.map(on).fillna("")
        df["amenity_nearby"] = ids.map(nearby).fillna("")
        return df

    return edges_ds.map_batches(_apply, batch_format="pandas")


def add_cycle_path_widths(edges_ds: rd.Dataset, widths: pa.Table) -> rd.Dataset:
    """J6: broadcast hash left-join on osmid after a groupby-min pre-agg."""
    w = widths.to_pandas()
    ref = ray.put(w)

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        return E.add_cycle_path_width(df, ray.get(ref))

    return edges_ds.map_batches(_batch, batch_format="pandas")


def enrich_network(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    dims: dict[str, pa.Table],
    node_osmids: np.ndarray,
    cfg=None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """The full p2 chain in reference order (p2_enrichData.py:706-756);
    step toggles + radii come from ``cfg`` (PipelineConfig — the engine's
    runSimplification.py:11-47 toggle surface)."""
    from ..config import DEFAULT

    cfg = cfg or DEFAULT
    # fan the inputs across the cluster FIRST: synthetic/from_pandas (and
    # single-file parquet) inputs arrive as 1-8 blocks, and map_batches
    # parallelism is per-BLOCK — a 1-block node table serializes every
    # node-side stage no matter how many CPUs exist (measured: the p3
    # chain's N→4N scaling was pinned at ~0.33 by exactly this)
    from ..rayctx import ensure_fanout

    edges_ds = ensure_fanout(edges_ds)
    nodes_ds = ensure_fanout(nodes_ds)
    if cfg.landuse:
        edges_ds = add_landuse_ratios(edges_ds, dims, ref_lat=cfg.ref_lat)
    edges_ds = add_bike_labels(edges_ds)
    edges_ds = add_reverse_bike_edges(edges_ds)
    if cfg.elevation and "elevations" in dims:
        edges_ds = add_gradient(edges_ds, dims["elevations"], node_osmids)
    elif cfg.elevation:
        edges_ds = add_gradient_from_dem(nodes_ds, edges_ds)

    # M5: coalesce osmnx-style duplicate columns (p2_enrichData.py:735-737).
    # The reference's third call passes ('smoothness', '_36', newName='width')
    # — a typo that would destroy the just-rebuilt smoothness column and
    # shadow the real width; we coalesce the intended ('width', '_36').
    def _coalesce(df: pd.DataFrame) -> pd.DataFrame:
        df = E.merge_similar_columns(df, "surface", "_30", "surface")
        df = E.merge_similar_columns(df, "smoothness", "_40", "smoothness")
        df = E.merge_similar_columns(df, "width", "_36", "width")
        return df

    edges_ds = edges_ds.map_batches(_coalesce, batch_format="pandas")
    edges_ds = edges_ds.materialize()
    if cfg.signals and "traffic_signals" in dims:
        nodes_ds = add_traffic_lights(nodes_ds, dims["traffic_signals"],
                                      max_distance_m=cfg.signal_snap_m,
                                      ref_lat=cfg.ref_lat)
    if cfg.widths and "cycle_path_widths" in dims:
        edges_ds = add_cycle_path_widths(edges_ds, dims["cycle_path_widths"])
    if cfg.amenities and "bike_amenities" in dims:
        edges_ds = add_bicycle_parking(edges_ds, dims["bike_amenities"],
                                       radius_m=cfg.amenity_radius_m,
                                       ref_lat=cfg.ref_lat).materialize()
    if cfg.ptstops and "pt_stops" in dims:
        edges_ds = add_pt_stops(edges_ds, dims["pt_stops"],
                                max_distance_m=cfg.stop_snap_m,
                                ref_lat=cfg.ref_lat).materialize()
    return nodes_ds, edges_ds
