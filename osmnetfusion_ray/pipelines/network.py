"""Flagship network pipeline: synthetic city → p2 enrichment → p3
simplification (the reference's full runSimplification chain,
runSimplification.py:11-47, re-expressed Ray-Data-first).

The synthetic city + dim tables are deterministic (seeded) — no external
data (BASELINE.json input_hint). The simplified network this produces is
the join target of the page-join flagship (pipelines/pagejoin.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .. import synth
from .enrich import enrich_network
from .simplify import simplify_network


def filter_pt_stops(stops: pa.Table) -> pa.Table:
    """J10 semi-join: keep stops whose member_ref occurs >3 times across
    route relations, one row per member (p1_getFurtherOSMData.py:237-238)."""
    df = stops.to_pandas()
    counts = df["member_ref"].value_counts()
    df = df[df["member_ref"].isin(counts[counts > 3].index)]
    df = df.drop_duplicates("member_ref").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def build_network_inputs(n: int = 16, seed: int = 42, satellites: int | None = None):
    """Driver-side synthesis → (nodes_ds, edges_ds, dims, node_osmids).

    Satellites default to one island per ~4 grid edges — dense-city node
    clusters that make contraction meaningful."""
    from ..rayctx import ensure_tuned

    ensure_tuned()
    if satellites is None:
        satellites = max(4, n * n // 4)
    nodes_t, edges_t = synth.synth_city(n=n, seed=seed, satellites=satellites)
    dims = synth.synth_dim_tables(nodes_t, seed=seed)
    dims["pt_stops"] = filter_pt_stops(dims["pt_stops"])

    def _with_old(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["old_osmid"] = df["osmid"].astype(np.int64)
        return df

    nodes_ds = rd.from_arrow(nodes_t).map_batches(_with_old, batch_format="pandas")
    edges_ds = (rd.from_arrow(edges_t).repartition(8)
                .map_batches(_with_old, batch_format="pandas"))
    return nodes_ds, edges_ds, dims, nodes_t["osmid"].to_numpy()


def simplified_city(n: int = 16, seed: int = 42, cluster_threshold: int | None = None,
                    cfg=None) -> dict:
    """Full chain; returns {'nodes': Dataset, 'edges': Dataset}."""
    nodes_ds, edges_ds, dims, node_osmids = build_network_inputs(n=n, seed=seed)
    nodes_ds, edges_ds = enrich_network(nodes_ds, edges_ds, dims, node_osmids, cfg=cfg)
    return simplify_network(nodes_ds, edges_ds, cluster_threshold=cluster_threshold, cfg=cfg)


def enriched_city(n: int = 16, seed: int = 42, cfg=None) -> tuple[rd.Dataset, rd.Dataset]:
    nodes_ds, edges_ds, dims, node_osmids = build_network_inputs(n=n, seed=seed)
    return enrich_network(nodes_ds, edges_ds, dims, node_osmids, cfg=cfg)


def simplified_from_snapshot(
    nodes_path: str,
    edges_path: str,
    dim_dir: str | None = None,
    *,
    bbox: tuple[float, float, float, float] | None = None,
    cluster_threshold: int | None = None,
    cfg=None,
) -> dict:
    """The non-synthetic entry point: OSM-snapshot parquet → p2 enrichment →
    p3 simplification (reference: runSimplification.py:11-47 over the
    GPKG/osmnx boundary, replaced by pruned parquet reads). ``dim_dir``
    holds the optional enrichment dim parquet tables (sources.osm
    .load_dim_tables); absent dims skip their steps like the reference's
    toggles."""
    from ..sources.osm import load_dim_tables, load_network_snapshot

    nodes_ds, edges_ds = load_network_snapshot(nodes_path, edges_path, bbox=bbox)
    dims = load_dim_tables(dim_dir) if dim_dir else {}
    # node ids in TABLE ORDER — the elevation dim is keyed by node index
    # (p1_getOtherData.py:79-80), so order is the mapping
    node_osmids = np.concatenate(
        [b["osmid"].to_numpy() for b in
         nodes_ds.select_columns(["osmid"]).iter_batches(batch_format="pandas")]
        or [np.zeros(0, np.int64)]).astype(np.int64)
    if "pt_stops" in dims:
        dims["pt_stops"] = filter_pt_stops(dims["pt_stops"])
    nodes_ds, edges_ds = enrich_network(nodes_ds, edges_ds, dims, node_osmids, cfg=cfg)
    return simplify_network(nodes_ds, edges_ds, cluster_threshold=cluster_threshold, cfg=cfg)


# ---------------------------------------------------------------------------
# S4 scale path: PBF-shaped relation parse (p1_getFurtherOSMData.py:93-149)
# ---------------------------------------------------------------------------

def parse_pt_relations(tags_ds: rd.Dataset, members_ds: rd.Dataset,
                       nodes_ds: rd.Dataset, ways_ds: rd.Dataset,
                       *, rows: int | None = None) -> rd.Dataset:
    """S4's osmium-PBF parse re-expressed over PRE-EXTRACTED relation rows
    (the SURVEY §2 mapping: ``map_batches`` over the handler's flattened
    node/way/relation dicts — see ``synth.synth_pt_relations`` for the
    table shapes). One stop row per relation member, tags inherited from
    the relation (p1_getFurtherOSMData.py:121-149): node members become
    Point WKB, way members LineString WKB assembled from the way's node
    list. Every attach is a marker co-location exchange (relation_id →
    tags; node_id → coords; way_id → polyline), so nothing scales with the
    driver: a planet-sized relation file streams through four keyed
    exchanges.

    Documented deviation (M11-style): the reference's missing-name
    fallback is ``str(relationIter)`` — the osmium dict's iteration
    ordinal, undefined across runs/partitionings. The engine uses
    ``str(relation_id)`` (deterministic, partition-independent)."""
    from ..rayctx import ensure_tuned, grouped
    from .. import geom

    ensure_tuned()

    # exchange 1 (relation_id): members + tag markers
    def _tag_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "relation_id": df["relation_id"].to_numpy().astype(np.int64),
            "seq": np.int64(-1), "member_type": "", "member_ref": np.int64(-1),
            "role": "", "route": df["route"].to_numpy(object),
            "name": df["name"].to_numpy(object),
            "operator": df["operator"].to_numpy(object),
            "ref": df["ref"].to_numpy(object),
            "network": df["network"].to_numpy(object),
            "rel_from": df["rel_from"].to_numpy(object),
            "rel_to": df["rel_to"].to_numpy(object)})

    def _member_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            "relation_id": df["relation_id"].to_numpy().astype(np.int64),
            "seq": df["seq"].to_numpy().astype(np.int64),
            "member_type": df["member_type"].to_numpy(object),
            "member_ref": df["member_ref"].to_numpy().astype(np.int64),
            "role": df["role"].to_numpy(object),
            "route": np.full(n, None, object), "name": np.full(n, None, object),
            "operator": np.full(n, None, object), "ref": np.full(n, None, object),
            "network": np.full(n, None, object),
            "rel_from": np.full(n, None, object),
            "rel_to": np.full(n, None, object)})

    def _attach_tags(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["seq"] < 0
        t = df.loc[mark].set_index("relation_id")
        d = df[~mark].copy()
        rid = d["relation_id"]
        for c in ("route", "operator", "ref", "network", "rel_from", "rel_to"):
            d[c] = rid.map(t[c])
        # name fallback: str(relation_id) — see docstring deviation note
        nm = rid.map(t["name"])
        d["name"] = np.where(pd.isna(nm), rid.astype(str), nm)
        return d.rename(columns={"route": "mode", "role": "stop_type"})

    tagged = grouped(
        members_ds.map_batches(_member_rows, batch_format="pandas").union(
            tags_ds.map_batches(_tag_markers, batch_format="pandas")),
        ["relation_id"], _attach_tags, small=True, rows=rows)

    # exchange 2 (node_id): node members + coord markers → Point WKB.
    # Marker frames are padded to the member schema (Ray union requires
    # aligned schemas across blocks).
    _STOP_COLS = ["relation_id", "seq", "member_type", "member_ref",
                  "stop_type", "mode", "name", "operator", "ref", "network",
                  "rel_from", "rel_to"]

    def _pad(df: pd.DataFrame) -> pd.DataFrame:
        for c in _STOP_COLS:
            if c not in df.columns:
                df[c] = (np.int64(-1)
                         if c in ("relation_id", "seq", "member_ref")
                         else np.full(len(df), None, object))
        return df

    def _node_markers(df: pd.DataFrame) -> pd.DataFrame:
        return _pad(pd.DataFrame({
            "node_id": df["node_id"].to_numpy().astype(np.int64),
            "lon": df["lon"].to_numpy(np.float64),
            "lat": df["lat"].to_numpy(np.float64)}))[
            ["node_id", "lon", "lat", *_STOP_COLS]]

    def _points_block(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["lon"].notna()
        nl = df.loc[mark].set_index("node_id")
        d = df[~mark].copy()
        lo = d["member_ref"].map(nl["lon"]).to_numpy(np.float64)
        la = d["member_ref"].map(nl["lat"]).to_numpy(np.float64)
        d = d.drop(columns=["node_id", "lon", "lat"])
        d["geometry"] = geom.wkb_points(lo, la)
        d["geom_type"] = "Point"
        return d

    n_members = tagged.map_batches(
        lambda df: df[df["member_type"] == "n"], batch_format="pandas")

    def _key_by_ref(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["node_id"] = df["member_ref"].to_numpy().astype(np.int64)
        df["lon"] = np.nan
        df["lat"] = np.nan
        return df[["node_id", "lon", "lat", *_STOP_COLS]]

    point_stops = grouped(
        n_members.map_batches(_key_by_ref, batch_format="pandas").union(
            nodes_ds.map_batches(_node_markers, batch_format="pandas")),
        ["node_id"], _points_block, small=True, rows=rows)

    # way polylines: way-node rows + coord markers (node_id), then per-way
    # assembly (way_id), then attach to 'w' members (member_ref)
    def _waynode_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node_id": df["node_id"].to_numpy().astype(np.int64),
            "way_id": df["way_id"].to_numpy().astype(np.int64),
            "seq": df["seq"].to_numpy().astype(np.int64),
            "lon": np.nan, "lat": np.nan})

    def _wn_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node_id": df["node_id"].to_numpy().astype(np.int64),
            "way_id": np.int64(-1), "seq": np.int64(-1),
            "lon": df["lon"].to_numpy(np.float64),
            "lat": df["lat"].to_numpy(np.float64)})

    def _wn_attach(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["way_id"] < 0
        nl = df.loc[mark].set_index("node_id")
        d = df[~mark].copy()
        d["lon"] = d["node_id"].map(nl["lon"]).to_numpy(np.float64)
        d["lat"] = d["node_id"].map(nl["lat"]).to_numpy(np.float64)
        return d.drop(columns=["node_id"])

    wn = grouped(
        ways_ds.map_batches(_waynode_rows, batch_format="pandas").union(
            nodes_ds.map_batches(_wn_markers, batch_format="pandas")),
        ["node_id"], _wn_attach, small=True, rows=rows)

    def _assemble(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"member_ref": np.zeros(0, np.int64),
                                 "geometry": np.zeros(0, object)})
        rows_out = []
        for wid, g in df.groupby("way_id", sort=False):
            g = g.sort_values("seq", kind="mergesort")
            coords = np.column_stack([g["lon"].to_numpy(np.float64),
                                      g["lat"].to_numpy(np.float64)])
            rows_out.append((int(wid), geom.wkb_linestring(coords)))
        return pd.DataFrame({
            "member_ref": np.asarray([r[0] for r in rows_out], np.int64),
            "geometry": np.asarray([r[1] for r in rows_out], object)})

    way_geoms = grouped(wn, ["way_id"], _assemble, small=True, rows=rows)

    w_members = tagged.map_batches(
        lambda df: df[df["member_type"] == "w"], batch_format="pandas")

    def _geom_markers(df: pd.DataFrame) -> pd.DataFrame:
        out = _pad(pd.DataFrame({
            "member_ref": df["member_ref"].to_numpy().astype(np.int64),
            "geometry": df["geometry"].to_numpy(object)}))
        out["seq"] = np.int64(-1)
        return out[["geometry", *_STOP_COLS]]

    def _w_attach(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["seq"] < 0
        gl = df.loc[mark].set_index("member_ref")
        d = df[~mark].copy()
        d["geometry"] = d["member_ref"].map(gl["geometry"])
        d["geom_type"] = "LineString"
        return d

    way_stops = grouped(
        w_members.map_batches(
            lambda df: df.assign(
                geometry=np.full(len(df), None, object))[
                ["geometry", *_STOP_COLS]],
            batch_format="pandas").union(
            way_geoms.map_batches(_geom_markers, batch_format="pandas")),
        ["member_ref"], _w_attach, small=True, rows=rows)

    cols = ["relation_id", "seq", "mode", "stop_type", "member_ref", "name",
            "operator", "ref", "network", "rel_from", "rel_to", "geometry",
            "geom_type"]
    return point_stops.select_columns(cols).union(
        way_stops.select_columns(cols))


def filter_pt_stops_ds(stops_ds: rd.Dataset) -> rd.Dataset:
    """Distributed J10 (p1_getFurtherOSMData.py:237-238): ONE
    member_ref-keyed exchange both counts occurrences (keep > 3) and
    dedups to the first row in (relation_id, seq) order — the
    deterministic mirror of the driver-side ``filter_pt_stops``'s
    table-order ``drop_duplicates``."""
    from ..rayctx import ensure_tuned, grouped

    ensure_tuned()

    def _blk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        cnt = df.groupby("member_ref", sort=False)["relation_id"].transform("size")
        d = df[cnt > 3]
        d = d.sort_values(["member_ref", "relation_id", "seq"],
                          kind="mergesort").drop_duplicates("member_ref")
        return d.reset_index(drop=True)

    return grouped(stops_ds, ["member_ref"], _blk, small=True)
