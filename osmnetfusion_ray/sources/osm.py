"""OSM-snapshot Parquet ingest: the engine's real-data boundary.

The reference loads a city network from GPKG layers produced by osmnx
(p2_enrichData.py:719-720, p3_simplification.py:116-117). This engine's
equivalent is a pair of Parquet tables — ``nodes`` (osmid, x, y, tags…) and
``edges`` (u, v, osmid, highway, oneway, reversed, length, geometry WKB,
tags…) — read with ``ray.data.read_parquet`` (column-pruned), normalized to
the pipeline schema (M10) and optionally bbox-filtered (S2) with the edge
side semi-joined on the kept node ids via a broadcast sorted-array filter
(node-scale, never a shuffle).

A user points :func:`load_network_snapshot` at their snapshot and feeds the
result straight into ``pipelines.enrich.enrich_network`` /
``pipelines.simplify.simplify_network`` — the same chain the synthetic city
runs (tests verify both paths produce identical outputs on identical
inputs).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

_NODE_DEFAULTS = {"highway": "", "crossing": ""}
_EDGE_REQUIRED = ["u", "v", "osmid", "highway", "oneway", "reversed", "length", "geometry"]


def write_snapshot(nodes_t: pa.Table, edges_t: pa.Table, out_dir: str) -> dict:
    """Write (nodes, edges) Arrow tables as a snapshot directory — the
    fixture writer for tests and the reference layout for users."""
    os.makedirs(out_dir, exist_ok=True)
    np_, ep_ = os.path.join(out_dir, "nodes.parquet"), os.path.join(out_dir, "edges.parquet")
    pq.write_table(nodes_t, np_)
    pq.write_table(edges_t, ep_)
    return {"nodes": np_, "edges": ep_}


def load_network_snapshot(
    nodes_path: str,
    edges_path: str,
    *,
    bbox: tuple[float, float, float, float] | None = None,
    columns: list[str] | None = None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Snapshot parquet → (nodes_ds, edges_ds) in pipeline schema.

    - pruned read (``columns`` limits the EDGE tag columns; core columns are
      always read)
    - M10 normalization: defaults for missing node tags, ``old_osmid``
      bookkeeping column, bool casts for oneway/reversed
    - S2 bbox path: nodes filtered by (x, y) predicate inside the read
      stream; edges kept iff BOTH endpoints survive (broadcast sorted id
      array + searchsorted — the node side is small by design)
    """
    from ..rayctx import ensure_tuned

    ensure_tuned()
    nodes = rd.read_parquet(nodes_path)
    edge_cols = None
    if columns is not None:
        edge_cols = list(dict.fromkeys([*_EDGE_REQUIRED, *columns]))
    edges = rd.read_parquet(edges_path, columns=edge_cols)

    for c in ("osmid", "x", "y"):
        if c not in nodes.schema().names:
            raise ValueError(f"snapshot nodes table is missing required column {c!r}")
    for c in _EDGE_REQUIRED:
        if c not in edges.schema().names:
            raise ValueError(f"snapshot edges table is missing required column {c!r}")

    if bbox is not None:
        lon0, lat0, lon1, lat1 = bbox

        def _nfilter(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["x"].to_numpy() >= lon0) & (df["x"].to_numpy() <= lon1) \
                & (df["y"].to_numpy() >= lat0) & (df["y"].to_numpy() <= lat1)
            return df[m]

        nodes = nodes.map_batches(_nfilter, batch_format="pandas").materialize()
        kept = np.sort(np.concatenate(
            [b["osmid"].to_numpy() for b in nodes.iter_batches(batch_format="pandas")]
            or [np.zeros(0, np.int64)]).astype(np.int64))
        kept_ref = ray.put(kept)

        def _efilter(df: pd.DataFrame) -> pd.DataFrame:
            ids = ray.get(kept_ref)
            u = df["u"].to_numpy().astype(np.int64)
            v = df["v"].to_numpy().astype(np.int64)

            def _in(a):
                if len(ids) == 0:
                    return np.zeros(len(a), bool)
                pos = np.clip(np.searchsorted(ids, a), 0, len(ids) - 1)
                return ids[pos] == a

            return df[_in(u) & _in(v)]

        edges = edges.map_batches(_efilter, batch_format="pandas")

    return (nodes.map_batches(_norm_nodes, batch_format="pandas"),
            edges.map_batches(_norm_edges, batch_format="pandas"))


def _norm_nodes(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c, dflt in _NODE_DEFAULTS.items():
        if c not in df.columns:
            df[c] = dflt
    df["osmid"] = df["osmid"].astype(np.int64)
    if "old_osmid" not in df.columns:
        df["old_osmid"] = df["osmid"].astype(np.int64)
    return df


def _norm_edges(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in ("u", "v", "osmid"):
        df[c] = df[c].astype(np.int64)
    for c in ("oneway", "reversed"):
        df[c] = df[c].astype(bool)
    df["length"] = df["length"].astype(np.float64)
    if "old_osmid" not in df.columns:
        df["old_osmid"] = df["osmid"].astype(np.int64)
    return df


def load_network_gpkg(path: str, nodes_layer: str = "nodes",
                      edges_layer: str = "edges") -> tuple[rd.Dataset, rd.Dataset]:
    """A reference user's existing GPKG network (the p1/p2 artifact loaded
    at p2_enrichData.py:719-720 / p3_simplification.py:116-117) →
    (nodes_ds, edges_ds) in pipeline schema. Nodes missing x/y are derived
    from their Point geometry."""
    from ..rayctx import ensure_tuned
    from ..state.gpkg import read_gpkg
    from .. import geom as G

    ensure_tuned()
    ndf = read_gpkg(path, nodes_layer)
    edf = read_gpkg(path, edges_layer)
    if "x" not in ndf.columns or "y" not in ndf.columns:
        xy = np.asarray([G.wkb_parse(b)[1][0] for b in ndf["geometry"]])
        ndf["x"], ndf["y"] = xy[:, 0], xy[:, 1]
    for c in _EDGE_REQUIRED:
        if c not in edf.columns:
            raise ValueError(f"GPKG edges layer is missing required column {c!r}")
    return (rd.from_pandas(_norm_nodes(ndf)).repartition(4),
            rd.from_pandas(_norm_edges(edf)).repartition(8))


_DIM_TABLES = ["landuse_green", "landuse_retail", "buildings", "traffic_signals",
               "pt_stops", "bike_amenities", "elevations", "cycle_path_widths"]


def load_dim_tables(dim_dir: str) -> dict[str, pa.Table]:
    """Enrichment dim tables from a snapshot directory (one parquet per dim,
    reference file inputs of p2_enrichData.main, p2_enrichData.py:706-720).
    Missing files are simply absent — enrich_network skips those steps."""
    out = {}
    for name in _DIM_TABLES:
        path = os.path.join(dim_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = pq.read_table(path)
    return out
