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
