"""Flagship pipeline (J11 / north_star): web pages × street network.

pages (10^12-row side, streams, never shuffles)
    → geocode + cell-encode            (stateless map_batches, Arrow)
    → point-in-polygon vs node-cluster buffers + kNN snap to network edges
      (actor pool; per-actor state = cell-bucketed segment + polygon indexes
       built ONCE per actor from a ray.put broadcast of the network side)
    → write partitioned Parquet (resumable layout) / downstream aggregation

Scale design: the network side (10^5–10^8 segments) is broadcast via
``ray.put`` — one object-store copy per node, zero-copy numpy views in every
actor — instead of shuffling 10^12 page rows into network partitions. Skew
in page density (hot urban cells) is irrelevant to this stage because pages
stay in their incoming blocks; it matters only for downstream per-cell
aggregations, which salt hot cells (cells.salt_hot_cells).

Reference semantics: nearest-edge snap mirrors the kNN joins of
p2_enrichData.py:449-602 (sjoin_nearest with max_distance); the
point-in-buffer test mirrors the node-buffer containment of
p3_functions.py:406,532.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .. import geom
from ..stages import pages as pages_stages
from ..state.index import SegmentGridIndex


def build_network_state(
    nodes: pa.Table,
    edges: pa.Table,
    buffer_m: float = 50.0,
    max_snap_m: float = 500.0,
) -> dict:
    """Driver-side: network tables → plain-numpy index inputs (picklable,
    broadcast once). Edges are exploded into segments; node buffers become
    polygon rings."""
    coords, offsets = geom.wkb_linestrings_to_flat(edges["geometry"].to_pylist())
    edge_ids = np.arange(edges.num_rows, dtype=np.int64)
    # segment explode: segment i of edge e
    seg_edge = np.repeat(edge_ids, np.diff(offsets) - 1)
    keep = np.ones(len(coords) - 1, dtype=bool) if len(coords) > 1 else np.zeros(0, bool)
    keep[offsets[1:-1] - 1] = False
    ax, ay = coords[:-1, 0][keep], coords[:-1, 1][keep]
    bx, by = coords[1:, 0][keep], coords[1:, 1][keep]

    nx = nodes["x"].to_numpy()
    ny = nodes["y"].to_numpy()
    node_ids = nodes["osmid"].to_numpy()
    return {
        "seg": (ax, ay, bx, by, seg_edge),
        "edge_u": edges["u"].to_numpy(),
        "edge_v": edges["v"].to_numpy(),
        "nodes": (nx, ny, node_ids),
        "buffer_m": buffer_m,
        "max_snap_m": max_snap_m,
    }


class JoinToNetwork:
    """Actor-pool stage: per-batch PIP + kNN snap against broadcast state.

    ``state_ref`` is a ``ray.ObjectRef`` from ``ray.put(build_network_state(...))``
    — fetched and indexed ONCE in ``__init__`` (per actor), not per batch.
    """

    def __init__(self, state_ref):
        state = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        ax, ay, bx, by, seg_edge = state["seg"]
        self.max_snap_m = state["max_snap_m"]
        self.seg_index = SegmentGridIndex(ax, ay, bx, by, seg_edge, max_radius_m=self.max_snap_m)
        nx, ny, node_ids = state["nodes"]
        # node-buffer membership is the EXACT metric disk (dist <= buffer_m)
        # — better than the reference's polygonized shapely buffers
        # (p3_functions.py:304: a 16-gon under-covers the disk by ~2%) and
        # reproducible by a SQL oracle with the same distance arithmetic
        self.buffer_m = state["buffer_m"]
        self.node_index = SegmentGridIndex.from_points(
            nx, ny, node_ids, max_radius_m=self.buffer_m)
        # warm the query path once per actor: pre-faults the allocator arena
        # and code paths so the first real batch isn't a page-fault storm
        # (this sandbox faults fresh pages at ~100 MB/s, globally serialized)
        rng = np.random.RandomState(0)
        wx = float(np.min(ax)) + rng.rand(8192) * (float(np.max(bx)) - float(np.min(ax)))
        wy = float(np.min(ay)) + rng.rand(8192) * (float(np.max(by)) - float(np.min(ay)))
        self.seg_index.nearest(wx, wy, max_dist_m=self.max_snap_m)
        self.node_index.within(wx, wy, self.buffer_m)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        edge_id, dist = self.seg_index.nearest(lon, lat, max_dist_m=self.max_snap_m)
        pt_rows, node_hit, _ = self.node_index.within(lon, lat, self.buffer_m)
        # smallest node id among containing buffers — deterministic
        sentinel = np.iinfo(np.int64).max
        in_node = np.full(len(lon), sentinel, dtype=np.int64)
        if len(pt_rows):
            np.minimum.at(in_node, pt_rows, node_hit)
        in_node = np.where(in_node == sentinel, -1, in_node)
        dist = np.where(np.isfinite(dist), dist, -1.0)
        return (
            batch.append_column("edge_id", pa.array(edge_id))
            .append_column("snap_dist_m", pa.array(np.round(dist, 6)))
            .append_column("node_buffer_id", pa.array(in_node))
        )


def join_pages_to_network(
    pages: rd.Dataset,
    nodes: pa.Table,
    edges: pa.Table,
    *,
    res: int | None = None,
    buffer_m: float = 50.0,
    max_snap_m: float = 500.0,
    concurrency: int | tuple | None = None,
    batch_size: int = 8192,
    geocode_mode: str = "url",
) -> rd.Dataset:
    """The flagship join as a lazy Dataset transform chain.

    ``batch_size`` is deliberately modest: per-batch temporaries scale with
    (rows x candidates-per-row); smaller batches keep each actor's arena
    small, which matters on hosts where first-touch page faults are slow.
    ``geocode_mode='doc_id'`` uses the SQL-mirrorable integer-hash geocode
    so the whole join can be oracle-checked.
    """
    state_ref = ray.put(build_network_state(nodes, edges, buffer_m=buffer_m, max_snap_m=max_snap_m))
    geocode = (pages_stages.geocode_cells_batch_docid if geocode_mode == "doc_id"
               else pages_stages.geocode_cells_batch)
    ds = pages.map_batches(geocode, batch_format="pyarrow")
    ds = ds.map_batches(
        JoinToNetwork,
        fn_constructor_args=(state_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 8),
        num_cpus=1,
    )
    return ds.map_batches(pages_stages.verify_text_invariant, batch_format="pyarrow")


# per-worker-process cache of built join state: task workers are REUSED
# across Dataset executions (actor processes are not), so a stateless
# map_batches fn + this cache amortizes both process startup and index build
# across every execution in the session. On hosts where process spawn /
# page faults are expensive (this sandbox) this beats an actor pool; on a
# normal cluster the actor-pool variant is equivalent. Keyed by object ref
# so several networks can coexist.
_JOIN_CACHE: dict = {}


def _cached_join(state_ref) -> "JoinToNetwork":
    key = state_ref.hex() if hasattr(state_ref, "hex") else id(state_ref)
    j = _JOIN_CACHE.get(key)
    if j is None:
        j = JoinToNetwork(state_ref)
        _JOIN_CACHE.clear()  # hold at most one network per worker
        _JOIN_CACHE[key] = j
    return j


def join_pages_to_network_slim(
    pages: rd.Dataset,
    nodes: pa.Table,
    edges: pa.Table,
    *,
    buffer_m: float = 50.0,
    max_snap_m: float = 500.0,
    concurrency: int | tuple | None = None,
    batch_size: int = 8192,
    stateful: bool = False,
) -> rd.Dataset:
    """Bench/aggregation variant: same join, but the heavy payload columns
    (html, text) are dropped AFTER the text-invariant check inside the same
    fused stage, so only the skinny join result ever enters the object
    store. On hosts where object-store writes are the global bottleneck
    (this sandbox ~100 MB/s) this is the difference between scaling and
    anti-scaling; on a real cluster it is simply less shuffle IO.
    """
    state_ref = ray.put(build_network_state(nodes, edges, buffer_m=buffer_m, max_snap_m=max_snap_m))

    keep = ["url", "cell", "text_hash", "edge_id", "snap_dist_m", "node_buffer_id"]

    def _slim(joiner: JoinToNetwork, batch: pa.Table) -> pa.Table:
        batch = pages_stages.geocode_cells_batch(batch)
        out = joiner(batch)
        out = pages_stages.verify_text_invariant(out)
        return out.select([c for c in keep if c in out.schema.names])

    if stateful:

        class _GeoJoinSlim(JoinToNetwork):
            def __call__(self, batch: pa.Table) -> pa.Table:
                return _slim(lambda b: JoinToNetwork.__call__(self, b), batch)

        return pages.map_batches(
            _GeoJoinSlim,
            fn_constructor_args=(state_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 8),
            num_cpus=1,
        )

    def _task_fn(batch: pa.Table) -> pa.Table:
        return _slim(_cached_join(state_ref), batch)

    return pages.map_batches(_task_fn, batch_format="pyarrow", batch_size=batch_size)


def join_pages_summary(
    pages: rd.Dataset,
    nodes: pa.Table,
    edges: pa.Table,
    *,
    buffer_m: float = 50.0,
    max_snap_m: float = 500.0,
    batch_size: int = 8192,
) -> rd.Dataset:
    """Throughput/statistics variant: the full geocode + PIP + kNN join per
    batch, reduced IN the same fused task to one summary row per batch
    (rows, snapped count, in-buffer count, snap-distance sum). Nothing but
    ~40 bytes per batch ever enters the object store — the right sink when
    the consumer is an aggregate, and the honest way to measure join
    throughput on hosts where object-store writes serialize globally."""
    state_ref = ray.put(build_network_state(nodes, edges, buffer_m=buffer_m, max_snap_m=max_snap_m))

    def _task_fn(batch: pa.Table) -> pa.Table:
        out = pages_stages.geocode_cells_batch(batch)
        out = _cached_join(state_ref)(out)
        out = pages_stages.verify_text_invariant(out)
        snap = out["snap_dist_m"].to_numpy()
        return pa.table({
            "n_rows": pa.array([out.num_rows], pa.int64()),
            "n_snapped": pa.array([int((out["edge_id"].to_numpy() >= 0).sum())], pa.int64()),
            "n_in_buffer": pa.array([int((out["node_buffer_id"].to_numpy() >= 0).sum())], pa.int64()),
            "snap_dist_sum": pa.array([float(np.where(snap >= 0, snap, 0.0).sum())], pa.float64()),
        })

    return pages.map_batches(_task_fn, batch_format="pyarrow", batch_size=batch_size)


def simplified_to_network_tables(simplified: dict) -> tuple[pa.Table, pa.Table]:
    """Adapt the p3 simplification output ({'nodes','edges'} Datasets) to
    the (nodes, edges) Arrow tables the join state builder expects — so the
    north_star flagship joins pages against the CONTRACTED network (kNN
    snap to merged edges, PIP vs merged-node buffers)."""
    nodes_pd = simplified["nodes"].to_pandas()
    edges_pd = simplified["edges"].to_pandas()
    nodes = pa.table({
        "osmid": pa.array(nodes_pd["g_id"].astype("int64")),
        "x": pa.array(nodes_pd["g_x"].astype(float)),
        "y": pa.array(nodes_pd["g_y"].astype(float)),
    })
    edges = pa.table({
        "u": pa.array(edges_pd["g_u"].astype("int64")),
        "v": pa.array(edges_pd["g_v"].astype("int64")),
        "osmid": pa.array(edges_pd["g_id"].astype("int64")),
        "geometry": pa.array(edges_pd["g_geo_rea"].tolist(), type=pa.binary()),
    })
    return nodes, edges
