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
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .. import cells, geom
from ..functions import hashing
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


def build_tiled_network_state(
    nodes: pa.Table,
    edges: pa.Table,
    buffer_m: float = 50.0,
    max_snap_m: float = 500.0,
    tile_res: int | None = None,
) -> dict:
    """Per-tile network shards for the TILED join: the scale path for when
    the network side (10^8+ segments) no longer fits a single broadcast
    object. Segments/nodes are replicated into every coarse tile within
    their query halo (max_snap_m for segments, buffer_m for nodes), so a
    page only ever consults its own tile's shard and still gets the EXACT
    same answer as the global broadcast (every candidate within the radius
    is present in the tile). Distances use ONE global reference latitude so
    tiling never changes a threshold comparison."""
    coords, offsets = geom.wkb_linestrings_to_flat(edges["geometry"].to_pylist())
    edge_ids = np.arange(edges.num_rows, dtype=np.int64)
    seg_edge = np.repeat(edge_ids, np.diff(offsets) - 1)
    keep = np.ones(len(coords) - 1, dtype=bool) if len(coords) > 1 else np.zeros(0, bool)
    keep[offsets[1:-1] - 1] = False
    ax, ay = coords[:-1, 0][keep], coords[:-1, 1][keep]
    bx, by = coords[1:, 0][keep], coords[1:, 1][keep]
    seg_ref_lat = float(np.median(ay)) if len(ay) else 0.0
    nx = nodes["x"].to_numpy()
    ny = nodes["y"].to_numpy()
    node_ids = nodes["osmid"].to_numpy()
    node_ref_lat = float(np.median(ny)) if len(ny) else 0.0
    if tile_res is None:
        # tiles at least one snap radius wide → halo = expanded-bbox cover
        tile_res = cells.res_for_radius(2 * max_snap_m, lat=seg_ref_lat)

    def _covering(xmin, ymin, xmax, ymax, halo_m, ref_lat):
        mx = geom.M_PER_DEG_LAT * np.cos(np.radians(ref_lat))
        dlon, dlat = halo_m / mx, halo_m / geom.M_PER_DEG_LAT
        ix0, iy0 = cells.xy_index(xmin - dlon, ymin - dlat, tile_res)
        ix1, iy1 = cells.xy_index(xmax + dlon, ymax + dlat, tile_res)
        spans = ((ix1 - ix0 + 1) * (iy1 - iy0 + 1)).astype(np.int64)
        row = np.repeat(np.arange(len(xmin), dtype=np.int64), spans)
        offs = np.concatenate([[0], np.cumsum(spans)])
        local = np.arange(int(spans.sum()), dtype=np.int64) - offs[row]
        w = (ix1 - ix0 + 1)[row].astype(np.int64)
        cx = ix0[row] + (local % w).astype(np.uint64)
        cy = iy0[row] + (local // w).astype(np.uint64)
        return row, cells.encode_xy(cx, cy, tile_res)

    srow, stile = _covering(np.minimum(ax, bx), np.minimum(ay, by),
                            np.maximum(ax, bx), np.maximum(ay, by),
                            max_snap_m, seg_ref_lat)
    nrow, ntile = _covering(nx, ny, nx, ny, buffer_m, node_ref_lat)

    tiles: dict[int, object] = {}
    for tile in np.unique(np.concatenate([stile, ntile])):
        sm = srow[stile == tile]
        nm = nrow[ntile == tile]
        tiles[int(tile)] = ray.put({
            "seg": (ax[sm], ay[sm], bx[sm], by[sm], seg_edge[sm]),
            "nodes": (nx[nm], ny[nm], node_ids[nm]),
        })
    return {
        "tiles": tiles,
        "tile_res": tile_res,
        "seg_ref_lat": seg_ref_lat,
        "node_ref_lat": node_ref_lat,
        "buffer_m": buffer_m,
        "max_snap_m": max_snap_m,
    }


class _TileCache:
    """Per-task tile index cache: fetch + index a tile's shard on first use
    (zero-copy numpy views out of the object store), reuse for every later
    batch that touches the tile."""

    def __init__(self, meta: dict):
        self.meta = meta
        self.cache: dict[int, tuple] = {}

    def get(self, tile: int):
        if tile not in self.cache:
            ref = self.meta["tiles"].get(tile)
            if ref is None:
                self.cache[tile] = None
            else:
                shard = ray.get(ref)
                ax, ay, bx, by, seg_edge = shard["seg"]
                seg_idx = (SegmentGridIndex(ax, ay, bx, by, seg_edge,
                                            max_radius_m=self.meta["max_snap_m"],
                                            ref_lat=self.meta["seg_ref_lat"])
                           if len(ax) else None)
                nx, ny, node_ids = shard["nodes"]
                node_idx = (SegmentGridIndex.from_points(
                    nx, ny, node_ids, max_radius_m=self.meta["buffer_m"],
                    ref_lat=self.meta["node_ref_lat"]) if len(nx) else None)
                self.cache[tile] = (seg_idx, node_idx)
        return self.cache[tile]


def join_pages_to_network_tiled(
    pages: rd.Dataset,
    nodes: pa.Table,
    edges: pa.Table,
    *,
    buffer_m: float = 50.0,
    max_snap_m: float = 500.0,
    tile_res: int | None = None,
    geocode_mode: str = "url",
    rows_hint: int | None = None,
) -> rd.Dataset:
    """TILED flagship join: pages are hash-partitioned by coarse tile and
    each partition consults only its tiles' network shards. Same results as
    :func:`join_pages_to_network` (tests assert equality); the tradeoff is
    one page shuffle in exchange for never holding the whole network in one
    object — the right shape once the network side outgrows worker memory.
    Output is the slim column set (payload columns dropped after the text
    invariant, BEFORE the shuffle, so only skinny rows move)."""
    meta = build_tiled_network_state(nodes, edges, buffer_m=buffer_m,
                                     max_snap_m=max_snap_m, tile_res=tile_res)
    geocode = (pages_stages.geocode_cells_batch_docid if geocode_mode == "doc_id"
               else pages_stages.geocode_cells_batch)
    tile_res = meta["tile_res"]

    def _prep(batch: pa.Table) -> pa.Table:
        out = geocode(batch)
        out = pages_stages.verify_text_invariant(out)
        tile = cells.cell_of(out["lon"].to_numpy(), out["lat"].to_numpy(), tile_res)
        keep = [c for c in ("url", "doc_id", "lon", "lat", "cell", "text_hash")
                if c in out.schema.names]
        return out.select(keep).append_column("tile", pa.array(tile, type=pa.uint64()))

    keyed = pages.map_batches(_prep, batch_format="pyarrow")

    def _join_block(df: pd.DataFrame) -> pd.DataFrame:
        cachedict = _join_block.__dict__.setdefault("tc", _TileCache(meta))
        outs = []
        for tile, g in df.groupby("tile", sort=False):
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            entry = cachedict.get(int(tile))
            if entry is None:
                edge_id = np.full(len(g), -1, dtype=np.int64)
                dist = np.full(len(g), -1.0)
                in_node = np.full(len(g), -1, dtype=np.int64)
            else:
                seg_idx, node_idx = entry
                if seg_idx is not None:
                    edge_id, dist = seg_idx.nearest(lon, lat, max_dist_m=max_snap_m)
                    dist = np.where(np.isfinite(dist), dist, -1.0)
                else:
                    edge_id = np.full(len(g), -1, dtype=np.int64)
                    dist = np.full(len(g), -1.0)
                sentinel = np.iinfo(np.int64).max
                in_node = np.full(len(g), sentinel, dtype=np.int64)
                if node_idx is not None:
                    pt_rows, node_hit, _ = node_idx.within(lon, lat, buffer_m)
                    if len(pt_rows):
                        np.minimum.at(in_node, pt_rows, node_hit)
                in_node = np.where(in_node == np.iinfo(np.int64).max, -1, in_node)
            g = g.copy()
            g["edge_id"] = edge_id
            g["snap_dist_m"] = np.round(dist, 6)
            g["node_buffer_id"] = in_node
            outs.append(g)
        if not outs:
            df = df.copy()
            for c, v in (("edge_id", np.int64(0)), ("snap_dist_m", 0.0),
                         ("node_buffer_id", np.int64(0))):
                df[c] = np.zeros(0, type(v)) if len(df) == 0 else v
            return df
        return pd.concat(outs, ignore_index=True)

    from ..rayctx import grouped, n_shuffle_blocks

    # the per-row join kernel is ~14 µs, so a shuffle partition only earns
    # its worker-spawn cost at ~50k rows — with a known page count, size
    # the exchange to the DATA (full cluster width at real scale, a
    # handful of partitions on bench-sized inputs where 32 fresh workers'
    # serialized first-touch faults dominated the whole job)
    if rows_hint is not None:
        nb = max(2, min(n_shuffle_blocks(), rows_hint // 50_000 + 2))
        return keyed.repartition(num_blocks=nb, keys=["tile"]).map_batches(
            _join_block, batch_format="pandas")
    return grouped(keyed, ["tile"], _join_block)


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


# ---------------------------------------------------------------------------
# trajectory snapping (map-matching-shaped composite) + coverage gaps
# ---------------------------------------------------------------------------

def _event_geocode_batch(batch: pa.Table) -> pa.Table:
    """event_id → (lon, lat) with the same SQL-exact Knuth-hash arithmetic
    as corpus.doc_geocode_batch (integer ops + IEEE doubles)."""
    eid = batch["event_id"].to_numpy().astype(np.int64)
    h = (eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    fx = (h % np.uint64(65536)).astype(np.float64) / 65536.0
    fy = (h // np.uint64(65536)).astype(np.float64) / 65536.0
    lon0, lat0, lon1, lat1 = hashing.DEFAULT_BBOX
    return (batch.append_column("lon", pa.array(lon0 + fx * (lon1 - lon0)))
            .append_column("lat", pa.array(lat0 + fy * (lat1 - lat0))))


def user_trajectories(sf_dir: str, max_snap_m: float = 500.0) -> rd.Dataset:
    """Map-matching-shaped composite over the events stream: every event is
    geocoded by the SQL-exact Knuth hash of its event_id, kNN-snapped to
    the fixture city's edge segments through the SAME broadcast-index stage
    as the flagship page join (the stream never shuffles for the spatial
    part), then ONE user-keyed exchange orders each user's snaps by
    (ts, event_id) and collapses the edge sequence into path stats:
    ``n_points``, ``n_moves`` (consecutive edge changes), ``first_edge``,
    ``last_edge``. At 100 TB the event stream is the big side — it flows
    through stateless snap tasks (index broadcast once per worker) and the
    only exchange carries (user_id, ts, edge_id) triples. DuckDB-oracled
    bit-equal via the same point-segment distance arithmetic + a window
    mirror (netoracle.trajectory_oracle)."""
    from .. import netfixture
    from ..rayctx import grouped
    from ..sources import read_table, table_rows

    netfixture.ensure_city_fixture()
    nodes, edges, _ = netfixture.city_tables()
    state_ref = ray.put(build_network_state(nodes, edges, max_snap_m=max_snap_m))

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    pts = ev.map_batches(_event_geocode_batch, batch_format="pyarrow")

    def _snap(batch: pa.Table) -> pa.Table:
        joiner = _cached_join(state_ref)
        out = joiner(batch)
        return out.select(["event_id", "user_id", "ts", "edge_id"])

    snapped = pts.map_batches(_snap, batch_format="pyarrow", batch_size=8192)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        edge = df["edge_id"].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        moved = np.empty(len(df), dtype=bool)
        moved[0:1] = False
        moved[1:] = edge[1:] != edge[:-1]
        moved &= ~new_user
        g = pd.DataFrame({"user_id": uid, "moved": moved.astype(np.int64),
                          "edge_id": edge})
        out = g.groupby("user_id", sort=False, as_index=False).agg(
            n_points=("edge_id", "size"), n_moves=("moved", "sum"),
            first_edge=("edge_id", "first"), last_edge=("edge_id", "last"))
        for c in ("n_points", "n_moves", "first_edge", "last_edge"):
            out[c] = out[c].astype(np.int64)
        return out

    return grouped(snapped, ["user_id"], per_user,
                   rows=table_rows(sf_dir, "events"))


def coverage_gaps(sf_dir: str) -> rd.Dataset:
    """Spatial coverage analysis of the flagship join: per 64x64 grid tile,
    how many pages landed there, how many failed the node-buffer PIP
    (``n_nobuffer``) and how many failed the kNN snap (``n_nosnap``) — the
    anti-join view of page_network_join, reusing its exact oracle as a CTE.
    One streamed pass (geocode + broadcast-index join + per-batch flags),
    one bounded (<=4096-key) exchange."""
    from .. import netfixture
    from ..sources import pages_from_documents
    from ..stages.agg import AggSpec, groupby_agg

    netfixture.ensure_city_fixture()
    nodes, edges, _ = netfixture.city_tables()
    joined = join_pages_to_network(pages_from_documents(sf_dir), nodes, edges,
                                   geocode_mode="doc_id")

    def flags(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy().astype(np.int64)
        h = (doc_id.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        fx = (h % np.uint64(65536)).astype(np.float64) / 65536.0
        fy = (h // np.uint64(65536)).astype(np.float64) / 65536.0
        ix = np.floor(fx * 64).astype(np.int64)
        iy = np.floor(fy * 64).astype(np.int64)
        return pa.table({
            "ix": pa.array(ix), "iy": pa.array(iy),
            "nobuf": pa.array((batch["node_buffer_id"].to_numpy() == -1).astype(np.int64)),
            "nosnap": pa.array((batch["edge_id"].to_numpy() == -1).astype(np.int64)),
        })

    per_tile = joined.map_batches(flags, batch_format="pyarrow")
    return groupby_agg(per_tile, ["ix", "iy"], [
        AggSpec("n_docs", None, "count"),
        AggSpec("n_nobuffer", "nobuf", "sum"),
        AggSpec("n_nosnap", "nosnap", "sum"),
    ], small=True)


MM_RADIUS_M = 300.0       # candidate radius for the HMM snap
MM_K = 3                  # candidate edges per ping (dp vector width)
MM_SWITCH_UNATS = 200_000  # transition penalty when the edge changes
MM_GAP_UNATS = 600_000     # emission for a ping with no candidate in range


def map_match_viterbi(sf_dir: str) -> rd.Dataset:
    """HMM MAP MATCHING — the real-world gold standard for snapping noisy
    GPS streams to a road network (Newson & Krumm 2009 shape), composing
    the engine's two hardest primitives: the flagship join's broadcast
    spatial index produces each ping's top-``MM_K`` candidate edges
    (rank by (dist, edge) over ALL edges within ``MM_RADIUS_M`` — exact,
    via the index's radius query + per-(ping, edge) min over segments),
    and a per-user VITERBI then decodes the cheapest edge sequence where
    emission = floor(snap_dist_m · 1000) and transition = a fixed
    switch penalty when consecutive choices differ (pings with no
    candidate carry a sentinel edge −1 at ``MM_GAP_UNATS``). Unlike the
    independent per-ping snap (user_trajectories), the decoded sequence
    is globally coherent — one far-off ping no longer teleports the
    trajectory, the exact failure mode map matching exists to fix.

    Distribution: the event stream flows through stateless snap tasks
    (network broadcast once — never shuffled spatially); ONE user-keyed
    exchange carries the skinny slot rows; the DP runs depth-vectorized
    across users exactly like viterbi_user_paths. All integers after
    the one shared floor-quantization, so the DuckDB oracle — the same
    candidate ranking in SQL + the dp-vector-as-columns recursive CTE —
    is bit-equal. Output per user: ping count, total decoded cost,
    decoded final edge."""
    from .. import netfixture
    from ..rayctx import grouped
    from ..sources import read_table, table_rows

    netfixture.ensure_city_fixture()
    nodes, edges, _ = netfixture.city_tables()
    state_ref = ray.put(build_network_state(nodes, edges))

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    pts = ev.map_batches(_event_geocode_batch, batch_format="pyarrow")

    def snap_slots(batch: pa.Table) -> pd.DataFrame:
        joiner = _cached_join(state_ref)
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        npts = len(lon)
        pt, eid, dist = joiner.seg_index.within(lon, lat, MM_RADIUS_M)
        e_slots = np.full((npts, MM_K), -1, np.int64)
        d_slots = np.full((npts, MM_K), MM_GAP_UNATS, np.int64)
        if len(pt):
            # per-(ping, edge) min over that edge's segments
            o = np.lexsort((dist, eid, pt))
            pt, eid, dist = pt[o], eid[o], dist[o]
            first = np.concatenate([[True], (pt[1:] != pt[:-1])
                                    | (eid[1:] != eid[:-1])])
            pt, eid, dist = pt[first], eid[first], dist[first]
            # rank per ping by (dist, edge); keep the MM_K best
            o = np.lexsort((eid, dist, pt))
            pt, eid, dist = pt[o], eid[o], dist[o]
            newp = np.concatenate([[True], pt[1:] != pt[:-1]])
            gid = np.cumsum(newp) - 1
            starts = np.concatenate([[0], np.cumsum(np.bincount(gid))])
            loc = np.arange(len(pt)) - starts[gid]
            keep = loc < MM_K
            e_slots[pt[keep], loc[keep]] = eid[keep]
            d_slots[pt[keep], loc[keep]] = np.floor(
                dist[keep] * 1000.0).astype(np.int64)
        out = {"user_id": batch["user_id"].to_numpy().astype(np.int64),
               "t": batch["ts"].cast(pa.int64()).to_numpy(),
               "eid": batch["event_id"].to_numpy().astype(np.int64)}
        for k in range(MM_K):
            out[f"e{k + 1}"] = e_slots[:, k]
            out[f"d{k + 1}"] = d_slots[:, k]
        return pd.DataFrame(out)

    slots = pts.map_batches(snap_slots, batch_format="pyarrow",
                            batch_size=8192)

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.zeros(0, np.int64),
                "n_pings": np.zeros(0, np.int64),
                "best_cost_unats": np.zeros(0, np.int64),
                "end_edge": np.zeros(0, np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        srt = np.lexsort((e, t, u))
        u = u[srt]
        E = np.stack([df[f"e{k + 1}"].to_numpy(np.int64)[srt]
                      for k in range(MM_K)], axis=1)
        D = np.stack([df[f"d{k + 1}"].to_numpy(np.int64)[srt]
                      for k in range(MM_K)], axis=1)
        from ..rayctx import depth_slices, group_positions
        uidx, sizes, ustarts, loc = group_positions(u)
        n_users = len(sizes)
        by_depth, kstarts = depth_slices(uidx, loc)
        kk = loc[by_depth]
        dp = np.zeros((n_users, MM_K), np.int64)
        pe = np.full((n_users, MM_K), -1, np.int64)
        for s in range(len(kstarts) - 1):
            rows = by_depth[kstarts[s]:kstarts[s + 1]]
            uu = uidx[rows]
            if kk[kstarts[s]] == 0:
                dp[uu] = D[rows]
                pe[uu] = E[rows]
            else:
                switch = (pe[uu][:, :, None]
                          != E[rows][:, None, :]) * MM_SWITCH_UNATS
                dp[uu] = (dp[uu][:, :, None] + switch).min(1) + D[rows]
                pe[uu] = E[rows]
        best = dp.min(axis=1)
        slot = dp.argmin(axis=1)  # first min == smallest slot
        return pd.DataFrame({
            "user_id": u[ustarts].astype(np.int64),
            "n_pings": sizes.astype(np.int64),
            "best_cost_unats": best.astype(np.int64),
            "end_edge": pe[np.arange(n_users), slot].astype(np.int64),
        })

    return grouped(slots, ["user_id"], decode,
                   rows=table_rows(sf_dir, "events"))
