"""p3 simplification as a Ray Data pipeline (reference driver:
p3_simplification.py:83-439, 13 steps).

Stage shape (SURVEY.md §7.3 step 5):

  edges ─ map_batches(split_curves) ─ map_batches(rank) ─┐
  nodes ─ union(new split nodes) ────────────────────────┤
          node importance  = flat-map + groupby(osmid) top-2
          buffering        = map_batches
          clustering       = per-cell pair gen (groupby(cell).map_groups)
                             → iterative min-label propagation to fixpoint
                             (the north_star "iterative groupby(cell)
                             .map_groups rounds with boundary-edge exchange")
                             → groupby(component).map_groups merge map
          edge splitting   = two-phase: broadcast cluster state →
                             map_batches emits split points → apply in arc
                             order (replaces the reference's sequential
                             conflict fixup, p3_functions.py:1005-1072)
          reassign         = map_batches with broadcast merge map
          node merge       = groupby(merged_by).map_groups
          edge merge       = groupby(canonical uv).map_groups
          orient           = map_batches

Scale notes: the page table (10^12 rows) never enters this pipeline — only
the network side does, and its exact-key groupbys (osmid, component,
merged_by, uv_key) are the legitimate shuffles. The two node-sized lookups
(cluster-buffer state, merge map) are SIZE-ADAPTIVE
(``P3_BROADCAST_STATE_MAX_NODES``): below the cap they are driver-built
and shipped once via ``ray.put``; above it the split requests build
through tiled keyed exchanges (``split_requests_tiled``) and the merge map
attaches by hash join — nothing O(N_nodes) ever lands on the driver. Hot
urban cells in the pair-generation groupby are salted by disk-bbox
duplication at a resolution sized to the buffer radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .. import cells, geom
from ..rayctx import ensure_tuned, grouped
from ..stages import simplify as S


def _per_group(keys: list[str], group_fn):
    """Adapter: run a per-group pandas kernel over every key-group within a
    hash-partitioned block (used with :func:`grouped`)."""

    def _block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return group_fn(df)
        parts = [group_fn(g) for _, g in df.groupby(list(keys), sort=False)]
        return pd.concat(parts, ignore_index=True) if parts else group_fn(df.iloc[0:0])

    return _block

def _num_partitions(rows: int | None = None) -> int:
    """Hash-join partitions for node-scale joins — sized to the cluster.
    Each partition is a live aggregator actor; oversizing on small clusters
    wastes startup time and can deadlock when several joins coexist. With a
    known row count the pool shrinks further — a 200-node join does not
    need 16 aggregator actors."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    base = max(2, min(16, cpus // 2))
    if rows is not None:
        return max(2, min(base, rows // 20_000 + 2))
    return base


# ---------------------------------------------------------------------------
# step 1: split curves
# ---------------------------------------------------------------------------

def _split_curves_batch(df: pd.DataFrame, max_angle_initial=S.MAX_ANGLE_INITIAL,
                        max_angle_prev=S.MAX_ANGLE_PREV) -> pd.DataFrame:
    out, _ = S.split_curves(df, max_angle_initial=max_angle_initial,
                            max_angle_prev=max_angle_prev)
    return out


def _new_nodes_from_split_edges(df: pd.DataFrame, base: int) -> pd.DataFrame:
    """Every synthetic split node is the ``u`` of exactly one sub-edge —
    extract (osmid, x, y) from the first geometry coordinate."""
    m = df["u"].to_numpy() >= base
    sub = df[m]
    xs, ys = [], []
    for w in sub["geometry"]:
        _, c = geom.wkb_parse(w)
        xs.append(float(c[0, 0]))
        ys.append(float(c[0, 1]))
    return pd.DataFrame({"osmid": sub["u"].to_numpy(dtype=np.int64),
                         "x": np.asarray(xs), "y": np.asarray(ys)})


# ---------------------------------------------------------------------------
# step 2+3: rank + node importance (J8) — flat-map + grouped top-2
# ---------------------------------------------------------------------------

def _rank_batch(df: pd.DataFrame, ranking: dict | None = None) -> pd.DataFrame:
    df = df.copy()
    df["highway_rank"] = S.add_highway_rank(df["highway"], ranking).astype(np.float64)
    return df


def _importance_pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Partial combiner: emit ≤2 top-rank incident edges per node per batch
    — the groupby then shuffles at most 2 rows per (batch, node)."""
    pairs = pd.DataFrame({
        "osmid": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
        "highway_rank": np.concatenate([df["highway_rank"].to_numpy()] * 2),
        "highway": np.concatenate([df["highway"].to_numpy()] * 2),
    })
    pairs = pairs.sort_values(["osmid", "highway_rank"], ascending=[True, False], kind="stable")
    return pairs.groupby("osmid", sort=False).head(2).reset_index(drop=True)


def _importance_final_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized final top-2 reduction over a hash-partitioned block (every
    osmid fully contained)."""
    df = df.sort_values(["osmid", "highway_rank"], ascending=[True, False], kind="stable")
    top2 = df.groupby("osmid", sort=False).head(2)
    out = top2.groupby("osmid", sort=False).agg(
        highway_rank=("highway_rank", "mean"), highway_conn=("highway", "first"))
    return out.reset_index()


# ---------------------------------------------------------------------------
# step 5/7: clustering — distributed pairs + label propagation
# ---------------------------------------------------------------------------

def pair_gen_res(buffers: dict | None = None, ref_lat: float = 48.0) -> int:
    """The ONE cell resolution every pair-gen batch must share, computed
    driver-side from the global maximum buffer radius and a fixed reference
    latitude. Correctness of the pair cover only needs the resolution to be
    IDENTICAL across batches (two intersecting disks share a covered cell at
    any res); a batch-local choice would let two batches encode the same
    disk at different resolutions and silently drop their cross-batch pair."""
    buffers = buffers or S.HIGHWAY_BUFFERS
    rmax = max(float(v) for v in buffers.values()) if buffers else 18.0
    return cells.res_for_radius(2 * rmax, lat=ref_lat)


def _pair_gen_batch(df: pd.DataFrame, res: int) -> pd.DataFrame:
    """Duplicate each node into every cell its buffer disk's bbox covers —
    two intersecting disks always share ≥1 covered cell, so per-cell local
    pair generation finds every intersecting pair (possibly twice; deduped
    by the downstream groupby). ``res`` MUST be the global pair_gen_res."""
    x = df["x"].to_numpy(dtype=np.float64)
    y = df["y"].to_numpy(dtype=np.float64)
    r = df["buffer_r"].to_numpy(dtype=np.float64)
    mx, my = geom.m_per_deg(y)
    rows = []
    ix0, iy0 = cells.xy_index(x - r / mx, y - r / my, res)
    ix1, iy1 = cells.xy_index(x + r / mx, y + r / my, res)
    spans = ((ix1 - ix0 + 1) * (iy1 - iy0 + 1)).astype(np.int64)
    node = np.repeat(np.arange(len(df), dtype=np.int64), spans)
    offs = np.concatenate([[0], np.cumsum(spans)])
    local = np.arange(int(spans.sum()), dtype=np.int64) - offs[node]
    w = (ix1 - ix0 + 1)[node].astype(np.int64)
    cx = ix0[node] + (local % w).astype(np.uint64)
    cy = iy0[node] + (local // w).astype(np.uint64)
    cell = cells.encode_xy(cx, cy, res)
    return pd.DataFrame({
        "cell": cell.astype(np.uint64),
        "osmid": df["osmid"].to_numpy()[node],
        "x": x[node], "y": y[node], "buffer_r": r[node],
    })


def _pairs_in_cell(g: pd.DataFrame, ref_lat: float | None = None) -> pd.DataFrame:
    """Cell-local pair generation, TRANSITIVELY CLOSED within the cell:
    a local union-find contracts each in-cell component to star edges
    (local-min-id, member), so the global label propagation only has to
    stitch components that span cell borders — it converges in ~1 round
    instead of the component diameter."""
    ids = g["osmid"].to_numpy()
    a, b = S.cluster_pairs_local(
        g["x"].to_numpy(dtype=np.float64), g["y"].to_numpy(dtype=np.float64),
        g["buffer_r"].to_numpy(dtype=np.float64), ids, ref_lat=ref_lat)
    if len(a) == 0:
        return pd.DataFrame({"a": np.zeros(0, np.int64), "b": np.zeros(0, np.int64)})
    touched = np.unique(np.concatenate([a, b]))
    lab = S.components_from_pairs(touched, a, b)
    m = lab != touched
    return pd.DataFrame({"a": lab[m], "b": touched[m]})


# below this many pair edges, connected components run as a driver-side
# union-find instead of distributed label-propagation rounds (see the
# size-adaptive branch in cluster_labels_ds). The cutover is sized by
# BYTES, not row-count aesthetics: 20M pairs = two int64 columns = 320 MB
# on the driver, well inside budget, and the union-find itself is ~2 s —
# while ONE distributed propagation round costs several hash-shuffle
# stages of fixed actor-pool spin-up (measured: 240k pairs crossing the
# old 200k cutoff took ~90 s/pass in the loop vs <1 s in the union-find —
# a 180 s cliff in the n=200 bench city). A continental network
# (pairs ≈ O(nodes) ≈ 10^8, multi-GB) still takes the distributed path,
# where those fixed costs amortize over real per-round work.
LOCAL_CC_MAX_PAIRS = 20_000_000


def cluster_labels_ds(nodes_ds: rd.Dataset, max_rounds: int = 64,
                      res: int | None = None, jump_after: int = 4,
                      ref_lat: float | None = None,
                      join_partitions: int | None = None,
                      rows: int | None = None) -> rd.Dataset:
    """Component label (min member osmid) per node, fully on Ray Data.

    Pairs come from per-cell ``map_groups``; labels converge by iterative
    min-label propagation: each round ships each node's current label to its
    neighbors (hash join on the pair list) and takes the min — an exact-key
    shuffle per round, terminating the round in which no message undercuts
    any label (boundary-edge exchange loop of the north_star). Component
    diameters are tiny (a cluster spans a street intersection), so rounds
    ≈ 2-4 in practice; past ``jump_after`` rounds each round also applies
    pointer jumping (label ← label[label], one extra hash join) so even a
    corridor chain spanning D cells converges in O(log D) instead of O(D)
    rounds. Non-convergence within ``max_rounds`` raises — a silently
    inconsistent merge map must never escape this function.
    """
    res = pair_gen_res() if res is None else res
    # directed message edges (node ← nbr), both directions; duplicate pairs
    # from the cell-replicated generation are harmless to a min-reduction,
    # so no dedup shuffle is spent on them
    msg_edges = (
        grouped(nodes_ds.map_batches(lambda df: _pair_gen_batch(df, res),
                                     batch_format="pandas"),
                ["cell"],
                _per_group(["cell"], lambda g: _pairs_in_cell(g, ref_lat=ref_lat)),
                small=False, rows=rows)
        .map_batches(
            lambda df: pd.DataFrame({
                "node": np.concatenate([df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)]),
                "nbr": np.concatenate([df["b"].to_numpy(np.int64), df["a"].to_numpy(np.int64)]),
            }),
            batch_format="pandas")
    ).materialize()
    return labels_from_edges_ds(nodes_ds, msg_edges, max_rounds=max_rounds,
                                jump_after=jump_after,
                                join_partitions=join_partitions, rows=rows)


def labels_from_edges_ds(ids_ds: rd.Dataset, msg_edges: rd.Dataset, *,
                         max_rounds: int = 64, jump_after: int = 4,
                         join_partitions: int | None = None,
                         rows: int | None = None) -> rd.Dataset:
    """GENERIC distributed connected components: (osmid) ids + materialized
    directed message edges (node, nbr; both directions present) → (osmid,
    label) with label = min member id. This is the machinery behind the
    geometric node clustering AND the corpus near-dup clustering — the
    same size-adaptive shape: driver union-find below LOCAL_CC_MAX_PAIRS,
    iterative min-label propagation with pointer jumping above it."""
    labels = ids_ds.map_batches(
        lambda df: pd.DataFrame({"osmid": df["osmid"], "label": df["osmid"]}),
        batch_format="pandas").materialize()

    n_pairs = msg_edges.count()
    if n_pairs == 0:
        return labels

    if n_pairs <= LOCAL_CC_MAX_PAIRS:
        # size-adaptive local path: below this bound, 2+ distributed
        # label-propagation rounds (a hash join + keyed shuffle +
        # materialize EACH) cost far more than a driver-side union-find
        # over the pair list (≤ ~3 MB of int64 here). The node table itself
        # never lands on the driver — labels come back as two sorted numpy
        # arrays broadcast via ray.put, applied with searchsorted inside
        # map_batches; nodes without a pair keep label = osmid. Smaller-
        # root-wins union-find yields exactly the min-member label the
        # distributed rounds converge to (tests assert path equality).
        pe = msg_edges.to_pandas()
        a = pe["node"].to_numpy().astype(np.int64)
        b = pe["nbr"].to_numpy().astype(np.int64)
        uniq = np.unique(np.concatenate([a, b]))
        ia = np.searchsorted(uniq, a)
        ib = np.searchsorted(uniq, b)
        uf = geom.UnionFind(len(uniq))
        for i, j in zip(ia.tolist(), ib.tolist()):
            uf.union(i, j)
        lab = uniq[uf.labels()]
        lab_ref = ray.put((uniq, lab))

        def _apply_labels(df: pd.DataFrame) -> pd.DataFrame:
            u, lv = ray.get(lab_ref)
            ids = df["osmid"].to_numpy().astype(np.int64)
            pos = np.clip(np.searchsorted(u, ids), 0, max(len(u) - 1, 0))
            hit = u[pos] == ids if len(u) else np.zeros(len(ids), bool)
            out = np.where(hit, lv[pos], ids)
            return pd.DataFrame({"osmid": ids, "label": out})

        return ids_ds.map_batches(_apply_labels, batch_format="pandas")

    def _min_block(df: pd.DataFrame) -> pd.DataFrame:
        """Grouped min with IN-BLOCK convergence detection: the union tags
        current-label rows flag=0 and incoming messages flag=1; a node
        'changed' iff some message undercuts its current label. The loop
        terminates the same round a fixpoint is reached — no extra no-op
        round, no global-aggregate pool."""
        g = df.groupby("osmid", sort=False)
        mn = g["label"].min()
        old = df[df["flag"] == 0].set_index("osmid")["label"]
        changed = mn < old.reindex(mn.index)
        return pd.DataFrame({"osmid": mn.index.to_numpy(), "label": mn.to_numpy(),
                             "changed": changed.to_numpy()})

    def _n_changed(ds: rd.Dataset) -> int:
        rows = ds.map_batches(
            lambda df: pd.DataFrame({"s": [int(df["changed"].sum())]}),
            batch_format="pandas").take_all()
        return sum(r["s"] for r in rows)

    converged = False
    for rnd in range(max_rounds):
        # ship each node's current label to its neighbors: ONE hash join per
        # round (two joins in one DAG can deadlock the actor-pool shuffle on
        # small clusters; each join is materialized before the next), then a
        # grouped min with combiner semantics
        jp = join_partitions or _num_partitions()
        offered = msg_edges.join(labels, join_type="inner", num_partitions=jp,
                                 on=("nbr",), right_on=("osmid",))
        msgs = offered.map_batches(
            lambda df: pd.DataFrame({"osmid": df["node"], "label": df["label"],
                                     "flag": np.ones(len(df), dtype=np.int8)}),
            batch_format="pandas")
        base = labels.map_batches(
            lambda df: pd.DataFrame({"osmid": df["osmid"], "label": df["label"],
                                     "flag": np.zeros(len(df), dtype=np.int8)}),
            batch_format="pandas")
        merged = grouped(base.union(msgs), ["osmid"], _min_block,
                         small=True, rows=rows).materialize()
        if _n_changed(merged) == 0:
            labels = merged.select_columns(["osmid", "label"])
            converged = True
            break
        # merged is materialized; the column projection is a zero-copy view
        labels = merged.select_columns(["osmid", "label"])
        if rnd + 1 >= jump_after:
            # pointer jumping: label ← label[label]. Valid because labels are
            # min-monotone (label[x] <= x always), so label[label[x]] only
            # tightens; halves the remaining chain length every round.
            parents = labels.map_batches(
                lambda df: pd.DataFrame({"p_osmid": df["osmid"], "p_label": df["label"]}),
                batch_format="pandas")
            jumped = labels.join(parents, join_type="inner",
                                 num_partitions=jp,
                                 on=("label",), right_on=("p_osmid",))
            labels = jumped.map_batches(
                lambda df: pd.DataFrame({"osmid": df["osmid"], "label": df["p_label"]}),
                batch_format="pandas").materialize()
    if not converged:
        raise RuntimeError(
            f"cluster label propagation did not converge in {max_rounds} rounds "
            f"— component diameter exceeds the round budget; raise max_rounds")
    return labels


def _merge_map_group(g: pd.DataFrame, threshold: int) -> pd.DataFrame:
    if len(g) == 0:
        return S.cluster_merge_map(g, np.zeros(0, dtype=np.int64), threshold)
    return S.cluster_merge_map(g, np.full(len(g), g["label"].iloc[0]), threshold)


def _merge_map_block(df: pd.DataFrame, threshold: int) -> pd.DataFrame:
    """Hash-partitioned merge-map block: the vast majority of labels are
    SINGLETON components — handled in one vectorized pass (a per-group
    Python loop here was the p3 chain's biggest wall at 10⁴ nodes); only
    genuine multi-node components run the rep/centroid/KMeans kernel."""
    cols = ["osmid", "merged_by", "mx", "my", "merged"]
    if len(df) == 0:
        return pd.DataFrame(columns=cols)
    sizes = df.groupby("label")["osmid"].transform("size")
    singles = df[sizes == 1]
    parts = [pd.DataFrame({
        "osmid": singles["osmid"].to_numpy(np.int64),
        "merged_by": singles["osmid"].to_numpy(np.int64),
        "mx": singles["x"].to_numpy(np.float64),
        "my": singles["y"].to_numpy(np.float64),
        "merged": np.full(len(singles), "", dtype=object),
    })]
    multi = df[sizes >= 2]
    for _, g in multi.groupby("label", sort=False):
        parts.append(_merge_map_group(g, threshold))
    return pd.concat(parts, ignore_index=True)[cols] if len(parts) > 1 else parts[0]


def cluster_merge_map_ds(nodes_ds: rd.Dataset, threshold: int = S.CLUSTER_THRESHOLD,
                         res: int | None = None,
                         ref_lat: float | None = None,
                         join_partitions: int | None = None,
                         rows: int | None = None) -> rd.Dataset:
    """nodes (osmid,x,y,highway_rank,buffer_r) → merge map dataset
    (osmid, merged_by, mx, my, merged)."""
    labels = cluster_labels_ds(nodes_ds, res=res, ref_lat=ref_lat,
                               join_partitions=join_partitions, rows=rows)
    joined = nodes_ds.join(labels, join_type="inner",
                           num_partitions=join_partitions or _num_partitions(),
                           on=("osmid",))
    return grouped(joined, ["label"],
                   lambda df: _merge_map_block(df, threshold), small=False, rows=rows)


# ---------------------------------------------------------------------------
# above-cap distributed cluster-buffer state (round-2 scale flag): below this
# many nodes the split-request state and the merge map are driver-built and
# broadcast ONCE as compact objects (one ray.put beats ~4 extra exchanges);
# above it nothing O(N_nodes) may touch the driver — the split-request phase
# switches to the tiled keyed-exchange build below and the reassign step to
# left_outer hash-join attachment. Same explicit-cap + forced-path-equality
# contract as SMALL_SIMPLIFY_MAX_EDGES / LOCAL_CC_MAX_PAIRS.
# ---------------------------------------------------------------------------
P3_BROADCAST_STATE_MAX_NODES = 2_000_000

_TILE_OFF = 1 << 20   # lon/lat tile ids fit ±2^20 at the minimum tile size
_TILE_SPAN = 1 << 21


def split_requests_tiled(edges_ds: rd.Dataset, mm1: rd.Dataset,
                         nodes_ds: rd.Dataset, *, max_r: float,
                         ref_lat: float | None,
                         join_partitions: int | None = None,
                         n_edges: int | None = None,
                         n_nodes: int | None = None,
                         merge_small: bool = False) -> rd.Dataset:
    """Distributed build of the edge-split requests — the scale path that
    replaces ``ClusterBufferState``'s whole-table driver collect with three
    keyed exchanges (the doc_dbscan cell+halo shape):

    1. member rows: ``mm1 ⋈ nodes`` on osmid (hash join), then a merged_by
       co-location filters multi-member clusters — each member row carries
       its cluster centroid (mx, my) so no tile ever needs remote state;
    2. tile exchange: members go to the tile of their point, edges to every
       tile overlapped by their bbox ⊕ max_r halo (a member disk can only
       hit / contain an endpoint of an edge within max_r of it, so every
       (edge, cluster) interaction is visible in the member's own tile);
    3. the per-tile kernel runs the SAME ``_split_requests_core`` as the
       broadcast path and emits per-(edge, cluster) rows with the LOCAL
       endpoint-inside flag; a final (edge, rep)-keyed exchange ORs the
       flags across tiles (a cluster's members may straddle tiles) and
       dedupes the identical split points.

    Result-identical to the broadcast path (the split point is a pure
    function of edge geometry + cluster centroid; forced-path equality
    tested)."""
    from ..rayctx import grouped
    from ..stages import simplify as S

    jp = join_partitions or _num_partitions()

    nodes_slim = nodes_ds.select_columns(["osmid", "x", "y", "buffer_r"])
    mem = mm1.select_columns(["osmid", "merged_by", "mx", "my"]).join(
        nodes_slim, join_type="inner", num_partitions=jp, on=("osmid",))

    def _multi(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"rep": np.zeros(0, np.int64),
                                 "px": np.zeros(0), "py": np.zeros(0),
                                 "pr": np.zeros(0), "cx": np.zeros(0),
                                 "cy": np.zeros(0)})
        sz = df.groupby("merged_by", sort=False)["osmid"].transform("size")
        d = df[sz >= 2]
        return pd.DataFrame({
            "rep": d["merged_by"].to_numpy().astype(np.int64),
            "px": d["x"].to_numpy(np.float64),
            "py": d["y"].to_numpy(np.float64),
            "pr": d["buffer_r"].to_numpy(np.float64),
            "cx": d["mx"].to_numpy(np.float64),
            "cy": d["my"].to_numpy(np.float64)})

    members = grouped(mem, ["merged_by"], _multi, small=merge_small,
                      rows=n_nodes)

    import math

    phi = math.radians(ref_lat if ref_lat is not None else 48.0)
    coslat = max(math.cos(phi), 0.05)
    deg_y = max(max_r, 1.0) / 111320.0          # meters → lat degrees
    deg_x = deg_y / coslat
    ts = max(64.0 * deg_y, 0.002)               # tile edge, degrees
    hx, hy = 1.05 * deg_x, 1.05 * deg_y         # halo (≥ max_r, margin)

    def _mem_tiles(df: pd.DataFrame) -> pd.DataFrame:
        tx = np.floor(df["px"].to_numpy(np.float64) / ts).astype(np.int64)
        ty = np.floor(df["py"].to_numpy(np.float64) / ts).astype(np.int64)
        out = df.copy()
        out["tile"] = (tx + _TILE_OFF) * _TILE_SPAN + (ty + _TILE_OFF)
        out["kind"] = np.int64(0)
        out["osmid"] = np.int64(-1)
        out["geometry"] = b""
        return out

    def _edge_tiles(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"tile": np.zeros(0, np.int64), "kind": np.zeros(0, np.int64),
                "rep": np.zeros(0, np.int64), "px": np.zeros(0),
                "py": np.zeros(0), "pr": np.zeros(0), "cx": np.zeros(0),
                "cy": np.zeros(0), "osmid": np.zeros(0, np.int64),
                "geometry": np.zeros(0, object)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        from .. import geom
        coords, offsets = geom.wkb_linestrings_to_flat(df["geometry"].tolist())
        mnx = np.minimum.reduceat(coords[:, 0], offsets[:-1])
        mxx = np.maximum.reduceat(coords[:, 0], offsets[:-1])
        mny = np.minimum.reduceat(coords[:, 1], offsets[:-1])
        mxy = np.maximum.reduceat(coords[:, 1], offsets[:-1])
        tx0 = np.floor((mnx - hx) / ts).astype(np.int64)
        tx1 = np.floor((mxx + hx) / ts).astype(np.int64)
        ty0 = np.floor((mny - hy) / ts).astype(np.int64)
        ty1 = np.floor((mxy + hy) / ts).astype(np.int64)
        nx_t = tx1 - tx0 + 1
        ny_t = ty1 - ty0 + 1
        cnt = nx_t * ny_t
        ei = np.repeat(np.arange(len(df), dtype=np.int64), cnt)
        pos = (np.arange(int(cnt.sum()), dtype=np.int64)
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        gx = tx0[ei] + pos // ny_t[ei]
        gy = ty0[ei] + pos % ny_t[ei]
        geoms = df["geometry"].to_numpy(object)
        osmid = df["osmid"].to_numpy().astype(np.int64)
        n = len(ei)
        return pd.DataFrame({
            "tile": (gx + _TILE_OFF) * _TILE_SPAN + (gy + _TILE_OFF),
            "kind": np.ones(n, np.int64),
            "rep": np.full(n, -1, np.int64),
            "px": np.full(n, np.nan), "py": np.full(n, np.nan),
            "pr": np.full(n, np.nan), "cx": np.full(n, np.nan),
            "cy": np.full(n, np.nan),
            "osmid": osmid[ei], "geometry": geoms[ei]})

    tiled = members.map_batches(_mem_tiles, batch_format="pandas").union(
        edges_ds.select_columns(["osmid", "geometry"]).map_batches(
            _edge_tiles, batch_format="pandas"))

    def _tile_kernel(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("tile", sort=False):
            m = g[g["kind"] == 0]
            e = g[g["kind"] == 1]
            if not len(m) or not len(e):
                continue
            order = np.argsort(m["rep"].to_numpy(), kind="mergesort")
            rep = m["rep"].to_numpy(np.int64)[order]
            mpx = m["px"].to_numpy(np.float64)[order]
            mpy = m["py"].to_numpy(np.float64)[order]
            mpr = m["pr"].to_numpy(np.float64)[order]
            first = np.concatenate([[True], rep[1:] != rep[:-1]])
            outs.append(S._split_requests_core(
                e[["osmid", "geometry"]], rep, mpx, mpy, mpr,
                rep[first], m["cx"].to_numpy(np.float64)[order][first],
                m["cy"].to_numpy(np.float64)[order][first],
                max_r, ref_lat))
        if not outs:
            return S._split_requests_empty()
        return pd.concat(outs, ignore_index=True)

    pairs = grouped(tiled, ["tile"], _tile_kernel, small=merge_small,
                    rows=(n_edges or 0) + (n_nodes or 0) or None)

    def _resolve(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return S._split_requests_empty().drop(columns=["inside"])
        bad = df.groupby(["edge_osmid", "rep"], sort=False)["inside"].transform("max")
        d = df[~bad.astype(bool)].drop_duplicates(["edge_osmid", "rep"])
        return d[["edge_osmid", "rep", "t_arc", "px", "py"]].reset_index(drop=True)

    return grouped(pairs, ["edge_osmid", "rep"], _resolve, small=merge_small,
                   rows=n_edges)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

def _collect_pandas(ds: rd.Dataset, columns: list[str]) -> pd.DataFrame:
    return ds.select_columns(columns).to_pandas()


# below this many edges the whole p3 chain runs driver-side on the same
# kernels: the distributed chain's ~15 hash-shuffle/join stages cost ~1 s
# of aggregator-actor startup EACH on this host — a 237-edge toy city spent
# ~13 s on pure pool spin-up. Same size-adaptive contract as the
# connected-components and near-dup-verify paths (path equality tested).
SMALL_SIMPLIFY_MAX_EDGES = 4_000


def _union_nodes_local(nodes_pd: pd.DataFrame, new_pd: pd.DataFrame) -> pd.DataFrame:
    """Driver mirror of :func:`_union_nodes` (same keep-columns + norm)."""
    keep = [c for c in ("osmid", "x", "y", "highway", "crossing", "old_osmid")
            if c in nodes_pd.columns]

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in keep:
            if c not in df.columns:
                df[c] = "" if c in ("highway", "crossing") else np.nan
        if "old_osmid" in keep:
            df["old_osmid"] = pd.to_numeric(df["old_osmid"], errors="coerce").astype(np.float64)
        return df[keep]

    return pd.concat([norm(nodes_pd), norm(new_pd)], ignore_index=True)


def _attach_importance_local(nodes_pd: pd.DataFrame, edges_pd: pd.DataFrame,
                             buffers: dict) -> pd.DataFrame:
    """Driver mirror of :func:`_attach_importance` (merge suffixes replicate
    the Ray join's collision-only right suffix)."""
    attrs = _importance_final_block(_importance_pairs_batch(edges_pd))
    df = nodes_pd.merge(attrs, on="osmid", how="left", suffixes=("", "_imp"))
    rank_col = "highway_rank_imp" if "highway_rank_imp" in df.columns else "highway_rank"
    conn_col = "highway_conn_imp" if "highway_conn_imp" in df.columns else "highway_conn"
    df["highway_rank"] = pd.to_numeric(df[rank_col], errors="coerce")
    df["highway_conn"] = df[conn_col]
    df["buffer_r"] = S.buffer_radii(df["highway_conn"], buffers)
    return df.drop(columns=[c for c in (rank_col, conn_col) if c.endswith("_imp")])


def _merge_map_local(nodes_pd: pd.DataFrame, threshold: int, ref_lat: float) -> pd.DataFrame:
    """Driver mirror of :func:`cluster_merge_map_ds`: one all-nodes pair
    generation (exact disk intersection), union-find components, then the
    same singleton-vectorized merge-map block."""
    ids = nodes_pd["osmid"].to_numpy().astype(np.int64)
    a, b = S.cluster_pairs_local(
        nodes_pd["x"].to_numpy(np.float64), nodes_pd["y"].to_numpy(np.float64),
        nodes_pd["buffer_r"].to_numpy(np.float64), ids, ref_lat=ref_lat)
    labels = S.components_from_pairs(ids, a, b)
    withlab = nodes_pd.copy()
    withlab["label"] = labels
    return _merge_map_block(withlab, threshold)


def _simplify_local(nodes_pd: pd.DataFrame, edges_pd: pd.DataFrame,
                    cluster_threshold: int, cfg, ranking: dict,
                    buffers: dict) -> tuple[pd.DataFrame, pd.DataFrame]:
    """The full 13-step p3 chain, driver-side, on the SAME kernels as the
    distributed path — each pipeline stage maps to exactly one kernel call
    here, so any semantic change to a kernel changes both paths."""
    # 1. split curves + new split nodes
    edges_pd = _split_curves_batch(edges_pd, cfg.max_angle_initial, cfg.max_angle_prev)
    nodes_all = _union_nodes_local(
        nodes_pd, _new_nodes_from_split_edges(edges_pd, S.SPLIT1_BASE))
    # 2. highway rank
    edges_pd = _rank_batch(edges_pd, ranking)
    # 3+4. node importance + buffer radii
    nodes_all = _attach_importance_local(nodes_all, edges_pd, buffers)
    # 5. cluster pass 1 (drives edge splitting only)
    mm1 = _merge_map_local(nodes_all, cluster_threshold, cfg.ref_lat)
    # 6. two-phase edge splitting
    state = S.ClusterBufferState(
        mm1, nodes_all[["osmid", "x", "y", "buffer_r"]], ref_lat=cfg.ref_lat)
    req = S.split_requests(edges_pd, state)
    if len(req):
        edges_pd, _ = S.apply_edge_splits(edges_pd, req)
    nodes_all = _union_nodes_local(
        nodes_all, _new_nodes_from_split_edges(edges_pd, S.SPLIT2_BASE))
    # 6b+7. re-rank importance over the final edge set, re-buffer, recluster
    nodes_all = _attach_importance_local(nodes_all, edges_pd, buffers)
    mm2 = _merge_map_local(nodes_all, cluster_threshold, cfg.ref_lat)
    # 8. reassign edges to merged nodes
    order = np.argsort(mm2["osmid"].to_numpy(), kind="stable")
    ids_sorted = mm2["osmid"].to_numpy()[order].astype(np.int64)
    mb = mm2["merged_by"].to_numpy()[order].astype(np.int64)
    mxa = mm2["mx"].to_numpy()[order].astype(np.float64)
    mya = mm2["my"].to_numpy()[order].astype(np.float64)
    edges_pd = S.reassign_edges_arrays(edges_pd, ids_sorted, mb, ids_sorted, mxa,
                                       ids_sorted, mya)
    # 10. merge nodes
    nodes_out = S.merge_nodes_block(
        S.prepare_nodes_for_merge(nodes_all.merge(mm2, on="osmid", how="inner")))
    # 11-13. merge edges by canonical uv key, orient
    edges_out = S.merge_edges_block(
        S.prepare_edges_for_merge(S.add_uv_keys(edges_pd)))
    return nodes_out, S.orient_edges(edges_out)


def simplify_network(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    *,
    cluster_threshold: int | None = None,
    cfg=None,
) -> dict:
    """Full p3: returns {'nodes': Dataset, 'edges': Dataset} of the merged
    network. Input: enriched nodes/edges datasets (WKB geometry). Knobs
    (ranking, buffers, angles, cluster threshold) come from ``cfg``
    (PipelineConfig; configFile.py:171-228 equivalents)."""
    from ..config import DEFAULT

    cfg = cfg or DEFAULT
    if cluster_threshold is None:
        cluster_threshold = cfg.cluster_threshold
    ranking = dict(cfg.highway_ranking)
    buffers = dict(cfg.highway_buffers)
    ensure_tuned()

    # stage timing, printed only when OSMNF_PROF is set (perf triage)
    import os as _os
    import time as _time
    _prof = bool(_os.environ.get("OSMNF_PROF"))
    _t = [_time.time()]

    def _mark(label: str):
        if _prof:
            now = _time.time()
            print(f"  <p3:{label}> {now - _t[0]:.1f}s", flush=True)
            _t[0] = now
    # size-adaptive: a tiny network pays ~15 shuffle stages' fixed
    # actor-pool costs in the distributed chain — below the cap the SAME
    # kernels run once each on the driver (path equality tested + golden
    # snapshot); a real city takes the distributed path below
    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= SMALL_SIMPLIFY_MAX_EDGES:
        nodes_out, edges_out = _simplify_local(
            nodes_ds.to_pandas(), edges_ds.to_pandas(),
            cluster_threshold, cfg, ranking, buffers)
        return {"nodes": rd.from_pandas(nodes_out),
                "edges": rd.from_pandas(edges_out)}
    # per-block map parallelism: narrow inputs serialize the chain (see
    # rayctx.ensure_fanout)
    from ..rayctx import ensure_fanout

    edges_ds = ensure_fanout(edges_ds).materialize()
    nodes_ds = ensure_fanout(nodes_ds)
    # 1. split curves (stateless flat-map; deterministic ids)
    edges_ds = edges_ds.map_batches(
        lambda df: _split_curves_batch(df, cfg.max_angle_initial, cfg.max_angle_prev),
        batch_format="pandas").materialize()
    _mark("split_curves")
    split_nodes1 = edges_ds.map_batches(
        lambda df: _new_nodes_from_split_edges(df, S.SPLIT1_BASE), batch_format="pandas")
    nodes_all = _union_nodes(nodes_ds, split_nodes1)

    n_edges = edges_ds.count()  # metadata-cheap: edges_ds is materialized

    # 2. highway rank
    edges_ds = edges_ds.map_batches(lambda df: _rank_batch(df, ranking), batch_format="pandas")

    # 3+4. node importance + buffer radii
    nodes_all = _attach_importance(nodes_all, edges_ds, buffers,
                                   rows=2 * n_edges).materialize()
    _mark("attach_importance_1")
    # joins below are node-scale; size their aggregator pools to the actual
    # row count so a toy city doesn't spin 16 actors per join. The merge
    # groupbys get FULL-width pools once the network is real-sized — the
    # per-group AnEdge construction is the chain's main compute and must
    # spread over every core.
    n_nodes = nodes_all.count()
    jp = _num_partitions(n_nodes)
    # the node/edge merge groupbys are the chain's main COMPUTE (a Python
    # per-group kernel over ~0.7 groups/edge) — full-width pools pay off as
    # soon as the per-group work dwarfs aggregator startup (~1 s/actor on
    # this host): small pools measured 258 s for the merge tail at 161k
    # edges where full width cuts it ~4x. Below ~20k edges the startup
    # cost dominates and the small pool wins (earlier BENCH note).
    merge_small = n_edges < 20_000

    # shared pair-gen resolution: ONE global value for every clustering batch
    # (a batch-local choice breaks cross-batch pair generation — see
    # pair_gen_res)
    res = pair_gen_res(buffers)

    # 5. cluster pass 1 (drives edge splitting only)
    mm1 = cluster_merge_map_ds(nodes_all, cluster_threshold, res=res,
                               ref_lat=cfg.ref_lat, join_partitions=jp,
                               rows=n_nodes)

    # 6. split edges passing through merged cluster buffers (two-phase).
    # Phase 1 streams edges against the broadcast cluster-buffer state and
    # emits split requests; phase 2 applies them DISTRIBUTED — a left-outer
    # hash join of edges onto their requests + a grouped per-edge apply. No
    # request rows are ever collected on the driver (round-1 flag: the
    # request table is O(edge×buffer crossings) and can reach GBs at 10^8
    # edges).
    # size-adaptive state layout (P3_BROADCAST_STATE_MAX_NODES): only below
    # the cap may node-scaled tables land on the driver. The env override
    # exists for benchmarking the tiled path below the cap (tests force it
    # by monkeypatching the constant).
    import os as _os2
    use_broadcast_state = (n_nodes <= P3_BROADCAST_STATE_MAX_NODES
                           and not _os2.environ.get("OSMNF_FORCE_TILED_STATE"))
    if use_broadcast_state:
        mm1_pd = mm1.to_pandas()
        _mark("cluster_pass_1")
        nodes_pd = _collect_pandas(nodes_all, ["osmid", "x", "y", "buffer_r"])
        state = S.ClusterBufferState(mm1_pd, nodes_pd, ref_lat=cfg.ref_lat)
        state_ref = ray.put(state)

        class _RequestsBatch:
            """Actor-pool stage: ClusterBufferState is an object graph (grid
            index + per-cluster arrays) that ``ray.get`` unpickles on every
            call — fetched once per actor, not once per batch."""

            def __init__(self):
                self.state = ray.get(state_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                return S.split_requests(df, self.state)

        from ..rayctx import pool_width

        req_ds = edges_ds.map_batches(_RequestsBatch, batch_format="pandas",
                                      concurrency=(1, pool_width())).materialize()
    else:
        # max buffer radius is a scalar reduce (the only global the tiled
        # build needs); tiles + halos make every (edge, cluster) interaction
        # tile-local — see split_requests_tiled
        max_r = float(nodes_all.max("buffer_r") or 0.0)
        _mark("cluster_pass_1")
        req_ds = split_requests_tiled(
            edges_ds, mm1, nodes_all, max_r=max_r, ref_lat=cfg.ref_lat,
            join_partitions=jp, n_edges=n_edges, n_nodes=n_nodes,
            merge_small=merge_small).materialize()
    _mark("split_requests")
    if req_ds.count() > 0:
        joined = edges_ds.join(req_ds, join_type="left_outer",
                               num_partitions=jp,
                               on=("osmid",), right_on=("edge_osmid",))

        def _apply_block(df: pd.DataFrame) -> pd.DataFrame:
            req_cols = ["rep", "t_arc", "px", "py"]
            req = df.loc[df["t_arc"].notna(),
                         ["osmid", *req_cols]].rename(columns={"osmid": "edge_osmid"})
            edges_only = df.drop_duplicates("osmid").drop(columns=req_cols)
            out, _ = S.apply_edge_splits(edges_only, req)
            return out

        edges_ds = grouped(joined, ["osmid"], _apply_block, small=merge_small,
                           rows=n_edges).materialize()
        _mark("apply_edge_splits")
    split_nodes2 = edges_ds.map_batches(
        lambda df: _new_nodes_from_split_edges(df, S.SPLIT2_BASE), batch_format="pandas")
    # keep the node TAG columns (highway, crossing, old_osmid) through the
    # second pass — merge_nodes_group unions them into g_infra/l_osmid
    # (p3_functions.py:1435-1437); _union_nodes aligns the split-node side
    nodes_all = _union_nodes(nodes_all, split_nodes2)

    # 6b+7. re-rank importance over the final edge set, re-buffer, recluster
    nodes_all = _attach_importance(nodes_all, edges_ds, buffers,
                                   join_partitions=jp, rows=2 * n_edges).materialize()
    _mark("attach_importance_2")
    mm2 = cluster_merge_map_ds(nodes_all, cluster_threshold, res=res,
                               ref_lat=cfg.ref_lat, join_partitions=jp,
                               rows=n_nodes).materialize()
    _mark("cluster_pass_2")

    # 8. reassign edges to merged nodes. Below the cap the merge map is
    # broadcast as SORTED numpy arrays (id + searchsorted lookup inside the
    # kernel — compact, zero-copy out of the object store, no driver-held
    # Python dicts); above it the map never touches the driver at all —
    # two left_outer hash joins attach the (rep, mx, my) triple to each
    # endpoint and the SAME kernel tail finishes per batch.
    if use_broadcast_state:
        mm2_pd = mm2.to_pandas()
        _mark("mm2_to_driver")
        order = np.argsort(mm2_pd["osmid"].to_numpy(), kind="stable")
        ids_sorted = mm2_pd["osmid"].to_numpy()[order].astype(np.int64)
        maps_ref = ray.put((
            ids_sorted,
            mm2_pd["merged_by"].to_numpy()[order].astype(np.int64),
            mm2_pd["mx"].to_numpy()[order].astype(np.float64),
            mm2_pd["my"].to_numpy()[order].astype(np.float64),
        ))

        class _ReassignBatch:
            def __init__(self):
                self.maps = ray.get(maps_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                ids, mb, mxa, mya = self.maps
                return S.reassign_edges_arrays(df, ids, mb, ids, mxa, ids, mya)

        edges_ds = edges_ds.map_batches(_ReassignBatch, batch_format="pandas",
                                        concurrency=(1, pool_width()))
    else:
        def _mm_u(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "nid_u": df["osmid"].to_numpy().astype(np.int64),
                "rep_u": df["merged_by"].to_numpy().astype(np.int64),
                "mux": df["mx"].to_numpy(np.float64),
                "muy": df["my"].to_numpy(np.float64)})

        def _mm_v(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "nid_v": df["osmid"].to_numpy().astype(np.int64),
                "rep_v": df["merged_by"].to_numpy().astype(np.int64),
                "mvx": df["mx"].to_numpy(np.float64),
                "mvy": df["my"].to_numpy(np.float64)})

        j = edges_ds.join(mm2.map_batches(_mm_u, batch_format="pandas"),
                          join_type="left_outer", num_partitions=jp,
                          on=("u",), right_on=("nid_u",))
        j = j.join(mm2.map_batches(_mm_v, batch_format="pandas"),
                   join_type="left_outer", num_partitions=jp,
                   on=("v",), right_on=("nid_v",))

        def _resolve_batch(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=[c for c in ("nid_u", "nid_v")
                                  if c in df.columns])
            return S.reassign_edges_resolved(df)

        edges_ds = j.map_batches(_resolve_batch, batch_format="pandas")

    # 10. merge nodes: join merge map, group by representative. The tag
    # cleaning happens INSIDE the post-shuffle block — cleaned columns hold
    # mixed str/list values that can't cross an Arrow shuffle boundary.
    nodes_merge = nodes_all.join(mm2, join_type="inner", num_partitions=jp,
                                 on=("osmid",))

    def _node_merge_block(df: pd.DataFrame) -> pd.DataFrame:
        return S.merge_nodes_block(S.prepare_nodes_for_merge(df))

    nodes_out = grouped(nodes_merge, ["merged_by"], _node_merge_block, small=merge_small,
                        rows=n_nodes)

    # 11-13. merge edges by canonical uv key (clean inside the block), orient
    edges_keyed = edges_ds.map_batches(S.add_uv_keys, batch_format="pandas")

    def _edge_merge_block(df: pd.DataFrame) -> pd.DataFrame:
        return S.merge_edges_block(S.prepare_edges_for_merge(df))

    edges_out = grouped(edges_keyed, ["uv_lo", "uv_hi"], _edge_merge_block, small=merge_small,
                        rows=n_edges)
    edges_out = edges_out.map_batches(S.orient_edges, batch_format="pandas")
    return {"nodes": nodes_out, "edges": edges_out}


def _union_nodes(nodes_ds: rd.Dataset, new_nodes: rd.Dataset) -> rd.Dataset:
    """Union keeping only the shared minimal schema (osmid, x, y) plus any
    original tag columns present on the left side (new nodes get NaN)."""
    schema = nodes_ds.schema().names
    keep = [c for c in ("osmid", "x", "y", "highway", "crossing", "old_osmid") if c in schema]

    def _norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in keep:
            if c not in df.columns:
                df[c] = "" if c in ("highway", "crossing") else np.nan
        if "old_osmid" in keep:
            df["old_osmid"] = pd.to_numeric(df["old_osmid"], errors="coerce").astype(np.float64)
        return df[keep]

    return (nodes_ds.map_batches(_norm, batch_format="pandas")
            .union(new_nodes.map_batches(_norm, batch_format="pandas")))


def _attach_importance(nodes_ds: rd.Dataset, edges_ds: rd.Dataset,
                       buffers: dict | None = None,
                       join_partitions: int | None = None,
                       rows: int | None = None) -> rd.Dataset:
    attrs = grouped(
        edges_ds.map_batches(_importance_pairs_batch, batch_format="pandas"),
        ["osmid"], _importance_final_block, small=True, rows=rows)
    nodes = nodes_ds.join(attrs, join_type="left_outer",
                          num_partitions=join_partitions or _num_partitions(),
                          on=("osmid",), right_suffix="_imp")

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        rank_col = "highway_rank_imp" if "highway_rank_imp" in df.columns else "highway_rank"
        conn_col = "highway_conn_imp" if "highway_conn_imp" in df.columns else "highway_conn"
        df["highway_rank"] = pd.to_numeric(df[rank_col], errors="coerce")
        df["highway_conn"] = df[conn_col]
        df["buffer_r"] = S.buffer_radii(df["highway_conn"], buffers)
        drop = [c for c in (rank_col, conn_col) if c.endswith("_imp")]
        return df.drop(columns=drop)

    return nodes.map_batches(_fin, batch_format="pandas")
