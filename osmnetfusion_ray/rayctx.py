"""Ray Data context tuning for this engine.

Ray's default sort-based shuffle + per-group Python reduction costs ~2 ms
PER GROUP — pathological for high-cardinality groupbys (20k part keys took
38 s for 20k rows). The engine's grouped operators therefore run as
``repartition(keys=...)`` (hash shuffle → each key lives in exactly one
block) followed by a VECTORIZED per-block pandas/numpy reduction — exact,
distributed, and ~30x faster. That repartition requires
``ShuffleStrategy.HASH_SHUFFLE``, enabled here once per session.

Never touches ``ray.init`` — the driver owns the session; this only
configures ``ray.data.DataContext``.
"""

from __future__ import annotations

import ray


def ensure_tuned():
    """Idempotently enable hash shuffle + cluster-sized parallelism."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if getattr(ctx, "_osmnetfusion_tuned", False):
        return ctx
    try:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        ctx.default_hash_shuffle_parallelism = max(8, min(64, cpus))
    except Exception:
        return ctx  # older Ray: keep defaults, retry next call
    # only latch once the parallelism reflects a live cluster
    if ray.is_initialized():
        ctx._osmnetfusion_tuned = True
    return ctx


def n_shuffle_blocks(small: bool = False, rows: int | None = None) -> int:
    """Output blocks for keyed repartitions, sized to the cluster. With a
    known row count the pool shrinks further — every block is a live
    aggregator actor (~1 s startup on this host), and a 200-row groupby
    does not need 8 of them. The curve (rows/2k + 2) reaches the
    cluster-sized cap by ~12k rows, so real-sized inputs are unaffected."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    cap = max(2, min(8, cpus // 4)) if small else max(4, min(64, cpus))
    if rows is not None:
        return max(2, min(cap, rows // 8_000 + 2))
    return cap


def pool_width(cap: int = 32) -> int:
    """Actor-pool width sized to the CLUSTER, not a constant: a literal
    ``concurrency=(1, 16)`` starves the large-cluster leg of the N→4N
    scaling protocol (16/24 CPUs busy) while oversizing tiny ones."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))


def ensure_fanout(ds, min_blocks: int | None = None):
    """Guarantee at least ``min_blocks`` blocks so map stages can use the
    cluster: synthetic ``from_pandas`` and single-file parquet inputs
    arrive as 1-8 blocks, and map_batches parallelism is per-BLOCK — a
    1-block table serializes every downstream map stage no matter how many
    CPUs exist. No-op when the dataset is already wide (checkable only on
    materialized datasets; lazy inputs are repartitioned defensively)."""
    nb = min_blocks or n_shuffle_blocks()
    try:
        cur = ds.num_blocks()
    except Exception:
        cur = None
    if cur is not None and cur >= nb:
        return ds
    return ds.repartition(num_blocks=nb)


def grouped(ds, keys, block_fn, *, small: bool = False, rows: int | None = None):
    """The engine's grouped-operator primitive: hash-repartition by ``keys``
    (every key fully in one block) then apply ``block_fn`` (a vectorized
    pandas kernel that must reduce/transform WITHIN key groups — it may see
    many keys per block, never a partial key). ``rows`` (approximate input
    row count, when the caller already knows it) bounds the aggregator pool
    for small inputs."""
    ensure_tuned()
    n = n_shuffle_blocks(small=small, rows=rows)
    return ds.repartition(num_blocks=n, keys=list(keys)).map_batches(
        block_fn, batch_format="pandas")


def group_positions(sorted_keys):
    """Within-run positions over a key array already sorted so equal keys
    are contiguous: returns ``(gid, sizes, starts, loc)`` — dense group
    index per row, rows per group, group start offsets (len = n_groups +
    1 is NOT included; starts[g] is group g's first row), and each row's
    0-based position inside its group. Shared by the per-entity DP
    kernels and pair-capping kernels (one implementation to fix)."""
    import numpy as np

    n = len(sorted_keys)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = sorted_keys[1:] != sorted_keys[:-1]
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    loc = np.arange(n) - starts[gid]
    return gid, sizes.astype(np.int64), starts.astype(np.int64), loc


def depth_slices(gid, loc):
    """Regroup rows BY within-group position (depth): returns
    ``(by_depth, kstarts)`` where ``by_depth`` orders rows by (loc, gid)
    and ``kstarts`` bounds each depth's contiguous slice — the layout that
    lets a sequential per-entity DP run as max_depth VECTORIZED steps."""
    import numpy as np

    by_depth = np.lexsort((gid, loc))
    kk = loc[by_depth]
    if len(kk) == 0:
        return by_depth, np.zeros(1, np.int64)
    kstarts = np.concatenate(
        [[0], np.flatnonzero(kk[1:] != kk[:-1]) + 1, [len(kk)]])
    return by_depth, kstarts
