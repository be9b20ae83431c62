"""Broadcast joins / semi-joins: the small side is ``ray.put`` once and read
zero-copy in every task — never re-shipped per batch, never a shuffle of the
big side (ray_guide.md "Joins and lookups"; reference equivalents: the dim
lookups of p2_enrichData.py:372-378,490-492).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


class BroadcastJoiner:
    """Actor-pool stage: pandas hash-join each batch against a broadcast
    small side. ``how`` ∈ {inner, left}; ``suffix`` disambiguates clashes."""

    def __init__(self, small_ref, left_on: str, right_on: str, how: str = "inner", columns=None):
        small: pd.DataFrame = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        if columns is not None:
            small = small[list(dict.fromkeys([right_on, *columns]))]
        self.small = small
        self.left_on, self.right_on, self.how = left_on, right_on, how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(
            self.small, how=self.how, left_on=self.left_on, right_on=self.right_on, suffixes=("", "_r")
        )
        if self.right_on != self.left_on and self.right_on in out.columns:
            out = out.drop(columns=[self.right_on])
        return out


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame | pa.Table,
    left_on: str,
    right_on: str,
    how: str = "inner",
    columns: list[str] | None = None,
    batch_size: int = 65536,
    concurrency=(1, 8),
) -> rd.Dataset:
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    ref = ray.put(small)
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_args=(ref, left_on, right_on, how, columns),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def broadcast_semi_filter(
    ds: rd.Dataset, keys: np.ndarray | set, col: str, keep: bool = True, batch_size: int = 65536
) -> rd.Dataset:
    """Semi (keep=True) / anti (keep=False) join: broadcast the key set and
    filter inside map_batches."""
    arr = np.asarray(sorted(keys))
    ref = ray.put(arr)

    class _Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, v)
            pos = np.clip(pos, 0, len(self.keys) - 1)
            hit = self.keys[pos] == v if len(self.keys) else np.zeros(len(v), bool)
            return batch.filter(pa.array(hit if keep else ~hit))

    return ds.map_batches(_Filter, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8))


def salted_join(
    fact: rd.Dataset,
    dim: rd.Dataset,
    fact_key: str,
    dim_key: str,
    salt_src: str,
    target_rows_per_key: int = 100_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Skew-safe big-big inner hash join: the north_rule's "explicit
    salting/splitting of skewed keys" as a reusable operator. A plain hash
    join sends EVERY row of a hot key to one aggregator — one task then
    owns the whole hot key while the rest of the cluster idles. Here:

    1. one streamed pass pre-counts the fact side per key (per-block
       combiner, then a small exchange — the count table is |keys| rows);
       keys above ``target_rows_per_key`` become the HOT set, each with a
       replication factor ceil(count/target). At most
       fact_rows/target keys can be hot, so the broadcast is bounded.
    2. fact rows of hot keys get salt = fnv1a64(salt_src) %% factor
       (deterministic — reruns and resumes shard identically); cold rows
       salt 0.
    3. dim rows of hot keys are REPLICATED once per salt value (the dim
       grows by sum(factors) rows, not by the fact's skew); cold rows
       pass through with salt 0.
    4. one Ray-native hash join on (key, salt) — every partition now holds
       at most ~target rows of any key.

    Result-identical to the unsalted join for inner semantics (each fact
    row meets exactly the dim rows of its key, in exactly one salt
    shard)."""
    from ..functions.hashing import fnv1a64
    from ..pipelines.simplify import _num_partitions
    from ..stages.agg import AggSpec, groupby_agg

    # The count table is |keys| rows — at billions of distinct keys that is
    # a driver OOM if collected whole.  The HOT set, by contrast, is bounded
    # by fact_rows/target (each hot key needs > target rows), so filter the
    # threshold INSIDE the distributed aggregate and collect only hot keys.
    hot = groupby_agg(
        fact.select_columns([fact_key]),
        [fact_key], [AggSpec("n", None, "count")], small=True,
    ).map_batches(
        lambda df: df[df["n"] > target_rows_per_key],
        batch_format="pandas",
    ).to_pandas()
    if fact_key not in hot.columns:  # all blocks filtered empty → Ray
        hot = pd.DataFrame({fact_key: [], "n": []})  # drops the schema
    factors = {
        int(k): int(-(-n // target_rows_per_key))
        for k, n in zip(hot[fact_key], hot["n"])
    }
    fref = ray.put(factors)

    def salt_fact(df: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(fref)
        df = df.copy()
        salt = np.zeros(len(df), dtype=np.int64)
        if f:
            fac = df[fact_key].map(f).fillna(0).to_numpy(np.int64)
            m = fac > 0
            if m.any():
                h = fnv1a64(df.loc[m, salt_src].astype(str).to_numpy())
                salt[m] = (h % fac[m].astype(np.uint64)).astype(np.int64)
        df["__salt"] = salt
        return df

    def replicate_dim(df: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(fref)
        fac = (df[dim_key].map(f).fillna(1).to_numpy(np.int64)
               if f else np.ones(len(df), dtype=np.int64))
        rep = df.loc[df.index.repeat(fac)].reset_index(drop=True)
        # within each repeated run, salts 0..factor-1
        idx = np.arange(len(rep))
        starts = np.repeat(np.cumsum(fac) - fac, fac)
        rep["__salt"] = idx - starts
        return rep

    n = num_partitions or _num_partitions()
    out = fact.map_batches(salt_fact, batch_format="pandas").join(
        dim.map_batches(replicate_dim, batch_format="pandas"),
        join_type="inner",
        num_partitions=n,
        on=(fact_key, "__salt"),
        right_on=(dim_key, "__salt"),
    )
    return out.map_batches(lambda df: df.drop(columns=["__salt"]),
                           batch_format="pandas")


# broadcast↔exchange crossover for colocated_attach: below this many dim
# rows the dim is collected once and broadcast via ray.put (a ≤2M-row
# skinny dim is tens of MB — comfortably inside the driver and per-worker
# budgets, and the broadcast path skips the keyed exchange entirely:
# measured 33.5 s → 46.6 s across the 13 de-broadcast queries at sf0.1
# when ALWAYS exchanging); above it the marker co-location is mandatory
# (at 100 TB the dim IS the dataset). Same size-adaptive contract as
# P3_BROADCAST_STATE_MAX_NODES — both paths are result-identical
# (forced-path equality tested).
COLOC_BROADCAST_MAX_ROWS = 2_000_000
# the row cap assumes skinny dims; the byte guard catches wide ones (long
# strings in attach columns) before they become a driver/object-store blob
COLOC_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def colocated_attach(
    left: rd.Dataset,
    key: str,
    dim: rd.Dataset,
    dim_key: str,
    attach: dict[str, "np.dtype | type | None"],
    *,
    left_fill: dict | None = None,
    small: bool = True,
    rows: int | None = None,
    semi_only: bool = False,
    broadcast_below_rows: int | None = COLOC_BROADCAST_MAX_ROWS,
    force_exchange: bool = False,
) -> rd.Dataset:
    """Dim-attribute attach / semi-filter with a size-adaptive layout:
    marker co-location through ONE key-co-located hash exchange (the
    engine's q7/q21 layout) when the dim is big, a one-shot ``ray.put``
    broadcast lookup when it is measurably small.

    Why the exchange path exists: broadcasting a dimension that SCALES
    WITH THE DATA (TPC-H part / supplier / customer grow linearly with
    SF) ships the whole table to the driver and then to every task — at
    100 TB that is a driver OOM and a per-worker memory wall. In the
    exchange layout the dim's (key, attrs) rows ride the SAME keyed
    exchange as the left rows, tagged by a marker column; each reduce
    block resolves key → attrs locally. The dim crosses the wire exactly
    once, linearly, and nothing is ever collected whole.

    Why the broadcast path exists: below ``broadcast_below_rows``
    (measured crossover — see COLOC_BROADCAST_MAX_ROWS) the keyed
    exchange is pure overhead (~+1 s per query of aggregator-pool spawn
    at toy scale); the dim fits in one object-store blob, so a
    stateless ``map_batches`` lookup attaches/filters with ZERO
    exchanges. The row count comes from ``dim.count()`` (parquet
    metadata / bounded execution of the dim-side projection). Both paths
    are result-identical including dtypes (forced-path equality tested);
    ``force_exchange=True`` pins the exchange path (tests, and callers
    whose left stream must stay lazy).

    ``left`` is typically a combiner-reduced partial stream (so the
    exchange is bounded), but raw fact rows are fine — the exchange is
    linear either way. ``attach`` maps dim column → dtype to pin on the
    output; pass ``None`` ONLY for string/object columns — numeric dim
    columns MUST pin a dtype (np.int64 / np.float64), because the left
    side's NaN placeholders floatify the unified column and an unpinned
    int would silently come out float64 (the same hash-divergence hazard
    ``left_fill`` guards; the block raises if a None-pinned column
    arrives floating). Inner semantics (left rows without a dim match
    drop). ``semi_only=True`` ignores ``attach`` values and just filters
    (semi-join). Dim keys are expected UNIQUE; if duplicates occur, both
    paths keep the row whose (key, attach...) tuple sorts smallest — a
    deterministic rule, never block-arrival order.
    """
    from ..rayctx import grouped

    attach_cols = [] if semi_only else list(attach)

    if not force_exchange and broadcast_below_rows:
        small_pd = None
        # ONE bounded execution decides the path AND feeds the
        # collect: materializing limit(cap+1) pins AT MOST cap+1 rows
        # (the limit back-pressures the scan), never the whole dim —
        # an above-cap dim costs one bounded probe and then takes the
        # exchange path; a below-cap dim's limited materialization IS
        # the whole dim, reused directly for the broadcast collect
        # (no second execution — a count()+to_pandas() pair measured
        # +~1 s/query of duplicated dim-pipeline runs).
        #
        # Errors from executing the dim pipeline PROPAGATE: the exchange
        # path runs the same pipeline and would hit the same error later
        # inside the union, with a far less diagnosable traceback — a
        # broken dim must fail here, not silently fall through (round-4
        # verdict: the old blanket `except Exception` masked real
        # defects behind the fallback).
        lim = dim.limit(broadcast_below_rows + 1).materialize()
        if lim.count() <= broadcast_below_rows:
            cols = [dim_key] + attach_cols
            pdf = lim.to_pandas()
            if len(pdf) == 0 and not all(c in pdf.columns for c in cols):
                # the ONE legitimate probe-only failure mode: Ray drops
                # empty blocks, so a fully-empty dim collects with NO
                # schema. Inner semantics make the result empty either
                # way — synthesize a typed empty dim so the broadcast
                # path (which the size test chose) still applies. Dtypes
                # follow the attach contract (pinned dtype, else object
                # for string columns) so the empty result's columns
                # match the exchange path's exactly.
                small_pd = pd.DataFrame({
                    c: pd.Series([], dtype=(attach.get(c) or object)
                                 if c != dim_key else object)
                    for c in cols})
            else:
                # missing columns on a NON-empty dim is a caller bug —
                # let the KeyError raise
                small_pd = pdf[cols]
            # bytes guard: the row cap assumes skinny dims; a wide
            # dim (long strings in attach cols) must not become a
            # multi-GB driver blob shipped to every task
            if int(small_pd.memory_usage(deep=True).sum()) \
                    > COLOC_BROADCAST_MAX_BYTES:
                small_pd = None
        if small_pd is not None:
            # duplicate-key rule, IDENTICAL on both paths: sort by every
            # carried column, keep the lexicographically-smallest row per
            # key (the exchange block applies the same sort)
            small_pd = (small_pd.sort_values([dim_key] + attach_cols,
                                             kind="mergesort")
                        .drop_duplicates(dim_key))
            order = np.argsort(small_pd[dim_key].to_numpy(), kind="stable")
            dkeys = small_pd[dim_key].to_numpy()[order]
            dvals = {c: small_pd[c].to_numpy()[order] for c in attach_cols}
            ref = ray.put((dkeys, dvals))

            def attach_batch(df: pd.DataFrame) -> pd.DataFrame:
                ks, vs = ray.get(ref)
                v = df[key].to_numpy()
                pos = np.clip(np.searchsorted(ks, v), 0,
                              max(len(ks) - 1, 0))
                hit = (ks[pos] == v) if len(ks) else np.zeros(len(v), bool)
                out = df[hit].copy()
                if attach_cols:
                    p = pos[hit]
                    for c in attach_cols:
                        av = vs[c][p] if len(ks) else vs[c][:0]
                        tp = attach.get(c)
                        out[c] = av.astype(tp) if tp is not None else av
                return out

            return left.map_batches(attach_batch, batch_format="pandas")

    def markers(df: pd.DataFrame) -> pd.DataFrame:
        out = {key: df[dim_key].to_numpy(), "__mk": np.int64(1)}
        for c in attach_cols:
            out[c] = df[c].to_numpy()
        # CRITICAL: marker rows must carry TYPED placeholders for every
        # non-key left column (``left_fill``) — otherwise the union
        # null-fills them, Ray unifies the column to a nullable/float
        # type, and a later exchange keyed on such a column hashes 42.0
        # differently from 42 (mis-colocation, silently wrong results)
        for c, fill in (left_fill or {}).items():
            out[c] = fill
        return pd.DataFrame(out)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in attach_cols:
            if c not in df.columns:
                df[c] = np.nan
        df["__mk"] = np.int64(0)
        return df

    def block(df: pd.DataFrame) -> pd.DataFrame:
        mk = df["__mk"].to_numpy() == 1
        dimr = df.loc[mk]
        out = df.loc[~mk].drop(columns=["__mk"] + attach_cols)
        keep = out[key].isin(set(dimr[key].tolist()))
        out = out[keep]
        if attach_cols:
            # duplicate-key rule shared with the broadcast path: sort by
            # every carried column so the lexicographically-smallest row
            # wins deterministically (block-arrival order must not decide)
            idx = (dimr.sort_values([key] + attach_cols, kind="mergesort")
                   .drop_duplicates(key).set_index(key))
            for c in attach_cols:
                v = out[key].map(idx[c]).to_numpy()
                tp = attach.get(c)
                if tp is not None:
                    out[c] = v.astype(tp)
                else:
                    if len(v) and v.dtype.kind in "fc":
                        raise TypeError(
                            f"colocated_attach: attach column {c!r} arrived "
                            f"as {v.dtype} — the union's NaN placeholders "
                            f"floatified it; pin an explicit dtype in "
                            f"`attach` (np.int64 / np.float64). None is for "
                            f"string/object columns only.")
                    out[c] = v
        return out

    union = left.map_batches(tag_left, batch_format="pandas").union(
        dim.map_batches(markers, batch_format="pandas"))
    return grouped(union, [key], block, small=small, rows=rows)
