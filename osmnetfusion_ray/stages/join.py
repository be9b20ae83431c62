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
