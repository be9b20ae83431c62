"""Partial (combiner) aggregation: pre-aggregate inside ``map_batches``,
then hash-repartition the partials by key and finish with a VECTORIZED
per-block pandas reduction.

A bare ``ds.groupby(k).aggregate(...)`` shuffles every input row AND pays
Ray's ~2 ms-per-group Python reduction (38 s for 20k groups measured on
this host). This helper (a) shrinks the shuffle to (#batches x #distinct
keys per batch) rows — the classic combiner — and (b) replaces the
per-group reduction with ``repartition(keys=...)`` + one pandas groupby per
block (exact: hash partitioning puts each key in exactly one block). Mean
decomposes into (sum, count); the other reductions are associative.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

import ray.data as rd

from ..rayctx import grouped


@dataclass(frozen=True)
class AggSpec:
    out: str          # output column name (must match the oracle SQL alias)
    col: str | None   # input column (None for count(*))
    kind: str         # sum | count | min | max | mean


def _reduce(df: pd.DataFrame, keys: list[str], specs: list[AggSpec], partial: bool) -> pd.DataFrame:
    g = df.groupby(list(keys), sort=False, observed=True, dropna=False)
    out = {}
    for s in specs:
        if s.kind == "sum":
            out[s.out] = g[s.col].sum() if partial else g[s.out].sum()
        elif s.kind == "count":
            if partial:
                out[s.out] = g.size() if s.col is None else g[s.col].count()
            else:
                out[s.out] = g[s.out].sum()
        elif s.kind == "min":
            out[s.out] = g[s.col if partial else s.out].min()
        elif s.kind == "max":
            out[s.out] = g[s.col if partial else s.out].max()
        elif s.kind == "mean":
            if partial:
                out[f"__s_{s.out}"] = g[s.col].sum()
                out[f"__c_{s.out}"] = g[s.col].count()
            else:
                out[f"__s_{s.out}"] = g[f"__s_{s.out}"].sum()
                out[f"__c_{s.out}"] = g[f"__c_{s.out}"].sum()
        else:
            raise ValueError(s.kind)
    return pd.DataFrame(out).reset_index()


def groupby_agg(ds: rd.Dataset, keys: list[str], specs: list[AggSpec],
                small: bool = False) -> rd.Dataset:
    """Partial-then-final grouped aggregation with named output columns.
    ``small=True`` uses a small shuffle pool — for inputs or key spaces far
    below the cluster's block budget."""
    partials = ds.map_batches(lambda df: _reduce(df, keys, specs, partial=True),
                              batch_format="pandas")
    final = grouped(partials, keys, lambda df: _reduce(df, keys, specs, partial=False),
                    small=small)

    mean_specs = [s for s in specs if s.kind == "mean"]
    if not mean_specs:
        return final

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        for s in mean_specs:
            df[s.out] = df[f"__s_{s.out}"] / df[f"__c_{s.out}"]
            df = df.drop(columns=[f"__s_{s.out}", f"__c_{s.out}"])
        return df

    return final.map_batches(finalize, batch_format="pandas")
