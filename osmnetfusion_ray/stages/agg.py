"""Partial (combiner) aggregation: pre-aggregate inside ``map_batches``,
then a small ``groupby().aggregate`` over the partials.

A bare ``ds.groupby(k).aggregate(...)`` shuffles every input row; at 10^12
rows that is the bottleneck. This helper shrinks the shuffle to
(#batches × #distinct keys per batch) rows — the classic combiner. Mean is
decomposed into (sum, count); all other reductions used here are
associative.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


@dataclass(frozen=True)
class AggSpec:
    out: str          # output column name (must match the oracle SQL alias)
    col: str | None   # input column (None for count(*))
    kind: str         # sum | count | min | max | mean


def groupby_agg(ds: rd.Dataset, keys: list[str], specs: list[AggSpec]) -> rd.Dataset:
    """Partial-then-final grouped aggregation with named output columns."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(list(keys), sort=False, observed=True, dropna=False)
        out = {}
        for s in specs:
            if s.kind == "sum":
                out[s.out] = g[s.col].sum()
            elif s.kind == "count":
                out[s.out] = g.size() if s.col is None else g[s.col].count()
            elif s.kind == "min":
                out[s.out] = g[s.col].min()
            elif s.kind == "max":
                out[s.out] = g[s.col].max()
            elif s.kind == "mean":
                out[f"__s_{s.out}"] = g[s.col].sum()
                out[f"__c_{s.out}"] = g[s.col].count()
            else:
                raise ValueError(s.kind)
        return pd.DataFrame(out).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    aggs = []
    for s in specs:
        if s.kind in ("sum", "count"):
            aggs.append(Sum(s.out, alias_name=s.out))
        elif s.kind == "min":
            aggs.append(Min(s.out, alias_name=s.out))
        elif s.kind == "max":
            aggs.append(Max(s.out, alias_name=s.out))
        elif s.kind == "mean":
            aggs.append(Sum(f"__s_{s.out}", alias_name=f"__s_{s.out}"))
            aggs.append(Sum(f"__c_{s.out}", alias_name=f"__c_{s.out}"))
    final = partials.groupby(list(keys)).aggregate(*aggs)

    mean_specs = [s for s in specs if s.kind == "mean"]
    if not mean_specs:
        return final

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        for s in mean_specs:
            df[s.out] = df[f"__s_{s.out}"] / df[f"__c_{s.out}"]
            df = df.drop(columns=[f"__s_{s.out}", f"__c_{s.out}"])
        return df

    return final.map_batches(finalize, batch_format="pandas")
