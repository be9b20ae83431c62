"""Messy OSM tag-value normalization kernels.

Reproduces the observable semantics of the reference's ``clean`` and
``listify`` (p3_functions.py:1083-1162, 1188-1219) — including the quirks
SURVEY.md §7.6 calls out (e.g. ``'1.35;3.6'`` → NaN because plain float()
fails; comma-digit strings counted numeric; ``listify`` strips every
non-word char so ``'1.5'`` becomes ``'15'``) — written fresh against those
semantics, not copied.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_NONWORD = re.compile(r"[^\w,]")


def _is_numlike(b) -> bool:
    if isinstance(b, (int, float, np.integer, np.floating)):
        return True
    if isinstance(b, str):
        return b.replace(",", "").replace(".", "").isdigit()
    return False


def _parse_list_string(a: str) -> list[str]:
    """``"['a', 'b']"`` → ``['a', 'b']`` (split on ", ", strip quotes)."""
    parts = a[1:-1].split(", ")
    return [p[1:-1] if p[:1] == "'" else p for p in parts]


def clean(a, as_float: bool = False, keep: str = "all"):
    """Normalize one tag value: scalars pass through, ``"[...]"`` strings
    parse to lists, numerics optionally coerce, single-element lists
    collapse, empty → NaN; ``keep`` ∈ {'all','min','mean','max'} reduces a
    numeric list (only meaningful with as_float)."""

    def clean_items(items) -> list:
        out = []
        for b in items:
            numlike = _is_numlike(b)
            if as_float and numlike:
                out.append(float(b) if isinstance(b, str) else float(b))
            elif as_float and not numlike:
                continue
            elif b == "":
                continue
            else:
                out.append(float(b) if (isinstance(b, str) and numlike) else b)
        return out

    if isinstance(a, list):
        l = clean_items(a)
    elif a is None or (isinstance(a, float) and np.isnan(a)) or a == "":
        l = np.nan
    elif isinstance(a, (int, float, np.integer, np.floating)):
        l = float(a) if as_float else a
    elif isinstance(a, str) and a[:1] == "[":
        l = clean_items(_parse_list_string(a))
    elif isinstance(a, str) and a[1:-1].isnumeric():
        l = float(a[1:-1]) if as_float else a[1:-1]
    else:
        try:
            l = float(a) if as_float else a
        except (TypeError, ValueError):
            l = np.nan

    if isinstance(l, list):
        if len(l) == 0:
            l = np.nan
        elif len(l) == 1:
            l = l[0]

    if keep != "all" and as_float:
        if keep == "min":
            return np.min(l) if isinstance(l, list) else l
        if keep == "mean":
            return np.mean(l) if isinstance(l, list) else l
        if keep == "max":
            return np.max(l) if isinstance(l, list) else l
    return l


def listify(series: pd.Series, as_int: bool = False) -> list:
    """Series → sorted unique flat list. Strings are stripped of every
    non-word char (except commas) then comma-split; ''/NaN dropped.

    Plain-python flatten instead of ``Series.explode().unique()`` — the
    output passes through ``sorted(set(...))`` anyway, and pandas explode
    cost ~0.1 ms per call inside the per-group merge kernels (the p3
    chain's hottest Python)."""
    out = []
    vals = series.tolist() if hasattr(series, "tolist") else list(series)
    flat: list = []
    for v in vals:
        if isinstance(v, (list, np.ndarray)):
            flat.extend(list(v))
        else:
            flat.append(v)
    for a in flat:
        if isinstance(a, list):
            out.extend(a)
        if (isinstance(a, str) and a == "") or (not isinstance(a, (str, list)) and pd.isna(a)):
            continue
        elif isinstance(a, (int, float, np.integer, np.floating)):
            out.append(a)
        elif isinstance(a, str):
            parts = [p for p in _NONWORD.sub("", a).split(",") if p != ""]
            out.extend(parts)
        elif not isinstance(a, list):
            out.append(a)
    if len(out) == 0:
        return out
    if as_int:
        out = [int(a) for a in out]
    return sorted(set(out))


def clean_column(s: pd.Series, as_float: bool = False, keep: str = "all") -> pd.Series:
    """Vectorized-ish clean over a column (C-level loop via map)."""
    return s.map(lambda a: clean(a, as_float=as_float, keep=keep))
