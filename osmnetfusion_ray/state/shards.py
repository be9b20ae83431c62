"""Sharded attribute store — the distributed-hash-table state pattern.

A lookup table too big to broadcast (at 10^12 docs the (doc_id → attr)
map IS the corpus) but needed point-wise by a moving computation (graph
walkers, iterative samplers) lives as P actors, each holding ONE hash
shard (id % P) as sorted numpy arrays. Readers batch their probes per
shard — one actor round-trip per (batch, shard), never per row — so the
table is partitioned once and NEVER reshipped per hop, unlike a keyed
exchange that would re-ship attr rows every iteration.

Shard construction here is a pruned parquet read + residue filter per
actor (P parallel column scans — right for the single-file testdata
layout; the multi-node swap is one hash exchange writing per-shard
parquet that each actor then reads, same interface). Contrast with
``state/index.py``'s broadcast indexes: those replicate small state to
every worker; this shards big state across workers.
"""

from __future__ import annotations

import numpy as np

import ray


@ray.remote
class ShardedAttrStore:
    """One shard of an (int64 id → int64 value) map: rows whose
    ``id % n_shards == shard`` live here as sorted parallel arrays;
    ``get`` answers batched probes via searchsorted."""

    def __init__(self, path: str, id_col: str, val_col: str,
                 shard: int, n_shards: int):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=[id_col, val_col])
        ids = t[id_col].to_numpy().astype(np.int64)
        vals = t[val_col].to_numpy().astype(np.int64)
        keep = (ids % n_shards) == shard
        ids, vals = ids[keep], vals[keep]
        o = np.argsort(ids, kind="mergesort")
        self._ids = ids[o]
        self._vals = vals[o]

    def get(self, probe: np.ndarray) -> np.ndarray:
        """Values for ``probe`` ids (all must belong to this shard)."""
        pos = np.searchsorted(self._ids, probe)
        if len(probe) and ((pos >= len(self._ids)).any()
                           or (self._ids[np.minimum(pos, len(self._ids) - 1)]
                               != probe).any()):
            raise KeyError("probe id not in shard")
        return self._vals[pos]

    def size(self) -> int:
        return len(self._ids)
