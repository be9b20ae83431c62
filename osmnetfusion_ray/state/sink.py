"""Checkpointed partitioned-parquet sink: the resumable output layout of
the north_rule ("resumable from checkpoint with per-partition lineage +
metrics").

Layout (state/checkpoint.py): one directory per partition key + a manifest
row (rows, bytes, checksum, lineage, wall-time) written AFTER the partition
data, + ``_SUCCESS`` when the stage completes. A rerun skips every
partition already in the manifest — the filter happens at the START of the
pipeline (broadcast key-set semi-join inside ``map_batches``), so resumed
runs don't even compute the finished partitions.

The write itself is distributed: ``groupby(key).map_groups`` writes each
partition inside a worker and returns its metrics row; the tiny metrics
dataset is the only thing the driver materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from . import checkpoint


def write_checkpointed(
    ds: rd.Dataset,
    root: str,
    stage: str,
    key_col: str,
    lineage: dict | None = None,
    checksum_col: str | None = None,
    finalize: bool = True,
) -> pd.DataFrame:
    """Write ``ds`` partitioned by ``key_col`` with per-partition manifests;
    skips partitions already completed in a previous run. Returns the
    metrics rows of partitions written in THIS run."""
    done = checkpoint.completed_partitions(root, stage)
    if done:
        # key domain contract: partition keys are non-negative integers (cell
        # ids / shard ids). Anything else would break the uint64 searchsorted
        # resume filter below (negative ints wrap; strings don't cast), so a
        # violating manifest fails loudly here instead of skipping partitions.
        try:
            done_int = sorted(int(k) for k in done)
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"write_checkpointed requires integer partition keys; manifest "
                f"for stage {stage!r} holds non-integer keys") from e
        if done_int and done_int[0] < 0:
            raise ValueError(
                f"write_checkpointed requires non-negative partition keys; "
                f"manifest for stage {stage!r} holds {done_int[0]}")
        done_ref = ray.put(np.asarray(done_int, dtype=np.uint64))

        def _skip_done(batch: pa.Table) -> pa.Table:
            keys = ray.get(done_ref)
            v = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.clip(np.searchsorted(keys, v), 0, max(len(keys) - 1, 0))
            hit = keys[pos] == v if len(keys) else np.zeros(len(v), bool)
            return batch.filter(pa.array(~hit))

        ds = ds.map_batches(_skip_done, batch_format="pyarrow").materialize()
        if ds.count() == 0:  # fully resumed — nothing left to write
            if finalize:
                checkpoint.finalize_stage(root, stage)
            return pd.DataFrame(columns=["partition", "rows", "bytes", "wall_s"])

    def _write_group(g: pd.DataFrame) -> pd.DataFrame:
        kv = int(g[key_col].iloc[0])
        if kv < 0:
            raise ValueError(f"write_checkpointed partition key must be >= 0, got {kv}")
        key = str(kv)
        tab = pa.Table.from_pandas(g, preserve_index=False)
        metrics = checkpoint.write_partition(
            root, stage, key, tab, lineage=lineage, checksum_col=checksum_col)
        return pd.DataFrame([{
            "partition": key, "rows": metrics["rows"], "bytes": metrics["bytes"],
            "wall_s": metrics["wall_s"],
        }])

    written = ds.groupby(key_col).map_groups(_write_group, batch_format="pandas").to_pandas()
    if finalize:
        checkpoint.finalize_stage(root, stage)
    return written


def read_checkpointed(root: str, stage: str) -> rd.Dataset:
    """Read a checkpointed stage back as one Dataset (all partitions)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(root, stage, "part=*", "*.parquet")))
    return rd.read_parquet(files)
