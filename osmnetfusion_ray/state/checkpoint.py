"""Per-partition checkpoint manifests with lineage + metrics.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".

Layout of a checkpointed stage output::

    <root>/<stage>/part=<key>/part-*.parquet     # data, one dir per partition
    <root>/<stage>/_manifest/<key>.json          # written AFTER the partition
    <root>/<stage>/_SUCCESS                      # written when all parts done

A manifest row records: partition key, row count, byte size, value checksum,
input lineage (stage + partition it came from), wall-time. A rerun calls
``completed_partitions`` and skips finished keys — the reference's
coarse-grained "each of p1/p2/p3 persists a GPKG" checkpointing
(README.md:66) refined to partition granularity.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _manifest_dir(root: str, stage: str) -> str:
    return os.path.join(root, stage, "_manifest")


def completed_partitions(root: str, stage: str) -> set[str]:
    d = _manifest_dir(root, stage)
    if not os.path.isdir(d):
        return set()
    return {f[:-5] for f in os.listdir(d) if f.endswith(".json")}


def write_partition(
    root: str,
    stage: str,
    key: str,
    table: pa.Table,
    lineage: dict | None = None,
    checksum_col: str | None = None,
) -> dict:
    """Atomically write one partition + its manifest row. Returns metrics."""
    t0 = time.time()
    part_dir = os.path.join(root, stage, f"part={key}")
    tmp_dir = part_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(table, os.path.join(tmp_dir, "part-0.parquet"))
    if os.path.isdir(part_dir):
        import shutil

        shutil.rmtree(part_dir)
    os.rename(tmp_dir, part_dir)

    checksum = None
    if checksum_col is not None and checksum_col in table.schema.names:
        import hashlib

        h = hashlib.md5()
        for v in sorted(x.as_py() or "" for x in table[checksum_col]):
            h.update(str(v).encode())
        checksum = h.hexdigest()

    metrics = {
        "partition": key,
        "rows": table.num_rows,
        "bytes": table.nbytes,
        "checksum": checksum,
        "lineage": lineage or {},
        "wall_s": round(time.time() - t0, 4),
        "ts": time.time(),
    }
    mdir = _manifest_dir(root, stage)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{key}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f)
    os.rename(tmp, os.path.join(mdir, f"{key}.json"))
    return metrics


def finalize_stage(root: str, stage: str) -> None:
    with open(os.path.join(root, stage, "_SUCCESS"), "w") as f:
        f.write(str(time.time()))


def stage_complete(root: str, stage: str) -> bool:
    return os.path.exists(os.path.join(root, stage, "_SUCCESS"))


def read_manifest(root: str, stage: str) -> list[dict]:
    d = _manifest_dir(root, stage)
    out = []
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append(json.load(fh))
    return out


def remove_partition(root: str, stage: str, key: str) -> None:
    """Invalidate ONE partition (manifest row + data dir + the stage's
    ``_SUCCESS``) so the next ``write_checkpointed`` recomputes exactly
    it — the operational lever for re-running a corrupted shard without
    touching the rest of a finished stage."""
    import shutil

    mpath = os.path.join(_manifest_dir(root, stage), f"{key}.json")
    if os.path.exists(mpath):
        os.remove(mpath)
    pdir = os.path.join(root, stage, f"part={key}")
    if os.path.isdir(pdir):
        shutil.rmtree(pdir)
    s = os.path.join(root, stage, "_SUCCESS")
    if os.path.exists(s):
        os.remove(s)
