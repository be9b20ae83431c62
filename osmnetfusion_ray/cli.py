"""CLI entry point — the ``ray job submit`` surface of the north_rule.

Usage (also via ``python -m osmnetfusion_ray.cli``)::

    python -m osmnetfusion_ray.cli pagejoin --pages 1000000 --out /tmp/out
    python -m osmnetfusion_ray.cli simplify --city-n 12 --out /tmp/net
    python -m osmnetfusion_ray.cli corpus --sf-dir /root/testdata/sf0.01 \
        --op exact_dedup --out /tmp/dedup

Owns a Ray session (guarded: attaches if one exists). Output is the
checkpointed partitioned-parquet layout (state/sink.py) — one directory per
partition + manifest + ``_SUCCESS`` — so a re-run with the same ``--out``
resumes, skipping finished partitions.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from .rayctx import ensure_tuned

    ensure_tuned()


def _cfg(args):
    from .config import PipelineConfig

    if args.config:
        with open(args.config) as f:
            return PipelineConfig.from_dict(json.load(f))
    return PipelineConfig()


def cmd_pagejoin(args) -> int:
    import numpy as np

    from . import cells, synth
    from .pipelines import pagejoin
    from .sources.pagegen import synth_pages_ds
    from .state.sink import write_checkpointed

    cfg = _cfg(args)
    nodes, edges = synth.synth_city(n=args.city_n, seed=args.seed)
    pages = synth_pages_ds(args.pages)
    ds = pagejoin.join_pages_to_network_slim(
        pages, nodes, edges, buffer_m=cfg.page_buffer_m, max_snap_m=cfg.page_max_snap_m)

    # partition key: cell hash-bucketed to a fixed count — resumable layout
    # (SURVEY.md §7.5) with balanced partitions at any city extent
    n_parts = np.uint64(args.partitions)

    def _coarse(batch):
        import pyarrow as pa

        cell = batch["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (cell * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 4) if n_parts == 16 \
            else (cell * np.uint64(0x9E3779B97F4A7C15)) % n_parts
        return batch.append_column("part_cell", pa.array(bucket, type=pa.uint64()))

    ds = ds.map_batches(_coarse, batch_format="pyarrow")
    written = write_checkpointed(ds, args.out, "pagejoin", "part_cell",
                                 lineage={"pages": args.pages, "city_n": args.city_n},
                                 checksum_col="url")
    print(json.dumps({"partitions_written": len(written), "rows": int(written["rows"].sum())
                      if len(written) else 0, "out": args.out}))
    return 0


def cmd_simplify(args) -> int:
    from .pipelines.network import simplified_city
    from .state.sink import write_checkpointed

    out = simplified_city(n=args.city_n, seed=args.seed, cfg=_cfg(args))
    if args.gpkg:
        from .state.gpkg import write_simplified_gpkg

        out = {k: v.materialize() for k, v in out.items()}
        write_simplified_gpkg(out, args.gpkg)
    import numpy as np
    import pyarrow as pa

    def _part(df):
        df = df.copy()
        df["part"] = (df["g_id"].to_numpy().astype(np.int64) % 8).astype(np.uint64)
        return df

    edges = out["edges"].map_batches(_part, batch_format="pandas")
    written = write_checkpointed(edges, args.out, "simplified_edges", "part",
                                 lineage={"city_n": args.city_n, "seed": args.seed})
    print(json.dumps({"partitions_written": len(written),
                      "rows": int(written["rows"].sum()) if len(written) else 0}))
    return 0


def cmd_simplify_snapshot(args) -> int:
    """Run the full p2+p3 chain on an OSM-snapshot parquet directory — the
    real-data CLI surface (replaces the reference's runSimplification over
    GPKG inputs)."""
    from .pipelines.network import simplified_from_snapshot
    from .state.sink import write_checkpointed

    bbox = tuple(float(x) for x in args.bbox.split(",")) if args.bbox else None
    out = simplified_from_snapshot(
        f"{args.snapshot}/nodes.parquet", f"{args.snapshot}/edges.parquet",
        args.snapshot if args.with_dims else None, bbox=bbox, cfg=_cfg(args))
    if args.gpkg:
        from .state.gpkg import write_simplified_gpkg

        out = {k: v.materialize() for k, v in out.items()}
        write_simplified_gpkg(out, args.gpkg)
    import numpy as np

    def _part(df):
        df = df.copy()
        df["part"] = (df["g_id"].to_numpy().astype(np.int64) % args.partitions).astype(np.uint64)
        return df

    edges = out["edges"].map_batches(_part, batch_format="pandas")
    written = write_checkpointed(edges, args.out, "simplified_edges", "part",
                                 lineage={"snapshot": args.snapshot, "bbox": args.bbox})
    print(json.dumps({"partitions_written": len(written),
                      "rows": int(written["rows"].sum()) if len(written) else 0}))
    return 0


def cmd_corpus(args) -> int:
    import __main__  # noqa: F401

    import ray.data as rd

    from .pipelines import corpus

    fn = getattr(corpus, args.op, None)
    if fn is None:
        print(f"unknown corpus op: {args.op}", file=sys.stderr)
        return 2
    res = fn(args.sf_dir)
    if isinstance(res, rd.Dataset):
        n = res.count()
    else:
        n = res.num_rows
    print(json.dumps({"op": args.op, "rows": int(n)}))
    return 0


def cmd_corpus_export(args) -> int:
    from .pipelines.corpus import corpus_clean_export

    written = corpus_clean_export(args.sf_dir, args.out,
                                  n_shards=args.shards)
    print(json.dumps({
        "op": "corpus_clean_export",
        "partitions_written": int(len(written)),
        "rows_written": int(written["rows"].sum()) if len(written) else 0,
        "out": args.out,
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="osmnetfusion-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--config", help="JSON file of PipelineConfig overrides")
    sub = p.add_subparsers(dest="cmd", required=True)

    pj = sub.add_parser("pagejoin")
    pj.add_argument("--pages", type=int, default=100_000)
    pj.add_argument("--city-n", type=int, default=16)
    pj.add_argument("--seed", type=int, default=42)
    pj.add_argument("--out", required=True)
    pj.add_argument("--partitions", type=int, default=16)

    sp = sub.add_parser("simplify")
    sp.add_argument("--city-n", type=int, default=12)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", required=True)
    sp.add_argument("--gpkg", help="also write a GeoPackage (reference output format)")

    ss = sub.add_parser("simplify-snapshot")
    ss.add_argument("--snapshot", required=True,
                    help="directory with nodes.parquet / edges.parquet (+ optional dim tables)")
    ss.add_argument("--with-dims", action="store_true",
                    help="load enrichment dim parquet tables from the snapshot dir")
    ss.add_argument("--bbox", help="lon0,lat0,lon1,lat1 filter")
    ss.add_argument("--out", required=True)
    ss.add_argument("--gpkg", help="also write a GeoPackage (reference output format)")
    ss.add_argument("--partitions", type=int, default=16)

    co = sub.add_parser("corpus")
    co.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    co.add_argument("--op", default="exact_dedup")

    ce = sub.add_parser("corpus-export",
                        help="resumable cleaned-corpus export (quality "
                             "filter + exact dedup -> checkpointed shards)")
    ce.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ce.add_argument("--out", required=True)
    ce.add_argument("--shards", type=int, default=64)

    args = p.parse_args(argv)
    _init_ray(args.num_cpus)
    try:
        return {"pagejoin": cmd_pagejoin, "simplify": cmd_simplify,
                "simplify-snapshot": cmd_simplify_snapshot,
                "corpus": cmd_corpus,
                "corpus-export": cmd_corpus_export}[args.cmd](args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
