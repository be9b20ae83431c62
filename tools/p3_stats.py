"""Dump `ds.stats()` for the p3 chain's materialized stages — the
measure-don't-guess loop used to find the round-2 walls (merge-map
singleton loop, aggregator pool startup, no-op convergence round).

    python tools/p3_stats.py [city_n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for _v in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
    os.environ.setdefault(_v, "536870912")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def main(n: int = 40):
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osmnetfusion_ray.rayctx import ensure_tuned

    ensure_tuned()
    from osmnetfusion_ray.pipelines.enrich import enrich_network
    from osmnetfusion_ray.pipelines.network import build_network_inputs
    from osmnetfusion_ray.pipelines.simplify import simplify_network

    nodes_ds, edges_ds, dims, ids = build_network_inputs(n=n, seed=42)
    nodes_ds, edges_ds = enrich_network(nodes_ds, edges_ds, dims, ids)
    edges_ds = edges_ds.materialize()
    print("=== enriched edges stats ===")
    print(edges_ds.stats())
    out = simplify_network(nodes_ds, edges_ds)
    edges_out = out["edges"].materialize()
    print("=== simplified edges stats ===")
    print(edges_out.stats())
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
