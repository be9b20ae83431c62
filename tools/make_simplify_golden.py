"""Generate (or --check) the committed golden artifact for the
``network_simplify`` driver oracle.

Role model: the reference repo publishes its own end-to-end simplified
network (``network_data/Munich_TEST/p3_Munich_TEST_simplified.gpkg``,
6,466 edges — p3_simplification.py:116,410-421) as the regression gate for
the whole p3 chain. This repo does the same for the fixture city: the
composite's integer-exact projection (ids, endpoints, access flags, 6dp
lengths/gradient/severity) is frozen into
``osmnetfusion_ray/golden/simplify_city_n8_s42.parquet`` and the driver's
DuckDB oracle simply reads it back — so any drift in ANY stage of the
p2+p3 chain turns the driver's ``network_simplify`` row red. The chain's
*semantics* are established independently by the per-stage network_*
DuckDB oracles and the pytest truth tables / merge-kernel bit-identity
tests; the golden pins the composite.

Usage::

    python tools/make_simplify_golden.py           # (re)write the golden
    python tools/make_simplify_golden.py --check   # re-run chain, compare
    python tools/make_simplify_golden.py --check --num-cpus 16

--check re-executes the full chain in THIS process's Ray session and
asserts the result is row-for-row identical to the committed file —
run it at two different --num-cpus values to evidence that the chain is
deterministic across cluster widths (the property the 6dp rounding plus
group-local sorted reductions guarantee).
"""

from __future__ import annotations

import argparse
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "osmnetfusion_ray", "golden",
                      "simplify_city_n8_s42.parquet")


def current() -> pd.DataFrame:
    import __ray_entry__ as entrymod

    df = entrymod.queries()["network_simplify"]("unused").to_pandas()
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    df = current()
    if args.check:
        golden = pd.read_parquet(GOLDEN)
        try:
            pd.testing.assert_frame_equal(df, golden)
        except AssertionError as e:
            print(f"MISMATCH vs {GOLDEN}:\n{e}")
            ray.shutdown()
            return 1
        print(f"OK: {len(df)} rows identical to {GOLDEN} "
              f"(num_cpus={args.num_cpus})")
    else:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        df.to_parquet(GOLDEN, index=False)
        print(f"wrote {len(df)} rows → {GOLDEN}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
