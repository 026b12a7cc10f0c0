"""Per-stage execution breakdown for a driver-contract query.

Runs ``queries()[name](sf_dir)`` and prints Ray Data's per-operator
stats (``ds.stats()``) — wall time, block counts, task parallelism —
the feedback loop used to verify a stage is dominated by useful
compute rather than coordination.  Queries returning a pandas
DataFrame (driver-side finishes) have no Dataset stats; their total
wall time is printed instead.

Usage: python scripts/stats.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    t0 = time.perf_counter()
    out = E.queries()[name](sf_dir)
    if hasattr(out, "stats"):  # ray.data.Dataset
        out = out.materialize()
        print(out.stats())
        n = out.count()
    else:  # pandas.DataFrame / pyarrow.Table
        n = len(out)
    wall = time.perf_counter() - t0
    print(f"\n{name}: {n} rows in {wall:.2f}s total")
    ray.shutdown()


if __name__ == "__main__":
    main()
