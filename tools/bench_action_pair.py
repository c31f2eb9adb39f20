"""Paired timed-action run for the r8 bench rebaseline (r7 verdict
#1): every headline entry measured best-of-BENCH_REPS under BOTH the
legacy ``count()`` action (what BENCH_r01..r07 recorded — Catalyst
prunes computed columns the count doesn't need) and the full-width
``force_full`` checksum (what bench.py times from r8 on). The one
recorded pairing is what lets the 2×-gate lineage survive the
rebaseline: old-action totals stay comparable to r1-r7, new-action
totals are the honest going-forward baseline, and the per-entry ratio
shows exactly which rows count() was flattering.

Usage: python tools/bench_action_pair.py [sf_dir]  (default sf0.1)
Prints one JSON object {"sf": ..., "count": {...}, "checksum": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_REPS, HEADLINE, force_full  # noqa: E402
from retail_datawarehouse_spark.registry import catalog  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402


def _best_of(spark, builder, sf_dir, action) -> float:
    action(builder(spark, sf_dir))  # warm
    best = None
    for _ in range(BENCH_REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        action(builder(spark, sf_dir))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench-action-pair")
    cat = catalog()
    out = {"sf": sf_dir, "count": {}, "checksum": {}}
    for name in HEADLINE:
        builder = cat[name].builder
        out["count"][name] = _best_of(
            spark, builder, sf_dir, lambda df: df.count()
        )
        out["checksum"][name] = _best_of(spark, builder, sf_dir, force_full)
        print(
            f"# {name}: count={out['count'][name]:.3f}s "
            f"checksum={out['checksum'][name]:.3f}s",
            file=sys.stderr,
        )
    for k in ("count", "checksum"):
        out[f"{k}_total"] = round(sum(out[k].values()), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
