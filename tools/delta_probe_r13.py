"""Quiet-box same-session re-measure of the rows touched by the r13
optimization changes (current HEAD code). Best-of-3 force_full, the
bench protocol. Usage: python tools/delta_probe_r13.py [sf_dir] [names...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force_full  # noqa: E402
from retail_datawarehouse_spark.registry import catalog  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q_etl_clean_staging",
    "q_fact_monthly_snapshot",
    "q55_snapshot_lifetime_read",
    "q_ann_topk_suite",
    "q51_sales_by_hour",
    "q_dedup_minhash_lsh",
    "q_text_metrics",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark(app_name="delta-probe-r13")
    cat = catalog()
    for name in names:
        b = cat[name].builder
        force_full(b(spark, sf_dir))
        best, n = None, 0
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = force_full(b(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(json.dumps({"probe": name, "sec": round(best, 4), "rows": n}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
