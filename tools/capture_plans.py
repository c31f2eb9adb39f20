"""Capture .explain("formatted") for catalog entries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [entry ...]
  tag     -> plans/<tag>/ output directory (e.g. r13)
  suffix  -> file suffix (before|after)
  entries -> catalog names; default = the bench HEADLINE set

Planning only (no job runs): the formatted physical plan is what the
optimization round's evidence files pin (Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python-eval nodes).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_datawarehouse_spark.registry import catalog  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    cat = catalog()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for name in names:
        df = cat[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
