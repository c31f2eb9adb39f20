"""Plan-shape screen for EVERY catalog entry: count Exchanges, join
strategies, Python-eval nodes, Windows, scans in each builder's
formatted physical plan. Output: one TSV line per entry.

Usage: python tools/plan_shapes_r13.py [sf_dir] > plans/r13/all_shapes.tsv
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_datawarehouse_spark.registry import catalog  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-shapes-r13")
    cat = catalog()
    print(
        "entry\texchanges\tbhj\tsmj\tshj\tbnlj\tpy\twindow\tsort\tscans\tnotes"
    )
    for name in sorted(cat):
        try:
            df = cat[name].builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERROR: {type(e).__name__}: {e}")
            continue
        tree = plan.split("\n\n")[0]

        def c(pat: str) -> int:
            return len(re.findall(pat, tree))

        notes = []
        if "CartesianProduct" in tree:
            notes.append("CARTESIAN")
        if re.search(r"BatchEvalPython", tree):
            notes.append("BatchEvalPython")
        win_pat = chr(10) + r"[^(]*Window"
        sort_pat = r"\bSort\b"
        print(
            f"{name}\t{c('Exchange')}\t{c('BroadcastHashJoin')}\t"
            f"{c('SortMergeJoin')}\t{c('ShuffledHashJoin')}\t"
            f"{c('BroadcastNestedLoopJoin')}\t"
            f"{c('EvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas')}\t"
            f"{c(win_pat)}\t{c(sort_pat)}\t"
            f"{c('Scan parquet')}\t{','.join(notes)}"
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
