"""Measured receipt for the metric knob's routing-honesty claim
(r10 continuation): the coarse quantizer is SPHERICAL (cosine) under
every serving metric, so small-nprobe recall for broad ip/l2 retrieval
inherits the spherical cell shapes. The query_ivf_index docstring
states this as a boundary; this probe RECORDS it — per-metric recall@3
of the float path vs that metric's own brute-force ranking, at small
nprobe under both probe routes, plus the full-probe exactness
degenerate (must read 1.0 everywhere by the pinned tests).

Usage: python tools/metric_recall_probe.py [sf_dir]  (default sf0.1)
Prints one JSON object; the committed copy lives at
tools/metric_recall_r10.json and BASELINE.md quotes it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.operators.ann_index import (  # noqa: E402
    _metric_score,
    _metric_topk,
    open_ivf_index,
    query_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.operators.similarity import (  # noqa: E402
    N_QUERIES,
    norm2_col,
)
from retail_datawarehouse_spark.session import get_spark  # noqa: E402
from retail_datawarehouse_spark.sources.readers import load_table  # noqa: E402


def _ids_by_query(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.candidate_id)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="metric-recall-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    with tempfile.TemporaryDirectory() as tmp:
        idx = f"{tmp}/idx"
        store_ivf_index(corpus, idx)  # auto cells, residual PQ default off
        h = open_ivf_index(spark, idx, persist=True)
        k = h.centroids.count()

        def brute(metric):
            c = corpus.select(
                F.col("id").alias("candidate_id"),
                F.col("emb").alias("c_emb"),
                norm2_col("emb").alias("c_n2"),
            )
            q = queries.select(
                F.col("id").alias("query_id"),
                F.col("emb").alias("q_emb"),
                norm2_col("emb").alias("q_n2"),
            )
            col = "cosine" if metric == "cosine" else "score"
            scored = c.crossJoin(F.broadcast(q)).withColumn(
                col, _metric_score(metric, "c_emb", "c_n2")
            )
            return _ids_by_query(_metric_topk(scored, metric))

        result: dict = {"sf_dir": sf_dir, "k": k, "rows": []}
        for metric in ("cosine", "ip", "l2"):
            truth = brute(metric)
            for nprobe in (max(1, k // 16), max(1, k // 8), max(1, k // 4), "all"):
                for route in ("symmetric", "flat"):
                    got = _ids_by_query(
                        query_ivf_index(
                            queries,
                            idx,
                            nprobe=nprobe,
                            metric=metric,
                            route=route,
                            handle=h,
                        )
                    )
                    recall = sum(
                        len(got.get(qid, set()) & t) / len(t)
                        for qid, t in truth.items()
                    ) / len(truth)
                    result["rows"].append(
                        {
                            "metric": metric,
                            "nprobe": nprobe,
                            "route": route,
                            "recall_at_3": round(recall, 4),
                        }
                    )
        h.close()
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
