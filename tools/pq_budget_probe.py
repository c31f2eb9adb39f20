"""PQ code-budget probe (r9 forward analysis, companion to
opq_gain_probe): the OPQ probe showed the raw-ADC recall floor is the
RATE limit of PQ_M×PQ_K = 8×16 on a spherical distribution, not a
coordinate artifact. This measures the claim: rebuild the residual
stored index at PQ_K ∈ {16, 64} (codes stay one small int per
subspace — the storage cost is identical at parquet's int encoding;
what grows is the codebook sidecar, 128 → 512 rows, and the per-row
encode fold, 16 → 64 L2 comparisons per subspace) and record recall@3
vs the exact float ranking at the default operating point's probe
depth with R=0 (pure ADC) and R=16.

PQ_K is mutated on the similarity module for the alternate build —
measurement tooling only; the product constant stays 16 because the
suite's DuckDB oracle unrolls seeds per code and its TRAIN sample
(256 rows) must stay comfortably above PQ_K per-subspace cells.

Usage: python tools/pq_budget_probe.py [sf_dir] [workdir]
"""
from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.operators import similarity  # noqa: E402
from retail_datawarehouse_spark.operators.ann_index import (  # noqa: E402
    query_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.session import get_spark  # noqa: E402
from retail_datawarehouse_spark.sources.readers import load_table  # noqa: E402


def _tops(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.candidate_id)
    return out


def _recall(got, want):
    rs = [len(got.get(q, set()) & want[q]) / len(want[q]) for q in want]
    return round(sum(rs) / len(rs), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe20"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pq_budget"
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark(app_name="pq-budget-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= similarity.N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < similarity.N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    base_pq_k = similarity.PQ_K
    results = []
    try:
        for pq_k in (16, 64):
            similarity.PQ_K = pq_k
            idx = f"{workdir}/idx_k{pq_k}"
            shutil.rmtree(idx, ignore_errors=True)
            store_ivf_index(corpus, idx, pq=True)
            k = spark.read.parquet(f"{idx}/centroids").count()
            exact = _tops(query_ivf_index(queries, idx, nprobe=k, pq=False))
            nprobe = max(1, round(k / 4))
            row = {"pq_k": pq_k, "k": k, "nprobe": nprobe}
            for rr in (None, 16):
                got = _tops(
                    query_ivf_index(
                        queries, idx, nprobe=nprobe, pq=True, rerank=rr
                    )
                )
                row[f"recall_at_3_r{rr or 0}"] = _recall(got, exact)
            results.append(row)
            print(f"# {row}", file=sys.stderr)
    finally:
        similarity.PQ_K = base_pq_k
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
