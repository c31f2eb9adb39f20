"""OPQ headroom probe (r9 forward analysis): would a learned rotation
(Ge et al. 2013, OPQ) improve the residual-PQ tier on THIS corpus?

OPQ's entire gain comes from redistributing variance: it rotates the
space so each PQ subspace carries a balanced share (and decorrelated
dimensions), which matters exactly when the data covariance is
anisotropic. This probe measures, over the same hash-ranked residual
sample the codebook trains on:

- the eigenvalue spectrum of the residual covariance (max/mean/min —
  spherical ⇒ nothing for a rotation to exploit);
- per-subspace variance under the CURRENT (identity) layout vs the
  balanced ideal (their ratio bounds the distortion-allocation gain —
  the product-of-subspace-variances term in the rate-distortion bound);
- the off-block energy fraction (cross-subspace covariance a rotation
  could remove).

All numpy over a bounded driver-side sample (the same 256-row class
the PQ trainer uses — this is ANALYSIS tooling, not an operator).

Usage: python tools/opq_gain_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.operators.similarity import (  # noqa: E402
    _PQ_SUB,
    PQ_M,
    N_QUERIES,
    _ivf_index_over,
    _residualize,
)
from retail_datawarehouse_spark.session import get_spark  # noqa: E402
from retail_datawarehouse_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="opq-gain-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    withn2 = corpus.withColumn(
        "n2",
        F.expr("aggregate(emb, cast(0.0 as double), (a, x) -> a + x * x)"),
    )
    assigned, centroids = _ivf_index_over(withn2)
    res = _residualize(assigned, centroids).select("res")
    # bounded sample: every residual at sf0.01 is small enough; cap 4096
    rows = res.limit(4096).collect()
    X = np.array([r.res for r in rows], dtype=np.float64)
    X = X - X.mean(axis=0, keepdims=True)
    C = (X.T @ X) / max(1, len(X) - 1)
    eig = np.linalg.eigvalsh(C)[::-1]
    d = C.shape[0]
    sub_vars = [
        float(np.trace(C[i * _PQ_SUB:(i + 1) * _PQ_SUB,
                         i * _PQ_SUB:(i + 1) * _PQ_SUB]))
        for i in range(PQ_M)
    ]
    total_var = float(np.trace(C))
    balanced = total_var / PQ_M
    # distortion-allocation bound: PQ distortion tracks the GEOMETRIC
    # mean of subspace variances; identity vs balanced ratio bounds
    # what re-allocation alone could buy
    geo_identity = float(np.exp(np.mean(np.log(np.maximum(sub_vars, 1e-30)))))
    off_block = C.copy()
    for i in range(PQ_M):
        off_block[i * _PQ_SUB:(i + 1) * _PQ_SUB,
                  i * _PQ_SUB:(i + 1) * _PQ_SUB] = 0.0
    out = {
        "sf_dir": sf_dir,
        "n_sample": int(len(X)),
        "dim": int(d),
        "eig_max_over_mean": round(float(eig[0] / eig.mean()), 4),
        "eig_min_over_mean": round(float(eig[-1] / eig.mean()), 4),
        "subspace_var_max_over_balanced": round(max(sub_vars) / balanced, 4),
        "subspace_var_min_over_balanced": round(min(sub_vars) / balanced, 4),
        "geo_mean_identity_over_balanced": round(geo_identity / balanced, 4),
        "off_block_energy_frac": round(
            float(np.linalg.norm(off_block) / np.linalg.norm(C)), 4
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
