"""Metric-trained coarse quantizer receipt (r11; r10 verdict #2).

The r10 metric-serving docs named the boundary honestly: the spherical
(cosine-trained) quantizer routes l2/ip probes through direction-only
cell shapes, which is fine on norm-concentrated corpora (the r10
routing receipt) but loses small-nprobe recall when ‖x‖ SPREADS —
"an L2-trained quantizer remains a rebuild decision". This probe
measures that exact gap on two planted norm-spread fixtures and records
the receipt JSON the norm-spread tests pin thresholds against:

- l2 fixture: a tight small-norm ball (‖x‖=0.1) plus a far large-norm
  shell (‖x‖=10), queries in the ball. True l2 neighbors are ball
  members of ANY direction; spherical cells mix ball and shell by
  direction cone, so a 2-of-16-cell probe misses most of the ball,
  while l2-trained Lloyd separates the shells.
- ip fixture: 8 small-norm direction clusters (one query-aligned) plus
  one large-norm cluster at cos≈0.8 off the query direction. True MIPS
  winners are the big off-direction cluster (10·0.8 ≫ 0.1·1.0);
  spherical probing ranks the aligned small cluster first, while the
  metric-trained index (L2 cells, q·centroid probe ranking — the
  ScaNN-style split) ranks the high-dot cell first.

Run: python tools/metric_quantizer_probe.py [out.json]
Writes tools/metric_quantizer_r11.json by default.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.operators.ann_index import (  # noqa: E402
    query_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.operators.similarity import TOP_K  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402

DIM = 16
CELLS = 16
NPROBE = 2


def _unit(rng: np.random.Generator, n: int) -> np.ndarray:
    v = rng.normal(size=(n, DIM))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def l2_fixture() -> tuple[list, list]:
    """(corpus rows, query rows): ball ‖x‖=0.1 ids 100-299, shell
    ‖x‖=10 ids 300-499, queries in the ball ids 0-9."""
    rng = np.random.default_rng(42)
    ball = 0.1 * _unit(rng, 200)
    shell = 10.0 * _unit(rng, 200)
    qs = 0.1 * _unit(rng, 10)
    corpus = [(100 + i, ball[i].tolist()) for i in range(200)] + [
        (300 + i, shell[i].tolist()) for i in range(200)
    ]
    queries = [(i, qs[i].tolist()) for i in range(10)]
    return corpus, queries


def ip_fixture() -> tuple[list, list]:
    """(corpus rows, query rows): 8 small-norm direction clusters
    (25×, ‖x‖=0.1; cluster 0 is query-aligned) ids 100-299, one
    large-norm cluster at cos≈0.8 to the query direction (50×, ‖x‖=10)
    ids 500-549, queries near cluster 0's direction with ‖q‖=1."""
    rng = np.random.default_rng(7)
    dirs = _unit(rng, 8)
    u = dirs[0]
    # direction at cos ~0.8 to u: mix u with an orthogonalized random v
    w = rng.normal(size=DIM)
    w -= w.dot(u) * u
    w /= np.linalg.norm(w)
    b = 0.8 * u + 0.6 * w  # unit by construction

    def around(d: np.ndarray, n: int, noise: float) -> np.ndarray:
        pts = d[None, :] + noise * rng.normal(size=(n, DIM))
        return pts / np.linalg.norm(pts, axis=1, keepdims=True)

    corpus = []
    for c in range(8):
        pts = 0.1 * around(dirs[c], 25, 0.05)
        corpus += [
            (100 + 25 * c + i, pts[i].tolist()) for i in range(25)
        ]
    big = 10.0 * around(b, 50, 0.05)
    corpus += [(500 + i, big[i].tolist()) for i in range(50)]
    qpts = 1.0 * around(u, 10, 0.05)
    queries = [(i, qpts[i].tolist()) for i in range(10)]
    return corpus, queries


def _true_topk(corpus: list, queries: list, metric: str) -> dict[int, set]:
    ids = np.array([r[0] for r in corpus])
    mat = np.array([r[1] for r in corpus])
    out = {}
    for qid, q in queries:
        q = np.array(q)
        if metric == "l2":
            key = ((mat - q) ** 2).sum(axis=1)
            order = np.lexsort((ids, key))
        elif metric == "cosine":
            key = (mat @ q) / (
                np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
            )
            order = np.lexsort((ids, -key))
        else:  # ip: larger better
            key = mat @ q
            order = np.lexsort((ids, -key))
        out[qid] = set(ids[order[:TOP_K]].tolist())
    return out


def concentrated_fixture() -> tuple[list, list]:
    """Norm-CONCENTRATED control (all ‖x‖≈1): the regime the r10
    routing receipt already certified for the spherical quantizer —
    the metric-trained quantizer must not REGRESS here (the boundary
    claim runs in both directions)."""
    rng = np.random.default_rng(21)
    mat = _unit(rng, 400)
    qs = _unit(rng, 10)
    corpus = [(100 + i, mat[i].tolist()) for i in range(400)]
    queries = [(i, qs[i].tolist()) for i in range(10)]
    return corpus, queries


def recall_at_nprobe(
    spark,
    corpus: list,
    queries: list,
    metric: str,
    trained: bool,
    nprobe: int = NPROBE,
) -> float:
    cdf = spark.createDataFrame(corpus, "id long, emb array<double>")
    qdf = spark.createDataFrame(queries, "id long, emb array<double>")
    truth = _true_topk(corpus, queries, metric)
    workdir = tempfile.mkdtemp(prefix="metric_quantizer_")
    try:
        idx = f"{workdir}/idx"
        store_ivf_index(
            cdf, idx, cells=CELLS, metric=metric if trained else "cosine"
        )
        got = query_ivf_index(qdf, idx, nprobe=nprobe, metric=metric)
        hits, total = 0, 0
        by_q: dict[int, set] = {}
        for r in got.collect():
            by_q.setdefault(r.query_id, set()).add(r.candidate_id)
        for qid, want in truth.items():
            hits += len(want & by_q.get(qid, set()))
            total += len(want)
        return round(hits / total, 4)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "metric_quantizer_r11.json",
        )
    )
    spark = get_spark(app_name="metric-quantizer-probe")
    report = {
        "dim": DIM,
        "cells": CELLS,
        "nprobe": NPROBE,
        "top_k": TOP_K,
    }
    for metric, fixture in (("l2", l2_fixture), ("ip", ip_fixture)):
        corpus, queries = fixture()
        sph = recall_at_nprobe(spark, corpus, queries, metric, trained=False)
        trn = recall_at_nprobe(spark, corpus, queries, metric, trained=True)
        curve = {
            f"nprobe_{np_}": {
                "spherical": recall_at_nprobe(
                    spark, corpus, queries, metric, False, nprobe=np_
                ),
                "metric_trained": recall_at_nprobe(
                    spark, corpus, queries, metric, True, nprobe=np_
                ),
            }
            for np_ in (1, 4)
        }
        report[metric] = {
            "spherical_recall": sph,
            "metric_trained_recall": trn,
            "gain": round(trn - sph, 4),
            "curve": curve,
        }
        print(f"# {metric}: spherical={sph} metric-trained={trn}", file=sys.stderr)
    # no-regression control: on a norm-concentrated corpus (the regime
    # the spherical quantizer already serves well) metric training must
    # not LOSE recall
    ccorpus, cqueries = concentrated_fixture()
    report["concentrated_control_l2"] = {
        "spherical": recall_at_nprobe(spark, ccorpus, cqueries, "l2", False),
        "metric_trained": recall_at_nprobe(
            spark, ccorpus, cqueries, "l2", True
        ),
    }
    print(
        f"# concentrated l2 control: {report['concentrated_control_l2']}",
        file=sys.stderr,
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
