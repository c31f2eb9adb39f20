"""Serving-tier operating curve (r7 verdict #2) and routed auto-build
recall proof (r7 verdict #5) for the stored IVF×PQ index.

Part 1 — recall-vs-cost curve: over a stored auto-built PQ index,
sweep nprobe ∈ {K/16, K/8, K/4, K/2, K} × rerank R ∈ {0, 16, 64, 256}
and record, per operating point, recall@3 against the exact float
ranking and wall per 10-query wave. nprobe is parameterized as a
FRACTION of K because that is the serving tier's cost model (query
cost ∝ nprobe/K of the corpus) and because the fixture vectors are
near-isotropic — IVF's hardest case, where recall tracks the coverage
fraction, so absolute nprobe values are meaningless across different
auto-derived K. This is the table a 100 TB deployer picks an
operating point from: nprobe/K buys candidate coverage (cells
scanned), R buys exact-rank recovery from the ADC shortlist (floats
read per query). R=0 is raw ADC ranks — recall there is bounded by
the PQ reconstruction honesty on the near-uniform fixture vectors,
which is precisely what the curve makes visible.

Part 2 — routed-assignment recall: the auto build's two-level routed
assignment is approximate at group boundaries (ann_index.py). Two
planted probe families, both queried at nprobe=4 on the FLOAT path
(isolates routing from PQ error):

- SCALED copies (0.5× a corpus vector — cosine exactly 1): assignment
  is cosine-based, so a scale-invariant copy routes with its parent
  at BOTH levels by construction; rank-1 recall here proves the
  `_nearest_cell` docstring's claim verbatim and must be identical
  routed vs flat.
- PERTURBED copies (one coordinate ×1.5, id-picked — cosine ≈ 0.99):
  the query's direction differs slightly from the parent's, so at
  group boundaries the parent may sit in a cell the routed probe
  never reaches — THIS family quantifies what the routing
  approximation actually costs a retrieval caller.

Then rebuild with the FLAT assignment at the same cell count (same
hash-rank seeds by construction: the auto path's threshold+cap picks
exactly the k smallest hash ranks that the explicit-k builder's
orderBy+limit picks) and record recall for both families on both
indexes, plus the routing-vs-flat assignment agreement AGAINST THE
SAME auto centroids (isolating the routing approximation from the
different Lloyd step a flat build produces).

r8 history: the first run of this probe (flat probes over the routed
assignment) measured 0.846 planted rank-1 recall for BOTH families —
the routed quantizer MUST be probed symmetrically; `ann_index` now
stores `_coarse` on the sidecar and routes appends + small-nprobe
probes through it, and this probe records the post-fix numbers.

Usage:
    python tools/ann_operating_curve.py [sf_dir] [workdir]
defaults: /tmp/scale_probe20 (the 20x synthetic corpus) /tmp/ann_curve
Prints one JSON object; human progress on stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.operators.ann_index import (  # noqa: E402
    query_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.operators.similarity import (  # noqa: E402
    N_QUERIES,
    TOP_K,
)
from retail_datawarehouse_spark.session import get_spark  # noqa: E402
from retail_datawarehouse_spark.sources.readers import load_table  # noqa: E402

PROBE_FRACS = (1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0)  # of K; 1.0 = full probe
RERANKS = (0, 16, 64, 256)  # 0 -> raw ADC ranks (rerank=None)
N_PLANTED = 50


def _tops(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.candidate_id)
    return out


def _recall(got: dict[int, set[int]], want: dict[int, set[int]]) -> float:
    rs = [len(got.get(q, set()) & want[q]) / len(want[q]) for q in want]
    return round(sum(rs) / len(rs), 4)


def curve(
    spark, sf_dir: str, workdir: str, pq_mode: str = "residual"
) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    idx = f"{workdir}/idx_curve_{pq_mode}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    store_ivf_index(corpus, idx, cells="auto", pq=True, pq_mode=pq_mode)
    store_s = round(time.perf_counter() - t0, 2)
    cents = spark.read.parquet(f"{idx}/centroids")
    k = cents.count()
    coarse = (
        cents.select("_coarse").first()[0]
        if "_coarse" in cents.columns
        else 0
    )
    n = corpus.count()
    print(
        f"# {sf_dir} [{pq_mode}]: N={n} K={k} coarse={coarse} "
        f"store={store_s}s",
        file=sys.stderr,
    )
    exact = _tops(query_ivf_index(queries, idx, nprobe=k, pq=False))
    points = []
    for frac in PROBE_FRACS:
        nprobe = max(1, round(k * frac))
        # flat-route twin only where the regimes actually differ
        # (r8 verdict #3: routed probing caps broad recall below
        # sqrt(K); a broad-retrieval caller flips route="flat")
        routes = ("symmetric", "flat") if nprobe <= coarse else (
            "symmetric",
        )
        for route in routes:
            for rr in RERANKS:
                rerank = None if rr == 0 else rr
                fn = lambda: query_ivf_index(  # noqa: E731
                    queries, idx, nprobe=nprobe, pq=True, rerank=rerank,
                    route=route,
                )
                got = _tops(fn())  # warm + recall in one pass
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    fn().collect()
                    dt = time.perf_counter() - t0
                    best = dt if best is None or dt < best else best
                points.append(
                    {
                        "nprobe": nprobe,
                        "probe_frac": round(frac, 4),
                        "rerank": rr,
                        "route": route,
                        "recall_at_3": _recall(got, exact),
                        "wave_sec": round(best, 3),
                    }
                )
                print(f"#   {points[-1]}", file=sys.stderr)
    return {"sf_dir": sf_dir, "pq_mode": pq_mode, "n": n, "k": k,
            "coarse": coarse, "store_sec": store_s,
            "top_k": TOP_K, "points": points}


def planted(spark, sf_dir: str, workdir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    # hash-spread parents (the engine's own salted-LCG spirit, cheap
    # deterministic modulus here), queries = 0.5-scaled copies —
    # cosine with the parent is exactly 1, so exact rank-1 is the
    # parent unless routing dropped it into an unprobed cell
    parents = (
        corpus.filter(F.col("id") % 1009 == 0).limit(N_PLANTED)
    ).persist()
    scaled = parents.select(
        "id", F.transform("emb", lambda x: x * F.lit(0.5)).alias("emb")
    )
    # deterministic one-coordinate perturbation: index picked by id
    perturbed = parents.select(
        "id",
        F.transform(
            "emb",
            lambda x, i: F.when(
                i == (F.col("id") % F.size("emb")).cast("int"),
                x * F.lit(1.5),
            ).otherwise(x),
        ).alias("emb"),
    )
    out: dict = {"sf_dir": sf_dir, "n_planted": parents.count()}
    auto_idx, flat_idx = f"{workdir}/idx_auto", f"{workdir}/idx_flat"
    shutil.rmtree(auto_idx, ignore_errors=True)
    shutil.rmtree(flat_idx, ignore_errors=True)
    store_ivf_index(corpus, auto_idx, cells="auto")
    k = spark.read.parquet(f"{auto_idx}/centroids").count()
    store_ivf_index(corpus, flat_idx, cells=k)
    for tag, idx in (("routed", auto_idx), ("flat", flat_idx)):
        for fam, probes in (("scaled", scaled), ("perturbed", perturbed)):
            got = query_ivf_index(probes, idx, nprobe=4, pq=False)
            hits = (
                got.filter(
                    (F.col("rank") == 1)
                    & (F.col("candidate_id") == F.col("query_id"))
                ).count()
            )
            out[f"rank1_recall_{tag}_{fam}_nprobe4"] = round(
                hits / out["n_planted"], 4
            )
    # Isolate the routing approximation: flat-assign the corpus
    # against the SAME auto centroids and compare with the stored
    # routed cells. (Comparing against the flat-BUILT index would
    # conflate routing with the different Lloyd step it produces.)
    from retail_datawarehouse_spark.operators.similarity import (
        _nearest_cell,
    )

    auto_cents = spark.read.parquet(f"{auto_idx}/centroids")
    stored = spark.read.parquet(f"{auto_idx}/cells").select("id", "cell")
    flat_same = _nearest_cell(corpus, auto_cents, keep=1).select(
        "id", F.col("cell").alias("cell_flat")
    )
    joined = stored.join(flat_same, "id")
    agree = joined.filter(F.col("cell") == F.col("cell_flat")).count()
    total = joined.count()
    out["k"] = k
    out["routing_agreement_same_centroids"] = round(agree / total, 4)
    parents.unpersist()
    print(f"# planted: {out}", file=sys.stderr)
    return out


PQ_K_AXIS = (16, 64, 256)  # store-time code budget per subspace


def pq_k_axis(spark, sf_dir: str, workdir: str) -> dict:
    """The pq_k dialing axis at the DEFAULT operating point (r9 verdict
    next-round #5): rebuild the residual index at each store-time code
    budget and record, at nprobe=K/8, recall@3 vs the exact float
    ranking for R ∈ {0, 16, 64} plus the wave wall — the table a
    deployer dials R=0/small-R recall from WITHOUT paying rerank float
    reads. Codes stay PQ_M small ints per vector at every pq_k
    (parquet int encoding); what grows is the codebook sidecar
    (PQ_M·pq_k rows) and the one-time encode fold — so past the point
    where the recall column saturates, a bigger pq_k is free accuracy.
    pq_k caps at PQ_TRAIN_N=256 (seeds come from the bounded training
    sample). Also records planted scale-copy rank-1 on pure ADC at
    nprobe=4 per pq_k (the near-dup candidate-generation contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    parents = (
        corpus.filter(F.col("id") % 1009 == 0).limit(N_PLANTED)
    ).persist()
    n_planted = parents.count()
    scaled = parents.select(
        "id", F.transform("emb", lambda x: x * F.lit(0.5)).alias("emb")
    )
    rows = []
    for pq_k in PQ_K_AXIS:
        idx = f"{workdir}/idx_pqk{pq_k}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        store_ivf_index(corpus, idx, cells="auto", pq=True, pq_k=pq_k)
        store_s = round(time.perf_counter() - t0, 2)
        k = spark.read.parquet(f"{idx}/centroids").count()
        nprobe = max(1, round(k / 8))
        exact = _tops(query_ivf_index(queries, idx, nprobe=k, pq=False))
        row = {"pq_k": pq_k, "k": k, "nprobe": nprobe, "store_sec": store_s}
        for rr in (0, 16, 64):
            rerank = None if rr == 0 else rr
            fn = lambda: query_ivf_index(  # noqa: E731
                queries, idx, nprobe=nprobe, pq=True, rerank=rerank
            )
            got = _tops(fn())
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn().collect()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            row[f"recall_at_3_r{rr}"] = _recall(got, exact)
            row[f"wave_sec_r{rr}"] = round(best, 3)
        hits = (
            query_ivf_index(scaled, idx, nprobe=4, pq=True)
            .filter(
                (F.col("rank") == 1)
                & (F.col("candidate_id") == F.col("query_id"))
            )
            .count()
        )
        row["planted_adc_rank1_nprobe4"] = round(hits / n_planted, 4)
        rows.append(row)
        print(f"# pq_k axis: {row}", file=sys.stderr)
    parents.unpersist()
    return {"sf_dir": sf_dir, "n_planted": n_planted, "rows": rows}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0] if args else "/tmp/scale_probe20"
    workdir = args[1] if len(args) > 1 else "/tmp/ann_curve"
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark(app_name="ann-operating-curve")
    if "--pqk-only" in flags:
        # the pq_k dialing axis alone (~10 min at 20x vs ~35 for the
        # full curve): 3 stores + 9 operating points + 3 planted reads
        result = {"pq_k_axis_20x": pq_k_axis(spark, sf_dir, workdir)}
    else:
        result = {
            "curve_1x_residual": curve(
                spark, "/root/testdata/sf0.1", workdir, "residual"
            ),
            "curve_20x_residual": curve(spark, sf_dir, workdir, "residual"),
            "curve_20x_raw": curve(spark, sf_dir, workdir, "raw"),
            "planted_20x": planted(spark, sf_dir, workdir),
            "pq_k_axis_20x": pq_k_axis(spark, sf_dir, workdir),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
