"""Decompose the ANN suite's shared-build cost (r13): time each piece
of _suite_shared + the per-branch probe chain, with job/stage counts
from the status tracker.

Usage: python tools/shared_build_probe_r13.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import force_full  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402


def timed(spark, name, build, reps=3):
    build(spark)
    best, n = None, 0
    st = spark.sparkContext.statusTracker()
    jobs_before = len(st.getJobIdsForGroup() or [])
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = force_full(build(spark))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"probe": name, "sec": round(best, 4), "rows": n}))
    sys.stdout.flush()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="shared-build-probe")

    from retail_datawarehouse_spark.operators import similarity as sim

    def corpus_only(s):
        return sim._ann_corpus(sim.load_table(s, sf_dir, "embeddings"))

    def assigned0_only(s):
        c = corpus_only(s).select(
            F.col("candidate_id").alias("id"),
            F.col("c_emb").alias("emb"),
            F.col("c_n2").alias("n2"),
        )
        seeds = c.filter(F.col("id") < sim.N_QUERIES + sim.IVF_CELLS).select(
            (F.col("id") - sim.N_QUERIES).alias("cell"),
            F.col("emb").alias("centroid"),
        )
        return sim._nearest_cell(c, seeds, keep=1).select("id", "cell")

    def centroids_only(s):
        c = corpus_only(s).select(
            F.col("candidate_id").alias("id"),
            F.col("c_emb").alias("emb"),
            F.col("c_n2").alias("n2"),
        )
        seeds = c.filter(F.col("id") < sim.N_QUERIES + sim.IVF_CELLS).select(
            (F.col("id") - sim.N_QUERIES).alias("cell"),
            F.col("emb").alias("centroid"),
        )
        a0 = sim._nearest_cell(c, seeds, keep=1)
        return sim._fixed_point_centroids(a0).select("cell")

    def ivf_index_full(s):
        c = corpus_only(s).select(
            F.col("candidate_id").alias("id"),
            F.col("c_emb").alias("emb"),
            F.col("c_n2").alias("n2"),
        )
        assigned, centroids = sim._ivf_index_over(c)
        return assigned.select("id", "cell")

    def coded_only(s):
        sh = sim._suite_shared(s, sf_dir)
        return sh["coded"].select("candidate_id")

    def coded_res_only(s):
        sh = sim._suite_shared(s, sf_dir)
        return sh["coded_res"].select("candidate_id")

    for name, fn in (
        ("corpus_only", corpus_only),
        ("assigned0_only", assigned0_only),
        ("centroids_only", centroids_only),
        ("ivf_index_full", ivf_index_full),
        ("coded_only", coded_only),
        ("coded_res_only", coded_res_only),
    ):
        timed(spark, name, fn)

    # stored-pair decomposition: one open per rep vs memoized handle
    from retail_datawarehouse_spark.operators.ann_index import (
        open_ivf_index,
        query_ivf_index,
    )

    cached = sim._STORED_SUITE_CACHE.get(
        (spark.sparkContext.applicationId, sf_dir)
    )
    idx = cached[0] if cached else None
    emb = sim.load_table(spark, sf_dir, "embeddings")
    q = sim._ann_queries(emb).select(
        F.col("query_id").alias("id"), F.col("q_emb").alias("emb")
    )
    if idx is None:
        sim._stored_suite_branches(spark, sf_dir, sim._ann_queries(emb))
        idx = sim._STORED_SUITE_CACHE[
            (spark.sparkContext.applicationId, sf_dir)
        ][0]

    def stored_handleless(s):
        flt = query_ivf_index(q, idx, nprobe=sim.IVF_NPROBE)
        adc = query_ivf_index(q, idx, nprobe=sim.IVF_NPROBE, pq=True)
        return flt.select("query_id").unionByName(adc.select("query_id"))

    handle = open_ivf_index(spark, idx, persist=False)

    def stored_shared_handle(s):
        flt = query_ivf_index(q, idx, nprobe=sim.IVF_NPROBE, handle=handle)
        adc = query_ivf_index(
            q, idx, nprobe=sim.IVF_NPROBE, pq=True, handle=handle
        )
        return flt.select("query_id").unionByName(adc.select("query_id"))

    timed(spark, "stored_handleless", stored_handleless)
    timed(spark, "stored_shared_handle", stored_shared_handle)
    spark.stop()


if __name__ == "__main__":
    main()
