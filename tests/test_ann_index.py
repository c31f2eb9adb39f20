"""Stored IVF index (operators/ann_index.py): serving from the
cell-partitioned on-disk table equals the in-memory IVF search, probes
prune unprobed cell directories (DPP), and the frozen-centroid
incremental append is correct (full-probe equals brute force over the
grown corpus; appended vectors are retrievable at nprobe=1) and
surgical (only landed-in cells gain files)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.ann_index import (
    append_to_ivf_index,
    query_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.operators.similarity import (
    IVF_CELLS,
    IVF_NPROBE,
    N_QUERIES,
    _nearest_cell,
    ivf_topk,
)
from retail_datawarehouse_spark.sources.readers import load_table


def _fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    return corpus, queries


def _rows(df):
    return sorted(
        (r.query_id, r.candidate_id, r.cosine, r.rank) for r in df.collect()
    )


def test_stored_index_serving_equals_in_memory_ivf(
    spark, sf_correctness_dir, tmp_path
):
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = str(tmp_path / "ivf")
    store_ivf_index(corpus, idx)
    got = query_ivf_index(queries, idx, nprobe=IVF_NPROBE)
    want = ivf_topk(spark, sf_correctness_dir, nprobe=IVF_NPROBE)
    assert _rows(got) == _rows(want)
    # the index landed as one directory per cell — the inverted file
    # IS the partitioning
    cells = glob.glob(f"{idx}/cells/cell=*")
    assert len(cells) == IVF_CELLS


def test_probe_prunes_unprobed_cells_in_plan(
    spark, sf_correctness_dir, tmp_path
):
    """The cell equi-join against the partitioned table carries a
    dynamicpruning expression on the scan — unprobed cell directories
    are never opened (the warehouse-fact DPP mechanism, reused by the
    index)."""
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = str(tmp_path / "ivf")
    store_ivf_index(corpus, idx)
    plan = (
        query_ivf_index(queries, idx, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_frozen_centroid_append_full_probe_equals_brute_force(
    spark, sf_correctness_dir, tmp_path
):
    """Build on corpus minus a holdout, append the holdout against the
    FROZEN centroids, serve at nprobe=K: must equal brute-force exact
    top-k over the WHOLE corpus — full probe is assignment-independent,
    so this passes iff the append lost/duplicated nothing."""
    from retail_datawarehouse_spark.operators.similarity import TOP_K

    corpus, queries = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 17 == 0)
    base = corpus.filter(F.col("id") % 17 != 0)
    idx = str(tmp_path / "ivf")
    store_ivf_index(base, idx)
    append_to_ivf_index(holdout, idx)
    got = query_ivf_index(queries, idx, nprobe=IVF_CELLS)
    from pyspark.sql import Window

    from retail_datawarehouse_spark.operators.similarity import (
        cosine_from_norms,
        norm2_col,
    )

    scored = (
        corpus.withColumnRenamed("id", "candidate_id")
        .withColumnRenamed("emb", "c_emb")
        .withColumn("c_n2", norm2_col("c_emb"))
        .crossJoin(
            F.broadcast(
                queries.withColumnRenamed("id", "query_id")
                .withColumnRenamed("emb", "q_emb")
                .withColumn("q_n2", norm2_col("q_emb"))
            )
        )
        .withColumn(
            "cosine", cosine_from_norms("q_emb", "c_emb", "q_n2", "c_n2")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "candidate_id")
    want = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "candidate_id", "cosine", "rank")
    )
    assert _rows(got) == _rows(want)


def test_appended_vectors_are_retrievable_at_nprobe_one(
    spark, sf_correctness_dir, tmp_path
):
    """Assignment/probe consistency: a query identical to an appended
    vector routes (keep=1) to the SAME cell the append assigned it to —
    frozen centroids on both paths — so nprobe=1 must retrieve it at
    rank 1 with the exact self-cosine."""
    corpus, _ = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 17 == 0)
    base = corpus.filter(F.col("id") % 17 != 0)
    idx = str(tmp_path / "ivf")
    store_ivf_index(base, idx)
    append_to_ivf_index(holdout, idx)
    self_queries = holdout.limit(5)
    got = query_ivf_index(self_queries, idx, nprobe=1)
    top1 = {r.query_id: r for r in got.filter(F.col("rank") == 1).collect()}
    for qid in [r.id for r in self_queries.collect()]:
        assert top1[qid].candidate_id == qid
        assert abs(top1[qid].cosine - 1.0) < 1e-12


def test_append_touches_only_landed_cells(
    spark, sf_correctness_dir, tmp_path
):
    corpus, _ = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 17 == 0)
    base = corpus.filter(F.col("id") % 17 != 0)
    idx = str(tmp_path / "ivf")
    store_ivf_index(base, idx)
    before = {
        d: len(glob.glob(f"{d}/*.parquet"))
        for d in glob.glob(f"{idx}/cells/cell=*")
    }
    append_to_ivf_index(holdout, idx)
    after = {
        d: len(glob.glob(f"{d}/*.parquet"))
        for d in glob.glob(f"{idx}/cells/cell=*")
    }
    centroids = spark.read.parquet(f"{idx}/centroids")
    landed = {
        r.cell
        for r in _nearest_cell(
            holdout.withColumn(
                "n2",
                F.expr(
                    "aggregate(emb, cast(0.0 as double), (a, x) -> a + x * x)"
                ),
            ),
            centroids,
            keep=1,
        ).collect()
    }
    grown = {
        int(d.rsplit("cell=", 1)[1])
        for d in after
        if after[d] > before.get(d, 0)
    }
    assert grown == landed
    untouched = {d for d in before if int(d.rsplit("cell=", 1)[1]) not in landed}
    for d in untouched:
        assert after[d] == before[d]


def test_custom_cell_count_full_probe_is_exact(
    spark, sf_correctness_dir, tmp_path
):
    """Full-probe exactness is CELL-COUNT-INDEPENDENT: an index built
    at cells=8 (the generalized builder, not the fixture-pinned one)
    must reproduce brute-force top-k exactly at nprobe=8 — cell
    partitions are a complete disjoint cover whatever their count —
    and the layout lands as exactly 8 directories."""
    from pyspark.sql import Window

    from retail_datawarehouse_spark.operators.similarity import (
        TOP_K,
        cosine_from_norms,
        norm2_col,
    )

    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = str(tmp_path / "ivf8")
    store_ivf_index(corpus, idx, cells=8)
    assert len(glob.glob(f"{idx}/cells/cell=*")) == 8
    got = query_ivf_index(queries, idx, nprobe=8)
    scored = (
        corpus.withColumnRenamed("id", "candidate_id")
        .withColumnRenamed("emb", "c_emb")
        .withColumn("c_n2", norm2_col("c_emb"))
        .crossJoin(
            F.broadcast(
                queries.withColumnRenamed("id", "query_id")
                .withColumnRenamed("emb", "q_emb")
                .withColumn("q_n2", norm2_col("q_emb"))
            )
        )
        .withColumn(
            "cosine", cosine_from_norms("q_emb", "c_emb", "q_n2", "c_n2")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "candidate_id")
    want = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "candidate_id", "cosine", "rank")
    )
    assert _rows(got) == _rows(want)
