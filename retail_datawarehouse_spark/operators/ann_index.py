"""Stored IVF index serving + incremental maintenance — the missing
half of ANN at 100 TB: ``q_ann_topk_suite`` proves the SEARCH math;
this module proves the index can live on disk as a table, answer
queries without ever being rebuilt, and absorb arriving vectors
without ever being rewritten.

Layout decision: the inverted file IS a partitioning key. The assigned
corpus is written ``partitionBy("cell")``, so a probe at nprobe cells
is a partition-pruned scan of nprobe directories — the other K−nprobe
cells are never opened (dynamic partition pruning from the broadcast
probe side; the same mechanism the warehouse fact reads pin). The
centroid table (K rows) rides alongside as the index metadata.

Incremental add is the FAISS `add`-after-`train` discipline: arriving
vectors are assigned against the STORED (frozen) centroids — a
map-only broadcast pass over the batch — and appended to the
partitioned table, which touches only the cells the batch lands in.
The corpus is never re-read, the index never retrained; drift between
the frozen quantizer and the data distribution is a REBUILD decision
(the drift-monitor panel is the signal for it), not a per-batch cost.
Serving correctness is probe-count-bounded exactly as for the built
index: nprobe=K degrades gracefully to exact search, pinned by test
against brute force over the grown corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.similarity import (
    _ivf_index_over,
    _nearest_cell,
    _norm2_expr,
    _per_query_topk,
    cosine_from_norms,
)


def _with_n2(vectors: DataFrame) -> DataFrame:
    """(id, emb[, n2]) → (id, emb, n2): the norm² is index data — it is
    computed ONCE at write/assign time and stored next to the vector,
    so serving never re-folds it (the suite-wide norms-below-the-join
    rule)."""
    if "n2" in vectors.columns:
        return vectors.select("id", "emb", "n2")
    return vectors.select(
        "id", "emb", _norm2_expr(F.col("emb")).alias("n2")
    )


def _build_index(
    corpus: DataFrame, cells: int
) -> tuple[DataFrame, DataFrame]:
    """Generalized index build at an arbitrary cell count: seed the
    ``cells`` smallest-HASH-RANK corpus vectors (r6 verdict #6: an
    id-prefix is a biased sample on real data where ids correlate with
    time/source; the salted LCG rank is equally deterministic and
    id-layout-free). orderBy+limit is a top-K TakeOrdered, not a
    global sort; the row_number window then runs over only ``cells``
    rows. One Lloyd iteration, final assignment — the
    `_ivf_index_over` recipe freed from the fixture-pinned IVF_CELLS,
    so the build can follow the √N cell-count rule."""
    from pyspark.sql import Window

    from retail_datawarehouse_spark.operators.similarity import (
        _fixed_point_centroids,
        _train_rank_col,
    )

    w = Window.orderBy("_hrank", "id")
    seeds = (
        corpus.select("id", "emb", _train_rank_col(F.col("id")).alias("_hrank"))
        .orderBy("_hrank", "id")
        .limit(cells)
        .withColumn("cell", F.row_number().over(w) - 1)
        .select("cell", F.col("emb").alias("centroid"))
    )
    assigned0 = _nearest_cell(corpus, seeds, keep=1)
    centroids = _fixed_point_centroids(assigned0).persist()
    return _nearest_cell(corpus, centroids, keep=1), centroids


def store_ivf_index(
    corpus: DataFrame, index_dir: str, cells: int | None = None
) -> None:
    """Build the IVF index over (id, emb) and persist it as a
    cell-partitioned parquet table + a centroid sidecar. One-time
    train/assign cost; every later query and append reads only what it
    touches. ``cells=None`` reuses the suite's fixture-pinned builder
    (byte-compatible with the in-memory `ivf_topk` twin); an explicit
    ``cells`` frees the count to follow the √N occupancy rule — probe
    cost is nprobe/K of the corpus either way, and full-probe
    exactness is cell-count-independent (pinned by test)."""
    withn2 = _with_n2(corpus)
    if cells is None:
        assigned, centroids = _ivf_index_over(withn2)
    else:
        assigned, centroids = _build_index(withn2, cells)
    assigned.select("id", "emb", "n2", "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{index_dir}/cells")
    centroids.write.mode("overwrite").parquet(f"{index_dir}/centroids")


def append_to_ivf_index(new_vectors: DataFrame, index_dir: str) -> None:
    """Assign arriving (id, emb) vectors against the STORED frozen
    centroids (map-only broadcast pass over the BATCH) and append —
    only the landed-in cells gain files; the stored corpus is never
    read, never rewritten."""
    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    assigned = _nearest_cell(_with_n2(new_vectors), centroids, keep=1)
    assigned.select("id", "emb", "n2", "cell").write.mode(
        "append"
    ).partitionBy("cell").parquet(f"{index_dir}/cells")


def query_ivf_index(
    queries: DataFrame, index_dir: str, nprobe: int
) -> DataFrame:
    """Serve top-k from the stored index: route each query to its
    nprobe nearest cells (broadcast centroid pass), then score exactly
    ONLY inside the probed cells — the cell equi-join against the
    partitioned table prunes unprobed cell directories at the source
    (dynamic partition pruning; pinned by plan test). Returns
    (query_id, candidate_id, cosine, rank)."""
    spark = queries.sparkSession
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    probes = _nearest_cell(_with_n2(queries), centroids, keep=nprobe).select(
        F.col("id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("n2").alias("q_n2"),
        "cell",
    )
    stored = spark.read.parquet(f"{index_dir}/cells").select(
        F.col("id").alias("candidate_id"),
        F.col("emb").alias("c_emb"),
        F.col("n2").alias("c_n2"),
        "cell",
    )
    scored = stored.join(F.broadcast(probes), "cell").withColumn(
        "cosine", cosine_from_norms("q_emb", "c_emb", "q_n2", "c_n2")
    )
    return _per_query_topk(scored)
