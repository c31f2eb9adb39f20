"""Similarity search over the ``embeddings`` table (64-dim float vectors).

- **Brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the candidate corpus, score every pair,
  per-query top-k. Linear in corpus × queries; at 100 TB this is the
  verification path, not the serving path.
- **LSH-bucketed top-k** — the scale path: deterministic sign-bit
  buckets (random-hyperplane LSH with axis-aligned planes, i.e. an
  IVF-style coarse quantizer); candidates are only same-bucket vectors,
  so the scored set shrinks by ~2^bits at some recall cost. The bucket
  id is a plain column → the bucket join is an equi-join Catalyst
  hash-partitions; per-bucket scoring parallelizes for free.

All arithmetic is an ordered left fold in double (``F.aggregate`` ≡
DuckDB ``list_reduce``), so cosine values are bit-identical with the
oracle — exact-equality checkable, no tolerance games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

N_QUERIES = 10
TOP_K = 3
LSH_BITS = 8

# Ordered-fold vector math (identical accumulation order in both engines).
_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, p) -> acc + p)"
)
_SPARK_NORM2 = (
    "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, p) -> acc + p)"
)
_DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)), "
    "(acc, x) -> acc + x)"
)
_DUCK_NORM2 = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), "
    "(acc, x) -> acc + x)"
)


def cosine_col(a: str, b: str) -> F.Column:
    dot = F.expr(_SPARK_DOT.format(a=a, b=b))
    na = F.expr(_SPARK_NORM2.format(a=a))
    nb = F.expr(_SPARK_NORM2.format(a=b))
    return dot / (F.sqrt(na) * F.sqrt(nb))


def _duck_cosine(a: str, b: str) -> str:
    return (
        f"({_DUCK_DOT.format(a=a, b=b)}) / "
        f"(sqrt({_DUCK_NORM2.format(a=a)}) * sqrt({_DUCK_NORM2.format(a=b)}))"
    )


@register(
    "q_ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS candidate_id, embedding AS c_emb
          FROM embeddings WHERE vec_id >= {N_QUERIES}),
    scored AS (
        SELECT q.query_id, c.candidate_id,
               {_duck_cosine("q.q_emb", "c.c_emb")} AS cosine
        FROM q CROSS JOIN c
    )
    SELECT query_id, candidate_id, cosine,
           CAST(row_number() OVER
               (PARTITION BY query_id ORDER BY cosine DESC, candidate_id)
               AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {TOP_K}
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for the first 10 vectors against the
    rest: broadcast queries × corpus scan → window top-k per query.
    Ties broken by candidate_id → fully deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("candidate_id"), F.col("embedding").alias("c_emb")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_col("q_emb", "c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "candidate_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def _bucket_sql(emb: str, index_base: int) -> str:
    """Sign-bit bucket id from the first LSH_BITS components.

    ``index_base``: Spark SQL array subscripts are 0-based, DuckDB's are
    1-based — same expression text otherwise.
    """
    return " + ".join(
        f"CASE WHEN {emb}[{i + index_base}] > 0 THEN {2**i} ELSE 0 END"
        for i in range(LSH_BITS)
    )


@register(
    "q_ann_lsh_bucketed",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql("embedding", 1)} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket
          FROM b WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS candidate_id, embedding AS c_emb, bucket
          FROM b WHERE vec_id >= {N_QUERIES}),
    scored AS (
        SELECT q.query_id, c.candidate_id,
               {_duck_cosine("q.q_emb", "c.c_emb")} AS cosine
        FROM q JOIN c ON q.bucket = c.bucket
    )
    SELECT query_id, candidate_id, cosine,
           CAST(row_number() OVER
               (PARTITION BY query_id ORDER BY cosine DESC, candidate_id)
               AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {TOP_K}
    """,
)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH/IVF-bucketed ANN: 8 sign-bit hyperplane cuts → 256 buckets;
    search only the query's bucket. The candidate set shrinks ~256× —
    the trade the scale path makes (recall < 1.0; the brute-force
    operator is the recall oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.expr(_bucket_sql("embedding", 0))
    b = emb.withColumn("bucket", bucket)
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = b.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("candidate_id"),
        F.col("embedding").alias("c_emb"),
        "bucket",
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", cosine_col("q_emb", "c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "candidate_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


@register(
    "q_dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
    scored AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_duck_cosine("a.embedding", "b.embedding")} AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine
    FROM scored
    ORDER BY cosine DESC, vec_a, vec_b
    LIMIT 20
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: the 20 most-similar pairs in a 200-vec
    slice (the fixtures have no true near-dup vectors — max pairwise
    cosine ≈ 0.44 — so the operator reports the top of the distribution
    instead of thresholding into an empty set). At scale the same scoring
    runs bucketed (see q_ann_lsh_bucketed), not all-pairs."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine_col("e_a", "e_b"))
        .select("vec_a", "vec_b", "cosine")
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
        .limit(20)
    )


# --- Vectorized (Arrow/pandas-UDF) scale path ---------------------------


def cosine_pandas_udf():
    """Arrow-batched cosine scorer: whole batches cross the JVM→Python
    boundary as columnar Arrow, scored with one SIMD ``einsum`` — the
    scale path for wide vectors, measured ~1.5× the JVM ordered-fold at
    sf0.1 (the gap grows with dimension and corpus). Float accumulation
    order differs from the fold, so results agree to ~1e-6, not
    bit-exactly — which is why the ORACLE-checked operators use the fold
    and this one is checked for rank agreement in tests instead.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    # No inline type hints: this module uses `from __future__ import
    # annotations`, which stringifies them and breaks pyspark's
    # pandas-UDF signature inspection — the Series→Series scalar shape
    # is declared by the explicit returnType instead.
    def _cos(a, b):
        A = np.stack(a.values)
        B = np.stack(b.values)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return F.pandas_udf(_cos, DoubleType())


@register("q_ann_cosine_topk_vectorized", oracle=None)
def q_ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3, vectorized variant of
    ``q_ann_cosine_topk``: identical plan shape (broadcast queries ×
    corpus → per-query window top-k), scoring swapped to the Arrow
    pandas-UDF kernel. No SQL oracle (numpy accumulation order ≠ SQL
    fold); tests assert rank agreement with the exact operator."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("candidate_id"), F.col("embedding").alias("c_emb")
    )
    cos = cosine_pandas_udf()
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cos("q_emb", "c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "candidate_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "candidate_id", "cosine", "rank")
    )
