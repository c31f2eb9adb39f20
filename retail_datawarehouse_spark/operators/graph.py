"""Iterative graph analytics over relational data.

Connected components (``operators/dedup.py``) resolves near-dup groups;
this module adds PageRank over the co-purchase graph — the importance
scoring used to pick canonical/representative items and to weight
corpus sources. Both are the same execution family: a fixed number of
join+aggregate rounds, each one shuffle on the vertex key.

Determinism is the design constraint: a float PageRank cannot be
hash-compared across engines (partial-sum order differs per
partitioning), so ranks are FIXED-POINT int64 (scale 2^20) and every
per-iteration step is integer arithmetic — `div` for contribution
splits, integer damping (85/100) — making all five iterations
bit-reproducible on any engine or cluster, and the whole computation
expressible as five chained SQL CTEs for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_Q = 1 << 20  # fixed-point scale: rank 1.0 == 2^20
PR_BASE_Q = 157286  # floor(0.15 * 2^20) — the teleport term
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_ITERS = 5


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed multi-edges (u, v) between parts appearing in the same
    order. The self-join fan-out is bounded per order by the square of
    lines-per-order (≤ 7 in TPC-H shapes, so ≤ 42 edges per order) —
    a per-key bound that holds at any corpus size, unlike a per-user
    or per-session co-occurrence join where a hot key explodes."""
    a = lineitem.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = lineitem.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    return a.join(b, "k").filter(F.col("u") != F.col("v")).select("u", "v")


def pagerank_fixed_point(
    nodes: DataFrame, edges: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """``iters`` PageRank rounds over directed multi-edges (u, v);
    returns (node, rq) with rq the fixed-point rank.

    Simplified (non-renormalized) PageRank: dangling mass is dropped,
    not redistributed — the variant whose per-iteration state is ONE
    integer per vertex, which is what keeps it exactly reproducible.
    Edges and per-source degrees are persisted once (two justified
    materialization boundaries: five iterations would otherwise replay
    the self-join per round AND per join side); the rank frame itself
    stays lazy — its lineage is the unrolled five-round plan."""
    ced = (
        edges.join(
            edges.groupBy("u").agg(F.count(F.lit(1)).alias("d")), "u"
        ).persist()
    )
    nodes = nodes.persist()
    ranks = nodes.select("node", F.lit(PR_Q).cast("long").alias("rq"))
    for _ in range(iters):
        contribs = (
            ced.join(ranks.select(F.col("node").alias("u"), "rq"), "u")
            .select("v", F.expr("rq div d").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs.select(F.col("v").alias("node"), "s"), "node", "left")
            .select(
                "node",
                (
                    F.lit(PR_BASE_Q)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" div {PR_DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("rq"),
            )
        )
    return ranks


def pagerank_sql_ctes() -> str:
    """The identical computation as chained DuckDB CTEs (prnodes /
    predges defined by the caller): r0 .. r{PR_ITERS}."""
    ctes = [f"r0 AS (SELECT node, CAST({PR_Q} AS BIGINT) AS rq FROM prnodes)"]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
        SELECT n.node,
               CAST({PR_BASE_Q}
                    + ({PR_DAMP_NUM} * COALESCE(s.c, 0)) // {PR_DAMP_DEN}
                    AS BIGINT) AS rq
        FROM prnodes n LEFT JOIN (
            SELECT e.v AS node, SUM(r{i - 1}.rq // e.d) AS c
            FROM predges e JOIN r{i - 1} ON r{i - 1}.node = e.u
            GROUP BY e.v
        ) s ON s.node = n.node
    )"""
        )
    return ",\n    ".join(ctes)
