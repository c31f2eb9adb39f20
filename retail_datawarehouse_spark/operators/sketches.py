"""Sketch-based approximate aggregation — the serving path at 100 TB.

Exact COUNT(DISTINCT) is an expand + full shuffle of every distinct
value; exact percentiles sort each group. Sketches replace both with
mergeable fixed-size state: HyperLogLog++ for distinct counts,
a quantile sketch for percentiles — one pass, partial+final merge, no
value shuffle. Sketch encodings are engine-specific by construction, so
these are NOT DuckDB-oracle-checked; tests bound their error against
the exact operators instead (the honest check for an approximation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table


@register("q_sketch_distinct_parts_per_brand", oracle=None)
def q_sketch_distinct_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct part count per brand (rsd=0.02). The shuffle
    carries one ~kB sketch per (partition, brand) instead of every
    distinct part key — the difference between a metadata-sized and a
    data-sized exchange at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register("q_sketch_price_quantiles", oracle=None)
def q_sketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of order value per priority
    (``approx_percentile``, accuracy=10000): bounded-size mergeable
    state per group vs the exact operator's per-group sort. The exact
    twin (``q_percentile_order_value``) is the accuracy oracle in
    tests."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("quantiles")
    )
