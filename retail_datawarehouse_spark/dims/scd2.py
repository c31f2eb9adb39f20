"""SCD Type 2: versioned dimension build + point-in-time join.

Reference README.md:145-147 recommends SCD2 on DimCustomer/DimProduct
("effective_date / end_date and surrogate keys"). The fixtures carry no
attribute history, so versions are derived from each customer's order
stream (attribute = o_orderpriority at that point in time) — the build
mechanics (W1) and the point-in-time range join (J8) are exactly what a
real attribute feed would use.

Build: one window per natural key — ``lead(effective_date)`` closes each
version; NULL end = current. One shuffle on the natural key.

Point-in-time join (J8): the join keeps the EQUI conjunct (natural key)
plus a residual range predicate — Catalyst plans sort-merge/shuffled-hash
on the key with the range as a post-join filter. Dropping the equi part
would degrade to a broadcast-nested-loop; never do that at fact scale
(SURVEY.md §7 risk 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table


def build_scd2(
    df: DataFrame, natural_key: str, effective_col: str, order_cols: list[str]
) -> DataFrame:
    """W1 — close each version with lead(effective) over the natural key."""
    w = Window.partitionBy(natural_key).orderBy(*order_cols)
    return (
        df.withColumn("effective_date", F.col(effective_col).cast("date"))
        .withColumn("end_date", F.lead("effective_date").over(w))
        .withColumn("is_current", F.col("end_date").isNull())
        .withColumn("version_seq", F.row_number().over(w).cast("long"))
    )


def _scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dim versions from the order stream (attr = priority)."""
    orders = load_table(spark, sf_dir, "orders")
    scd = build_scd2(
        orders, "o_custkey", "o_orderdate", ["o_orderdate", "o_orderkey"]
    )
    return scd.select(
        F.lit("customer").alias("entity"),
        F.col("o_custkey").alias("natural_key"),
        F.col("o_orderkey").alias("version_id"),
        F.col("o_orderpriority").alias("attr_value"),
        F.date_format("effective_date", "yyyy-MM-dd").alias("effective_date"),
        F.date_format("end_date", "yyyy-MM-dd").alias("end_date"),
        "is_current",
        "version_seq",
    )


def _scd2_product_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product dim versions from the lineitem stream (attr = return flag).

    Reference README.md:145-147 recommends SCD2 for Customer AND
    Product; the same generic ``build_scd2`` runs over parts here.
    First line of each order (l_linenumber = 1) gives one candidate
    version per (order, part) with a unique (shipdate, orderkey) order
    within each part — the same determinism contract as the customer
    build.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    scd = build_scd2(li, "l_partkey", "l_shipdate", ["l_shipdate", "l_orderkey"])
    return scd.select(
        F.lit("product").alias("entity"),
        F.col("l_partkey").alias("natural_key"),
        F.col("l_orderkey").alias("version_id"),
        F.col("l_returnflag").alias("attr_value"),
        F.date_format("effective_date", "yyyy-MM-dd").alias("effective_date"),
        F.date_format("end_date", "yyyy-MM-dd").alias("end_date"),
        "is_current",
        "version_seq",
    )


@register(
    "q_scd2_build",
    oracle="""
    SELECT 'customer' AS entity,
           o_custkey AS natural_key,
           o_orderkey AS version_id,
           o_orderpriority AS attr_value,
           strftime(o_orderdate, '%Y-%m-%d') AS effective_date,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS end_date,
           lead(o_orderdate) OVER w IS NULL AS is_current,
           row_number() OVER w AS version_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    UNION ALL
    SELECT 'product' AS entity,
           l_partkey AS natural_key,
           l_orderkey AS version_id,
           l_returnflag AS attr_value,
           strftime(l_shipdate, '%Y-%m-%d') AS effective_date,
           strftime(lead(l_shipdate) OVER w2, '%Y-%m-%d') AS end_date,
           lead(l_shipdate) OVER w2 IS NULL AS is_current,
           row_number() OVER w2 AS version_seq
    FROM lineitem
    WHERE l_linenumber = 1
    WINDOW w2 AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey)
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version build over BOTH dims the reference recommends it for
    (README.md:145-147, Customer and Product): effective/end dates via
    lead(), is_current flag, per-key version sequence — one generic
    builder, two entity streams, tagged and unioned."""
    return _scd2_customer_versions(spark, sf_dir).unionByName(
        _scd2_product_versions(spark, sf_dir)
    )


@register(
    "q_scd2_point_in_time",
    oracle="""
    WITH versions AS (
        SELECT o_custkey AS customer_key,
               o_orderkey AS version_id,
               CAST(o_orderdate AS DATE) AS effective_date,
               CAST(lead(o_orderdate) OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS DATE) AS end_date
        FROM orders
    ),
    fact AS (
        SELECT o.o_custkey AS customer_key,
               CAST(l.l_shipdate AS DATE) AS ship_date,
               l.l_extendedprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT v.customer_key, v.version_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS version_sales
    FROM fact f
    JOIN versions v
      ON f.customer_key = v.customer_key
     AND f.ship_date >= v.effective_date
     AND (v.end_date IS NULL OR f.ship_date < v.end_date)
    GROUP BY 1, 2
    """,
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — point-in-time join: each fact line lands in the dimension
    version whose [effective, end) range covers its date; aggregates per
    version. Equi conjunct on the natural key keeps the plan hash-based."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    versions = (
        build_scd2(orders, "o_custkey", "o_orderdate", ["o_orderdate", "o_orderkey"])
        .select(
            F.col("o_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("version_id"),
            "effective_date",
            "end_date",
        )
    )
    fact = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("f_customer_key"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price_dec"),
    )
    joined = fact.join(
        versions,
        (fact.f_customer_key == versions.customer_key)
        & (fact.ship_date >= versions.effective_date)
        & (versions.end_date.isNull() | (fact.ship_date < versions.end_date)),
    )
    return joined.groupBy("customer_key", "version_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("price_dec").cast("double").alias("version_sales"),
    )
