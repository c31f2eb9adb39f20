"""Fact_Sales_Transaction build (reference README.md:95-105, load step
README.md:171-174).

J2 — the fact load is a multi-way surrogate-key lookup: each staging row
resolves date/customer/product/shipping keys against the dims. Every
dimension is broadcast (they are small by definition in a star schema),
so the 100 TB fact scan acquires all its keys with ZERO shuffles — the
plan is scan → N× BroadcastHashJoin → project → write.

LEFT joins per SURVEY.md J2: an unmatched fact row keeps NULL keys and
stays visible (feeding the audit/reject path S5) instead of silently
vanishing as inner joins would.

The degenerate dimension (README.md:99): transaction_id lives on the
fact itself — no dim table, used for order-count distincts (A5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.keys import date_key, month_key
from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table


def build_fact_sales(
    lineitem: DataFrame,
    orders: DataFrame,
    dim_product: DataFrame,
    dim_customer: DataFrame,
    dim_shipping: DataFrame,
) -> DataFrame:
    """Star-schema fact: measures + degenerate id + broadcast key lookups."""
    staging = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "left"
    )
    fact = (
        staging.join(
            F.broadcast(dim_product),
            staging.l_partkey == dim_product.product_id,
            "left",
        )
        .join(
            F.broadcast(dim_customer),
            staging.o_custkey == dim_customer.customer_id,
            "left",
        )
        .join(
            F.broadcast(dim_shipping),
            staging.o_orderpriority == dim_shipping.service_level,
            "left",
        )
    )
    ship = F.col("l_shipdate")
    return fact.select(
        F.col("l_orderkey").alias("transaction_id"),
        F.col("l_linenumber").alias("line_number"),
        date_key(ship).alias("date_key"),
        month_key(ship).alias("month_key"),
        F.col("customer_key"),
        F.col("product_key"),
        F.col("shipping_key"),
        F.col("l_quantity").cast("long").alias("quantity"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_extendedprice").alias("line_total_amount"),
        (F.col("l_returnflag") == "R").alias("is_returned"),
    )


@register(
    "q_fact_sales",
    oracle="""
    WITH dim_product AS (
        SELECT row_number() OVER (ORDER BY p_partkey) AS product_key,
               p_partkey AS product_id
        FROM part
    ),
    dim_customer AS (
        SELECT row_number() OVER (ORDER BY c_custkey) AS customer_key,
               c_custkey AS customer_id
        FROM customer
    ),
    dim_shipping AS (
        SELECT row_number() OVER (ORDER BY service_level) AS shipping_key,
               service_level
        FROM (SELECT DISTINCT o_orderpriority AS service_level FROM orders)
    )
    SELECT l.l_orderkey AS transaction_id,
           l.l_linenumber AS line_number,
           strftime(l.l_shipdate, '%d%m%Y') AS date_key,
           strftime(l.l_shipdate, '%m%Y') AS month_key,
           c.customer_key,
           p.product_key,
           s.shipping_key,
           CAST(l.l_quantity AS BIGINT) AS quantity,
           l.l_extendedprice / l.l_quantity AS unit_price,
           l.l_extendedprice AS line_total_amount,
           l.l_returnflag = 'R' AS is_returned
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN dim_product p ON l.l_partkey = p.product_id
    LEFT JOIN dim_customer c ON o.o_custkey = c.customer_id
    LEFT JOIN dim_shipping s ON o.o_orderpriority = s.service_level
    """,
)
def q_fact_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-grain fact load: J2 broadcast lookups + P13 is_returned
    + smart keys; at scale written partitioned by month_key (S4)."""
    from retail_datawarehouse_spark.dims.extracted import (
        q_dim_customer,
        q_dim_product,
        q_dim_shipping,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return build_fact_sales(
        lineitem,
        orders,
        q_dim_product(spark, sf_dir).select("product_key", "product_id"),
        q_dim_customer(spark, sf_dir).select("customer_key", "customer_id"),
        q_dim_shipping(spark, sf_dir).select("shipping_key", "service_level"),
    )
