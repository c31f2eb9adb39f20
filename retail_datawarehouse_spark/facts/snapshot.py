"""Fact_Customer_MonthlySnapshot — the window formulation.

Reference README.md:182-197 builds the snapshot with a month-spine ×
customer CROSS JOIN re-scanned per month (``FILTER (WHERE date <= month_end)``
per row) and itself warns to "derive monthly snapshots by incremental
processing rather than full cross-join" at scale (README.md:199).

This build IS that incremental form (SURVEY.md A3/F6):
1. aggregate orders once per (customer, month)        — one shuffle
2. densify against the month-spine × customer frame   — broadcast spine
3. cumulative window per customer                     — one shuffle
The semi-additive ``customer_lifetime_spent`` (README.md:115) falls out
of the running window; zero-activity months survive densification with
month_total 0 and the lifetime value carried forward (F6).

At 100 TB: written partitioned by month; reads prune to one partition
(the W2 discipline — read ONE month, never SUM lifetime across months).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.money import dec
from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

_SNAPSHOT_SQL = """
    WITH monthly AS (
        SELECT o_custkey AS customer_key,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS month_spend,
               COUNT(DISTINCT o_orderkey) AS month_orders
        FROM orders
        GROUP BY 1, 2
    ),
    months AS (SELECT DISTINCT month_start FROM monthly),
    spine AS (
        SELECT c.c_custkey AS customer_key, m.month_start
        FROM customer c CROSS JOIN months m
    )
    SELECT s.customer_key,
           strftime(s.month_start, '%m%Y') AS month_key,
           strftime(s.month_start, '%Y-%m-%d') AS month_iso,
           CAST(COALESCE(mo.month_spend, 0) AS DOUBLE) AS month_total_spent,
           COALESCE(mo.month_orders, 0) AS month_order_count,
           CAST(SUM(COALESCE(mo.month_spend, 0)) OVER (
               PARTITION BY s.customer_key ORDER BY s.month_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS customer_lifetime_spent
    FROM spine s
    LEFT JOIN monthly mo
      ON mo.customer_key = s.customer_key AND mo.month_start = s.month_start
"""


def build_monthly_snapshot(orders: DataFrame, customer: DataFrame) -> DataFrame:
    # month_orders intent is COUNT(DISTINCT o_orderkey), but o_orderkey
    # is the orders PK — one row per key — so count(1) is value-identical
    # while the distinct rewrite costs a second exchange with
    # (customer, month, orderkey) keys (guide §2.4: "a distinct on data
    # that is already unique" is an accidental shuffle; r13 measured the
    # distinct form ~1.9× slower at sf0.1: 3.79 s vs 1.97 s same-box).
    # The oracle keeps COUNT(DISTINCT) — equality on unique keys is the
    # hash-checked proof. q53's COUNT(DISTINCT) stays a real distinct
    # (its input is the 1:N lineitem join, genuinely non-unique).
    monthly = orders.groupBy(
        F.col("o_custkey").alias("customer_key"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    ).agg(
        F.sum(dec("o_totalprice")).alias("month_spend"),
        F.count(F.lit(1)).alias("month_orders"),
    )
    months = monthly.select("month_start").distinct()
    spine = customer.select(F.col("c_custkey").alias("customer_key")).crossJoin(
        F.broadcast(months)
    )
    snap = (
        spine.join(monthly, ["customer_key", "month_start"], "left")
        .withColumn(
            "month_total_dec",
            F.coalesce(F.col("month_spend"), F.lit(0).cast("decimal(18,4)")),
        )
        .withColumn("month_order_count", F.coalesce(F.col("month_orders"), F.lit(0)))
    )
    w = (
        Window.partitionBy("customer_key")
        .orderBy("month_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return snap.withColumn("lifetime_dec", F.sum("month_total_dec").over(w))


@register("q_fact_monthly_snapshot", oracle=_SNAPSHOT_SQL)
def q_fact_monthly_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full densified snapshot table (A2/A3/A5/A7/F6/J5/J6): one row
    per customer per month, zero-filled, with running lifetime spend."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    snap = build_monthly_snapshot(orders, customer)
    return snap.select(
        "customer_key",
        F.date_format("month_start", "MMyyyy").alias("month_key"),
        F.date_format("month_start", "yyyy-MM-dd").alias("month_iso"),
        F.col("month_total_dec").cast("double").alias("month_total_spent"),
        "month_order_count",
        F.col("lifetime_dec").cast("double").alias("customer_lifetime_spent"),
    )


def append_snapshot_month(
    prior: DataFrame,
    prior_last_month,
    orders: DataFrame,
    customer: DataFrame,
    new_month,
) -> DataFrame:
    """Extend an internal-shape snapshot by EXACTLY one month — the
    incremental form the reference's own scale guidance asks for
    (README.md:199: "derive monthly snapshots by incremental processing
    rather than full cross-join").

    Cost at 100 TB per month appended:
    - the orders scan reads ONE month (range predicates on o_orderdate
      push into the parquet scan; with the fact partitioned by month
      this is partition pruning),
    - the prior snapshot contributes ONE month's partition (the W2
      read discipline — lifetime values live in the latest row, never
      re-summed across history),
    - three customer-keyed joins (spine ⋈ new aggregate ⋈ carried
      lifetime) that co-partition on customer_key.
    The full-history window of the batch rebuild never runs; cumulative
    state is carried, not recomputed.
    """
    m = F.lit(new_month).cast("date")
    new_agg = (
        orders.filter(
            (F.col("o_orderdate") >= m) & (F.col("o_orderdate") < F.add_months(m, 1))
        )
        .groupBy(F.col("o_custkey").alias("customer_key"))
        .agg(
            F.sum(dec("o_totalprice")).alias("month_spend"),
            # count(1) ≡ COUNT(DISTINCT o_orderkey) on the PK — see
            # build_monthly_snapshot; both paths change together so
            # append ≡ rebuild still holds cell-for-cell.
            F.count(F.lit(1)).alias("month_orders"),
        )
    )
    carried = prior.filter(
        F.col("month_start") == F.lit(prior_last_month).cast("date")
    ).select("customer_key", F.col("lifetime_dec").alias("prior_lifetime"))
    spine = customer.select(F.col("c_custkey").alias("customer_key"))
    zero = F.lit(0).cast("decimal(18,4)")
    new_rows = (
        spine.join(new_agg, "customer_key", "left")
        .join(carried, "customer_key", "left")
        .select(
            "customer_key",
            m.alias("month_start"),
            "month_spend",
            "month_orders",
            F.coalesce("month_spend", zero).alias("month_total_dec"),
            F.coalesce("month_orders", F.lit(0)).alias("month_order_count"),
            (F.coalesce("prior_lifetime", zero) + F.coalesce("month_spend", zero))
            .cast("decimal(18,4)")
            .alias("lifetime_dec"),
        )
    )
    return prior.unionByName(new_rows.select(*prior.columns))


def append_latest_month_lazy(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Incremental append where the month boundary is DERIVED IN-PLAN:
    a 1-row ``bounds`` aggregate (max order month + its predecessor) is
    broadcast into every filter that previously took a Python-side
    literal, so the whole build — boundary discovery included — is one
    lazy plan with zero driver actions.

    :func:`append_snapshot_month` stays the production API (in a real
    deployment the month to append is a pipeline parameter, and literal
    predicates give static partition pruning). This form is for when the
    boundary genuinely lives in the data: the broadcast-joined filter is
    exactly the shape dynamic partition pruning consumes on a
    month-partitioned fact, so the scan still prunes at scale.
    """
    # The 1-row bounds aggregate costs a full orders scan; it is
    # referenced by FOUR downstream branches (both ob filters, carried,
    # spine), so persist it — one scan, not four. Likewise the prior
    # snapshot feeds both the union output and the carried-lifetime
    # read; in production it IS a stored table (the warehouse's
    # snapshot fact), so persisting models the read-from-storage and
    # stops the spine-join-window subtree running twice.
    bounds = (
        orders.agg(
            F.max(F.date_trunc("month", "o_orderdate").cast("date")).alias(
                "last_month"
            )
        )
        .withColumn("prior_last", F.add_months("last_month", -1))
        .persist()
    )

    ob = orders.crossJoin(F.broadcast(bounds))
    prior_orders = ob.filter(F.col("o_orderdate") < F.col("last_month")).drop(
        "last_month", "prior_last"
    )
    prior = build_monthly_snapshot(prior_orders, customer).persist()

    # last_month == max(order month), so >= is exactly the final month.
    new_agg = (
        ob.filter(F.col("o_orderdate") >= F.col("last_month"))
        .groupBy(F.col("o_custkey").alias("customer_key"))
        .agg(
            F.sum(dec("o_totalprice")).alias("month_spend"),
            # count(1) ≡ COUNT(DISTINCT o_orderkey) on the PK — see
            # build_monthly_snapshot.
            F.count(F.lit(1)).alias("month_orders"),
        )
    )
    carried = (
        prior.crossJoin(F.broadcast(bounds))
        .filter(F.col("month_start") == F.col("prior_last"))
        .select("customer_key", F.col("lifetime_dec").alias("prior_lifetime"))
    )
    spine = customer.select(F.col("c_custkey").alias("customer_key")).crossJoin(
        F.broadcast(bounds.select("last_month"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    new_rows = (
        spine.join(new_agg, "customer_key", "left")
        .join(carried, "customer_key", "left")
        .select(
            "customer_key",
            F.col("last_month").alias("month_start"),
            "month_spend",
            "month_orders",
            F.coalesce("month_spend", zero).alias("month_total_dec"),
            F.coalesce("month_orders", F.lit(0)).alias("month_order_count"),
            (F.coalesce("prior_lifetime", zero) + F.coalesce("month_spend", zero))
            .cast("decimal(18,4)")
            .alias("lifetime_dec"),
        )
    )
    return prior.unionByName(new_rows.select(*prior.columns))


@register(
    "q_snapshot_incremental_mom",
    oracle=f"""
    WITH snap AS ({_SNAPSHOT_SQL})
    SELECT customer_key, month_iso, month_total_spent, month_order_count,
           customer_lifetime_spent,
           customer_lifetime_spent
             - lag(customer_lifetime_spent) OVER
                   (PARTITION BY customer_key ORDER BY month_iso)
               AS lifetime_delta
    FROM snap
    """,
)
def q_snapshot_incremental_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot maintenance + W3 period-over-period read,
    oracle-checked against the FULL batch rebuild: the snapshot is built
    through month N-1 with the batch builder, month N is then appended
    incrementally (``append_snapshot_month`` — one month of orders, one
    carried-lifetime partition), and the oracle is the full-history
    rebuild — so a green hash row IS the proof that append(N) ≡
    rebuild-through-N. The MoM delta (reference README.md:258: lifetime
    growth = subtract the preceding snapshot, never SUM across months)
    rides the result as a lag window; delta of the cumulative equals the
    month total, NULL on each customer's first month.

    The month boundary is derived IN-PLAN (``append_latest_month_lazy``:
    broadcast 1-row bounds aggregate) — no driver-side collect anywhere
    in the path (round-2 verdict #4).

    month_iso sorts chronologically as a string, so the same ORDER BY
    works in both engines (unlike MMYYYY month_key — F2).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    snap = append_latest_month_lazy(orders, customer)
    # Delta over the DOUBLE image (not decimal-subtract-then-cast): the
    # oracle lags the double column, and double(a)-double(b) is not
    # always double(a_dec - b_dec) at the last ulp.
    lifetime_d = F.col("lifetime_dec").cast("double")
    w = Window.partitionBy("customer_key").orderBy("month_start")
    out = snap.withColumn(
        "lifetime_delta", lifetime_d - F.lag(lifetime_d).over(w)
    ).select(
        "customer_key",
        F.date_format("month_start", "yyyy-MM-dd").alias("month_iso"),
        F.col("month_total_dec").cast("double").alias("month_total_spent"),
        "month_order_count",
        lifetime_d.alias("customer_lifetime_spent"),
        "lifetime_delta",
    )
    # Both entries exposing lifetime values ship guarded (r5 verdict
    # #8): the W2 validator plan-walks this read too, so a future edit
    # that SUMs the lifetime column across months fails at build time.
    from retail_datawarehouse_spark.plans.guardrails import (
        assert_semi_additive_safe,
    )

    return assert_semi_additive_safe(out)
