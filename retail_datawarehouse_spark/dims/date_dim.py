"""Generated dimensions: DimDate calendar spine + DimTimeOfDay clock spine.

Reference README.md:47-57 — DimDate (1 row per calendar day, smart key
DDMMYYYY) and DimTimeOfDay (1 row per second of day, smart key SSMMHH,
12-hr bucket label + period bucket). Both are *generated*, not extracted
(SURVEY.md §1.1): a calendar has no source table.

Spark-first generation: ``sequence()`` + ``explode`` for the date range
(driven by the fact's min/max date — one tiny aggregate), ``spark.range``
for the 86,400-second clock. Both spines are tiny forever (a century of
days < 40k rows), so at 100 TB they are broadcast dimensions; generation
cost is irrelevant, join side matters.

AM/PM labels are constructed with arithmetic + format_string, not
``date_format('h a')``, so the output is locale-independent and matches
the oracle byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.keys import (
    HOLIDAYS,
    date_key,
    is_holiday_flag,
    month_key,
    time_bucket_period,
)
from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table


# HOLIDAYS re-exported for compatibility; the single source of truth
# (list + flag expression) lives in functions.keys (round-2 verdict:
# the two surfaces had diverged). When the holiday source becomes a
# real external table, the shape is a broadcast left join against it —
# until then a static constant compiles to a pure expression.


def build_dim_date(spark: SparkSession, anchor_dates: DataFrame) -> DataFrame:
    """Calendar spine over [min(date), max(date)] of ``anchor_dates``
    (single column ``d``), with the P16 attribute block.

    ``day_of_week`` is ISO (1=Monday..7=Sunday) — chosen over Spark's
    Sunday-first ``dayofweek`` so the convention is unambiguous.
    """
    bounds = anchor_dates.agg(
        F.min("d").cast("date").alias("lo"), F.max("d").cast("date").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("date_value")
    )
    d = F.col("date_value")
    iso_dow = F.weekday(d) + 1  # weekday: 0=Monday
    return spine.select(
        F.date_format(d, "yyyy-MM-dd").alias("date_iso"),
        date_key(d).alias("date_key"),
        month_key(d).alias("month_key"),
        iso_dow.cast("long").alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.month(d).cast("long").alias("month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.quarter(d).cast("long").alias("quarter"),
        F.year(d).cast("long").alias("year"),
        F.weekofyear(d).cast("long").alias("week_of_year"),
        (iso_dow >= 6).alias("is_weekend"),
        is_holiday_flag(d).alias("is_holiday_flag"),
    )


@register(
    "q_dim_date",
    oracle="""
    WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) lo,
                      CAST(max(o_orderdate) AS DATE) hi FROM orders),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        FROM b
    )
    SELECT strftime(d, '%Y-%m-%d') AS date_iso,
           strftime(d, '%d%m%Y') AS date_key,
           strftime(d, '%m%Y') AS month_key,
           isodow(d) AS day_of_week,
           dayname(d) AS day_name,
           CAST(EXTRACT(month FROM d) AS BIGINT) AS month,
           monthname(d) AS month_name,
           CAST(EXTRACT(quarter FROM d) AS BIGINT) AS quarter,
           CAST(EXTRACT(year FROM d) AS BIGINT) AS year,
           week(d) AS week_of_year,
           isodow(d) >= 6 AS is_weekend,
           CASE WHEN (EXTRACT(month FROM d), EXTRACT(day FROM d))
                     IN ((1, 1), (7, 4), (12, 25))
                THEN TRUE ELSE NULL END AS is_holiday_flag
    FROM spine
    """,
)
def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DimDate generated over the orders date range (reference README.md:47-51)."""
    orders = load_table(spark, sf_dir, "orders")
    return build_dim_date(spark, orders.select(F.col("o_orderdate").alias("d")))


def build_dim_time_of_day(spark: SparkSession) -> DataFrame:
    """86,400-row clock spine (reference README.md:53-57)."""
    spine = spark.range(86400).withColumnRenamed("id", "second_of_day")
    s = F.col("second_of_day")
    hour = (s / 3600).cast("long")
    minute = ((s % 3600) / 60).cast("long")
    second = (s % 60).cast("long")
    hour12 = ((hour + 11) % 12) + 1
    ampm = F.when(hour < 12, "AM").otherwise("PM")
    return spine.select(
        s.alias("second_of_day"),
        F.format_string("%02d%02d%02d", second, minute, hour).alias("time_key"),
        hour.alias("hour_24"),
        minute.alias("minute"),
        second.alias("second"),
        F.concat(
            hour12.cast("string"), F.lit(":00 "), ampm,
            F.lit(" - "),
            hour12.cast("string"), F.lit(":59 "), ampm,
        ).alias("time_bucket_12hr"),
        time_bucket_period(hour).alias("time_bucket_period"),
    )


@register(
    "q_dim_time_of_day",
    oracle="""
    SELECT i AS second_of_day,
           printf('%02d%02d%02d', i % 60, (i % 3600) // 60, i // 3600) AS time_key,
           i // 3600 AS hour_24,
           (i % 3600) // 60 AS minute,
           i % 60 AS second,
           CAST(((i // 3600) + 11) % 12 + 1 AS VARCHAR)
             || ':00 ' || CASE WHEN i // 3600 < 12 THEN 'AM' ELSE 'PM' END
             || ' - '
             || CAST(((i // 3600) + 11) % 12 + 1 AS VARCHAR)
             || ':59 ' || CASE WHEN i // 3600 < 12 THEN 'AM' ELSE 'PM' END
               AS time_bucket_12hr,
           CASE WHEN i // 3600 BETWEEN 6 AND 11 THEN 'Morning'
                WHEN i // 3600 BETWEEN 12 AND 17 THEN 'Afternoon'
                WHEN i // 3600 BETWEEN 18 AND 22 THEN 'Evening'
                ELSE 'Night' END AS time_bucket_period
    FROM range(86400) t(i)
    """,
)
def q_dim_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DimTimeOfDay clock spine with SSMMHH key + 12-hr/period buckets
    (reference README.md:53-57; key fidelity F1)."""
    return build_dim_time_of_day(spark)
