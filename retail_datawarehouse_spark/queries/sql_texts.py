"""The second query lifecycle: ``spark.sql`` texts (SURVEY.md §3.2/O3).

Every reference query exists twice — as a DataFrame builder
(``queries.catalog``) and as SQL text here — exercising both entry
points of the engine: DataFrame API → unresolved plan, and ANTLR parser
→ unresolved plan. Both converge in the Catalyst analyzer and MUST
produce identical results (asserted in tests/test_sql_lifecycle.py);
the physical plans are the same modulo join-hint placement.

The texts run over temp views registered by
``sources.readers.register_views`` and use Spark SQL's PostgreSQL-ish
constructs where the reference did (``FILTER (WHERE …)`` and
``date_trunc`` appear in the reference README.md:186 — both supported
by Spark ≥3.0, SURVEY.md F7).
"""

from __future__ import annotations

_PERIOD_CASE = """
    CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'Morning'
         WHEN hour(ts) BETWEEN 12 AND 17 THEN 'Afternoon'
         WHEN hour(ts) BETWEEN 18 AND 22 THEN 'Evening'
         ELSE 'Night' END
"""

SPARK_SQL_TEXTS: dict[str, str] = {
    "q51_sales_by_hour": f"""
        SELECT CAST(hour(ts) AS BIGINT) AS hour_24,
               {_PERIOD_CASE} AS time_bucket_period,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_sales,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
        ORDER BY 1
    """,
    "q52_top10_products": """
        SELECT /*+ BROADCAST(p) */ p.p_brand, p.p_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * CAST(1.0 - l.l_discount AS DECIMAL(18,4)))
                    AS DOUBLE) AS revenue,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        ORDER BY revenue DESC, p_brand, p_name
        LIMIT 10
    """,
    "q53_sales_by_shipping_tier": """
        SELECT o.o_orderpriority AS service_level,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'Express'
                    WHEN o.o_orderpriority = '3-MEDIUM' THEN 'Standard'
                    ELSE 'Economy' END AS speed_tier,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_sales,
               COUNT(DISTINCT l.l_orderkey) AS n_orders
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
        ORDER BY total_sales DESC
    """,
    "q54_rising_spend_customers": """
        WITH monthly AS (
            SELECT o_custkey AS customer_key,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS month_spend
            FROM orders
            GROUP BY 1, 2
        ),
        w AS (
            SELECT customer_key, month_start, month_spend,
                   lag(month_start) OVER
                       (PARTITION BY customer_key ORDER BY month_start)
                       AS prev_month,
                   lag(month_spend) OVER
                       (PARTITION BY customer_key ORDER BY month_start)
                       AS prev_spend
            FROM monthly
        )
        SELECT customer_key,
               CAST(SUM(month_spend - prev_spend) AS DOUBLE) AS total_growth,
               COUNT(*) AS n_rising_months
        FROM w
        WHERE prev_month = add_months(month_start, -1)
          AND month_spend > prev_spend
        GROUP BY 1
        ORDER BY total_growth DESC, customer_key
        LIMIT 50
    """,
    "q55_snapshot_lifetime_read": """
        WITH monthly AS (
            SELECT o_custkey AS customer_key,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS month_spend
            FROM orders
            GROUP BY 1, 2
        ),
        months AS (SELECT DISTINCT month_start FROM monthly),
        spine AS (
            SELECT c.c_custkey AS customer_key, m.month_start
            FROM customer c CROSS JOIN months m
        ),
        snap AS (
            SELECT s.customer_key, s.month_start,
                   COALESCE(mo.month_spend, CAST(0 AS DECIMAL(18,4)))
                       AS month_total_spent,
                   SUM(COALESCE(mo.month_spend, CAST(0 AS DECIMAL(18,4))))
                       OVER (PARTITION BY s.customer_key ORDER BY s.month_start
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS lifetime
            FROM spine s
            LEFT JOIN monthly mo
              ON mo.customer_key = s.customer_key
             AND mo.month_start = s.month_start
        )
        SELECT customer_key,
               CAST(month_total_spent AS DOUBLE) AS month_total_spent,
               CAST(lifetime AS DOUBLE) AS customer_lifetime_spent
        FROM snap
        WHERE month_start = DATE '1998-06-01'
        ORDER BY customer_key
    """,
}
