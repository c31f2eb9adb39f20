"""Advanced relational extensions: range join, batch sessionization,
ranking analytics, MERGE-style upsert.

These fill the remaining operator families SURVEY.md §2.3/§2.5 lists as
absent from the reference (interval joins, full-outer join, ranking
window functions beyond row_number, upsert/merge semantics) — each in
its 100 TB shape and each hash-checked against a DuckDB oracle.

Scale notes per operator:
- Range join: bin-overlay rewrite (operators/rangejoin.py) — equi join
  on a grid cell instead of BroadcastNestedLoopJoin, so it shuffles by
  bin and survives a large interval side.
- Sessionization: ONE shuffle on user_id; gaps and session ids are two
  window passes over the same sort order (Spark reuses the sort — no
  second exchange), then the per-session aggregate rides the same
  partitioning.
- Ranking suite: a single window sort per partition computes all four
  rank flavors; ordering includes the unique key so every rank is
  deterministic (ties would otherwise make percent_rank/cume_dist
  engine-dependent).
- MERGE upsert: full-outer join on the key, action derived from which
  side matched — the batch formulation of MERGE INTO for plain-Parquet
  warehouses (no transactional table format needed); at 100 TB both
  sides bucket by the key so the join is co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.money import dec_sum
from retail_datawarehouse_spark.operators.rangejoin import range_join_binned
from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

# Price bands for the range-join showcase: non-uniform (so the band id
# is NOT derivable by arithmetic — a genuine interval lookup), half-open
# [lo, hi), covering the whole o_totalprice range.
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("micro", 0.0, 25_000.0),
    ("small", 25_000.0, 75_000.0),
    ("mid", 75_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("jumbo", 300_000.0, 1_000_000.0),
]

_BANDS_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "q_range_join_price_bands",
    oracle=f"""
    WITH bands(band_name, lo, hi) AS (VALUES {_BANDS_VALUES})
    SELECT band_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_value
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_name
    """,
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: orders matched to non-uniform price bands
    via the bin-overlay equi-join rewrite, then aggregated per band.
    The oracle states the plain theta join; the Spark plan is a hash
    equi-join on the bin id with a residual range filter — no
    BroadcastNestedLoopJoin, so the same plan holds when the interval
    side is millions of rows (SLA windows, per-customer price lists),
    not five."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band_name string, lo double, hi double")
    joined = range_join_binned(
        orders, bands, point_col="o_totalprice", lo_col="lo", hi_col="hi",
        bin_width=25_000.0,
    )
    return joined.groupBy("band_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "total_value"),
    )


@register(
    "q_sessionize_batch",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS session_start_us,
           MAX(epoch_us(ts)) AS session_end_us
    FROM sess
    GROUP BY user_id, session_idx
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch twin of q_stream_session_30m's
    session_window): per user, a >30-min silence starts a new session;
    session id = running count of session starts. One shuffle on
    user_id; the lag pass, the running-sum pass, and the per-session
    aggregate all reuse the same (user_id, ts) sort order, so the plan
    is sort-once/window-twice/aggregate — linear in events per user,
    no self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    running = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_idx", F.sum("new_sess").over(running))
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
    )


def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking analytics: dense_rank / percent_rank / cume_dist /
    ntile over account balance within market segment — all four ride
    ONE window sort (same partition, same order), so the plan is a
    single exchange + sort regardless of how many rank flavors are
    requested. Ordering includes the unique c_custkey so every output
    value is deterministic across engines."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_merge_upsert_customers",
    oracle="""
    WITH target AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
    ),
    source AS (
        SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey + 10000000, c_name || '_new', 0.0
        FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
                ELSE t.c_name END AS c_name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN s.c_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
    """,
)
def q_merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain Parquet: apply a change batch
    (updates to every 3rd customer, inserts of synthetic new keys) onto
    the customer dim via FULL OUTER join on the key — matched rows
    update, source-only rows insert, target-only rows carry forward,
    with the action tagged for audit. This is the batch-upsert shape
    foreachBatch uses incrementally (streaming/pipelines.py); at scale
    both sides are bucketed by the key so the full-outer join runs
    co-located with zero shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    target = cust.select("c_custkey", "c_name", "c_acctbal")
    source = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
                F.concat(F.col("c_name"), F.lit("_new")).alias("c_name"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    # Explicit match markers: action/value derivation keys off a
    # non-null literal projected on each side BEFORE the join, never off
    # payload columns — a row with a legitimately NULL c_name/c_acctbal
    # would otherwise be misclassified (and COALESCE would resurrect the
    # target value on an update that legitimately sets NULL).
    t = target.withColumn("_t_matched", F.lit(True)).alias("t")
    s = source.withColumn("_s_matched", F.lit(True)).alias("s")
    merged = t.join(s, on="c_custkey", how="full_outer")
    from_source = F.col("s._s_matched").isNotNull()
    return merged.select(
        F.col("c_custkey"),
        F.when(from_source, F.col("s.c_name")).otherwise(F.col("t.c_name")).alias("c_name"),
        F.when(from_source, F.col("s.c_acctbal"))
        .otherwise(F.col("t.c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("t._t_matched").isNull(), F.lit("insert"))
        .when(F.col("s._s_matched").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


def q_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, the first 'view' and the first
    'purchase' at-or-after it — the two-step funnel primitive behind
    conversion-rate and time-to-convert analytics. Formulated as ONE
    shuffle, no self-join: a partition-only window pins each user's
    first view onto every event row, then the conditional min of
    qualifying purchase timestamps rides the SAME user_id partitioning
    (the aggregate after the window adds no exchange). The join
    formulation (first-view relation ⋈ purchase stream) can't broadcast
    its small side — it is outer-preserved, and an outer join must
    build on the other side — so it would shuffle the events twice;
    this shape shuffles them once. All event-time math in integer
    microseconds — engine-exact."""
    events = load_table(spark, sf_dir, "events")
    ev = events.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        ev.withColumn("first_view", fv)
        .filter(F.col("first_view").isNotNull())
        .groupBy("user_id", "first_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).alias("first_purchase")
        )
        .select(
            "user_id",
            F.unix_micros("first_view").alias("first_view_us"),
            F.unix_micros("first_purchase").alias("first_purchase_us"),
            F.col("first_purchase").isNotNull().alias("converted"),
            (F.unix_micros("first_purchase") - F.unix_micros("first_view")).alias(
                "lag_us"
            ),
        )
    )
