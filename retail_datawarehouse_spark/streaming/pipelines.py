"""Structured Streaming over the ``events`` table.

The reference is batch-only and names latency as its shortcoming
("loaded in batches (hourly/daily)... not suitable for real-time",
reference README.md:274). This module supplies the streaming layer the
reference lacks (SURVEY.md §2.5 extension): watermarked event-time
windows (tumbling / sliding / session) and a ``foreachBatch`` upsert
that keeps the monthly-snapshot fact incrementally fresh.

Design notes for the real cluster:
- Source: ``readStream`` over the landing directory (or Kafka at deploy);
  schema DECLARED (streaming requires it anyway).
- Watermark 10 minutes: late events inside the watermark revise their
  window; later ones are dropped — state stays bounded, which is the
  whole point at 100 TB/day ingest.
- The same window expressions run IDENTICALLY in batch (Spark's
  batch/streaming unification) — the oracle-checked q_stream_* catalog
  entries below are the batch-mode images of these pipelines, which is
  exactly how their correctness is testable at all.

Window semantics reminders (encoded in the oracles):
- tumbling/sliding windows are epoch-aligned half-open [start, end);
- an event belongs to slide_count = window/slide sliding windows;
- a session window ends gap after its LAST event; an event exactly at
  ``prev + gap`` starts a NEW session (half-open again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.money import dec, dec_sum
from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import TABLE_SCHEMAS, load_table

WATERMARK = "10 minutes"


def make_landing_dir(sf_dir: str) -> str:
    """Stage ``events.parquet`` into a fresh landing DIRECTORY.

    Spark's FileStreamSource requires a directory (it watches for files
    arriving in it); the driver fixture is a single parquet file, so the
    local smoke path stages it the way a real ingest would land it. On a
    cluster this is the landing path files are dropped into (or Kafka).
    """
    import shutil
    import tempfile

    landing = tempfile.mkdtemp(prefix="events_landing_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{landing}/batch-0.parquet")
    return landing


def stream_events(spark: SparkSession, landing_dir: str) -> DataFrame:
    """readStream over the events landing dir (parquet microbatches).

    Same unit handling as the batch reader (sources.readers.load_table):
    the fixture's ts has shipped as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS), so probe the landed footer and read ns as a raw
    long truncated to µs (integral `div`, not `/`, which rounds via
    DOUBLE), µs natively.
    """
    from retail_datawarehouse_spark.sources.readers import (
        EVENTS_SCHEMA_TS,
        events_ts_unit,
    )

    if events_ts_unit(landing_dir) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(TABLE_SCHEMAS["events"]).parquet(landing_dir)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.readStream.schema(EVENTS_SCHEMA_TS).parquet(landing_dir)


def tumbling_aggregation(events: DataFrame) -> DataFrame:
    """Watermarked 1-hour tumbling counts/sums per event type."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(spark: SparkSession, sf_dir: str, name: str = "stream_out") -> DataFrame:
    """Drive the streaming pipeline over everything currently in the
    source (trigger=availableNow) into a memory sink — the local smoke
    path; on a cluster the same query runs continuously with a real sink."""
    events = stream_events(spark, make_landing_dir(sf_dir))
    q = (
        tumbling_aggregation(events)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def foreach_batch_upsert(
    spark: SparkSession,
    sf_dir: str,
    target_dir: str,
    landing_dir: str | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Exactly-once-style sink: per micro-batch, merge new hourly
    aggregates into the target (emulated MERGE: read target, anti-join
    overwritten keys, union, rewrite — the Delta-less upsert pattern;
    with Delta/Iceberg on the classpath this becomes a real MERGE INTO).

    ``landing_dir``/``checkpoint_dir`` make the drain INCREMENTAL: with
    a checkpoint, a later call with more files landed resumes from the
    recorded source offsets and recovered aggregation state — the
    restart-recovery contract a production stream runs on (proven by
    ``tests/test_streaming.py::
    test_checkpointed_incremental_drains_recover_exactly_once``)."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        batch = batch_df.cache()
        sess = batch.sparkSession
        # The target is rewritten in place each batch; drop any cached
        # file listing so reads see the current files, not prior ones.
        sess.catalog.refreshByPath(target_dir)
        try:
            existing = sess.read.parquet(target_dir)
            keep = existing.join(
                batch.select("window_start_epoch", "event_type"),
                ["window_start_epoch", "event_type"],
                "left_anti",
            )
            merged = keep.unionByName(batch)
        except AnalysisException:
            # First batch: target path does not exist yet. ONLY the
            # path-resolution error may fall through to "start fresh" —
            # a transient/corrupt read must re-raise, or the upsert
            # would silently discard all previously merged data and
            # rewrite the target with just this micro-batch.
            merged = batch
        merged.write.mode("overwrite").parquet(target_dir + "_tmp")
        sess.catalog.refreshByPath(target_dir + "_tmp")
        sess.read.parquet(target_dir + "_tmp").write.mode("overwrite").parquet(
            target_dir
        )
        sess.catalog.refreshByPath(target_dir)
        batch.unpersist()

    events = stream_events(spark, landing_dir or make_landing_dir(sf_dir))
    writer = (
        tumbling_aggregation(events)
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination(120)


# --- Batch-mode images of the streaming pipelines (oracle-checked) ---


_TUMBLING_SQL = """
    SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS window_start_epoch,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
"""


def q_stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation (batch image of the streaming
    pipeline; identical plan modulo the watermark/state operators)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_SQL = """
    WITH expanded AS (
        SELECT (epoch_us(ts) // 1000000 // 900) * 900 - k.k * 900
                   AS window_start_epoch,
               event_type, value
        FROM events
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    )
    SELECT window_start_epoch, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2
"""


def q_stream_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 15 min slide): every event lands in
    exactly 4 windows. The oracle materializes that expansion explicitly
    (floor-to-slide minus k·slide) — the definition Spark's window
    operator implements internally."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_SQL = """
    WITH ordered AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    numbered AS (
        SELECT *, CAST(SUM(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY 1, 2
"""


def q_stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — ``session_window`` in
    batch mode; the oracle derives the identical sessions with the
    gaps-and-islands idiom (lag + cumulative new-session flags), which is
    also the pre-``session_window`` Spark formulation. Session end =
    last event + gap, half-open."""
    events = load_table(spark, sf_dir, "events")
    sessions = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )
    # session_seq: rank sessions per user by start time (matches the
    # oracle's cumulative-flag numbering).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start_us")
    return sessions.withColumn(
        "session_seq", F.row_number().over(w).cast("long")
    ).select(
        "user_id",
        "session_seq",
        "session_start_us",
        "session_end_us",
        "n_events",
        "total_value",
    )


# --- Custom stateful operator: applyInPandasWithState ---

STATEFUL_OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_cents LONG, "
    "first_ts_us LONG, last_ts_us LONG"
)
STATEFUL_STATE_SCHEMA = (
    "n_events LONG, total_cents LONG, first_ts_us LONG, last_ts_us LONG"
)


def _user_totals_func(key, pdf_iter, state):
    """Per-user running totals — the custom stateful kernel.

    State survives across micro-batches in the state store; each batch
    folds its rows in and emits the updated running row (update mode).
    Money is tracked in integer cents so streaming and batch images are
    exactly equal (no float accumulation-order drift).
    """
    import pandas as pd

    if state.exists:
        n, cents, first_us, last_us = state.get
    else:
        n, cents, first_us, last_us = 0, 0, None, None
    for pdf in pdf_iter:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
        lo = int(pdf["ts_us"].min())
        hi = int(pdf["ts_us"].max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, cents, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_cents": [cents],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful streaming (SURVEY.md §2.5 extension): running
    per-user totals via ``applyInPandasWithState`` — the escape hatch for
    operators Spark's built-in windows can't express (custom state
    transition functions). Inputs are pre-shaped to plain longs
    (``unix_micros`` ts, integer cents) so the Python kernel is
    unit-and-timezone-free and exactly reproducible.

    At 100 TB/day: state is hash-partitioned by user_id across the
    cluster's state stores; each micro-batch shuffles only that batch's
    events; RocksDB state backend + changelog checkpointing keep state
    size off-heap.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    shaped = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return shaped.groupBy("user_id").applyInPandasWithState(
        _user_totals_func,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class _UserTotalsProcessor(StatefulProcessor):
    """``transformWithState`` twin of ``_user_totals_func`` — the
    operator-API successor to applyInPandasWithState (typed state
    handles, timers, TTL support; SPARK-49564). Same state transition,
    same integer-cents discipline, so both APIs must produce the same
    rows — pinned by test."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATEFUL_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        prior = self._totals.get() if self._totals.exists() else None
        n, cents, first_us, last_us = prior or (0, 0, None, None)
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            lo = int(pdf["ts_us"].min())
            hi = int(pdf["ts_us"].max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        self._totals.update((n, cents, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "first_ts_us": [first_us],
                "last_ts_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running-totals operator on the transformWithState API.

    Runtime requirements beyond applyInPandasWithState: the RocksDB
    state store provider, and ``google.protobuf`` (the state-server
    protocol) in the Python environment — absent there, the query
    fails at start with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
    (cleanly, never a silent wrong answer). The agreement test in
    tests/test_streaming.py auto-activates wherever protobuf exists."""
    proc = _UserTotalsProcessor()
    shaped = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return shaped.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_stateful_available_now(
    spark: SparkSession, sf_dir: str, name: str = "stateful_out"
) -> DataFrame:
    events = stream_events(spark, make_landing_dir(sf_dir))
    q = (
        stateful_user_totals(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


_STATEFUL_SQL = """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           epoch_us(MIN(ts)) AS first_ts_us,
           epoch_us(MAX(ts)) AS last_ts_us
    FROM events
    GROUP BY user_id
"""


def q_stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image of the stateful per-user running totals: after the
    stream drains, the state rows equal this one-pass aggregate —
    asserted in tests, oracle-checked here."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )


# --- Streaming deduplication ---


def stream_dedup_events(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state size tracks the late-data horizon
    (10 min of keys), not the stream's lifetime — the only viable
    form of at-least-once → effectively-once dedup at 100 TB/day.
    """
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_dedup_available_now(
    spark: SparkSession, sf_dir: str, name: str = "dedup_out"
) -> DataFrame:
    """Drain a landing dir that contains DUPLICATED input (the same file
    staged twice → every event arrives twice) through the streaming
    dedup; the result must equal the batch-distinct image."""
    import shutil

    landing = make_landing_dir(sf_dir)
    shutil.copy(f"{sf_dir}/events.parquet", f"{landing}/batch-1.parquet")
    deduped = stream_dedup_events(stream_events(spark, landing))
    q = (
        deduped.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


# --- Stream-stream join (watermarked, time-interval condition) ----------


def stream_stream_attribution_join(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Watermarked stream-stream INNER join: each purchase paired with
    every view by the same user in the hour BEFORE it (half-open:
    view.ts in (purchase.ts - 1h, purchase.ts]).

    Both sides carry a watermark and the join condition bounds the
    event-time distance — that pair of constraints is what lets Spark
    EVICT join state: a buffered view can be dropped once the purchase
    watermark passes view.ts + 1h, so state is (rate × horizon), not
    unbounded. Without the time bound, a stream-stream join must keep
    every row forever — the difference between a runnable and an
    OOM-by-design pipeline at 100 TB/day.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", WATERMARK)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", WATERMARK)
    return p.join(
        v,
        F.expr(
            "p_user = v_user AND "
            "v_ts > p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "view_event_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"),
    )


def run_stream_stream_join_available_now(
    spark: SparkSession, sf_dir: str, name: str = "ssj_out"
) -> DataFrame:
    """Drain the stream-stream join over the full landing dir; the
    result must equal the batch image (q_stream_join_attribution)."""
    landing = make_landing_dir(sf_dir)
    views = stream_events(spark, landing).filter(F.col("event_type") == "view")
    purchases = stream_events(spark, landing).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        stream_stream_attribution_join(views, purchases)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


_SSJOIN_SQL = """
    SELECT p.user_id,
           p.event_id AS purchase_event_id,
           v.event_id AS view_event_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(v.ts) AS view_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts > p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
"""


def q_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image of the stream-stream attribution join (identical
    expressions minus the watermarks): purchases × same-user views
    within the preceding hour. Relationally an equi-join on user_id
    with a time-range residual — one shuffle each side, never a range
    explosion because the hour bound caps matches per purchase."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "view_event_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"),
    )


def stream_stream_attribution_join_outer(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """LEFT OUTER variant of the watermarked stream-stream join: every
    purchase emits — matched with its in-window views, or NULL-extended
    once no match can still arrive. The outer side is what makes
    watermarks LOAD-BEARING for results (not just for state size): a
    NULL-extended row may only emit when the view-side watermark has
    passed the purchase's match window (v_ts ≤ p_ts), because until
    then a matching view could still be in flight. So the streamed
    output is the batch left-join image MINUS the unmatched purchases
    newer than (max event time − watermark delay) — still buffered,
    awaiting proof of no match. State eviction bounds are identical to
    the inner form."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", WATERMARK)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", WATERMARK)
    return p.join(
        v,
        F.expr(
            "p_user = v_user AND "
            "v_ts > p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"
        ),
        "leftOuter",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "view_event_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"),
    )


def run_stream_stream_outer_join_available_now(
    spark: SparkSession, sf_dir: str, name: str = "ssjo_out"
) -> DataFrame:
    """Drain the left-outer stream-stream join; must equal the batch
    image with the watermark cutoff (q_stream_join_attribution_outer)."""
    landing = make_landing_dir(sf_dir)
    views = stream_events(spark, landing).filter(F.col("event_type") == "view")
    purchases = stream_events(spark, landing).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        stream_stream_attribution_join_outer(views, purchases)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


_SSJOIN_OUTER_SQL = f"""
    SELECT p.user_id,
           p.event_id AS purchase_event_id,
           v.event_id AS view_event_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(v.ts) AS view_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts > p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
    WHERE v.event_id IS NOT NULL
       OR p.ts < (SELECT max(ts) FROM events) - INTERVAL {WATERMARK}
"""


def q_stream_join_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image of the drained left-outer stream-stream join:
    the plain left join, with NULL-extended rows filtered to purchases
    the final watermark (max event time − delay, a 1-row in-plan
    broadcast aggregate) has already proven matchless — exactly the
    rows append-mode streaming can have emitted.

    Boundary semantics: the cutoff is STRICT (p_ts < watermark) — a
    purchase landing exactly ON the final watermark is still buffered,
    not NULL-emitted. This mirrors Spark's internal eviction predicate
    and is pinned empirically by ``tests/test_streaming.py::
    test_outer_join_exact_boundary_purchase_pins_eviction_inequality``
    (an exact-boundary purchase in a synthetic fixture), so a Spark
    upgrade flipping the predicate fails a named test instead of
    silently diverging."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    bounds = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {WATERMARK}")).alias("__wm")
    )
    return (
        p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts")),
            "left",
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("view_event_id").isNotNull() | (F.col("p_ts") < F.col("__wm")))
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_event_id",
            "view_event_id",
            F.unix_micros("p_ts").alias("purchase_ts_us"),
            F.unix_micros("v_ts").alias("view_ts_us"),
        )
    )


# --- Stream-static enrichment join (broadcast dimension) ----------------


def enriched_segment_aggregation(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Watermarked stream enriched by a STATIC dimension before the
    windowed aggregate: events join customer on user_id, then 1-hour
    tumbling revenue per market segment.

    A stream-static join keeps NO join state — the static side is
    broadcast to every task and each microbatch probes it like any
    batch broadcast-hash join, so (unlike the stream-stream join above)
    no watermark is needed on the dimension and the enrichment adds
    zero shuffles to the streaming plan. This is the standard shape for
    dimension lookup at ingest; on a cluster the dim is reloaded per
    trigger, picking up slowly-changing updates for free.
    """
    enriched = events.withWatermark("ts", WATERMARK).join(
        F.broadcast(
            customers.select(
                F.col("c_custkey").alias("user_id"),
                F.col("c_mktsegment").alias("mktsegment"),
            )
        ),
        "user_id",
    )
    return (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), "mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "mktsegment",
            "n_events",
            "total_value",
        )
    )


def run_stream_enrich_available_now(
    spark: SparkSession, sf_dir: str, name: str = "enrich_out"
) -> DataFrame:
    """Drain the stream-static enrichment over the full landing dir;
    must equal the batch image (q_stream_enrich_segment_revenue)."""
    events = stream_events(spark, make_landing_dir(sf_dir))
    customers = load_table(spark, sf_dir, "customer")
    q = (
        enriched_segment_aggregation(events, customers)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


_ENRICH_SQL = """
    SELECT epoch_us(date_trunc('hour', e.ts)) // 1000000 AS window_start_epoch,
           c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
"""


def q_stream_enrich_segment_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch image of the stream-static enrichment: events broadcast-
    joined to the customer dimension, 1-hour tumbling value per market
    segment. Identical expressions to the streaming plan minus the
    watermark/state operators."""
    events = load_table(spark, sf_dir, "events")
    customers = load_table(spark, sf_dir, "customer")
    enriched = events.join(
        F.broadcast(
            customers.select(
                F.col("c_custkey").alias("user_id"),
                F.col("c_mktsegment").alias("mktsegment"),
            )
        ),
        "user_id",
    )
    return (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), "mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_epoch"),
            "mktsegment",
            "n_events",
            "total_value",
        )
    )


# --- Consolidated catalog entries (driver checks ≤50 sorted names) ------
#
# Round-1 verdict: the driver's CORRECTNESS file holds only the first 50
# sorted query names, so the six per-shape streaming images are folded
# into two part-tagged suites. Every shape keeps its full value surface
# — the union just re-keys the columns onto a shared (part, k1, k2, t1,
# t2, n, v) frame, so the driver hash still checks every cell of every
# pipeline. The individual builders stay importable (tests drive the
# actual streaming engine against them).

_NULL_L = "CAST(NULL AS BIGINT)"


@register(
    "q_stream_windows",
    oracle=f"""
    WITH tumbling AS ({_TUMBLING_SQL}),
    sliding AS ({_SLIDING_SQL}),
    sess AS ({_SESSION_SQL})
    SELECT 'tumbling' AS part, {_NULL_L} AS k1, event_type AS k2,
           window_start_epoch AS t1, {_NULL_L} AS t2, n_events AS n,
           total_value AS v
    FROM tumbling
    UNION ALL
    SELECT 'sliding', {_NULL_L}, event_type, window_start_epoch, {_NULL_L},
           n_events, total_value
    FROM sliding
    UNION ALL
    SELECT 'session', user_id, CAST(session_seq AS VARCHAR),
           session_start_us, session_end_us, n_events, total_value
    FROM sess
    """,
)
def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three windowed-aggregation shapes of the streaming layer —
    1-hour tumbling, 1-hour/15-min sliding, 30-min-gap session — as one
    part-tagged union of their batch images (batch/streaming unification
    makes the batch image THE testable semantics; the streaming runs are
    asserted equal in tests/test_streaming.py)."""
    null_l = F.lit(None).cast("long")
    tumbling = q_stream_tumbling_1h(spark, sf_dir).select(
        F.lit("tumbling").alias("part"),
        null_l.alias("k1"),
        F.col("event_type").alias("k2"),
        F.col("window_start_epoch").alias("t1"),
        null_l.alias("t2"),
        F.col("n_events").alias("n"),
        F.col("total_value").alias("v"),
    )
    sliding = q_stream_sliding_1h_15m(spark, sf_dir).select(
        F.lit("sliding").alias("part"),
        null_l.alias("k1"),
        F.col("event_type").alias("k2"),
        F.col("window_start_epoch").alias("t1"),
        null_l.alias("t2"),
        F.col("n_events").alias("n"),
        F.col("total_value").alias("v"),
    )
    sess = q_stream_session_30m(spark, sf_dir).select(
        F.lit("session").alias("part"),
        F.col("user_id").alias("k1"),
        F.col("session_seq").cast("string").alias("k2"),
        F.col("session_start_us").alias("t1"),
        F.col("session_end_us").alias("t2"),
        F.col("n_events").alias("n"),
        F.col("total_value").alias("v"),
    )
    return tumbling.unionByName(sliding).unionByName(sess)


@register(
    "q_stream_joins_stateful",
    oracle=f"""
    WITH attr AS ({_SSJOIN_SQL}),
    outerj AS ({_SSJOIN_OUTER_SQL}),
    enrich AS ({_ENRICH_SQL}),
    stateful AS ({_STATEFUL_SQL})
    SELECT 'attr' AS part, user_id AS k1, CAST(NULL AS VARCHAR) AS k2,
           purchase_ts_us AS t1, view_ts_us AS t2,
           purchase_event_id AS n, CAST(view_event_id AS DOUBLE) AS v
    FROM attr
    UNION ALL
    SELECT 'outer', user_id, CAST(NULL AS VARCHAR),
           purchase_ts_us, view_ts_us,
           purchase_event_id, CAST(view_event_id AS DOUBLE)
    FROM outerj
    UNION ALL
    SELECT 'enrich', {_NULL_L}, mktsegment, window_start_epoch, {_NULL_L},
           n_events, total_value
    FROM enrich
    UNION ALL
    SELECT 'stateful', user_id, CAST(NULL AS VARCHAR), first_ts_us,
           last_ts_us, n_events, CAST(total_cents AS DOUBLE)
    FROM stateful
    """,
)
def q_stream_joins_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful/join shapes of the streaming layer — the
    watermarked stream-stream attribution join (inner AND left-outer,
    the outer image carrying the watermark emission cutoff for
    NULL-extended rows), the stream-static broadcast enrichment, and
    the applyInPandasWithState running totals — as one part-tagged
    union of their batch images. total_cents and view_event_id ride
    the double column exactly (both < 2^53)."""
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")
    attr = q_stream_join_attribution(spark, sf_dir).select(
        F.lit("attr").alias("part"),
        F.col("user_id").alias("k1"),
        null_s.alias("k2"),
        F.col("purchase_ts_us").alias("t1"),
        F.col("view_ts_us").alias("t2"),
        F.col("purchase_event_id").alias("n"),
        F.col("view_event_id").cast("double").alias("v"),
    )
    outerj = q_stream_join_attribution_outer(spark, sf_dir).select(
        F.lit("outer").alias("part"),
        F.col("user_id").alias("k1"),
        null_s.alias("k2"),
        F.col("purchase_ts_us").alias("t1"),
        F.col("view_ts_us").alias("t2"),
        F.col("purchase_event_id").alias("n"),
        F.col("view_event_id").cast("double").alias("v"),
    )
    enrich = q_stream_enrich_segment_revenue(spark, sf_dir).select(
        F.lit("enrich").alias("part"),
        null_l.alias("k1"),
        F.col("mktsegment").alias("k2"),
        F.col("window_start_epoch").alias("t1"),
        null_l.alias("t2"),
        F.col("n_events").alias("n"),
        F.col("total_value").alias("v"),
    )
    stateful = q_stream_stateful_user_totals(spark, sf_dir).select(
        F.lit("stateful").alias("part"),
        F.col("user_id").alias("k1"),
        null_s.alias("k2"),
        F.col("first_ts_us").alias("t1"),
        F.col("last_ts_us").alias("t2"),
        F.col("n_events").alias("n"),
        F.col("total_cents").cast("double").alias("v"),
    )
    return (
        attr.unionByName(outerj).unionByName(enrich).unionByName(stateful)
    )
