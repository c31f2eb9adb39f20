"""Structured Streaming pipeline tests: the streaming result must equal
the batch image of the same computation (Spark's unification promise —
and ours, since the batch image is what the oracle certifies)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.builders import builder  # noqa: E402
from retail_datawarehouse_spark.registry import catalog
from retail_datawarehouse_spark.streaming.pipelines import (
    foreach_batch_upsert,
    run_available_now,
)


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_matches_batch_image(spark, sf_dir):
    stream_out = run_available_now(spark, sf_dir, name="t_stream_smoke")
    batch_out = builder("q_stream_tumbling_1h")(spark, sf_dir)
    assert _as_set(stream_out) == _as_set(batch_out)
    assert stream_out.count() > 0


def test_foreach_batch_upsert_builds_target(spark, sf_dir):
    target = tempfile.mkdtemp(prefix="snap_upsert_") + "/hourly"
    try:
        foreach_batch_upsert(spark, sf_dir, target)
        merged = spark.read.parquet(target)
        batch_out = builder("q_stream_tumbling_1h")(spark, sf_dir)
        merged_set = _as_set(merged)  # materialize BEFORE the rewrite below
        assert merged_set == _as_set(batch_out)
        # idempotency: re-running the upsert must not duplicate keys
        foreach_batch_upsert(spark, sf_dir, target)
        again = spark.read.parquet(target)
        assert again.count() == len(merged_set)
        assert (
            again.groupBy("window_start_epoch", "event_type")
            .count()
            .filter(F.col("count") > 1)
            .count()
            == 0
        )
    finally:
        shutil.rmtree(target.rsplit("/", 1)[0], ignore_errors=True)


def test_sliding_window_multiplicity(spark, sf_dir):
    """1h/15m slide: total (event, window) memberships = 4 × events."""
    events_n = (
        builder("q_stream_tumbling_1h")(spark, sf_dir)
        .agg(F.sum("n_events"))
        .first()[0]
    )
    sliding_n = (
        builder("q_stream_sliding_1h_15m")(spark, sf_dir)
        .agg(F.sum("n_events"))
        .first()[0]
    )
    assert sliding_n == 4 * events_n


def test_session_windows_disjoint_per_user(spark, sf_dir):
    """Sessions of one user must not overlap: next start >= prev end
    would violate the 30-min-gap closure; starts must be ≥ prev end."""
    from pyspark.sql import Window

    s = builder("q_stream_session_30m")(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("session_start_us")
    bad = (
        s.withColumn("prev_end", F.lag("session_end_us").over(w))
        .filter(F.col("prev_end").isNotNull())
        .filter(F.col("session_start_us") < F.col("prev_end"))
    )
    assert bad.count() == 0


def test_stateful_user_totals_matches_batch_image(spark, sf_dir):
    """applyInPandasWithState drained over the full source must equal
    the one-pass batch aggregate (exact: integer cents, integer µs)."""
    from retail_datawarehouse_spark.streaming.pipelines import (
        run_stateful_available_now,
    )

    stream_out = run_stateful_available_now(spark, sf_dir, name="t_stateful_smoke")
    batch_out = builder("q_stream_stateful_user_totals")(spark, sf_dir)
    assert _as_set(stream_out) == _as_set(batch_out)
    assert stream_out.count() > 0


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """Doubled input drained through dropDuplicatesWithinWatermark must
    equal the batch-distinct image — one row per event_id."""
    from retail_datawarehouse_spark.sources.readers import load_table
    from retail_datawarehouse_spark.streaming.pipelines import (
        run_stream_dedup_available_now,
    )

    out = run_stream_dedup_available_now(spark, sf_dir, name="t_dedup_smoke")
    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    assert out.count() == batch.count()
    assert _as_set(out) == _as_set(batch)


def test_stream_stream_join_matches_batch_image(spark, sf_dir):
    """The watermarked stream-stream join, drained with availableNow,
    must produce exactly the batch image's pairs (same join condition,
    no pairs lost to state eviction within a single drain)."""
    from retail_datawarehouse_spark.registry import catalog
    from retail_datawarehouse_spark.streaming.pipelines import (
        run_stream_stream_join_available_now,
    )

    streamed = run_stream_stream_join_available_now(spark, sf_dir, "ssj_test")
    batch = builder("q_stream_join_attribution")(spark, sf_dir)
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_stream_static_enrichment_matches_batch_image(spark, sf_dir):
    """The stream-static broadcast enrichment, drained with
    availableNow, must equal the batch image exactly (same join + same
    windowed aggregate; static side holds no state, loses no rows)."""
    from retail_datawarehouse_spark.registry import catalog
    from retail_datawarehouse_spark.streaming.pipelines import (
        run_stream_enrich_available_now,
    )

    streamed = run_stream_enrich_available_now(spark, sf_dir, "enrich_test")
    batch = builder("q_stream_enrich_segment_revenue")(spark, sf_dir)
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_stream_stream_outer_join_matches_batch_image_with_wm_cutoff(
    spark, sf_dir
):
    """The LEFT OUTER stream-stream join drained with availableNow:
    matched pairs equal the batch image's, and NULL-extended rows are
    exactly the unmatched purchases the final watermark has proven
    matchless (p_ts < max event time − delay) — purchases newer than
    the cutoff stay buffered and must NOT emit. This pins the append-
    mode emission semantics, not just the join condition."""
    from retail_datawarehouse_spark.streaming.pipelines import (
        run_stream_stream_outer_join_available_now,
    )

    streamed = run_stream_stream_outer_join_available_now(
        spark, sf_dir, "ssjo_test"
    )
    image = builder("q_stream_join_attribution_outer")(spark, sf_dir)
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, image.collect()))
    assert a == b and len(a) > 0
    n_null = sum(1 for r in a if r[2] is None)
    assert n_null > 0, "no NULL-extended rows — outer semantics unexercised"


def test_checkpointed_incremental_drains_recover_exactly_once(spark, sf_dir):
    """The restart-recovery contract: drain half the event history with
    a checkpoint, then land the rest and drain AGAIN with the same
    checkpoint — the second run must resume from recorded source
    offsets and recovered aggregation state, and the upserted target
    must equal the full-data batch image exactly (no window lost, no
    window double-counted, the straddling boundary window completed
    from recovered state). The halves split chronologically, as a real
    ingest would land them."""
    import os
    import tempfile

    from retail_datawarehouse_spark.sources.readers import load_table
    from retail_datawarehouse_spark.streaming.pipelines import (
        foreach_batch_upsert,
    )

    root = tempfile.mkdtemp(prefix="ckpt_drains_")
    landing = f"{root}/landing"
    ckpt = f"{root}/ckpt"
    target = f"{root}/hourly"
    os.makedirs(landing)
    try:
        events = load_table(spark, sf_dir, "events")
        lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
        mid = lo + (hi - lo) / 2
        # land µs timestamps like the fixture (Spark's default INT96
        # writer format is not what the declared-schema reader expects)
        saved_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try:
            for i, half in enumerate(
                (events.filter(F.col("ts") < mid), events.filter(F.col("ts") >= mid))
            ):
                half.coalesce(1).write.parquet(f"{root}/half{i}")
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", saved_tt)

        def land(i):
            import glob
            import shutil

            src = glob.glob(f"{root}/half{i}/part-*.parquet")[0]
            shutil.copy(src, f"{landing}/batch-{i}.parquet")

        land(0)
        foreach_batch_upsert(
            spark, sf_dir, target, landing_dir=landing, checkpoint_dir=ckpt
        )
        partial = _as_set(spark.read.parquet(target))

        land(1)
        foreach_batch_upsert(
            spark, sf_dir, target, landing_dir=landing, checkpoint_dir=ckpt
        )
        spark.catalog.refreshByPath(target)
        final = _as_set(spark.read.parquet(target))

        full_image = _as_set(builder("q_stream_tumbling_1h")(spark, sf_dir))
        assert final == full_image
        assert partial != full_image, "second drain did no work"
        # exactly-once at the key level: no (window, type) appears twice
        t = spark.read.parquet(target)
        assert (
            t.groupBy("window_start_epoch", "event_type")
            .count()
            .filter(F.col("count") > 1)
            .count()
            == 0
        )
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
