"""Streaming CDC → SCD2: the nightly-warehouse shape, composed
(r4 verdict #4).

The two halves existed separately — the batch SCD2 merge
(``dims/scd2.py``) and checkpointed ``foreachBatch`` drains
(``streaming/pipelines.py``). This module composes them: a change feed
lands as parquet files (each file one nightly-shaped wave, tagged with
a monotone ``wave`` number), a checkpointed ``availableNow`` stream
drains it, and every micro-batch applies its changes onto the stored
versioned dim via ``scd2_apply_change_stream`` — the set-based
multi-wave merge, so a restart backlog of several waves in ONE
micro-batch still produces the exact version history a wave-at-a-time
drain would (proven: drain ≡ folding ``scd2_merge_batch`` over waves,
byte-identically, across checkpoint restarts).

Exactly-once story: source offsets + the commit log live in the
checkpoint; the merge itself is deterministic and the target rewrite is
staged through a tmp directory (the same Delta-less pattern as
``foreach_batch_upsert`` — with Delta/Iceberg on the classpath the
rewrite becomes a real transactional MERGE INTO and the tmp hop
disappears). ``foreachBatch`` is AT-LEAST-once for the side effect: a
crash after the dim rewrite but before the checkpoint commit replays
the micro-batch, and re-applying a batch with a revert chain (A→B→A)
onto the ALREADY-merged dim would duplicate version history (the
changes are no-ops only for simple updates). The guard is the wave
number itself — the feed's monotone high-water mark, persisted as a
1-row sidecar next to the dim and re-read per batch: already-applied
waves are filtered out BEFORE the merge, so a full or partial replay
(batch straddling the committed boundary) applies each wave exactly
once. The sidecar is written after the dim swap; the residual
window — crash BETWEEN those two writes — is the atomicity gap a real
table format (Delta/Iceberg transactional commit) closes, and is
documented rather than hidden.

At 100 TB the dim is a stored table bucketed by natural_key; the merge
kernel never shuffles it (see ``scd2_apply_change_stream``), so each
micro-batch costs one dim scan + batch-sized window work — the same
cost class as the nightly batch job it replaces, at micro-batch
latency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from retail_datawarehouse_spark.dims.scd2 import scd2_apply_change_stream

CDC_SCHEMA = (
    "wave LONG, natural_key LONG, version_id LONG, "
    "attr_value STRING, effective_date STRING"
)


def stream_changes(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source CDC feed: declared schema (no inference pass), one
    parquet file per landed wave."""
    return (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1000)  # availableNow batches waves
        .parquet(landing_dir)
    )


def run_cdc_scd2_available_now(
    spark: SparkSession,
    dim_dir: str,
    landing_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain every landed-and-uncommitted change wave into the stored
    SCD2 dim at ``dim_dir``. With ``checkpoint_dir``, a later call
    resumes from recorded offsets — the restart contract; without, it
    reprocesses everything (one-shot semantics)."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        import pyspark.sql.functions as F

        sess = batch_df.sparkSession
        hwm_dir = dim_dir + "__hwm"
        try:
            sess.catalog.refreshByPath(hwm_dir)
            hwm = sess.read.parquet(hwm_dir)
        except AnalysisException:
            hwm = None  # first batch ever: nothing applied yet
        # Replay guard: drop waves at or below the persisted high-water
        # mark. 1-row broadcast — no collect, no dim scan.
        fresh = (
            batch_df
            if hwm is None
            else batch_df.join(
                F.broadcast(hwm.select(F.col("applied_wave").alias("_hw"))),
                how="cross",
            )
            .filter(F.col("wave") > F.col("_hw"))
            .drop("_hw")
        )
        sess.catalog.refreshByPath(dim_dir)
        dim = sess.read.parquet(dim_dir)
        merged = scd2_apply_change_stream(dim, fresh)
        # Stage-then-swap: never rewrite the dim in place from a plan
        # that is still READING it (overwrite-while-reading corrupts).
        merged.write.mode("overwrite").parquet(dim_dir + "_tmp")
        sess.catalog.refreshByPath(dim_dir + "_tmp")
        sess.read.parquet(dim_dir + "_tmp").write.mode("overwrite").parquet(
            dim_dir
        )
        sess.catalog.refreshByPath(dim_dir)
        # Advance the mark (after the dim swap — see module docstring
        # for the residual window). max() over an empty fresh batch is
        # NULL → coalesce keeps the old mark.
        new_hwm = fresh.agg(
            F.coalesce(F.max("wave"), F.lit(-1)).cast("long").alias(
                "applied_wave"
            )
        )
        if hwm is not None:
            # greatest, never coalesce: an empty fresh batch yields the
            # -1 sentinel, which must not regress a real mark.
            new_hwm = new_hwm.crossJoin(
                F.broadcast(hwm.select(F.col("applied_wave").alias("_old")))
            ).select(
                F.greatest(F.col("applied_wave"), F.col("_old")).alias(
                    "applied_wave"
                )
            )
        new_hwm.write.mode("overwrite").parquet(hwm_dir + "_tmp")
        sess.catalog.refreshByPath(hwm_dir + "_tmp")
        sess.read.parquet(hwm_dir + "_tmp").write.mode("overwrite").parquet(
            hwm_dir
        )
        sess.catalog.refreshByPath(hwm_dir)

    writer = (
        stream_changes(spark, landing_dir)
        .writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination(120)
