"""Ingest-time drift monitoring: every arriving micro-batch is scored
against a stored reference profile BEFORE it joins the corpus.

Composition of the streaming landing machinery (checkpointed
``availableNow`` file-source drains, the same shape as
``streaming/cdc.py``) with the exact-integer drift statistics
(``operators/drift.py``). The production question this answers: a
training-data pipeline ingests source batches continuously; a batch
whose category mix shifted (new crawl seed, upstream re-labeling, a
broken extractor collapsing fields) must be FLAGGED at the door, not
discovered downstream as a model regression.

Shape at 100 TB:
- The reference profile is computed ONCE from the corpus
  (``key_profile`` — one key-cardinality aggregate) and stored; the
  steady-state monitor never reads the corpus again.
- Each micro-batch pays one batch-sized aggregate down to key
  cardinality plus a metadata-sized union-fold against the profile —
  monitoring cost is proportional to the BATCH, independent of corpus
  size.
- The verdict sidecar appends one row per (wave, batch): scaled TVD,
  totals, flag. ``foreachBatch`` is at-least-once, so a crash between
  the sidecar append and the checkpoint commit can duplicate a wave's
  verdict row on replay; verdicts are deterministic per wave, so
  ``read_verdicts`` dedupes on the wave key (documented, tested) —
  the same idempotency-by-key discipline as the CDC applied-wave set,
  without needing the generation commit (a duplicated verdict is
  harmless where a duplicated dim merge is not).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONITOR_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.LongType()),
        T.StructField("k", T.StringType()),
    ]
)

VERDICT_SCHEMA = (
    "wave long, tvd_scaled decimal(38,0), n_ref decimal(38,0), "
    "n_cur decimal(38,0), flag long"
)


def stream_landing(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source landing feed: declared schema, one parquet file per
    wave; maxFilesPerTrigger=1 so each wave gets its own verdict row
    (a fused backlog batch would average drifted and clean waves into
    one statistic and could mask the drifted one)."""
    return (
        spark.readStream.schema(MONITOR_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def run_drift_monitor_available_now(
    spark: SparkSession,
    landing_dir: str,
    ref_profile_dir: str,
    verdict_dir: str,
    checkpoint_dir: str | None = None,
    thresh_permille: int | None = None,
    timeout: float | None = None,
) -> None:
    """Drain every landed-and-unmonitored wave, scoring each against
    the stored reference profile and appending verdict rows.

    ``ref_profile_dir`` holds a (k, c) profile written by
    ``key_profile(...).write.parquet`` — the corpus-side aggregate,
    computed once. Timeout semantics mirror ``run_cdc_scd2_available_now``:
    None blocks until the availableNow drain self-terminates; expiry
    stops the query and raises (a silent return would let a caller
    read a partial verdict sidecar as if the drain had finished).
    """
    from retail_datawarehouse_spark.operators.drift import (
        DEFAULT_THRESH_PERMILLE,
        categorical_drift_from_profiles,
        key_profile,
    )

    permille = (
        DEFAULT_THRESH_PERMILLE if thresh_permille is None else thresh_permille
    )

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        ref = sess.read.parquet(ref_profile_dir)
        cur = key_profile(batch_df, F.col("k"))
        # one wave per batch (maxFilesPerTrigger=1); carry its tag from
        # the data itself, not epoch_id (epoch numbering restarts with
        # a fresh checkpoint — the wave tag is the stable identity).
        # The tag RAISES if the batch spans >1 wave (ADVICE r6: a
        # batch-wide verdict attributed to min(wave) would silently
        # average a drifted and a clean wave and drop one's verdict) —
        # contract failure is loud, in-plan, no extra driver action.
        wave = batch_df.agg(
            F.min("wave").cast("long").alias("_w"),
            F.countDistinct("wave").alias("_nw"),
        ).select(
            F.when(F.col("_nw") <= 1, F.col("_w"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "drift monitor batch spans %d waves — "
                        "one-file-per-wave contract broken",
                        F.col("_nw"),
                    )
                ).cast("long")
            )
            .alias("wave")
        )
        verdict = (
            categorical_drift_from_profiles(ref, cur, permille)
            .crossJoin(F.broadcast(wave))
            .select("wave", "tvd_scaled", "n_ref", "n_cur", "flag")
        )
        verdict.write.mode("append").parquet(verdict_dir)

    writer = (
        stream_landing(spark, landing_dir)
        .writeStream.outputMode("append")
        .foreachBatch(score_batch)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    if timeout is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"drift monitor did not terminate within {timeout}s — verdicts "
            f"at {verdict_dir} may be partial; not returning control"
        )


CLASSIFIER_MONITOR_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ]
)


def stream_embedding_landing(
    spark: SparkSession, landing_dir: str
) -> DataFrame:
    """Embedding-wave landing feed for the classifier monitor: same
    one-file-per-wave / maxFilesPerTrigger=1 contract as
    ``stream_landing`` (a fused backlog batch would average a shifted
    and a clean wave into one verdict)."""
    return (
        spark.readStream.schema(CLASSIFIER_MONITOR_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def run_classifier_monitor_available_now(
    spark: SparkSession,
    landing_dir: str,
    protos_dir: str,
    ref_profile_dir: str,
    verdict_dir: str,
    checkpoint_dir: str | None = None,
    thresh_permille: int | None = None,
    timeout: float | None = None,
) -> None:
    """CLASSIFIER monitoring (r10 continuation) — the standard ML-ops
    loop, composed from pieces this engine already pins: every arriving
    embedding wave is labeled by the STORED nearest-class-mean
    prototypes (``classify_by_prototypes`` — map-only over one
    broadcast L×dim row) and the wave's PREDICTED-class distribution is
    TVD-scored against the stored reference profile (the training-time
    prediction mix). A prediction-mix shift is the deployment signal
    that the upstream data moved (new domain mix, a broken extractor,
    covariate shift) — caught at the door without labels, which is
    precisely why production monitors watch the prediction
    distribution rather than accuracy.

    Shape at 100 TB: prototypes and the reference profile are tiny
    stored sidecars re-read once per WAVE through the micro-batch's own
    session (L×dim / L rows — metadata-sized; consistent semantics for
    both sidecars, ADVICE r10); each wave pays its own classify pass
    (map-only) plus one label-cardinality aggregate — cost proportional
    to the batch, corpus never re-read. Verdict
    sidecar semantics (at-least-once append, dedupe-on-wave at read,
    loud multi-wave-batch raise, timeout contract) are identical to
    ``run_drift_monitor_available_now``; ``read_verdicts`` reads this
    monitor's sidecar too.

    The flag threshold is the caller's contract: the clean-wave TVD
    floor is the classifier's own sampling noise across waves (for the
    fixture's 10 balanced classes at n=250 it reads ~100‰), so
    ``thresh_permille`` must sit above that floor and below the
    failure you monitor for (the test pins 300‰ with 3× margins both
    sides)."""
    from retail_datawarehouse_spark.operators.drift import (
        DEFAULT_THRESH_PERMILLE,
        categorical_drift_from_profiles,
        key_profile,
    )
    from retail_datawarehouse_spark.operators.similarity import (
        classify_by_prototypes,
    )

    permille = (
        DEFAULT_THRESH_PERMILLE if thresh_permille is None else thresh_permille
    )

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        # BOTH sidecars are read through the micro-batch's own session
        # (ADVICE r10): a frame created on the outer driver session and
        # joined against batch frames inside foreachBatch only works
        # where the two sessions share a SparkContext — and it silently
        # gives the two sidecars different mid-drain update semantics
        # (outer read = frozen plan, batch read = re-resolved per wave).
        # Tiny L×dim / L-row reads, so once-per-wave costs nothing.
        ref = sess.read.parquet(ref_profile_dir)
        protos = sess.read.parquet(protos_dir)
        preds = classify_by_prototypes(
            batch_df.select("wave", "id", "emb"), protos
        )
        cur = key_profile(preds, F.col("pred_label").cast("string"))
        wave = batch_df.agg(
            F.min("wave").cast("long").alias("_w"),
            F.countDistinct("wave").alias("_nw"),
        ).select(
            F.when(F.col("_nw") <= 1, F.col("_w"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "classifier monitor batch spans %d waves — "
                        "one-file-per-wave contract broken",
                        F.col("_nw"),
                    )
                ).cast("long")
            )
            .alias("wave")
        )
        verdict = (
            categorical_drift_from_profiles(ref, cur, permille)
            .crossJoin(F.broadcast(wave))
            .select("wave", "tvd_scaled", "n_ref", "n_cur", "flag")
        )
        verdict.write.mode("append").parquet(verdict_dir)

    writer = (
        stream_embedding_landing(spark, landing_dir)
        .writeStream.outputMode("append")
        .foreachBatch(score_batch)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    if timeout is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"classifier monitor did not terminate within {timeout}s — "
            f"verdicts at {verdict_dir} may be partial; not returning "
            "control"
        )


def read_verdicts(spark: SparkSession, verdict_dir: str) -> DataFrame:
    """Verdict sidecar, deduped per wave (at-least-once foreachBatch
    can append a wave's deterministic verdict twice across a crash;
    see module docstring)."""
    if not os.path.isdir(verdict_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(verdict_dir)
    ):
        return spark.createDataFrame([], VERDICT_SCHEMA)
    return spark.read.parquet(verdict_dir).dropDuplicates(["wave"])
