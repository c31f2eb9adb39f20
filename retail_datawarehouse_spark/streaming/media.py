"""Streaming multimodal ingest: arriving MIXED-media binary waves are
decoded and featurized at the door, appending normalized feature rows.

Composition of the streaming landing machinery (checkpointed
``availableNow`` file-source drains — the ``cdc.py``/``monitor.py``
shape) with the magic-dispatch media featurizer
(``operators/media.py``). The production question: a multimodal corpus
lands continuously as binary batches; features (dims, hashes, durations,
sampled-frame stats) must exist BEFORE downstream dedup/quality stages
run, and recomputing them over the whole corpus per arrival is the
quadratic a landing-zone pipeline cannot afford.

Shape at 100 TB:
- Featurize cost is proportional to the BATCH (map-only Arrow decode
  pass, the dispatch inside it — see ``operators/media.py`` on why
  modality routing must not cost a payload shuffle); the stored corpus
  is never re-read, never re-decoded.
- The feature sidecar appends one row per (wave, doc, sub-item).
  ``foreachBatch`` is at-least-once: a crash between the append and the
  checkpoint commit replays the wave, duplicating its DETERMINISTIC
  rows — ``read_media_features`` dedupes on (wave, doc_id, idx), the
  monitor-verdict idempotency-by-key discipline (a duplicated feature
  row is harmless where a duplicated dim merge is not, so no
  generation commit is needed here).
- ``maxFilesPerTrigger=1``: one wave per micro-batch, so a restarted
  drain replays at most one wave's worth of decode work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_datawarehouse_spark.operators.media import (
    MEDIA_FEATURE_SCHEMA,
    featurize_media,
)

LANDING_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_FEATURES_DDL = (
    "wave long, doc_id long, media string, idx long, f1 long, f2 long, "
    "fhash string, fd double"
)


def stream_media_landing(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source landing feed of binary payload waves: declared
    schema, one parquet file per wave, one wave per micro-batch."""
    return (
        spark.readStream.schema(LANDING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def run_media_ingest_available_now(
    spark: SparkSession,
    landing_dir: str,
    features_dir: str,
    checkpoint_dir: str | None = None,
    timeout: float | None = None,
) -> None:
    """Drain every landed-and-unfeaturized wave through the
    magic-dispatch featurizer, appending normalized feature rows.
    Timeout semantics mirror the CDC/monitor drains: ``None`` blocks
    until the availableNow drain self-terminates; expiry stops the
    query and raises (a silent return would let a caller read a
    partial feature sidecar as if the drain had finished)."""

    def featurize_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # one wave per batch; carry its tag from the data (epoch_id
        # restarts with a fresh checkpoint — the wave tag is stable).
        # The tag expression RAISES if the batch ever spans >1 wave
        # (ADVICE r6: a silent min() would mis-attribute the extra
        # wave's features and let the (wave, doc, idx) dedupe collapse
        # rows from distinct waves) — the one-file-per-wave contract
        # fails loudly, in-plan, with no extra driver action.
        wave = batch_df.agg(
            F.min("wave").cast("long").alias("_w"),
            F.countDistinct("wave").alias("_nw"),
        ).select(
            F.when(F.col("_nw") <= 1, F.col("_w"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "media ingest batch spans %d waves — "
                        "one-file-per-wave contract broken",
                        F.col("_nw"),
                    )
                ).cast("long")
            )
            .alias("wave")
        )
        out = featurize_media(batch_df).crossJoin(F.broadcast(wave)).select(
            "wave", *[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
        )
        out.write.mode("append").parquet(features_dir)

    writer = (
        stream_media_landing(spark, landing_dir)
        .writeStream.outputMode("append")
        .foreachBatch(featurize_batch)
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
            f"media ingest drain did not terminate within {timeout}s — "
            f"features at {features_dir} may be partial; not returning "
            "control"
        )


def read_media_features(spark: SparkSession, features_dir: str) -> DataFrame:
    """Feature sidecar, deduped per (wave, doc, sub-item) — at-least-once
    replay duplicates a wave's deterministic rows (module docstring)."""
    if not os.path.isdir(features_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(features_dir)
    ):
        return spark.createDataFrame([], _FEATURES_DDL)
    return spark.read.parquet(features_dir).dropDuplicates(
        ["wave", "doc_id", "idx"]
    )
