"""Streaming ANN serving: query vectors arrive as landing waves and
are answered against the STORED IVF(×PQ) index — the retrieval side of
a continuously-fed corpus.

Composition of the streaming landing machinery (checkpointed
``availableNow`` file-source drains — the ``cdc.py``/``monitor.py``/
``media.py`` shape) with the stored-index serving path
(``operators/ann_index.query_ivf_index``). The production question: a
retrieval/dedup-candidate tier receives query embeddings continuously
(new documents probing for near-dups before admission, user queries,
eval probes); each batch must be answered from the index AS STORED —
never by rebuilding, never by scanning the corpus — and results must
land idempotently.

Shape at 100 TB:
- Per-batch cost is the stored-index query cost: route the BATCH's
  queries to nprobe cells (one broadcast centroid pass over the
  batch), scan only the probed cell directories (dynamic partition
  pruning — plan-pinned on the batch path too), score, top-k. The
  corpus term is N·nprobe/K per query wave, flat in corpus growth at
  fixed occupancy (BASELINE.md round-7 serving-tier table).
- Appends to the index between waves are visible to the NEXT wave
  automatically — the query path reads the parquet table as-of
  execution; no restart, no re-registration (pinned by test: a wave
  served after an append retrieves the appended vector).
- ``foreachBatch`` is at-least-once: a crash between the result append
  and the checkpoint commit replays the wave, duplicating its
  DETERMINISTIC rows — ``read_ann_results`` dedupes on
  (wave, query_id, rank), the monitor-verdict idempotency-by-key
  discipline.
- ``maxFilesPerTrigger=1``: one wave per micro-batch; the wave tag
  raises in-plan if a landing file ever spans >1 wave (ADVICE r6
  contract, same as media/monitor).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_datawarehouse_spark.operators.ann_index import query_ivf_index

QUERY_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("emb", T.ArrayType(T.FloatType())),
    ]
)

_RESULTS_DDL = (
    "wave long, query_id long, candidate_id long, cosine double, rank long"
)


def stream_query_landing(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source landing feed of query-vector waves: declared schema,
    one parquet file per wave, one wave per micro-batch."""
    return (
        spark.readStream.schema(QUERY_LANDING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def run_ann_serve_available_now(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    results_dir: str,
    nprobe: int,
    checkpoint_dir: str | None = None,
    pq: bool = False,
    rerank: int | None = None,
    timeout: float | None = None,
) -> None:
    """Drain every landed-and-unanswered query wave through the stored
    index, appending (wave, query_id, candidate_id, cosine, rank)
    rows. Timeout semantics mirror the CDC/monitor/media drains:
    ``None`` blocks until the availableNow drain self-terminates;
    expiry stops the query and raises (a silent return would let a
    caller read a partial result sidecar as if the drain had
    finished)."""

    def serve_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # one wave per batch; the tag RAISES on a multi-wave file
        # (ADVICE r6 — min() would mis-attribute results and the
        # (wave, query_id, rank) dedupe could collapse distinct waves)
        wave = batch_df.agg(
            F.min("wave").cast("long").alias("_w"),
            F.countDistinct("wave").alias("_nw"),
        ).select(
            F.when(F.col("_nw") <= 1, F.col("_w"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "ann serve batch spans %d waves — "
                        "one-file-per-wave contract broken",
                        F.col("_nw"),
                    )
                ).cast("long")
            )
            .alias("wave")
        )
        topk = query_ivf_index(
            batch_df.select("id", "emb"),
            index_dir,
            nprobe=nprobe,
            pq=pq,
            rerank=rerank,
        )
        out = topk.crossJoin(F.broadcast(wave)).select(
            "wave", "query_id", "candidate_id", "cosine", "rank"
        )
        out.write.mode("append").parquet(results_dir)

    writer = (
        stream_query_landing(spark, landing_dir)
        .writeStream.outputMode("append")
        .foreachBatch(serve_batch)
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
            f"ann serve drain did not terminate within {timeout}s — "
            f"results at {results_dir} may be partial; not returning "
            "control"
        )


def read_ann_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """Result sidecar, deduped per (wave, query, rank) — at-least-once
    replay duplicates a wave's deterministic rows (module docstring)."""
    if not os.path.isdir(results_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(results_dir)
    ):
        return spark.createDataFrame([], _RESULTS_DDL)
    return spark.read.parquet(results_dir).dropDuplicates(
        ["wave", "query_id", "rank"]
    )
