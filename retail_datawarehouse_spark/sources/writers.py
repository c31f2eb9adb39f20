"""Sink operators (SURVEY.md §2.1 S2/S4).

The warehouse's physical layout decision lives here: facts are written
partitioned by ``month_key`` so month-scoped queries (snapshot reads,
period-over-period) get partition pruning, and per-partition file sizes
stay near the Parquet sweet spot instead of one giant file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink (reference clean_data.py:136 writes one comma-CSV).

    ``single_file`` coalesces to one output file for byte-compatibility
    with the reference; leave False at scale (one file = one writer task).
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_parquet_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    buckets: tuple[int, str] | None = None,
    table_name: str | None = None,
) -> None:
    """Warehouse table load (reference README.md:168-176,184).

    ``partition_by=["month_key"]`` for facts → partition pruning.
    ``buckets=(n, key)`` co-locates later joins/aggs on ``key`` without a
    shuffle (requires ``saveAsTable``).

    Partition values are zero-padded key STRINGS; readers must keep
    ``spark.sql.sources.partitionColumnTypeInference.enabled=false``
    (set in our session factory) or "011995" comes back as INT 11995
    (SURVEY.md F2 leading-zero hazard — covered by the e2e tests).
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if buckets is not None:
        n, key = buckets
        name = table_name or path.rstrip("/").rsplit("/", 1)[-1]
        writer.bucketBy(n, key).sortBy(key).option("path", path).format(
            "parquet"
        ).saveAsTable(name)
    else:
        writer.parquet(path)


def compact_table(
    df: DataFrame,
    path: str,
    target_files: int,
    range_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Small-files compaction / layout rewrite — the maintenance job
    every long-lived warehouse needs. Streaming micro-batches and
    incremental loads leave thousands of KB-sized files per partition;
    at 100 TB that means task-per-tiny-file scheduling overhead and
    footer-heavy scans. This rewrites to ``target_files`` outputs, and
    with ``range_by`` ALSO range-clusters rows (repartitionByRange →
    each output file covers a tight key range) so Parquet min/max
    row-group statistics prune key-scoped scans — poor-man's Z-order
    for a single sort dimension.

    ``max_records_per_file`` caps file size independent of partition
    count (Spark splits writer output), the guard against one skewed
    range producing a monster file.
    """
    out = (
        df.repartitionByRange(target_files, *range_by)
        if range_by
        else df.repartition(target_files)
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
