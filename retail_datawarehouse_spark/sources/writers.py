"""Sink operators (SURVEY.md §2.1 S2/S4).

The warehouse's physical layout decision lives here: facts are written
partitioned by ``month_key`` so month-scoped queries (snapshot reads,
period-over-period) get partition pruning, and per-partition file sizes
stay near the Parquet sweet spot instead of one giant file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def write_orc_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """ORC warehouse load — the same partitioned layout contract as
    ``write_parquet_table`` through Spark's other built-in columnar
    format (ORC ships in-core; a lakehouse migrating between the two
    keeps the directory/partition discipline unchanged). Same F2
    leading-zero hazard, same declared-schema read-back rule."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


ZORDER_BITS = 8


def zorder_value(cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Interleaved-bit z-value over ``cols`` — the multi-dimensional
    clustering key behind Delta/Iceberg OPTIMIZE ZORDER. Each column is
    min-max quantized to ``bits`` levels (bounds from a 1-row in-plan
    aggregate the caller cross-joins in — see :func:`compact_table`),
    then the quantized bits are interleaved round-robin so nearby
    z-values are nearby in EVERY dimension at once. Range-clustering
    files by this value gives each dimension ~N^(1/k) of the key space
    per file (k = len(cols)) — Parquet min/max stats then prune scans
    filtered on ANY clustered column, where single-key range clustering
    prunes only its own column. Pure integer bit arithmetic: map-only,
    deterministic, engine-independent.

    Expects bounds columns ``__min_<c>`` / ``__max_<c>`` to be present
    (attached by the caller); returns the z-value Column.
    """
    z = F.lit(0).cast("long")
    n = len(cols)
    for i, c in enumerate(cols):
        lo = F.col(f"__min_{c}").cast("double")
        hi = F.col(f"__max_{c}").cast("double")
        span = hi - lo
        q = F.when(span <= 0, F.lit(0)).otherwise(
            F.floor(
                (F.col(c).cast("double") - lo) * ((1 << bits) - 1) / span
            )
        ).cast("long")
        for j in range(bits):
            bit = F.shiftright(q, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def compact_table(
    df: DataFrame,
    path: str,
    target_files: int,
    range_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
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

    ``zorder_by`` (mutually exclusive with ``range_by``) range-clusters
    on the interleaved-bit :func:`zorder_value` instead — every listed
    column gets file-level min/max locality, so scans filtered on any
    of them prune (the multi-column upgrade of the single-key path; the
    column bounds ride a 1-row broadcast aggregate, fully in-plan).
    """
    if range_by and zorder_by:
        raise ValueError("range_by and zorder_by are mutually exclusive")
    if zorder_by:
        bounds = df.agg(
            *[
                agg(c).alias(f"__{tag}_{c}")
                for c in zorder_by
                for tag, agg in (("min", F.min), ("max", F.max))
            ]
        )
        out = (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("__z", zorder_value(zorder_by))
            .repartitionByRange(target_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z", *[f"__{t}_{c}" for c in zorder_by for t in ("min", "max")])
        )
    elif range_by:
        out = df.repartitionByRange(target_files, *range_by)
    else:
        out = df.repartition(target_files)
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
