"""Sink contracts (SURVEY.md §2.1 S2/S4): round-trips, partition
pruning on the partitioned fact layout, and shuffle-free joins over
bucketed tables — the physical-layout half of the 100 TB design."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.plans.explain import formatted_plan, shuffle_count
from retail_datawarehouse_spark.sources.readers import load_table
from retail_datawarehouse_spark.sources.writers import write_csv, write_parquet_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="writers_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_round_trip(spark, sf_dir, tmpdir):
    """S2: CSV sink writes header'd comma CSV readable back losslessly."""
    src = load_table(spark, sf_dir, "nation")
    write_csv(src, f"{tmpdir}/nation_csv", single_file=True)
    back = (
        spark.read.option("header", "true")
        .schema(src.schema)
        .csv(f"{tmpdir}/nation_csv")
    )
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_partitioned_fact_write_prunes_partitions(spark, sf_dir, tmpdir):
    """S4: the fact written partitioned by month_key must serve a
    month-scoped read from ONE partition directory (partition pruning
    visible in the scan), and survive the round trip."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "month_key", F.date_format("o_orderdate", "MMyyyy")
    )
    write_parquet_table(orders, f"{tmpdir}/orders_part", partition_by=["month_key"])
    back = spark.read.parquet(f"{tmpdir}/orders_part")
    assert back.count() == orders.count()
    one_month = back.filter(F.col("month_key") == "011995")
    plan = formatted_plan(one_month)
    assert "PartitionFilters" in plan and "month_key" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    expected = orders.filter(F.col("month_key") == "011995").count()
    assert one_month.count() == expected > 0


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmpdir):
    """S4 bucketing: two tables bucketed on the join key co-locate —
    the join plans with ZERO exchanges. This is the pre-partitioning
    story for repeated big-big joins at 100 TB (pay the shuffle once at
    write time, never again at read time)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_parquet_table(
        orders, f"{tmpdir}/orders_b", buckets=(8, "o_orderkey"), table_name="t_orders_b"
    )
    write_parquet_table(
        li, f"{tmpdir}/li_b", buckets=(8, "l_orderkey"), table_name="t_li_b"
    )
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_li_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        n_shuffles = shuffle_count(joined)
        assert n_shuffles == 0, formatted_plan(joined)
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_raw_retail_csv_scan_coerce_or_drop(spark, tmpdir):
    """S1/P6: semicolon CSV scan with the declared 30-column raw schema;
    malformed numeric cells coerce to NULL (PERMISSIVE + non-ANSI), the
    reference's coerce-or-drop posture."""
    from retail_datawarehouse_spark.sources.readers import (
        RAW_RETAIL_SCHEMA,
        read_retail_csv,
    )

    header = ";".join(f.name for f in RAW_RETAIL_SCHEMA.fields)
    good = (
        "1;10;Ana;a@x.com;555;Main St;Porto;P;4000;PT;33;F;Medium;Regular;"
        "1/15/2023;2023;January;08:05:09;2;9.5;19.0;Books;BrandA;Paper;"
        "Standard;Card;Delivered;4.5;Notebook;Good"
    )
    bad_qty = good.replace(";2;9.5;", ";NOT_A_NUMBER;9.5;")
    path = f"{tmpdir}/raw.csv"
    with open(path, "w") as f:
        f.write("\n".join([header, good, bad_qty]))
    df = read_retail_csv(spark, path)
    assert df.count() == 2
    rows = df.orderBy(F.col("Total_Purchases").asc_nulls_last()).collect()
    assert rows[0]["Total_Purchases"] == 2
    assert rows[1]["Total_Purchases"] is None  # coerced, not raised
    assert rows[0]["Date"] == "1/15/2023" and rows[0]["Amount"] == 9.5


def test_json_round_trip_with_declared_schema(spark, sf_dir, tmpdir):
    """JSON lines sink/scan: schema-on-read declared (no inference pass
    — same 100 TB rule as parquet), values survive the trip."""
    src = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src.write.mode("overwrite").json(f"{tmpdir}/events_json")
    back = spark.read.schema(src.schema).json(f"{tmpdir}/events_json")
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_orc_round_trip(spark, sf_dir, tmpdir):
    """ORC sink/scan — the second columnar warehouse format; declared
    schema, lossless round trip including date-typed columns."""
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )
    src.write.mode("overwrite").orc(f"{tmpdir}/li_orc")
    back = spark.read.schema(src.schema).orc(f"{tmpdir}/li_orc")
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_compact_table_controls_files_and_clusters_ranges(spark, sf_dir, tmpdir):
    """Small-files compaction: a fragmented table (64 writer tasks)
    rewritten to 4 range-clustered files — file count drops to the
    target, no rows lost, and the per-file l_orderkey ranges are
    pairwise disjoint, which is exactly what makes Parquet min/max
    row-group stats prune key-scoped scans after compaction."""
    import glob

    from retail_datawarehouse_spark.sources.writers import compact_table

    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(f"{tmpdir}/li_frag")
    frag_files = glob.glob(f"{tmpdir}/li_frag/part-*.parquet")
    assert len(frag_files) > 16

    frag = spark.read.schema(li.schema).parquet(f"{tmpdir}/li_frag")
    compact_table(frag, f"{tmpdir}/li_compact", target_files=4,
                  range_by=["l_orderkey"])
    out_files = glob.glob(f"{tmpdir}/li_compact/part-*.parquet")
    assert len(out_files) <= 4

    back = spark.read.schema(li.schema).parquet(f"{tmpdir}/li_compact")
    assert back.count() == li.count()

    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted([(r.lo, r.hi) for r in spans])
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans  # disjoint key ranges per file


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmpdir):
    """DPP: a fact partitioned by month_key joined to a FILTERED dim on
    the partition column must scan only the partitions the dim filter
    selects — the plan carries a dynamicpruning expression in the
    fact's PartitionFilters. At 100 TB this is the difference between
    scanning 3 months and scanning 10 years."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "month_key", F.date_format("o_orderdate", "MMyyyy")
    )
    write_parquet_table(orders, f"{tmpdir}/orders_dpp", partition_by=["month_key"])
    fact = spark.read.parquet(f"{tmpdir}/orders_dpp")
    months = (
        orders.select("month_key").distinct()
        .withColumn("quarter_tag", F.substring("month_key", 1, 2))
    )
    dim = months.filter(F.col("quarter_tag") == "03")
    joined = fact.join(dim, "month_key").groupBy("quarter_tag").count()
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.collect()[0]["count"] > 0


def test_events_reader_handles_both_parquet_ts_units(spark, tmpdir):
    """The driver fixture's events.ts has shipped as TIMESTAMP(NANOS)
    (rounds 1-2) and TIMESTAMP(MICROS) (round 3). load_table probes the
    footer and must return the SAME µs TimestampType values for either
    encoding — a reader hard-wired to one unit compresses or stretches
    event time 1000× on the other (caught live when the round-3 fixture
    flipped units and every hour collapsed into a 2-bucket span)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1704067200000000 + i * 3_600_000_000 + 123456 for i in range(48)]
    cols = {
        "event_id": pa.array(range(48), pa.int64()),
        "user_id": pa.array([i % 7 for i in range(48)], pa.int64()),
        "event_type": pa.array(["view"] * 48),
        "value": pa.array([float(i) for i in range(48)]),
        "props": pa.array(["{}"] * 48),
    }
    for unit in ("us", "ns"):
        scale = 1 if unit == "us" else 1000
        tbl = pa.table(
            {
                "event_id": cols["event_id"],
                "ts": pa.array([m * scale for m in micros], pa.timestamp(unit)),
                "user_id": cols["user_id"],
                "event_type": cols["event_type"],
                "value": cols["value"],
                "props": cols["props"],
            }
        )
        d = f"{tmpdir}/events_{unit}"
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, f"{d}/events.parquet", store_schema=False)

    read = {}
    for unit in ("us", "ns"):
        df = load_table(spark, f"{tmpdir}/events_{unit}", "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        read[unit] = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert read["us"] == read["ns"]
    epoch_us = [int(t.timestamp() * 1_000_000) for t in read["us"]]
    assert epoch_us[0] == micros[0]


def test_fixture_schemas_match_declared(sf_dir):
    """Schema-drift canary: the driver REGENERATES /root/testdata between
    rounds, and round 3 silently flipped events.ts from TIMESTAMP(NANOS)
    to TIMESTAMP(MICROS) — values stayed plausible, so only downstream
    row counts caught it. This probes every fixture footer (metadata
    only) against the declared DDL so the next drift fails here, with a
    clear message, before it can corrupt query results."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from retail_datawarehouse_spark.sources.readers import (
        TABLE_SCHEMAS,
        events_ts_unit,
    )

    def spark_kind(dt):
        if isinstance(dt, (T.LongType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.DoubleType):
            return "float"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.TimestampType):
            return "timestamp"
        if isinstance(dt, T.ArrayType):
            return "list"
        return type(dt).__name__

    def arrow_kind(at):
        import pyarrow as pa

        if pa.types.is_integer(at):
            return "int"
        if pa.types.is_floating(at):
            return "float"
        if pa.types.is_string(at) or pa.types.is_large_string(at):
            return "string"
        if pa.types.is_timestamp(at):
            return "timestamp"
        if pa.types.is_list(at) or pa.types.is_large_list(at):
            return "list"
        return str(at)

    for name, decl in TABLE_SCHEMAS.items():
        actual = pq.read_schema(f"{sf_dir}/{name}.parquet")
        assert actual.names == [f.name for f in decl.fields], (
            f"{name}: fixture columns {actual.names} != declared"
        )
        for f in decl.fields:
            got = arrow_kind(actual.field(f.name).type)
            if name == "events" and f.name == "ts":
                # declared long + unit-probed conversion path
                assert got == "timestamp", f"events.ts: {got}"
                assert events_ts_unit(f"{sf_dir}/{name}.parquet") in ("ns", "us")
            else:
                want = spark_kind(f.dataType)
                assert got == want, f"{name}.{f.name}: fixture {got} != declared {want}"


def test_incremental_dedup_against_bucketed_index_shuffles_batch_only(
    spark, sf_dir, tmpdir
):
    """Operational exact dedup: a new batch dedups against the LIVE
    corpus's fingerprint index. At 100 TB the index dwarfs every batch,
    so the physical contract is: the index NEVER moves — stored
    bucketed on content_hash, its side of the left-anti join reads
    buckets in place and the single exchange in the plan is the small
    batch shuffling into the index's bucket layout. Broadcast is
    disabled to model an unbroadcastable index; values are checked too
    (exactly the never-seen docs survive)."""
    from pyspark.sql import functions as FF

    from retail_datawarehouse_spark.operators.dedup import dedup_against_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    history = docs.filter(FF.col("doc_id") % 3 != 0)
    write_parquet_table(
        history.select(FF.md5("text").alias("content_hash")),
        f"{tmpdir}/fp_index",
        buckets=(8, "content_hash"),
        table_name="t_fp_index",
    )
    index = spark.table("t_fp_index")
    batch = docs.filter(FF.col("doc_id") < 60)

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = dedup_against_index(batch, index)
        plan = formatted_plan(out)
        assert shuffle_count(out) == 1, plan  # batch side only; index in place
        assert "LeftAnti" in plan, plan
        got = {r.doc_id for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS t_fp_index")

    expected = {i for i in range(60) if i % 3 == 0}  # never ingested
    assert got == expected


def test_zorder_compaction_gives_every_dimension_file_locality(
    spark, sf_dir, tmpdir
):
    """Z-order vs single-key range clustering, measured by the thing
    that matters for scan pruning: per-file min/max SPAN of each
    clustered column as a fraction of its global span (Parquet skips a
    file when the predicate misses its [min,max]). Single-key
    clustering makes its own column's per-file spans tiny but leaves
    the other column's ~full (no pruning on it); z-order by BOTH gives
    each dimension ~sqrt-of-files locality, so scans filtered on
    EITHER column prune."""
    from retail_datawarehouse_spark.sources.writers import compact_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")

    def mean_span_frac(path, col):
        back = spark.read.parquet(path)
        spans = (
            back.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max(col) - F.min(col)).alias("span"),
            )
            .collect()
        )
        g = li.agg((F.max(col) - F.min(col)).alias("g")).collect()[0]["g"]
        return sum(r.span for r in spans) / (len(spans) * g)

    compact_table(li, f"{tmpdir}/li_1d", target_files=16, range_by=["l_orderkey"])
    compact_table(
        li, f"{tmpdir}/li_z", target_files=16, zorder_by=["l_orderkey", "l_partkey"]
    )
    assert spark.read.parquet(f"{tmpdir}/li_z").count() == li.count()

    # single-key: own column tightly clustered, other column unpruned
    assert mean_span_frac(f"{tmpdir}/li_1d", "l_orderkey") < 0.15
    assert mean_span_frac(f"{tmpdir}/li_1d", "l_partkey") > 0.8

    # z-order: BOTH columns get real locality (16 files ≈ 2 fixed top
    # bits per dimension → ~1/4 of each key space per file; allow slack)
    assert mean_span_frac(f"{tmpdir}/li_z", "l_orderkey") < 0.6
    assert mean_span_frac(f"{tmpdir}/li_z", "l_partkey") < 0.6


def test_schema_evolution_merge_read_across_file_generations(
    spark, sf_dir, tmpdir
):
    """Lakehouse schema evolution: files written before a column was
    added coexist with files written after. A mergeSchema read must
    return the superset schema, NULL-filling the old generation — and
    exactly the old generation (no value bleed). At 100 TB this is how
    a column lands without rewriting petabytes of history."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "priority_tag", F.lit("migrated")
    )
    v1.write.parquet(f"{tmpdir}/evo", mode="overwrite")
    v2.write.parquet(f"{tmpdir}/evo", mode="append")

    back = spark.read.option("mergeSchema", "true").parquet(f"{tmpdir}/evo")
    assert set(back.columns) == {"o_orderkey", "o_totalprice", "priority_tag"}
    assert back.count() == orders.count()
    nulls = back.filter(F.col("priority_tag").isNull())
    assert nulls.count() == v1.count()
    assert nulls.filter(F.col("o_orderkey") % 2 == 1).count() == 0
    tagged = back.filter(F.col("priority_tag") == "migrated")
    assert tagged.count() == v2.count()


def test_fixture_document_text_is_ascii(sf_dir, sf_correctness_dir):
    """Content-assumption canary (sibling of the schema-drift one):
    several oracle pairs are cross-engine-exact ONLY on ASCII text —
    lower() (JVM per-codepoint vs utf8proc differ on exotic casings),
    the multimodal ascii()-aggregate featurizer, and the LM/tile
    trigram substr arithmetic. The driver regenerates fixtures between
    rounds; if documents.text ever gains non-ASCII, this fails with the
    dependency list instead of a mysterious hash mismatch downstream."""
    import duckdb

    for d in (sf_dir, sf_correctness_dir):
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{d}/documents.parquet') "
            "WHERE text ~ '^[\\x20-\\x7E]*$' = false"
        ).fetchone()[0]
        assert n == 0, (
            f"{d}: {n} documents contain non-printable-ASCII text; "
            "revisit lower()/ascii()/substr-based oracles (textual.py lm "
            "+ tile dedup, multimodal featurizer) before trusting hashes"
        )


def test_load_table_probes_fixture_drift_at_scan_boundary(spark, tmpdir):
    """r4 verdict #8: the pytest canaries above only fire when pytest
    runs; the driver's CORRECTNESS gate calls load_table directly, so
    the probe now lives THERE (once per session per (path, table)).
    Plant both drift classes in a fake sf_dir and assert each fails
    with its named diagnosis, then that a faithful fixture loads clean
    and the probe caches (second load does not re-read the footer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from retail_datawarehouse_spark.sources import readers

    # Drift class 1: renamed column on a tiny faithful-shape region.
    bad_schema_dir = os.path.join(tmpdir, "bad_schema")
    os.makedirs(bad_schema_dir)
    pq.write_table(
        pa.table({"r_regionkey": pa.array([0], pa.int32()),
                  "r_label": ["AFRICA"]}),
        f"{bad_schema_dir}/region.parquet",
    )
    with pytest.raises(RuntimeError, match="fixture drift.*r_label"):
        load_table(spark, bad_schema_dir, "region")

    # Drift class 2: non-ASCII documents.text.
    bad_text_dir = os.path.join(tmpdir, "bad_text")
    os.makedirs(bad_text_dir)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": ["café au lait"],
                "lang": ["fr"],
                "source": ["web"],
                "n_chars": pa.array([12], pa.int64()),
            }
        ),
        f"{bad_text_dir}/documents.parquet",
    )
    with pytest.raises(RuntimeError, match="non-printable-ASCII"):
        load_table(spark, bad_text_dir, "documents")

    # Faithful fixture: loads clean, and the (path, name) key is cached
    # so the per-session cost is one footer read, not one per query.
    ok_dir = os.path.join(tmpdir, "ok")
    os.makedirs(ok_dir)
    pq.write_table(
        pa.table({"r_regionkey": pa.array([0], pa.int32()),
                  "r_name": ["AFRICA"]}),
        f"{ok_dir}/region.parquet",
    )
    assert load_table(spark, ok_dir, "region").count() == 1
    assert (f"{ok_dir}/region.parquet", "region") in readers._FIXTURE_PROBED
    # Cached: a second load must not re-probe (bomb the probe fn).
    real = readers._probe_fixture
    try:
        readers._probe_fixture = lambda *_: (_ for _ in ()).throw(
            AssertionError("probe re-ran for a cached (path, table)")
        )
        load_table(spark, ok_dir, "region")
    finally:
        readers._probe_fixture = real


def test_jsonl_quarantine_semantics(spark, tmpdir):
    """read_jsonl's PERMISSIVE quarantine contract, pinned on a
    hand-built landing file: exactly the malformed lines land in
    `_corrupt` (raw bytes preserved, data fields all NULL), valid lines
    parse clean with a NULL `_corrupt`, and nothing is dropped — the
    row count equals the line count. This is the audit-trail property
    the q_jsonl_ingest oracle relies on."""
    import os

    from retail_datawarehouse_spark.sources.readers import (
        DOCS_JSONL_SCHEMA,
        read_jsonl,
    )

    lines = [
        '{"doc_id":1,"text":"alpha beta","lang":"en","source":"web","n_chars":10}',
        '{"doc_id":2,"text":"gamma","lang"',  # truncated mid-record
        'not json at all',
        '{"doc_id":3,"text":"delta","lang":"de","source":"api","n_chars":5}',
    ]
    path = os.path.join(str(tmpdir), "landing")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")

    rows = read_jsonl(spark, path, DOCS_JSONL_SCHEMA).collect()
    assert len(rows) == len(lines)  # total: nothing silently dropped

    corrupt = sorted(
        (r for r in rows if r["_corrupt"] is not None), key=lambda r: r["_corrupt"]
    )
    good = {r["doc_id"]: r for r in rows if r["_corrupt"] is None}

    # Exactly the malformed lines quarantined, raw bytes preserved.
    assert [r["_corrupt"] for r in corrupt] == sorted([lines[1], lines[2]])
    # Quarantined rows carry NO parsed data (all-NULL fields) — the
    # q_jsonl_ingest stats rely on this (their sums stay NULL).
    for r in corrupt:
        assert all(
            r[f.name] is None for f in DOCS_JSONL_SCHEMA.fields
        ), f"corrupt row leaked parsed fields: {r}"
    # Valid lines parse clean.
    assert set(good) == {1, 3}
    assert good[1]["text"] == "alpha beta" and good[1]["n_chars"] == 10
    assert good[3]["lang"] == "de" and good[3]["source"] == "api"
