"""Scan operators (SURVEY.md §2.1 S1-S3).

Every reader declares an explicit ``StructType`` — schema inference is a
full extra pass over the data and is banned at 100 TB (SURVEY.md §1.2).
The schemas below are the authoritative DDL for the driver's test tables
(TESTDATA.md / FIXTURES.md §3) plus the reference's raw retail CSV
(reference ``scripts/clean_data.py:10``, reconstructed in FIXTURES.md §1).

Declaring the schema (instead of ``inferSchema``) also keeps the Parquet
scan prunable: Catalyst pushes filters and reads only referenced columns
(verify with ``plans.pushed_filters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Driver test-table schemas (FIXTURES.md §3; verified against parquet) ---

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # The fixture generator has shipped ts as BOTH Parquet
            # TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across driver
            # rounds; load_table probes the footer (events_ts_unit) and
            # reads ns as an epoch-nanos long (nanosAsLong) truncated to
            # µs, or µs natively. Post-load, ts is always TimestampType.
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(TABLE_SCHEMAS)

# events schema variant for files that store ts as TIMESTAMP(MICROS):
# Spark reads µs natively into TimestampType, no conversion needed.
EVENTS_SCHEMA_TS = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.TimestampType())
        for f in TABLE_SCHEMAS["events"].fields
    ]
)

_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """Probe the Parquet timestamp unit of ``ts`` ('ns' or 'us').

    Footer-only metadata read on the driver (same class of work as file
    listing — no data scanned). Needed because the fixture generator has
    shipped events.ts as TIMESTAMP(NANOS) in some rounds and
    TIMESTAMP(MICROS) in others; a reader hard-wired to either unit
    silently compresses or stretches event time 1000× on the other.
    """
    if path not in _TS_UNIT_CACHE:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(probe):
            parts = sorted(
                f
                for f in os.listdir(probe)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            probe = os.path.join(probe, parts[0])
        ts_type = pq.read_schema(probe).field("ts").type
        _TS_UNIT_CACHE[path] = getattr(ts_type, "unit", "us")
    return _TS_UNIT_CACHE[path]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_FIXTURE_PROBED: set[tuple[str, str]] = set()


def _first_parquet_file(path: str) -> str:
    if not os.path.isdir(path):
        return path
    parts = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    return os.path.join(path, parts[0])


def _probe_fixture(path: str, name: str) -> None:
    """Once-per-session fixture canary AT the scan boundary (r4 verdict
    #8): the driver regenerates /root/testdata between rounds, and the
    pytest-side canaries (test_writers.py schema/ASCII tests) only fire
    when pytest runs — the CORRECTNESS gate itself would see a mystery
    hash mismatch. Failing here instead names the drift.

    Cost model: footer-only metadata read for every table (same driver-
    side class of work as file listing), plus — for ``documents`` only —
    the FIRST row group's ``text`` column decoded driver-side (bounded:
    one row group regardless of table size). Several oracle pairs are
    cross-engine-exact ONLY on printable-ASCII text (JVM lower() vs
    utf8proc on exotic casings, the multimodal ascii()-aggregate
    featurizer, the LM/tile trigram substr arithmetic), so non-ASCII
    content is as much a fixture break as a renamed column.
    """
    import pyarrow.parquet as pq

    probe = _first_parquet_file(path)
    got = list(pq.read_schema(probe).names)
    declared = [f.name for f in TABLE_SCHEMAS[name].fields]
    if got != declared:
        raise RuntimeError(
            f"fixture drift: {path} columns {got} != declared DDL "
            f"{declared} (TABLE_SCHEMAS[{name!r}]) — the driver "
            "regenerated the fixture with a different schema; update "
            "sources/readers.py before trusting any query result"
        )
    if name == "documents":
        texts = pq.ParquetFile(probe).read_row_group(0, columns=["text"])
        bad = [
            s
            for s in texts.column("text").to_pylist()
            if s is not None
            and not (s.isascii() and all(" " <= c <= "~" for c in s))
        ]
        if bad:
            raise RuntimeError(
                f"fixture drift: {path} contains {len(bad)} non-printable-"
                "ASCII text values in row group 0 (first: "
                f"{bad[0][:80]!r}); lower()/ascii()/substr-based oracles "
                "(textual.py LM + tile dedup, multimodal featurizer) are "
                "cross-engine-exact only on printable ASCII — revisit "
                "them before trusting hashes"
            )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with declared schema (S3 staging ingest analog).

    At 100 TB the fact tables would be directory-partitioned (e.g. by
    month); ``spark.read.parquet`` then gets partition pruning for free
    on top of predicate pushdown + column pruning.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # The driver hands us its own SparkSession, which may not carry our
    # session-factory configs. Pin the semantics every catalog query
    # assumes (all runtime-settable, idempotent, no job triggered):
    # UTC so event-time hour/date math matches the (UTC-naive) oracle,
    # and non-ANSI so string smart-key/partition-value handling keeps
    # the reference's coerce posture (Spark 4 defaults ANSI ON).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # Partition values are strings by contract (F2 smart keys are
    # zero-padded: month_key '011995'); inference would collapse them
    # to INT 11995 on read-back. The session factory pins this too, but
    # the driver's externally built session must inherit it from here.
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    path = f"{sf_dir}/{name}.parquet"
    if (path, name) not in _FIXTURE_PROBED:
        _probe_fixture(path, name)
        _FIXTURE_PROBED.add((path, name))
    if name == "events" and events_ts_unit(path) == "ns":
        # TIMESTAMP(NANOS), which Spark's reader rejects unless read as
        # a raw long; then ns → µs truncation, matching DuckDB's
        # TIMESTAMP_NS→TIMESTAMP cast. `div` is integral division: `/`
        # would go through DOUBLE, which at ~1.7e18 ns has >1 µs ULP
        # and rounds the value.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = EVENTS_SCHEMA_TS if name == "events" else TABLE_SCHEMAS[name]
    return spark.read.schema(schema).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the ``spark.sql`` lifecycle."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- Reference raw retail CSV (S1; reference scripts/clean_data.py:10) ---

RAW_RETAIL_SCHEMA = T.StructType(
    [
        T.StructField("Transaction_ID", T.LongType()),
        T.StructField("Customer_ID", T.LongType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Email", T.StringType()),
        T.StructField("Phone", T.StringType()),
        T.StructField("Address", T.StringType()),
        T.StructField("City", T.StringType()),
        T.StructField("State", T.StringType()),
        T.StructField("Zipcode", T.LongType()),
        T.StructField("Country", T.StringType()),
        T.StructField("Age", T.LongType()),
        T.StructField("Gender", T.StringType()),
        T.StructField("Income", T.StringType()),
        T.StructField("Customer_Segment", T.StringType()),
        T.StructField("Date", T.StringType()),
        T.StructField("Year", T.LongType()),
        T.StructField("Month", T.StringType()),
        T.StructField("Time", T.StringType()),
        T.StructField("Total_Purchases", T.LongType()),
        T.StructField("Amount", T.DoubleType()),
        T.StructField("Total_Amount", T.DoubleType()),
        T.StructField("Product_Category", T.StringType()),
        T.StructField("Product_Brand", T.StringType()),
        T.StructField("Product_Type", T.StringType()),
        T.StructField("Shipping_Method", T.StringType()),
        T.StructField("Payment_Method", T.StringType()),
        T.StructField("Order_Status", T.StringType()),
        T.StructField("Ratings", T.DoubleType()),
        T.StructField("products", T.StringType()),
        T.StructField("Feedback", T.StringType()),
    ]
)


def read_retail_csv(spark: SparkSession, path: str, sep: str = ";") -> DataFrame:
    """Semicolon-delimited retail CSV scan (reference clean_data.py:10).

    ``mode=PERMISSIVE`` + non-ANSI casts reproduce the reference's
    coerce-or-drop posture (SURVEY.md P6): bad cells become NULL and the
    cleaning pipeline's NOT NULL filter drops them.
    """
    return (
        spark.read.option("sep", sep)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .schema(RAW_RETAIL_SCHEMA)
        .csv(path)
    )


DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Line-delimited JSON scan with a DECLARED schema and an explicit
    quarantine column — the LLM-pipeline landing format (web scrapes,
    Common-Crawl-style dumps, API exports all arrive as JSONL).

    100 TB discipline, same as the CSV scan above:

    - The schema is a contract, never inferred — inference is a full
      extra pass over the landing zone, and a sampled inference can
      silently narrow a type on the one shard that lacked the wide
      value.
    - ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` keeps the
      scan single-pass AND total: a malformed line (truncated upload,
      mid-record flush, non-JSON noise) lands with all data fields
      NULL and the raw line preserved in ``corrupt_col`` for the
      quarantine branch, instead of failing the job (FAILFAST) or
      vanishing (DROPMALFORMED — silent data loss at the exact layer
      where you most need an audit trail).
    - Capturing the raw line costs nothing extra: the parser already
      holds the line buffer; there is no second read.

    The corrupt column is appended to the declared schema here so
    callers state only the data contract.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .json(path)
    )
