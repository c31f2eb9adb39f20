"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB (BASELINE.json north star):
the payload is an opaque ``binary`` column riding next to typed metadata;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so the
Python stage sees columnar batches, never rows, and the shuffle story is
unchanged (payloads partition like any other column — size-aware
``maxPartitionBytes`` matters more than row counts).

The container has no image/audio libraries, so the decode step is a
STUB: ``decode_image`` raises NotImplementedError, and the featurizer
runs a clearly-marked deterministic fake (byte-statistics) through the
REAL plumbing — schema, batching, UDF signature are production-shaped.
The fixtures carry no binary column either; payloads are derived by
UTF-8-encoding ``documents.text`` (same plumbing, checkable content).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table


def decode_image(payload: bytes) -> "object":
    """Real decoder slot (PIL/libvips at deploy time). Stubbed: the
    container ships no imaging libraries."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; wire PIL/torchvision here at deploy time"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("payload_bytes"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.LongType()),
        T.StructField("byte_max", T.LongType()),
    ]
)


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE featurizer (byte statistics) standing in for
    decode→resize→embed. Arrow-batched: one pandas frame per batch, the
    real shape a GPU feature-extractor consumes."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": payloads.map(len).astype("int64"),
                "byte_mean": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
                "byte_min": payloads.map(lambda b: int(min(b)) if len(b) else 0),
                "byte_max": payloads.map(lambda b: int(max(b)) if len(b) else 0),
            }
        )


def featurize(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _featurize_batches, FEATURE_SCHEMA
    )


_META_SQL = """
    SELECT doc_id,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS payload_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS payload_md5
    FROM documents
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque payload — the JVM-side half of the
    multimodal pipeline (no Python): sizes, sniffed header byte, content
    hash. This is the path metadata-only queries take (count by media
    type, size histograms) without ever touching Python or the payload
    decode."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("payload_bytes"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("first_byte"),
        F.md5("text").alias("payload_md5"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal plumbing: payload attach → Arrow-batched
    mapInPandas featurizer (deterministic fake behind the real decode
    slot). The kernel is Python, but its OUTPUT is SQL-expressible —
    byte statistics over the (verified-ASCII) payload are ascii-value
    aggregates — so the suite below hash-checks even the mapInPandas
    path cell-by-cell, not just row counts."""
    docs = load_table(spark, sf_dir, "documents")
    return featurize(with_binary_payload(docs))


# The featurizer's byte stats re-expressed in SQL: payload = UTF-8 text,
# text is pure ASCII (asserted by the chunker oracle's precondition), so
# bytes == ascii(char). The integer byte-sum is exact; ONE IEEE division
# reproduces numpy's float(sum)/len bit-for-bit.
_FEATURES_SQL = """
    SELECT doc_id,
           length(text) AS payload_bytes,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(regexp_extract_all(text, '.'),
                                   ch -> CAST(ascii(ch) AS BIGINT))),
                (acc, x) -> acc + x) AS DOUBLE) / length(text) AS byte_mean,
           CAST(list_aggregate(list_transform(regexp_extract_all(text, '.'),
                    ch -> ascii(ch)), 'min') AS BIGINT) AS byte_min,
           CAST(list_aggregate(list_transform(regexp_extract_all(text, '.'),
                    ch -> ascii(ch)), 'max') AS BIGINT) AS byte_max
    FROM documents
"""


# --- Frame sampling: the 1→N mapInPandas shape ---

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("chunk_bytes", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)

CHUNK_SIZE = 64


def _chunk_batches(batches):
    """Deterministic frame-sampler stand-in: split each payload into
    fixed 64-byte chunks, one output row per chunk — the exact output
    shape of video frame-sampling / audio windowing (1 input row → N
    typed rows), with md5 standing in for the decoded frame tensor."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "chunk_idx": [], "chunk_bytes": [], "chunk_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(0, len(payload), CHUNK_SIZE):
                chunk = payload[i : i + CHUNK_SIZE]
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(i // CHUNK_SIZE)
                out["chunk_bytes"].append(len(chunk))
                out["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


def sample_chunks(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas frame-sampling plumbing (1 row in → N chunk rows out).

    At 100 TB the payload column dominates partition size — the knob is
    ``spark.sql.files.maxPartitionBytes`` (bytes-based splits), not row
    counts; the chunk explosion happens inside the Arrow batch without
    a shuffle."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _chunk_batches, CHUNK_SCHEMA
    )


_CHUNKS_SQL = f"""
    -- documents.text is pure ASCII (verified: octet_length(encode(text))
    -- == length(text) for every row), so char windows == byte chunks.
    WITH chunks AS (
        SELECT doc_id,
               CAST(g.k AS BIGINT) AS chunk_idx,
               md5(substring(text, g.k * {CHUNK_SIZE} + 1, {CHUNK_SIZE}))
                   AS chunk_md5,
               length(substring(text, g.k * {CHUNK_SIZE} + 1, {CHUNK_SIZE}))
                   AS chunk_bytes
        FROM documents
        CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS k) g
        WHERE g.k * {CHUNK_SIZE} < length(text)
    )
    SELECT doc_id, chunk_idx, chunk_bytes, chunk_md5 FROM chunks
"""


def q_multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over the opaque payload: every document split into
    64-byte chunks with per-chunk content hashes. The Python kernel is
    a real mapInPandas 1→N explosion; the oracle reproduces it in pure
    SQL (substring windows over the encoded payload), so even the
    Python-side plumbing is hash-checked, not just row-counted."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_chunks(with_binary_payload(docs))


# --- Token chunking with overlap (embedding-pipeline text prep) ---------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def token_chunk_frame(docs: DataFrame) -> DataFrame:
    """Overlapping token chunks — how documents are actually fed to an
    embedding model (fixed window, stride < window so no boundary
    sentence is lost). Chunk k covers tokens [k·stride, k·stride+size);
    k runs while k·stride < n, so every doc yields ≥1 chunk and the
    tail chunk may be short.

    Deliberate contrast with :func:`sample_chunks` (the BYTE chunker):
    that one exercises the Arrow ``mapInPandas`` kernel path; this one
    is pure JVM array HOFs over one hoisted tokenization — zero Python,
    zero exchanges, the 1→N explosion stays inside whole-stage codegen.
    Emits (doc_id, chunk_idx, n_toks, chunk_md5)."""
    toksed = docs.select("doc_id", F.split("text", " ").alias("toks"))
    return (
        toksed.select(
            "doc_id",
            "toks",
            F.posexplode(
                F.expr(f"sequence(0, (size(toks) - 1) div {CHUNK_STRIDE})")
            ).alias("_p", "k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_idx"),
            F.size(
                F.expr(f"slice(toks, k * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS})")
            )
            .cast("long")
            .alias("n_toks"),
            F.md5(
                F.expr(
                    f"concat_ws(' ', slice(toks, k * {CHUNK_STRIDE} + 1,"
                    f" {CHUNK_TOKENS}))"
                )
            ).alias("chunk_md5"),
        )
    )


_TCHUNK_SQL = f"""
    SELECT doc_id, CAST(g.k AS BIGINT) AS chunk_idx,
           CAST(len(toks[g.k * {CHUNK_STRIDE} + 1
                         : g.k * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS BIGINT)
               AS n_toks,
           md5(array_to_string(
               toks[g.k * {CHUNK_STRIDE} + 1
                    : g.k * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
               AS chunk_md5
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS k) g
    WHERE g.k * {CHUNK_STRIDE} < len(toks)
"""


# --- Consolidated catalog entry (driver checks ≤50 sorted names) --------


@register(
    "q_multimodal_suite",
    oracle=f"""
    WITH meta AS ({_META_SQL}),
    chunks AS ({_CHUNKS_SQL}),
    tchunks AS ({_TCHUNK_SQL}),
    feats AS ({_FEATURES_SQL})
    SELECT 'meta' AS part, doc_id, payload_bytes AS i1,
           first_byte AS i2, payload_md5 AS s1, CAST(NULL AS DOUBLE) AS d1
    FROM meta
    UNION ALL
    SELECT 'chunk', doc_id, chunk_idx, chunk_bytes, chunk_md5,
           CAST(NULL AS DOUBLE)
    FROM chunks
    UNION ALL
    SELECT 'feat', doc_id, byte_min, byte_max, CAST(NULL AS VARCHAR),
           byte_mean
    FROM feats
    UNION ALL
    SELECT 'tchunk', doc_id, chunk_idx, n_toks, chunk_md5,
           CAST(NULL AS DOUBLE)
    FROM tchunks
    """,
)
def q_multimodal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole multimodal stack as one part-tagged union: JVM-side
    typed metadata ('meta'), the mapInPandas 1→N frame-sampling chunker
    ('chunk'), and the mapInPandas featurizer ('feat' — previously the
    catalog's only rows-only entry, now hash-checked because the fake
    featurizer's byte statistics are SQL-expressible over the ASCII
    payload), plus the pure-JVM overlapping TOKEN chunker ('tchunk' —
    the embedding-model text prep, zero Python by contrast with the
    Arrow byte chunker). The decode slot behind the featurizer remains the one
    documented NotImplementedError stub (no imaging libs in the
    container); everything around it is value-verified."""
    docs = load_table(spark, sf_dir, "documents")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    meta = q_multimodal_meta(spark, sf_dir).select(
        F.lit("meta").alias("part"),
        "doc_id",
        F.col("payload_bytes").alias("i1"),
        F.col("first_byte").alias("i2"),
        F.col("payload_md5").alias("s1"),
        null_d.alias("d1"),
    )
    chunks = q_multimodal_chunks(spark, sf_dir).select(
        F.lit("chunk").alias("part"),
        "doc_id",
        F.col("chunk_idx").alias("i1"),
        F.col("chunk_bytes").alias("i2"),
        F.col("chunk_md5").alias("s1"),
        null_d.alias("d1"),
    )
    feats = q_multimodal_features(spark, sf_dir).select(
        F.lit("feat").alias("part"),
        "doc_id",
        F.col("byte_min").alias("i1"),
        F.col("byte_max").alias("i2"),
        null_s.alias("s1"),
        F.col("byte_mean").alias("d1"),
    )
    tchunks = token_chunk_frame(docs).select(
        F.lit("tchunk").alias("part"),
        "doc_id",
        F.col("chunk_idx").alias("i1"),
        F.col("n_toks").alias("i2"),
        F.col("chunk_md5").alias("s1"),
        null_d.alias("d1"),
    )
    return (
        meta.unionByName(chunks).unionByName(feats).unionByName(tchunks)
    )
