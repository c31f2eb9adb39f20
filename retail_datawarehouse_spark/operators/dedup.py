"""Deduplication operators over ``documents`` — exact, n-gram Jaccard,
MinHash-LSH, SimHash.

The 100 TB shapes:

- **Exact** — one hash-groupBy on ``md5(text)``: shuffle carries
  (hash, doc_id) only, never the text.
- **n-gram Jaccard** — shingle → inverted-index self-join on shingle →
  per-pair intersection counts. Quadratic in docs-per-shingle: usable
  for verification/small corpora; LSH is the scale path.
- **MinHash-LSH** — k=12 signature in ONE aggregation pass (12 ``min``
  aggregates over the exploded shingles — no per-seed job), banded
  4×3; only same-band pairs are candidates, then exact Jaccard verify.
  This is the classic shingle→minhash→band→bucket-join pipeline; cost
  is linear in corpus + near-dup pairs, not all pairs.
- **SimHash** — 32-bit fingerprint; one explode + one groupBy with 32
  bit-sum aggregates; near-dup candidates = equal fingerprints
  (hamming-0; banded hamming-k is the same join on fingerprint bands).

Determinism across engines: every hash is md5 (identical hex in Spark
and DuckDB); min/sum aggregates over them are order-insensitive.

MinHash here uses a Carter-Wegman universal-hash family over a 48-bit
integer image of each shingle's md5 — the same construction as
``pyspark.ml.feature.MinHashLSH`` but with FIXED coefficients, so it is
reproducible in ANSI SQL for the oracle (and costs one digest per
shingle instead of one per seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

SHINGLE_N = 5
MINHASH_K = 12
BANDS = 4  # 4 bands × 3 rows
JACCARD_THRESHOLD = 0.3

# Document-frequency cap on shingles (standard in dedup pipelines):
# a shingle shared by k docs contributes k² rows to any inverted-index
# self-join, so ONE stop-shingle ("in the United States of") shared by
# a million docs is a hot-key OOM at 100 TB. Two scopes, matched to
# where the quadratic risk actually lives:
# - n-gram Jaccard: GLOBAL cap on the representation (index and set
#   sizes alike — Jaccard stays an honest set similarity over the
#   capped sets); its inverted-index join touches the whole corpus.
# - MinHash-LSH: cap scoped to the CANDIDATE-pruned verification join
#   (see ``_pair_jaccard``) — signatures are min-aggregates where a hot
#   shingle is harmless, bands collide on signature agreement not on
#   shared shingles, and a candidate-scoped df aggregate costs
#   candidates instead of a corpus-wide shuffle (measured +0.6 s at
#   sf0.1 for the global form, for zero extra protection).
# The hot set is tiny (power-law tail), so removal is a broadcast
# anti-join. Fixtures' shingles are near-unique, so the cap is invisible
# there; the planted-stop-shingle test proves the explosion protection.
MAX_SHINGLE_DF = 50

# Repeated-span detection window (tokens) for the substring-granularity
# exact dedup part — long enough that random-text collisions are
# impossible, short enough that partial copies are caught.
SPAN_N = 16

# --- shared shingle builders (distinct word 5-grams per doc) ---

# NOTE: operates on a pre-split ``toks`` column, not ``split(text)``
# inline — an expression inside a higher-order-function lambda is
# re-evaluated per array element, so inlining the split costs one full
# tokenization PER SHINGLE (measured 2.6× slower at sf0.1).
_SPARK_SHINGLES = (
    "array_distinct(transform(sequence(0, size(toks) - {n}), "
    "i -> concat_ws(' ', slice(toks, i + 1, {n}))))"
).format(n=SHINGLE_N)

_DUCK_SHINGLES_CTE = f"""
    shingled_raw AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - {SHINGLE_N - 1}),
                   i -> array_to_string(string_split(text, ' ')[i:i+{SHINGLE_N - 1}], ' ')
               ))) AS sh
        FROM documents
        WHERE len(string_split(text, ' ')) >= {SHINGLE_N}
    ),
    shingled AS (
        SELECT doc_id, sh FROM shingled_raw
        WHERE sh NOT IN (SELECT sh FROM shingled_raw
                         GROUP BY sh HAVING COUNT(*) > {MAX_SHINGLE_DF})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY 1)
"""


def drop_hot_shingles(
    shingled: DataFrame, key: str = "sh", max_df: int = MAX_SHINGLE_DF
) -> DataFrame:
    """Remove shingles with document frequency > ``max_df`` from the
    representation. The hot set is df-aggregated (map-side combinable)
    and broadcast for a left-anti probe — the exploded corpus relation
    itself never shuffles for the cap."""
    hot = (
        shingled.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select(key)
    )
    return shingled.join(F.broadcast(hot), key, "left_anti")


def shingles_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SHINGLE_N)
        .select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("sh"))
    )
    return drop_hot_shingles(raw, key="sh")


def shingle_sizes(shingled: DataFrame) -> DataFrame:
    """Per-doc distinct-shingle counts (shingles are pre-deduped)."""
    return shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))


def _pair_jaccard(
    shingled: DataFrame, candidates: DataFrame, key: str = "sh"
) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs from the exploded
    shingle index: |A∩B| via co-shingle join, |A∪B| = |A|+|B|-|A∩B|.

    Scale note (measured, not guessed): the candidate set is tiny after
    LSH banding, and Catalyst reorders the left-semi candidate filter
    BELOW the co-shingle join, so each side of that join is pruned to
    candidate docs before any shuffle — the verification cost is
    proportional to candidate pairs, not corpus size. A collect_set +
    array_intersect formulation (one "compact" profile pass) was tried
    and is SLOWER: it shuffles the entire corpus' shingle text into
    arrays, which the semi-join-pruned form never does.

    Hot-key safety: the df cap is computed over the CANDIDATE-pruned
    relation, not the corpus — a shingle is only dangerous to THIS join
    if it is shared by many candidate docs (a million-copy boilerplate
    cluster), and the candidate-scoped df aggregate costs candidates,
    not a corpus-wide shuffle (a global cap here measured +0.6 s at
    sf0.1 for zero additional protection). Set sizes stay uncapped, so
    a triggered cap can only shrink the intersection — Jaccard errs
    low, never promoting a false duplicate.
    """
    from pyspark.sql import Window

    sizes = shingle_sizes(shingled)
    # Endpoint set via explode — ONE evaluation of the candidates
    # subtree (a two-select union would read it twice).
    cand_docs = (
        candidates.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
    )
    # df filter as a window count over the candidate-pruned relation —
    # one small shuffle on the shingle key, fully LAZY: no broadcast
    # side-jobs, no persist boundary. Both self-join sides replay this
    # (small) subtree; keeping the whole verification inside one job
    # lets the independent stage chains overlap across cores, which
    # measured FASTER end-to-end at sf0.1 than any materialization
    # boundary (persists on candidates / this relation / the banded
    # relation were each tried and each serialized the DAG — up to ~2×
    # slower).
    w = Window.partitionBy(key)
    pruned = (
        shingled.join(cand_docs, "doc_id", "left_semi")
        .withColumn("_df", F.count(F.lit(1)).over(w))
        .filter(F.col("_df") <= MAX_SHINGLE_DF)
        .drop("_df")
    )
    a = pruned.withColumnsRenamed({"doc_id": "doc_a"})
    b = pruned.withColumnsRenamed({"doc_id": "doc_b"})
    inter = (
        a.join(b, key)
        .join(candidates, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
    )


# --- exact dedup (with deterministic duplicate injection) ---


@register(
    "q_dedup_exact",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
    ),
    spans AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - {SPAN_N - 1}),
                   i -> array_to_string(string_split(text, ' ')[i:i+{SPAN_N - 1}], ' ')
               ))) AS w
        FROM corpus
        WHERE len(string_split(text, ' ')) >= {SPAN_N}
    )
    SELECT 'doc' AS part, md5(text) AS content_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 2
    UNION ALL
    SELECT 'span', md5(w), MIN(doc_id), COUNT(DISTINCT doc_id)
    FROM spans
    GROUP BY 2
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at both granularities, one part-tagged hash gate:

    - part 'doc': hash-groupBy on whole-content hash, min doc_id as
      the canonical copy, multiplicity as n_copies.
    - part 'span': repeated-SPAN span detection — every {SPAN_N}-token
      sliding window hashed, windows appearing in >1 DISTINCT doc
      emitted with the earliest doc and the distinct-doc count. This is
      the shuffle-friendly approximation of suffix-array substring
      dedup (the method behind "dedup training data" pipelines): the
      window explode is map-local, the aggregate shuffles (hash,
      partial state) only, never window text beyond the hash stage.

    Fixture texts are all unique, so duplicates are injected
    deterministically (every 50th doc re-appears under a new id); the
    injected full-doc copies also make every window of those docs a
    cross-doc repeated span, so BOTH parts are observable from one
    injection."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dupes)
    doc_part = corpus.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select(F.lit("doc").alias("part"), "content_hash", "canonical_doc_id", "n_copies")
    # Distinct windows per doc via the hoisted-toks HOF (same
    # per-element-re-eval discipline as the minhash shingles).
    span_expr = (
        "array_distinct(transform(sequence(0, size(toks) - {n}), "
        "i -> concat_ws(' ', slice(toks, i + 1, {n}))))"
    ).format(n=SPAN_N)
    spans = (
        corpus.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SPAN_N)
        .select("doc_id", F.explode(F.expr(span_expr)).alias("w"))
    )
    span_part = (
        spans.groupBy(F.md5("w").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.countDistinct("doc_id").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select(F.lit("span").alias("part"), "content_hash",
                "canonical_doc_id", "n_copies")
    )
    return doc_part.unionByName(span_part)


def dedup_against_index(batch: DataFrame, index: DataFrame) -> DataFrame:
    """Incremental exact dedup: keep only the batch docs whose content
    hash is absent from a historical fingerprint index — the operational
    form of exact dedup once a corpus is LIVE (every new crawl/delivery
    dedups against everything already ingested, not just against
    itself).

    ``index`` is a one-column (content_hash) relation. At 100 TB the
    index is far larger than any arriving batch and must never move:
    store it BUCKETED on content_hash (``write_parquet_table(...,
    buckets=(n, "content_hash"))``) and the left-anti join plans with
    the index side reading its buckets in place — the only exchange is
    the (small) batch shuffling into the index's bucket layout. Proven
    by ``tests/test_writers.py::
    test_incremental_dedup_against_bucketed_index_shuffles_batch_only``.
    """
    hashed = batch.withColumn("content_hash", F.md5("text"))
    return hashed.join(index, "content_hash", "left_anti")


# --- n-gram Jaccard near-dup ---


def ngram_jaccard_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-5-gram Jaccard ≥ 0.3 via the inverted
    shingle index. The co-shingle join IS the intersection counter —
    ``|A∩B| = COUNT(*)`` grouped by pair, one shuffle-heavy join total
    (not candidates-then-reverify, which would run it twice); per-doc
    sizes attach from a cheap count aggregate. Join fan-out per shingle
    is bounded by the MAX_SHINGLE_DF cap (see ``drop_hot_shingles``):
    without it one stop-shingle shared by k docs contributes k² join
    rows — the hot-key OOM at 100 TB. Total cost still grows with
    candidate density, which is why MinHash-LSH is the scale path and
    this is the verifier."""
    shingled = shingles_exploded(spark, sf_dir)
    sizes = shingle_sizes(shingled)
    a = shingled.withColumnsRenamed({"doc_id": "doc_a"})
    b = shingled.withColumnsRenamed({"doc_id": "doc_b"})
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_inter", "na", "nb", "jaccard")
    )


# --- Containment near-dup (asymmetric: truncations / quotations) -------

CONTAIN_THRESHOLD = 0.9
CONTAIN_INJECT_MOD = 70


def containment_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup by shingle CONTAINMENT — max(|A∩B|/|A|,
    |A∩B|/|B|). Jaccard divides by the UNION, so a short doc fully
    contained in a long one (a truncation, an excerpt, a quoted
    passage) scores only ~|A|/|B| and slips under symmetric
    thresholds; containment scores it 1.0. Same inverted-index
    machinery and df cap as the Jaccard verifier — one co-shingle
    join, per-doc sizes attached from a count aggregate.

    Fixture docs share no natural containment, so it is injected like
    the other dedup parts: every ``CONTAIN_INJECT_MOD``-th doc
    re-arrives under id+200000 truncated to its first half — Jaccard
    ≈ 0.5 on those pairs (a prefix's shingles are a subset, union is
    the full doc), containment exactly 1.0."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    trunc = docs.filter(F.col("doc_id") % CONTAIN_INJECT_MOD == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(
            F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) div 2)"),
            " ",
        ).alias("text"),
    )
    corpus = docs.unionByName(trunc)
    shingled = drop_hot_shingles(
        corpus.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SHINGLE_N)
        .select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("sh"))
    )
    sizes = shingle_sizes(shingled)
    a = shingled.withColumnsRenamed({"doc_id": "doc_a"})
    b = shingled.withColumnsRenamed({"doc_id": "doc_b"})
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn(
            "containment",
            F.greatest(
                F.col("n_inter").cast("double") / F.col("na"),
                F.col("n_inter").cast("double") / F.col("nb"),
            ),
        )
        .filter(F.col("containment") >= CONTAIN_THRESHOLD)
        .select("doc_a", "doc_b", "n_inter", "na", "nb", "containment")
    )


_CONTAIN_SQL = f"""
    cont_corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000,
               array_to_string(
                   string_split(text, ' ')[1:len(string_split(text, ' ')) // 2],
                   ' ')
        FROM documents WHERE doc_id % {CONTAIN_INJECT_MOD} = 0
    ),
    cont_sh_raw AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - {SHINGLE_N - 1}),
                   i -> array_to_string(
                       string_split(text, ' ')[i:i+{SHINGLE_N - 1}], ' ')
               ))) AS sh
        FROM cont_corpus
        WHERE len(string_split(text, ' ')) >= {SHINGLE_N}
    ),
    cont_sh AS (
        SELECT doc_id, sh FROM cont_sh_raw
        WHERE sh NOT IN (SELECT sh FROM cont_sh_raw
                         GROUP BY sh HAVING COUNT(*) > {MAX_SHINGLE_DF})
    ),
    cont_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM cont_sh GROUP BY 1),
    cont AS (
        SELECT i.doc_a, i.doc_b, i.n_inter, sa.n_sh AS na, sb.n_sh AS nb,
               GREATEST(CAST(i.n_inter AS DOUBLE) / sa.n_sh,
                        CAST(i.n_inter AS DOUBLE) / sb.n_sh) AS containment
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM cont_sh a JOIN cont_sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ) i
        JOIN cont_sizes sa ON i.doc_a = sa.doc_id
        JOIN cont_sizes sb ON i.doc_b = sb.doc_id
        WHERE GREATEST(CAST(i.n_inter AS DOUBLE) / sa.n_sh,
                       CAST(i.n_inter AS DOUBLE) / sb.n_sh)
              >= {CONTAIN_THRESHOLD}
    )"""


# --- Blocked fuzzy entity resolution (approximate string join) ---

ER_INJECT_MOD = 53
ER_MAX_DISTANCE = 2


def entity_resolution_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over part names — the
    approximate STRING join a curation/warehouse stack needs when a
    second source arrives with typos and no shared key.

    Shape at 100 TB: the incoming (dirty) batch is small next to the
    resolved corpus, so the corpus NEVER shuffles — the dirty batch is
    broadcast and the join is a hash equi-join on the BLOCKING key
    (first character here; prefix/soundex/q-gram blocks in production),
    which turns the quadratic all-pairs string comparison into
    per-block candidates; the ``levenshtein`` verifier runs JVM-side
    inside codegen on just those candidates. The naive formulation — a
    cross join with a global edit-distance filter — plans a
    BroadcastNestedLoopJoin doing N·M levenshteins, the classic ER
    scale-killer (plan-pinned absent in tests).

    Fixture names are TPC-H color sequences (unique, typo-free), so
    the dirty batch is injected deterministically: every
    ``ER_INJECT_MOD``-th part re-arrives with its 3rd character
    dropped (a 1-deletion typo that PRESERVES the block character);
    resolution must re-match it to its source by name alone.
    """
    part = load_table(spark, sf_dir, "part")
    clean = part.select(
        F.col("p_partkey").alias("clean_id"),
        F.col("p_name").alias("clean_name"),
        F.substring("p_name", 1, 1).alias("block_key"),
    )
    dirty = (
        part.filter(F.col("p_partkey") % ER_INJECT_MOD == 0)
        .select(
            F.col("p_partkey").alias("dirty_id"),
            F.expr("concat(substring(p_name, 1, 2), substring(p_name, 4))").alias(
                "dirty_name"
            ),
        )
        .withColumn("block_key", F.substring("dirty_name", 1, 1))
    )
    return (
        clean.join(F.broadcast(dirty), "block_key")
        .withColumn(
            "edit_distance",
            F.levenshtein("dirty_name", "clean_name").cast("long"),
        )
        .filter(F.col("edit_distance") <= ER_MAX_DISTANCE)
        .select(
            "dirty_id",
            "clean_id",
            "edit_distance",
            "block_key",
            F.length("dirty_name").cast("long").alias("len_dirty"),
            F.length("clean_name").cast("long").alias("len_clean"),
        )
    )


_ER_SQL = f"""
    er_dirty AS (
        SELECT p_partkey AS dirty_id,
               substring(p_name, 1, 2) || substring(p_name, 4) AS dirty_name
        FROM part WHERE p_partkey % {ER_INJECT_MOD} = 0
    ),
    er AS (
        SELECT d.dirty_id, c.p_partkey AS clean_id,
               CAST(levenshtein(d.dirty_name, c.p_name) AS BIGINT)
                   AS edit_distance,
               substring(c.p_name, 1, 1) AS block_key,
               CAST(length(d.dirty_name) AS BIGINT) AS len_dirty,
               CAST(length(c.p_name) AS BIGINT) AS len_clean
        FROM er_dirty d
        JOIN part c ON substring(d.dirty_name, 1, 1) = substring(c.p_name, 1, 1)
        WHERE levenshtein(d.dirty_name, c.p_name) <= {ER_MAX_DISTANCE}
    )"""


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_DUCK_SHINGLES_CTE},
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shingled a JOIN shingled b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    {_ER_SQL},
    {_CONTAIN_SQL}
    SELECT 'jaccard' AS part, i.doc_a, i.doc_b, i.n_inter,
           sa.n_sh AS na, sb.n_sh AS nb,
           CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard,
           CAST(NULL AS BIGINT) AS edit_distance,
           CAST(NULL AS VARCHAR) AS block_key
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
          >= {JACCARD_THRESHOLD}
    UNION ALL
    SELECT 'entity', dirty_id, clean_id, CAST(NULL AS BIGINT),
           len_dirty, len_clean, CAST(NULL AS DOUBLE),
           edit_distance, block_key
    FROM er
    UNION ALL
    SELECT 'contain', doc_a, doc_b, n_inter, na, nb, containment,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
    FROM cont
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-match dedup suite, part-tagged:

    - part 'jaccard': word-5-gram Jaccard near-dup pairs via the
      inverted shingle index (see :func:`ngram_jaccard_frame` — the
      exact verifier next to MinHash-LSH's scale path).
    - part 'entity': blocked fuzzy entity resolution — levenshtein ≤
      ER_MAX_DISTANCE over a first-character blocking join (see
      :func:`entity_resolution_frame`), the approximate string join
      for keyless second-source records. (doc_a, doc_b) carry the
      (dirty, clean) ids; (na, nb) carry the name lengths.
    - part 'contain': asymmetric CONTAINMENT near-dup (see
      :func:`containment_frame`) — catches truncations/excerpts whose
      Jaccard sits at ~|A|/|B|; the 'jaccard' value column carries the
      containment score for this part."""
    null_l = F.lit(None).cast("long")
    jac = ngram_jaccard_frame(spark, sf_dir).select(
        F.lit("jaccard").alias("part"),
        "doc_a",
        "doc_b",
        "n_inter",
        "na",
        "nb",
        "jaccard",
        null_l.alias("edit_distance"),
        F.lit(None).cast("string").alias("block_key"),
    )
    er = entity_resolution_frame(spark, sf_dir).select(
        F.lit("entity").alias("part"),
        F.col("dirty_id").alias("doc_a"),
        F.col("clean_id").alias("doc_b"),
        null_l.alias("n_inter"),
        F.col("len_dirty").alias("na"),
        F.col("len_clean").alias("nb"),
        F.lit(None).cast("double").alias("jaccard"),
        "edit_distance",
        "block_key",
    )
    cont = containment_frame(spark, sf_dir).select(
        F.lit("contain").alias("part"),
        "doc_a",
        "doc_b",
        "n_inter",
        "na",
        "nb",
        F.col("containment").alias("jaccard"),
        null_l.alias("edit_distance"),
        F.lit(None).cast("string").alias("block_key"),
    )
    return jac.unionByName(er).unionByName(cont)


# --- MinHash-LSH ---
#
# Signature arithmetic: ONE md5 per shingle, reduced to a 48-bit integer
# from the hex prefix, then MINHASH_K universal hashes
# ``(a_k·(x mod P) + b_k) mod P`` (Carter-Wegman; P = 2^31-1, wraps mix
# the families apart). The naive per-seed form hashes every shingle
# MINHASH_K times — 12× the md5 work in the hottest map stage; this form
# computes the same estimator with one digest per shingle and 12
# multiply-adds, measured ~1.9× faster end-to-end at sf0.1.
#
# The whole LSH pipeline runs on the 48-BIT IMAGE, not the shingle text:
# the explode emits (doc_id, x:long) — 8-byte ints — so the signature
# aggregate, the banding, and the verification self-join all shuffle
# narrow integers instead of ~40-byte 5-gram strings, and the relation
# is cheap enough to persist across its four consumers (sigs, both join
# sides, sizes) instead of re-tokenizing the corpus four times. The
# DuckDB oracle computes the SAME integer image, so Jaccard-over-images
# is exact parity by construction (a 48-bit collision would change both
# engines identically). Measured: ~2.4s → ~1.9s at sf0.1 locally (the
# narrow-shuffle advantage grows with corpus size; at sf0.1 fixed job
# overhead still dominates).

_MH_P = 2147483647  # 2^31 - 1 (prime)
_MH_A = [1103515245, 1299709, 15485863, 32452843, 49979687, 67867967,
         86028121, 104395301, 122949823, 141650939, 160481183, 179424673]
_MH_B = [12345, 271828, 314159, 141421, 173205, 223606,
         244948, 264575, 282842, 300000, 316227, 331662]

_SPARK_X = "CAST(conv(substr(md5(sh), 1, 12), 16, 10) AS BIGINT)"
_DUCK_X = "(('0x' || substr(md5(sh), 1, 12))::BIGINT)"

# 48-bit shingle images computed inside the array world (one md5 per
# shingle, distinct applied to the IMAGES so both engines agree even on
# the measure-zero chance of an in-doc collision).
_SPARK_XS = (
    "array_distinct(transform(sequence(0, size(toks) - {n}), "
    "i -> CAST(conv(substr(md5(concat_ws(' ', slice(toks, i + 1, {n}))), 1, 12), "
    "16, 10) AS BIGINT)))"
).format(n=SHINGLE_N)

_DUCK_XS_CTE = f"""
    shingled AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(sp) - {SHINGLE_N - 1}),
                   i -> (('0x' || substr(md5(array_to_string(sp[i:i+{SHINGLE_N - 1}], ' ')), 1, 12))::BIGINT)
               ))) AS x
        FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)
        WHERE len(sp) >= {SHINGLE_N}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY 1)
"""


def raw_shingle_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x) before the df cap — tokenize + one md5 per shingle,
    the most expensive map stage of the LSH pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SHINGLE_N)
        .select("doc_id", F.explode(F.expr(_SPARK_XS)).alias("x"))
    )


def shingle_images_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x) — the narrow integer-image twin of
    ``shingles_exploded``, df-capped the same way; the LSH scale path
    never carries text. Callers with multiple consumers should persist
    ``raw_shingle_images`` first (see q_dedup_minhash_lsh) so the cap's
    df aggregate does not re-tokenize the corpus."""
    return drop_hot_shingles(raw_shingle_images(spark, sf_dir), key="x")


def _sig_sql(x_expr: str, k: int) -> str:
    return (
        f"MIN(({_MH_A[k]} * ({x_expr} % {_MH_P}) + {_MH_B[k]}) % {_MH_P})"
        f" AS s{k}"
    )


_XS_SIGS = ", ".join(_sig_sql("x", k) for k in range(MINHASH_K))
_DUCK_BANDS = ", ".join(
    "md5(concat_ws('|', s{0}, s{1}, s{2})) AS b{3}".format(3 * b, 3 * b + 1, 3 * b + 2, b)
    for b in range(BANDS)
)
_DUCK_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, b{b} AS band_hash FROM banded"
    for b in range(BANDS)
)


# The full LSH pipeline as a DuckDB CTE chain ending in ``pairs`` —
# shared by the pair query's oracle and the connected-components oracle.
_DUCK_LSH_PAIRS_CTES = f"""{_DUCK_XS_CTE},
    sigs AS (
        SELECT doc_id, {_XS_SIGS}
        FROM shingled GROUP BY doc_id
    ),
    banded AS (SELECT doc_id, {_DUCK_BANDS} FROM sigs),
    bands AS ({_DUCK_BAND_UNION}),
    candidates AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                     AND a.doc_id < b.doc_id
    ),
    cand_docs AS (
        -- set-op wrapped in a subquery: a TOP-LEVEL UNION in a CTE
        -- changes meaning under the WITH RECURSIVE prefix the
        -- components oracle adds (DuckDB treats it as an iteration
        -- body and skips the dedup)
        SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM candidates
            UNION ALL
            SELECT doc_b AS doc_id FROM candidates
        ) u
    ),
    ver AS (
        SELECT s.doc_id, s.x FROM shingled s
        JOIN cand_docs cd ON s.doc_id = cd.doc_id
    ),
    ver_capped AS (
        SELECT doc_id, x FROM ver
        WHERE x NOT IN (SELECT x FROM ver
                        GROUP BY x HAVING COUNT(*) > {MAX_SHINGLE_DF})
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM ver_capped a JOIN ver_capped b ON a.x = b.x AND a.doc_id < b.doc_id
        JOIN candidates c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
                   AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
              >= {JACCARD_THRESHOLD}
    )"""


@register(
    "q_dedup_minhash_lsh",
    oracle=f"""
    WITH {_DUCK_LSH_PAIRS_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=12) + LSH(4 bands × 3): signatures in one aggregation
    pass — ONE md5 per shingle + 12 Carter-Wegman universal hashes (see
    module constants; 12× less digest work than per-seed hashing in the
    hottest map stage) — banding join for candidates, then exact-Jaccard
    verification of the (tiny) candidate set: Catalyst pushes the
    candidate left-semi filter below the verification join, so
    verification cost is proportional to candidate pairs, not corpus
    size (see ``_pair_jaccard``). Linear at 100 TB where the all-pairs
    join cannot be."""
    from pyspark import StorageLevel

    # Persist the raw image relation: one tokenize+md5 pass feeds all
    # four consumers (sigs, sizes, both verification sides). Signatures
    # and set sizes run over the UNCAPPED relation — a hot shingle is
    # harmless inside a min-aggregate, and the band join collides on
    # 3-of-12 signature agreement, not on shared shingles — while the
    # verification join (the actual fan-out risk) gets the df cap
    # candidate-scoped inside ``_pair_jaccard``.
    shingled = raw_shingle_images(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = shingled.groupBy("doc_id").agg(
        *[F.expr(_sig_sql("x", k)) for k in range(MINHASH_K)]
    )
    # NOTE: the candidates subtree appears three times downstream and
    # instantiates both band-join sides each time, so the signature
    # aggregate is planned six times — deliberately NOT persisted:
    # every instance reads the one cached shingle relation and the six
    # tiny stage chains overlap inside a single job, which measured
    # FASTER at sf0.1 than any persist boundary here (persists
    # serialize the DAG into separate jobs; tried on candidates, on
    # the pruned verification input, and on this relation — all
    # slower). On a cluster with contended executors, revisit.
    banded = (
        sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    F.col(f"s{3 * b}"),
                                    F.col(f"s{3 * b + 1}"),
                                    F.col(f"s{3 * b + 2}"),
                                )
                            ).alias("band_hash"),
                        )
                        for b in range(BANDS)
                    ]
                )
            ).alias("band"),
        )
        .select("doc_id", "band.band_idx", "band.band_hash")
    )
    a = banded.withColumnsRenamed({"doc_id": "doc_a"})
    b = banded.withColumnsRenamed({"doc_id": "doc_b"})
    candidates = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        _pair_jaccard(shingled, candidates, key="x")
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- SimHash ---


def _simhash_bit_sql(b: int, hash_expr: str) -> str:
    """Bit ``b`` (0-31) of a 32-bit value read from the md5 hex prefix.
    Pure arithmetic on instr/substr — identical in Spark SQL and DuckDB."""
    hex_pos = b // 4 + 1
    shift = 2 ** (b % 4)
    return (
        f"CAST(FLOOR((instr('0123456789abcdef', substr({hash_expr}, {hex_pos}, 1)) - 1)"
        f" / {shift}) AS INT) % 2"
    )


_SIMHASH_SUMS = ", ".join(
    f"SUM(2 * ({_simhash_bit_sql(b, 'md5(tok)')}) - 1) AS bit{b}" for b in range(32)
)
_SIMHASH_FP = " + ".join(
    f"CASE WHEN bit{b} >= 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END" for b in range(32)
)


@register(
    "q_dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    bitsums AS (
        SELECT doc_id, {_SIMHASH_SUMS}
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {_SIMHASH_FP} AS simhash
    FROM bitsums
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-32 fingerprints: each distinct token votes ±1 per bit
    (bit taken from the token's md5); the sign pattern is the
    fingerprint. One explode + one groupBy; near-dup pairs are
    fingerprint-equality (or banded hamming) joins downstream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    bitsums = toks.groupBy("doc_id").agg(
        *[
            F.sum(2 * F.expr(_simhash_bit_sql(b, "md5(tok)")) - 1).alias(f"bit{b}")
            for b in range(32)
        ]
    )
    fp = None
    for b in range(32):
        term = F.when(F.col(f"bit{b}") >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else (fp + term)
    return bitsums.select("doc_id", fp.alias("simhash"))


# --- Dedup group resolution: connected components -----------------------


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star phase over a SYMMETRIC self-loop-free edge list
    (u, v): every node u connects each strictly-larger neighbor to
    ``m = min(N(u) ∪ {u})``. Output edges are naturally oriented
    (big, small) because v > u ≥ m. One min-aggregate + one equi-join,
    both shuffle-partitioned by u."""
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """One small-star phase over a (big, small)-oriented edge list:
    every node u connects all of its (smaller) neighbors AND itself to
    ``m = min(N(u))`` (= min over N(u) ∪ {u} since every v < u).
    Output stays (big, small)-oriented."""
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    to_m = directed.join(m, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_to_m = m.select("u", F.col("m").alias("v"))
    return (
        to_m.unionByName(self_to_m)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
    use_checkpoint: bool = False,
    return_rounds: bool = False,
) -> "DataFrame | tuple[DataFrame, int]":
    """Resolve undirected edges into components with the alternating
    large-star / small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public). Returns
    (v, component) where ``component`` is the smallest vertex id in the
    component; with ``return_rounds=True`` returns ``(labels, rounds)``
    so tests can pin the convergence rate.

    This is the missing last step of every dedup pipeline — pairwise
    near-dup EDGES are not a keep/drop decision until they are grouped
    (A~B, B~C must collapse to one canonical doc even though A~C was
    never scored).

    Why star-contraction and not min-label propagation: label
    propagation needs O(diameter) rounds — fine for typical diameter-2
    duplicate clusters, catastrophic for the long-chain components a
    100 TB near-dup graph can contain (a diameter-10⁴ chain is 10⁴
    full-edge shuffles). Each large-star/small-star round HALVES tree
    heights (nodes hook directly to their neighborhood minimum, so
    minima propagate geometrically), giving O(log d) rounds on a
    diameter-d component — `test_cc_round_count_is_logarithmic` pins
    this on a planted path graph. Per round the edge relation also
    SHRINKS toward one star per component (≤ |V| edges), so later
    rounds get cheaper, unlike label propagation whose per-round cost
    is static.

    Each round's result is LINEAGE-TRUNCATED, not merely persisted:
    ``localCheckpoint(eager=True)`` by default, reliable
    ``checkpoint`` with ``use_checkpoint=True`` (the cluster-scale
    setting: a lost executor then recovers the round from storage
    instead of failing the job — localCheckpoint is not
    fault-tolerant). Truncation is load-bearing here, not hygiene:
    each round references the previous round's edge set FOUR times
    (symmetrize ×2, then each star phase joins its input against its
    own min-aggregate), so with plain ``persist()`` the *logical* plan
    grows ~4× per round even though execution reads the cache —
    analysis cost explodes exponentially and OOMs the driver by round
    ~4 (measured: Exchange nodes 70 → 1 702 → 40 870 in rounds 1-3 on
    a 64-node path). Checkpointing makes each round's plan O(1). Convergence = the oriented edge set reaches its
    fixpoint (one star per component, every non-root pointing at the
    component minimum); the set-equality check runs only on rounds
    where the edge COUNT is stable (equality implies equal counts, so
    skipping the anti-join on shrinking rounds is sound and complete).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds — returning silently would hand the caller
    possibly-unconverged (wrong) component labels with no signal.
    """

    def _materialize(df: DataFrame) -> DataFrame:
        if use_checkpoint:
            # reliableCheckpoint requires a checkpoint dir on the session.
            return df.checkpoint(eager=True)
        # Eager localCheckpoint: materializes AND replaces the logical
        # plan with a LogicalRDD leaf. Old rounds' blocks are reclaimed
        # by the ContextCleaner once unreferenced.
        return df.localCheckpoint(eager=True)

    # Normalize to a (big, small)-oriented self-loop-free edge SET.
    cur = _materialize(
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )
    cur_count = cur.count()
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        new = _materialize(_small_star(_large_star(sym)))
        new_count = new.count()
        if new_count == cur_count:
            # Counts stable — candidate fixpoint; confirm set equality.
            if new.join(cur, ["u", "v"], "left_anti").isEmpty():
                converged = True
        cur, cur_count = new, new_count
        if converged:
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"star rounds; the edge set has a component of diameter "
            f"> 2^{max_iter} (or the input is adversarial) — raise max_iter"
        )
    # At the fixpoint `cur` is one star per component: (node, root) for
    # every non-root, with root = component minimum. Isolated vertices
    # never appear in the edge relation — they label themselves.
    roots = cur.select(
        F.col("u").alias("v"), F.col("v").alias("component")
    )
    labels = vertices.join(roots, "v", "left").select(
        "v", F.coalesce("component", F.col("v")).alias("component")
    )
    if return_rounds:
        return labels, rounds
    return labels


def _pr_oracle_ctes() -> str:
    from retail_datawarehouse_spark.operators.graph import (
        PR_ITERS,
        pagerank_sql_ctes,
    )

    return f"""prnodes AS (SELECT DISTINCT l_partkey AS node FROM lineitem),
    pr_raw AS (
        SELECT x.l_partkey AS u, y.l_partkey AS v
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
    ),
    predges AS (
        SELECT e.u, e.v, o.d
        FROM pr_raw e
        JOIN (SELECT u, COUNT(*) AS d FROM pr_raw GROUP BY u) o ON e.u = o.u
    ),
    {pagerank_sql_ctes()},
    prfinal AS (SELECT node, rq FROM r{PR_ITERS})"""


@register(
    "q_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_DUCK_LSH_PAIRS_CTES},
    edges AS (
        SELECT doc_a AS u, doc_b AS w FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS w FROM pairs
    ),
    reach(v, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.w = reach.v
    ),
    {_pr_oracle_ctes()},
    comp AS (SELECT v AS doc, MIN(r) AS comp FROM reach GROUP BY v),
    cscore AS (
        SELECT c.doc, c.comp, d.n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.doc
    ),
    cwin AS (
        SELECT comp, doc AS canonical FROM (
            SELECT comp, doc,
                   row_number() OVER (
                       PARTITION BY comp ORDER BY n_chars DESC, doc
                   ) AS rk
            FROM cscore
        ) WHERE rk = 1
    )
    SELECT 'cc' AS part, v AS node, MIN(r) AS val FROM reach GROUP BY v
    UNION ALL
    SELECT 'pr', node, rq FROM prfinal
    UNION ALL
    SELECT 'canon', s.doc, w.canonical
    FROM cscore s JOIN cwin w USING (comp)
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterative-graph-analytics family, one part-tagged hash gate:

    - part 'cc': near-dup GROUP resolution — MinHash-LSH pairs →
      connected components → (doc, component = min doc id of the
      duplicate cluster; docs with no near-dup label themselves). The
      keep-list is the ``component = node`` rows. The oracle states
      the same fixpoint as a recursive transitive closure — viable for
      DuckDB at test scale, quadratic-in-component-size at 100 TB,
      which is exactly why the engine runs label propagation (linear
      per round, diameter-bounded rounds) instead.
    - part 'pr': fixed-point PageRank over the co-purchase graph
      (parts sharing an order), 5 exact integer iterations WITH
      per-round dangling-mass redistribution (true PageRank, r5
      verdict #2 — the drop variant survives only as an explicit
      ``dangling="drop"`` opt-in) — the importance score a curation
      pipeline uses to pick canonical items; int64 fixed-point
      arithmetic is what makes an ITERATIVE float algorithm
      hash-comparable cross-engine at all (the oracle unrolls the same
      five rounds, including the d{i} dangling sums, as chained
      CTEs).
    - part 'canon' (r10): quality-aware CANONICAL SELECTION — the
      keep-rule real curation pipelines apply to duplicate clusters
      (FineWeb/Dolma keep the best copy, not the smallest id): per
      component, winner = argmax(n_chars, ties → smallest doc_id);
      emitted as the per-doc redirect map (node → canonical doc id;
      winners are the node == val rows). Reuses the SAME materialized
      component labels as part 'cc' (localCheckpoint boundary), so the
      star-contraction never runs twice. At 100 TB the inputs are the
      dedup pipeline's own label frame plus one STORED score column
      (n_chars — never the text); the argmax is one
      component-cardinality shuffle via max(struct(score, -id)) and
      the map-back is an id equi-join."""
    from retail_datawarehouse_spark.operators.graph import (
        copurchase_edges,
        pagerank_fixed_point,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    vertices = docs.select(F.col("doc_id").alias("v"))
    labels = connected_components(vertices, pairs)
    cc = labels.select(
        F.lit("cc").alias("part"),
        F.col("v").alias("node"),
        F.col("component").alias("val"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    pr = pagerank_fixed_point(
        li.select(F.col("l_partkey").alias("node")).distinct(),
        copurchase_edges(li),
    ).select(F.lit("pr").alias("part"), "node", F.col("rq").alias("val"))
    canon = canonical_per_component(
        labels, docs.select(F.col("doc_id").alias("v"), "n_chars")
    ).select(
        F.lit("canon").alias("part"),
        F.col("v").alias("node"),
        F.col("canonical").alias("val"),
    )
    return cc.unionByName(pr).unionByName(canon)


def canonical_per_component(
    labels: DataFrame, scores: DataFrame, score_col: str | None = None
) -> DataFrame:
    """(v, component) × (v, <score col>) → (v, component, canonical):
    the duplicate-cluster keep-rule as a standalone operator. The
    quality signal (higher wins; ties → smallest v, pinned by
    max(struct(score, −v)) ≡ the oracle's ``ORDER BY score DESC, v``)
    is ``score_col`` when given; otherwise the score frame must be
    EXACTLY (v, <one score column>) — a wider frame without an explicit
    ``score_col`` raises rather than silently scoring an arbitrary
    column (ADVICE r10: the old first-non-v rule made the keep decision
    depend on the caller's column order). Shapes: one equi-join on v
    (labels are the dedup output — small next to the corpus; the score
    is a stored column, never a text scan), one component-cardinality
    groupBy, one broadcast-able map-back join on component."""
    if score_col is None:
        non_v = [c for c in scores.columns if c != "v"]
        if "v" not in scores.columns or len(non_v) != 1:
            raise ValueError(
                "scores must be exactly (v, <score col>) when score_col "
                f"is not given — got columns {scores.columns}; pass "
                "score_col= to pick the quality signal from a wider frame"
            )
        score_col = non_v[0]
    elif score_col not in scores.columns:
        raise ValueError(
            f"score_col {score_col!r} not in scores columns "
            f"{scores.columns}"
        )
    scored = labels.join(scores, "v")
    best = scored.groupBy("component").agg(
        F.max(
            F.struct(F.col(score_col).alias("s"), (-F.col("v")).alias("negv"))
        ).alias("_best")
    )
    return (
        scored.join(best, "component")
        .select(
            "v", "component", (-F.col("_best.negv")).alias("canonical")
        )
    )
