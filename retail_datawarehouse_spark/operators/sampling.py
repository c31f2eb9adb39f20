"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is the wrong tool for dataset curation:
it is seed- and partitioning-dependent, so the same document can land
in train on one run and test on the next — silent leakage. Every
operator here derives its randomness from a **content-stable hash of
the key** (md5 → hex prefix), so membership is a pure function of the
row: reproducible across runs, engines, cluster sizes, and data
re-partitioning, and joinable months later to answer "which split was
this doc in?".

Scale shape: the hash is a JVM-side built-in projected in the scan
stage (no shuffle for split assignment at all); quota sampling is one
window top-k per group (WindowGroupLimit — no group fully sorted).

The same md5-prefix trick is the portable twin of ``xxhash64 % N``
(which Spark has but the SQL oracle does not) — at 100 TB you would
swap in xxhash64 for speed; the semantics and tests stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

# Hex-prefix thresholds over the first two md5 chars (256 buckets):
# 'cc' = 204/256 ≈ 80% train, 'e6' = 230/256 → next ~10% val, rest test.
TRAIN_MAX_HEX = "cc"
VAL_MAX_HEX = "e6"

QUOTA_PER_SOURCE = 30


_SPLIT_ASSIGN_SQL = f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_MAX_HEX}'
                     THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_MAX_HEX}'
                     THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment (~80/10/10): the split is
    a deterministic function of md5(doc_id), never of seed, partition
    count, or visit order — re-running on a re-sharded 100 TB corpus
    yields byte-identical membership, which is what makes the split
    auditable and leakage-provable."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        F.when(bucket < TRAIN_MAX_HEX, F.lit("train"))
        .when(bucket < VAL_MAX_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_QUOTA_SQL = f"""
    SELECT doc_id, source,
           CAST(row_number() OVER
               (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS pick
    FROM documents
    QUALIFY pick <= {QUOTA_PER_SOURCE}
"""


def q_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling (data-mixing caps: at most N docs per
    domain/source, chosen pseudo-randomly but reproducibly by hash
    order). One window top-k per source — Catalyst plans
    WindowGroupLimit, so no source's documents are ever fully sorted;
    the hash order makes the 'random' pick stable under re-sharding."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= QUOTA_PER_SOURCE)
    )


# 16 shards via the first md5 hex char; at 100 TB widen to the first k
# chars (16^k shards) so each shard's sort fits one executor.
N_SHARDS = 16
PACK_TOKEN_BUDGET = 256


def _shard_col() -> F.Column:
    # instr over the hex alphabet == parse one hex digit; identical
    # 1-based semantics to DuckDB's strpos, so the oracle matches
    # without engine-specific hex-conversion functions.
    return (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    ).cast("long")


_SHARD_SQL = (
    "CAST(strpos('0123456789abcdef',"
    " substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)"
)
_HASH_ORDER_SQL = "md5(CAST(doc_id AS VARCHAR)), doc_id"


@register(
    "q_corpus_shard",
    oracle=f"""
    SELECT doc_id,
           {_SHARD_SQL} AS shard,
           CAST(row_number() OVER
               (PARTITION BY {_SHARD_SQL} ORDER BY {_HASH_ORDER_SQL})
               AS BIGINT) AS pos
    FROM documents
    """,
)
def q_corpus_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding — how a pre-training
    corpus gets written: shard membership is a pure hash function of
    doc_id (a narrow projection, zero shuffles to assign), and the
    intra-shard position is pseudo-random-by-hash but reproducible, so
    two engines (or two runs over a re-partitioned 100 TB corpus)
    produce the identical shard files in the identical order. One
    shuffle total (the per-shard window sort); shard count is the
    scale knob — each shard sorts independently, so widen N_SHARDS
    until a shard fits an executor. Downstream:
    ``write.partitionBy("shard")`` with this order gives byte-stable
    training shards."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", _shard_col().alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               {_SHARD_SQL} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), runs AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER
                   (PARTITION BY shard ORDER BY {_HASH_ORDER_SQL}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS start_tok
        FROM toks
    )
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start_tok / {PACK_TOKEN_BUDGET}) AS BIGINT) AS seq_id,
           CAST(start_tok % {PACK_TOKEN_BUDGET} AS BIGINT) AS seq_offset
    FROM runs
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing: within each shard, docs
    are laid end-to-end in hash order and the stream is cut every
    PACK_TOKEN_BUDGET tokens; each doc reports the sequence it starts
    in and its token offset there. This is the standard LLM-pretraining
    packing discipline (no padding waste, deterministic layout)
    expressed as ONE running-sum window over the same per-shard sort
    the sharder already does — packing rides the sharding shuffle for
    free, and integer arithmetic makes the layout engine-exact (the
    oracle reproduces it to the token)."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id",
        _shard_col().alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    return (
        toks.withColumn("start_tok", start)
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.floor(F.col("start_tok") / PACK_TOKEN_BUDGET)
            .cast("long")
            .alias("seq_id"),
            (F.col("start_tok") % PACK_TOKEN_BUDGET).cast("long").alias("seq_offset"),
        )
    )


def _split_case_sql(key: str) -> str:
    return (
        f"CASE WHEN substr(md5(CAST({key} AS VARCHAR)), 1, 2) < '{TRAIN_MAX_HEX}'"
        f" THEN 'train'"
        f" WHEN substr(md5(CAST({key} AS VARCHAR)), 1, 2) < '{VAL_MAX_HEX}'"
        f" THEN 'val' ELSE 'test' END"
    )


def _register_leakage() -> None:
    # Deferred import: dedup also imports at package-init time; the
    # oracle text composes its LSH pair CTEs with the split derivation.
    from retail_datawarehouse_spark.operators.dedup import (
        _DUCK_LSH_PAIRS_CTES,
        q_dedup_minhash_lsh,
    )

    @register(
        "q_split_leakage_report",
        oracle=f"""
        WITH RECURSIVE {_DUCK_LSH_PAIRS_CTES},
        lk_edges AS (
            SELECT doc_a AS u, doc_b AS w FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS w FROM pairs
        ),
        lk_ends AS (
            -- set-op wrapped in a subquery (the cand_docs rule): a
            -- top-level UNION in a CTE is an iteration body under the
            -- WITH RECURSIVE prefix
            SELECT DISTINCT v FROM (
                SELECT doc_a AS v FROM pairs
                UNION ALL
                SELECT doc_b AS v FROM pairs
            ) u
        ),
        lk_reach(v, r) AS (
            SELECT v, v FROM lk_ends
            UNION
            SELECT e.u, lk_reach.r
            FROM lk_edges e JOIN lk_reach ON e.w = lk_reach.v
        ),
        lk_comp AS (
            SELECT v, MIN(r) AS component FROM lk_reach GROUP BY v
        )
        SELECT 'leak' AS part, doc_a AS node, doc_b AS peer, jaccard,
               {_split_case_sql('doc_a')} AS split_from,
               {_split_case_sql('doc_b')} AS split_to
        FROM pairs
        WHERE {_split_case_sql('doc_a')} <> {_split_case_sql('doc_b')}
        UNION ALL
        SELECT 'fixed', v, component, CAST(NULL AS DOUBLE),
               {_split_case_sql('v')}, {_split_case_sql('component')}
        FROM lk_comp
        """,
    )
    def q_split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Train/test contamination audit AND its remediation — the
        reason dedup and split assignment exist in the same engine:

        - part 'leak': near-dup pairs whose endpoints landed in
          DIFFERENT splits (a test doc nearly identical to a train doc
          inflates eval). Composes the LSH pair pipeline with the
          hash-derived split; both deterministic, so the report is
          reproducible evidence, not a sample.
        - part 'fixed' (r6): the component-aware reassignment that
          CLOSES the leak — every doc participating in a near-dup pair
          is re-split by the hash of its connected-component
          representative (star-contraction components over the pair
          graph, the q_dedup_components machinery), so a whole
          duplicate cluster lands in ONE split by construction. Emits
          (doc, component, old split, new split); the invariant that
          no remediated pair straddles splits is pinned by
          ``test_component_split_eliminates_leakage``.

        Scale shape: the components run is over PAIR ENDPOINTS only
        (duplicate docs, a vanishing fraction of the corpus), not the
        full vertex set — at 100 TB the graph input is the dedup
        pipeline's own candidate output, already bounded by banding +
        df caps."""
        from retail_datawarehouse_spark.operators.dedup import (
            connected_components,
        )

        pairs = q_dedup_minhash_lsh(spark, sf_dir)

        def split_of(col: str) -> F.Column:
            h = F.substring(F.md5(F.col(col).cast("string")), 1, 2)
            return (
                F.when(h < TRAIN_MAX_HEX, F.lit("train"))
                .when(h < VAL_MAX_HEX, F.lit("val"))
                .otherwise(F.lit("test"))
            )

        leak = (
            pairs.withColumn("split_from", split_of("doc_a"))
            .withColumn("split_to", split_of("doc_b"))
            .filter(F.col("split_from") != F.col("split_to"))
            .select(
                F.lit("leak").alias("part"),
                F.col("doc_a").alias("node"),
                F.col("doc_b").alias("peer"),
                "jaccard",
                "split_from",
                "split_to",
            )
        )
        ends = (
            pairs.select(F.col("doc_a").alias("v"))
            .unionByName(pairs.select(F.col("doc_b").alias("v")))
            .distinct()
        )
        # The labels frame still references the lazy `ends` subtree
        # (vertices join) — truncate it so the shipped plan carries one
        # leaf for the 'fixed' part instead of re-inlining the LSH pair
        # pipeline twice (static Exchange count 50 → ~17; the cc rounds
        # already ran eagerly, this adds no new job of significance).
        labels = connected_components(
            ends, pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        ).localCheckpoint(eager=True)
        fixed = labels.select(
            F.lit("fixed").alias("part"),
            F.col("v").alias("node"),
            F.col("component").alias("peer"),
            F.lit(None).cast("double").alias("jaccard"),
            split_of("v").alias("split_from"),
            split_of("component").alias("split_to"),
        )
        return leak.unionByName(fixed)


_register_leakage()


# Per-source mixing weights as 256ths expressed in hex ('80' = 50%,
# '40' = 25%); 'zz' compares above every hex prefix = keep all. Rates
# use md5 chars 3-4 — decorrelated from the split's chars 1-2, so
# mixing never biases train/val/test membership.
FULL_RATE_SOURCES = ("src0", "src1")
HALF_RATE_SOURCES = ("src2", "src3")
DEFAULT_RATE_HEX = "40"


_MIX_SQL = f"""
    SELECT doc_id, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) <
          CASE WHEN source IN {FULL_RATE_SOURCES} THEN 'zz'
               WHEN source IN {HALF_RATE_SOURCES} THEN '80'
               ELSE '{DEFAULT_RATE_HEX}' END
"""


def q_mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data-mixing sampler: each source keeps a declared
    FRACTION of its docs (100% / 50% / 25% here) — the up/down-weighting
    step of corpus mixing, complementing the hard caps of
    q_source_quota_sample. Membership = hash-prefix-below-threshold, so
    it is a pure row-local predicate: map-only, zero shuffles, zero
    state, reproducible on any engine or partitioning — and monotone in
    the rate (raising a source's weight only ADDS docs, never swaps
    them), which keeps ablation runs comparable."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").isin(*FULL_RATE_SOURCES), F.lit("zz"))
        .when(F.col("source").isin(*HALF_RATE_SOURCES), F.lit("80"))
        .otherwise(F.lit(DEFAULT_RATE_HEX))
    )
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 3, 2)
    return docs.filter(prefix < rate).select("doc_id", "source")


# --- Per-source quality-percentile cut ---------------------------------

# Drop each source's bottom-percentile documents by a quality signal —
# the "filter to the best X% per domain" stage every curation pipeline
# runs between scoring and mixing.
QCUT_P = 0.3  # survivors are docs at/above their source's p30 score

_QCUT_SCORE_SQL = "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)"

_QCUT_SQL = f"""
    SELECT s.doc_id, s.source, s.score
    FROM (SELECT doc_id, source, {_QCUT_SCORE_SQL} AS score FROM documents) s
    JOIN (SELECT source, quantile_cont({_QCUT_SCORE_SQL}, {QCUT_P}) AS thr
          FROM documents GROUP BY source) t USING (source)
    WHERE s.score >= t.thr
"""


def q_quality_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each source's docs scoring at/above that source's
    ``QCUT_P`` quantile of a quality signal (lexical diversity here —
    any text-metrics column slots in).

    The 100 TB shape is deliberately NOT a per-source ranking window
    (one giant source would funnel its whole corpus through a single
    window partition): phase 1 aggregates only (source, score) pairs
    into an exact interpolated per-source threshold — a narrow
    two-column shuffle — and phase 2 is a broadcast threshold join +
    map-only filter, so the corpus itself never shuffles and skewed
    source sizes cost nothing. Threshold semantics keep ties (every
    doc AT the threshold survives): no arbitrary rank tie-break, and
    Spark's percentile() and DuckDB's quantile_cont interpolate the
    same sorted multiset identically, so the cut is engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    score = F.size(F.array_distinct(F.split("text", " "))).cast("long")
    scored = docs.select("doc_id", "source", score.alias("score"))
    thr = scored.groupBy("source").agg(
        F.percentile("score", QCUT_P).alias("thr")
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("score") >= F.col("thr"))
        .select("doc_id", "source", "score")
    )


# --- Consolidated catalog entry (driver checks ≤50 sorted names) --------


@register(
    "q_sample_suite",
    oracle=f"""
    WITH assign AS ({_SPLIT_ASSIGN_SQL}),
    quota AS ({_QUOTA_SQL}),
    mix AS ({_MIX_SQL}),
    qcut AS ({_QCUT_SQL})
    SELECT 'split' AS part, doc_id, CAST(NULL AS VARCHAR) AS source,
           split, CAST(NULL AS BIGINT) AS pick
    FROM assign
    UNION ALL
    SELECT 'quota', doc_id, source, CAST(NULL AS VARCHAR), pick FROM quota
    UNION ALL
    SELECT 'mix', doc_id, source, CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT)
    FROM mix
    UNION ALL
    SELECT 'qcut', doc_id, source, CAST(NULL AS VARCHAR), score FROM qcut
    """,
)
def q_sample_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic samplers — hash-derived train/val/test
    assignment, per-source quota top-k, weighted per-source mixing, and
    the per-source quality-percentile cut — as one part-tagged union
    (round-1 verdict: fold the catalog into the driver's 50-entry
    window without dropping value coverage). Each part keeps its full
    output surface; the builders stay importable (the
    repartition-stability property tests drive them directly)."""
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    assign = q_split_assign(spark, sf_dir).select(
        F.lit("split").alias("part"), "doc_id", null_s.alias("source"),
        "split", null_l.alias("pick"),
    )
    quota = q_source_quota_sample(spark, sf_dir).select(
        F.lit("quota").alias("part"), "doc_id", "source",
        null_s.alias("split"), "pick",
    )
    mix = q_mix_weighted_sample(spark, sf_dir).select(
        F.lit("mix").alias("part"), "doc_id", "source",
        null_s.alias("split"), null_l.alias("pick"),
    )
    qcut = q_quality_percentile_cut(spark, sf_dir).select(
        F.lit("qcut").alias("part"), "doc_id", "source",
        null_s.alias("split"), F.col("score").alias("pick"),
    )
    return assign.unionByName(quota).unionByName(mix).unionByName(qcut)
