"""Sketch-based approximate aggregation — the serving path at 100 TB.

Exact COUNT(DISTINCT) is an expand + full shuffle of every distinct
value; exact percentiles sort each group. Sketches replace both with
mergeable fixed-size state: HyperLogLog++ for distinct counts, a
quantile sketch for percentiles — one pass, partial+final merge, no
value shuffle.

Sketch ENCODINGS are engine-specific by construction, so raw sketch
outputs can never be hash-compared across engines. The catalog entry
therefore emits what IS cross-engine checkable: the exact per-group
value (which the oracle recomputes) plus a ``within_bound`` flag
certifying the sketch against its own documented error bound, which the
oracle asserts as literal TRUE — a failed bound flips the flag and
fails the hash gate. Tests keep the tighter numeric error assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

HLL_RSD = 0.02
HLL_BOUND = 3 * HLL_RSD  # 3σ of the documented relative standard deviation
# The CORRECTNESS-gate certification uses 5σ, not 3σ: the oracle asserts
# the flag as literal TRUE, so a Spark-version change to the sketch/hash
# implementation or an unlucky group at a new scale factor must not flip
# the driver gate red without a real bug (round-2 advice). The tight 3σ
# numeric assertion lives in tests (test_sketches_bounded_error_vs_exact)
# where it can be tuned per fixture.
HLL_CERT_BOUND = 5 * HLL_RSD


def sketch_distinct_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct part count per brand (rsd=0.02). The shuffle
    carries one ~kB sketch per (partition, brand) instead of every
    distinct part key — the difference between a metadata-sized and a
    data-sized exchange at 100 TB. The exact count rides alongside for
    certification (at scale you run one or the other, not both)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


def sketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of order value per priority
    (``approx_percentile``, accuracy=10000): bounded-size mergeable
    state per group vs the exact operator's per-group sort; exact
    reference quantiles ride alongside for certification."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("approx_q"),
        F.expr(
            "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9, 0.99))"
        ).alias("exact_q"),
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- Count-Min sketch (frequency estimation / heavy hitters) ---
#
# Unlike HLL/approx_percentile (engine-native encodings), this CMS is
# built from first principles on md5 hashing — the same cross-engine
# determinism trick as the MinHash shingle images — so the ESTIMATES
# themselves are hash-comparable with DuckDB, not just a bound flag.
CMS_D = 3  # hash rows
CMS_W = 256  # buckets per row

_CMS_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat(CAST(k AS STRING), '#', event_type)), 1, 12), "
    f"16, 10) AS BIGINT) % {CMS_W}"
)
_CMS_BUCKET_DUCK = (
    "(('0x' || substr(md5(CAST(k AS VARCHAR) || '#' || event_type), 1, 12))"
    f"::BIGINT) % {CMS_W}"
)


def sketch_countmin_event_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimation over event_type: every row
    increments one bucket per hash row; a key's estimate is the MIN of
    its D bucket counts — always ≥ the true count (buckets only ever
    collide upward), within ε·N with high probability.

    Scale shape: the sketch is D×W = 3×256 counters TOTAL regardless
    of input size — the explode is map-local and the shuffle carries at
    most D·W partial counts per map task, so frequency estimation over
    100 TB moves kilobytes. The probe side joins the tiny CMS table
    back as a broadcast. This is the bounded-memory alternative to a
    full groupBy when the key domain is huge (URLs, n-grams) and only
    heavy hitters matter."""
    events = load_table(spark, sf_dir, "events").select("event_type")
    cells = events.select(
        F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("k"), "event_type"
    ).select("k", F.expr(_CMS_BUCKET_SPARK).alias("bucket"))
    cms = cells.groupBy("k", "bucket").agg(F.count(F.lit(1)).alias("c"))
    keys = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = keys.select(
        "event_type",
        "exact_n",
        F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("k"),
    ).withColumn("bucket", F.expr(_CMS_BUCKET_SPARK))
    return (
        probes.join(F.broadcast(cms), ["k", "bucket"])
        .groupBy("event_type", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )


# --- CMS-guided heavy hitters (two-phase, exact-verified) ---------------
#
# The pattern for "which keys exceed θ·N" when the key domain is too
# large for a full groupBy (URLs, n-grams): phase 1 builds the D×W CMS
# over the raw token stream (map-local explode, kilobytes of state);
# phase 2 probes candidate keys — est ≥ exact ALWAYS, so keys with
# est < θ·N are provably not heavy and the candidate set is a
# guaranteed superset; phase 3 exact-counts ONLY the candidates
# (broadcast semi-join scoped) and keeps those truly ≥ θ·N, discarding
# CMS false positives. On the fixture the probe set is the vocabulary
# (tiny); at scale candidates come from a per-partition top-k pre-pass.
HH_INV = 512  # heavy = frequency > total/512

_HH_TOKEN_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat(CAST(k AS STRING), '#', token)), 1, 12), "
    f"16, 10) AS BIGINT) % {CMS_W}"
)
_HH_TOKEN_BUCKET_DUCK = (
    "(('0x' || substr(md5(CAST(k AS VARCHAR) || '#' || token), 1, 12))"
    f"::BIGINT) % {CMS_W}"
)


def sketch_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-verified heavy-hitter tokens over the document corpus:
    CMS candidates (no false negatives) → candidate-scoped exact
    verification (no false positives). Emits (token, exact_n, est_n)
    for tokens with exact_n · HH_INV ≥ total tokens."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cells = toks.select(
        F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("k"), "token"
    ).select("k", F.expr(_HH_TOKEN_BUCKET_SPARK).alias("bucket"))
    cms = cells.groupBy("k", "bucket").agg(F.count(F.lit(1)).alias("c"))
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    total = tc.agg(F.sum("exact_n").alias("total"))
    est = (
        tc.select(
            "token",
            "exact_n",
            F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("k"),
        )
        .withColumn("bucket", F.expr(_HH_TOKEN_BUCKET_SPARK))
        .join(F.broadcast(cms), ["k", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        # candidate cut on the ESTIMATE (the only cut a huge domain
        # affords pre-verification), then the exact verification cut
        .filter(F.col("est_n") * HH_INV >= F.col("total"))
        .filter(F.col("exact_n") * HH_INV >= F.col("total"))
        .select("token", "exact_n", "est_n")
    )


_HH_SQL = f"""
    hh_toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hh_cells AS (
        SELECT k, {_HH_TOKEN_BUCKET_DUCK} AS bucket
        FROM hh_toks, generate_series(0, {CMS_D - 1}) AS g(k)
    ),
    hh_cms AS (SELECT k, bucket, COUNT(*) AS c FROM hh_cells GROUP BY 1, 2),
    hh_tc AS (SELECT token, COUNT(*) AS exact_n FROM hh_toks GROUP BY 1),
    hh_total AS (SELECT SUM(exact_n) AS total FROM hh_tc),
    hh_est AS (
        SELECT p.token, p.exact_n, MIN(c.c) AS est_n
        FROM (SELECT token, exact_n, k, {_HH_TOKEN_BUCKET_DUCK} AS bucket
              FROM hh_tc, generate_series(0, {CMS_D - 1}) AS g(k)) p
        JOIN hh_cms c ON p.k = c.k AND p.bucket = c.bucket
        GROUP BY 1, 2
    ),
    hh AS (
        SELECT token, exact_n, est_n
        FROM hh_est, hh_total
        WHERE est_n * {HH_INV} >= total AND exact_n * {HH_INV} >= total
    )"""


_CMS_SQL = f"""
    cms_cells AS (
        SELECT k, {_CMS_BUCKET_DUCK} AS bucket
        FROM events, generate_series(0, {CMS_D - 1}) AS g(k)
    ),
    cms AS (
        SELECT k, bucket, COUNT(*) AS c FROM cms_cells GROUP BY 1, 2
    ),
    cms_keys AS (
        SELECT event_type, COUNT(*) AS exact_n FROM events GROUP BY 1
    ),
    cms_probes AS (
        SELECT event_type, exact_n, k, {_CMS_BUCKET_DUCK} AS bucket
        FROM cms_keys, generate_series(0, {CMS_D - 1}) AS g(k)
    ),
    cms_est AS (
        SELECT p.event_type, p.exact_n, MIN(c.c) AS est_n
        FROM cms_probes p JOIN cms c ON p.k = c.k AND p.bucket = c.bucket
        GROUP BY 1, 2
    )"""


@register(
    "q_sketch_suite",
    oracle=f"""
    WITH {_CMS_SQL},
    {_HH_SQL}
    SELECT 'hll' AS part, p_brand AS key,
           COUNT(DISTINCT l_partkey) AS exact_n,
           CAST(NULL AS BIGINT) AS est_n, TRUE AS within_bound
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    UNION ALL
    SELECT 'quantile', o_orderpriority, COUNT(*), CAST(NULL AS BIGINT), TRUE
    FROM orders
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'cms', event_type, exact_n, est_n, TRUE
    FROM cms_est
    UNION ALL
    SELECT 'hh', token, exact_n, est_n, TRUE
    FROM hh
    """,
)
def q_sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three sketches under one oracle-backed hash gate: per group the
    EXACT value the oracle recomputes, plus a within_bound flag the
    oracle asserts TRUE — 'hll' certifies |approx−exact|/exact ≤ 5·rsd
    (headroom so only a real bug flips the gate; 3σ stays in tests),
    'quantile' certifies each approx quantile lands inside a bracketing
    window of exact quantiles (approx_percentile at accuracy=10000 has
    rank error < n/10000, far inside these brackets at any SF), and
    'cms' is the md5-deterministic Count-Min build whose per-key
    ESTIMATE is itself hash-compared (est_n), certified against the
    sketch's one deterministic guarantee est ≥ exact (the ε·N
    tightness assertion lives in tests), and 'hh' is the CMS-guided
    exact-verified heavy-hitter pipeline (candidates from estimates —
    no false negatives; verification on candidates only — no false
    positives; both cuts hash-compared)."""
    null_l = F.lit(None).cast("long")
    hll = sketch_distinct_parts_per_brand(spark, sf_dir).select(
        F.lit("hll").alias("part"),
        F.col("p_brand").alias("key"),
        F.col("exact_parts").alias("exact_n"),
        null_l.alias("est_n"),
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= HLL_CERT_BOUND
        ).alias("within_bound"),
    )
    q = sketch_price_quantiles(spark, sf_dir)
    a = F.col("approx_q")
    e = F.col("exact_q")
    quant = q.select(
        F.lit("quantile").alias("part"),
        F.col("o_orderpriority").alias("key"),
        F.col("n_rows").alias("exact_n"),
        null_l.alias("est_n"),
        (
            a[0].between(e[0], e[2])  # p50 in [p25, p75]
            & a[1].between(e[1], e[4])  # p90 in [p50, p99]
            & (a[2] >= e[3])  # p99 ≥ p90
            & (a[2] <= F.col("mx"))
        ).alias("within_bound"),
    )
    cms = sketch_countmin_event_freq(spark, sf_dir).select(
        F.lit("cms").alias("part"),
        F.col("event_type").alias("key"),
        "exact_n",
        "est_n",
        (F.col("est_n") >= F.col("exact_n")).alias("within_bound"),
    )
    hh = sketch_heavy_hitter_tokens(spark, sf_dir).select(
        F.lit("hh").alias("part"),
        F.col("token").alias("key"),
        "exact_n",
        "est_n",
        (F.col("est_n") >= F.col("exact_n")).alias("within_bound"),
    )
    return hll.unionByName(quant).unionByName(cms).unionByName(hh)
