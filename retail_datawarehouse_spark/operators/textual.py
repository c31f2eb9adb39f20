"""Text-analysis operators over the ``documents`` table.

The LLM-data-pipeline text stack (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting — all as
built-in column expressions (JVM-side, codegen'd, shuffle-free per row).
At 100 TB these run as a single map-only pass over the corpus; nothing
here exchanges data.

Cross-engine determinism: marker counts use replace-length arithmetic,
token counts use identical RE2/Java-compatible regexes, the rolling hash
is an ordered left fold (``F.aggregate`` ≡ DuckDB ``list_reduce``), so
every output is bit-identical with the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.bpe import (
    apply_bpe,
    bpe_apply_oracle_sql,
    bpe_oracle_cte,
    train_bpe,
)
from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table

# Pre-tokenizer regex (BPE-ish: letter runs | digit runs | single symbol).
# Identical semantics in Java regex (Spark) and RE2 (DuckDB).
WORD_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for")

# Language marker words; counts decide the prediction (fixed precedence
# breaks ties deterministically). A real system uses character-n-gram
# profiles; the operator shape (marker scoring, argmax) is the same.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "les", "des"),
    "es": ("el", "los", "las"),
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via replace-length arithmetic — identical
    integer result in any engine, no regex dialect involved."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    token = f" {needle} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("long")


def _count_occurrences_sql(text_expr: str, needle: str) -> str:
    token = f" {needle} "
    padded = f"concat(' ', {text_expr}, ' ')"
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{token}', '')))"
        f" / {len(token)} AS BIGINT)"
    )


def token_stat_cols() -> list[Column]:
    """Token counting: whitespace tokens + BPE-ish pre-tokenizer counts."""
    return [
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(WORD_TOKEN_RE)).cast("long").alias("n_word_tokens"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("long").alias("n_number_tokens"),
    ]


_TOKEN_STATS_SQL_COLS = f"""
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{WORD_TOKEN_RE}')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens"""


_SW_SQL = " + ".join(_count_occurrences_sql("text", w) for w in STOPWORDS)


def quality_cols() -> list[Column]:
    """Quality scoring: length / punctuation / stopword-ratio heuristics
    plus the Gopher-rule panel (token-count window, mean word length,
    lexical diversity) as map-only column expressions. Every ratio is
    exact-int arithmetic + one correctly-rounded IEEE division, so the
    booleans cut on them are engine-exact too."""
    text = F.col("text")
    toks = F.split(text, " ")
    n_tokens = F.size(toks).cast("long")
    n_stop = None
    for w in STOPWORDS:
        c = _count_occurrences(text, w)
        n_stop = c if n_stop is None else (n_stop + c)
    sw_ratio = n_stop.cast("double") / n_tokens
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    ttr = n_distinct.cast("double") / n_tokens
    # mean token length over single-spaced text: (chars − spaces) / n
    mean_word = (F.length(text) - n_tokens + 1).cast("double") / n_tokens
    return [
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        sw_ratio.alias("stopword_ratio"),
        (
            F.regexp_count(text, F.lit("[^A-Za-z0-9 ]")).cast("double")
            / F.length(text)
        ).alias("punct_ratio"),
        (F.length(text).cast("double") / n_tokens).alias("avg_token_len"),
        (
            (F.length(text) >= 100) & sw_ratio.between(0.01, 0.6)
        ).alias("passes_quality"),
        n_distinct.alias("n_distinct_ws_tokens"),
        ttr.alias("type_token_ratio"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("long")
        .alias("max_token_len"),
        mean_word.alias("mean_word_len"),
        (
            n_tokens.between(50, 100000)
            & mean_word.between(3.0, 10.0)
            & (ttr > 0.2)
        ).alias("gopher_pass"),
    ]


_QUALITY_SQL_COLS = f"""
           len(string_split(text, ' ')) AS n_tokens,
           ({_SW_SQL}) AS n_stopwords,
           CAST(({_SW_SQL}) AS DOUBLE) / len(string_split(text, ' '))
               AS stopword_ratio,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
               / length(text) AS punct_ratio,
           CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
               AS avg_token_len,
           length(text) >= 100
               AND CAST(({_SW_SQL}) AS DOUBLE)
                   / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.6
               AS passes_quality,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_ws_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS type_token_ratio,
           CAST(list_aggregate(list_transform(string_split(text, ' '),
                                              t -> len(t)), 'max') AS BIGINT)
               AS max_token_len,
           CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_word_len,
           len(string_split(text, ' ')) BETWEEN 50 AND 100000
               AND (CAST(length(text) - len(string_split(text, ' ')) + 1
                         AS DOUBLE)
                    / len(string_split(text, ' '))) BETWEEN 3.0 AND 10.0
               AND (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' '))) > 0.2
               AS gopher_pass"""


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_count_occurrences_sql("text", w) for w in LANG_MARKERS[lang])


def langid_cols() -> list[Column]:
    """Language ID: marker-word scores + fixed-precedence argmax."""
    text = F.col("text")
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for w in markers:
            c = _count_occurrences(text, w)
            s = c if s is None else (s + c)
        scores[lang] = s
    s_en, s_de, s_fr, s_es = (scores[lg] for lg in ("en", "de", "fr", "es"))
    predicted = (
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es), "en")
        .when((s_de >= s_fr) & (s_de >= s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )
    return [
        F.col("lang").alias("labeled_lang"),
        s_en.alias("s_en"),
        s_de.alias("s_de"),
        s_fr.alias("s_fr"),
        s_es.alias("s_es"),
        predicted.alias("predicted_lang"),
    ]


_LANGID_SQL_COLS = f"""
           lang AS labeled_lang,
           ({_lang_score_sql("en")}) AS s_en,
           ({_lang_score_sql("de")}) AS s_de,
           ({_lang_score_sql("fr")}) AS s_fr,
           ({_lang_score_sql("es")}) AS s_es,
           CASE WHEN ({_lang_score_sql("en")}) >= ({_lang_score_sql("de")})
                 AND ({_lang_score_sql("en")}) >= ({_lang_score_sql("fr")})
                 AND ({_lang_score_sql("en")}) >= ({_lang_score_sql("es")}) THEN 'en'
                WHEN ({_lang_score_sql("de")}) >= ({_lang_score_sql("fr")})
                 AND ({_lang_score_sql("de")}) >= ({_lang_score_sql("es")}) THEN 'de'
                WHEN ({_lang_score_sql("fr")}) >= ({_lang_score_sql("es")}) THEN 'fr'
                ELSE 'es' END AS predicted_lang"""


ROLLING_MOD = 1_000_000_007


def fingerprint_frame(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: (1) content hash of the normalized text
    (lowercase, punctuation stripped, whitespace collapsed) — robust to
    formatting-only edits; (2) polynomial rolling hash over the raw
    characters — an ordered left fold, the building block of rolling
    chunking. Both engines fold left → identical values."""
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " ")
    )
    rolling = F.expr(
        f"aggregate(regexp_extract_all(text, '.', 0), CAST(7 AS BIGINT), "
        f"(acc, ch) -> (acc * 31 + ascii(ch)) % {ROLLING_MOD})"
    )
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


_FINGERPRINT_SQL = f"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS content_md5,
           list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                   list_transform(regexp_extract_all(text, '.'),
                                  ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, ch) -> (acc * 31 + ch) % {ROLLING_MOD}) AS rolling_hash
    FROM documents
"""


def _bind(arr: Column, f) -> Column:
    """Evaluate ``arr`` ONCE per row and hand the result to ``f`` as a
    lambda variable: ``transform`` over a one-element array is the
    expression-level let-binding Spark SQL lacks. Why it matters:
    higher-order functions are interpreted (CodegenFallback), so no
    whole-stage-codegen subexpression elimination runs inside them — a
    lambda body like ``slice(split(text), i, 3)`` re-evaluates the
    SPLIT on every lambda iteration, turning an O(words) gram build
    into O(words²) per document (measured: the repetition panel alone
    cost 4.45 s of q_text_metrics' 5.5 s at sf0.1; binding the token
    array first makes the whole five-panel projection ~3× cheaper).
    Values are bit-identical — the bound expression is the same tree,
    evaluated once."""
    return F.transform(F.array(arr), f).getItem(0)


def repetition_cols() -> list[Column]:
    """Repetition scoring — the duplicated-trigram ratio used to filter
    degenerate/looping text from training corpora. The trigram list is
    built per row with array HOFs (sequence → slice → join): entirely
    JVM-side and SHUFFLE-FREE — at 100 TB this is a map-only pass like
    the rest of the quality stack, no explode+groupBy detour through an
    exchange. Integer counts + one IEEE division keep it engine-exact;
    docs too short for a trigram report 0 counts and a NULL ratio.
    The token array is let-bound (``_bind``) so the gram build is
    O(words), not O(words²) — see ``_bind``."""
    grams = _bind(
        F.split("text", " "),
        lambda toks: F.when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    n_tri = F.size(grams).cast("long")
    n_dis = F.size(F.array_distinct(grams)).cast("long")
    return [
        n_tri.alias("n_trigrams"),
        n_dis.alias("n_distinct_trigrams"),
        F.when(n_tri > 0, (n_tri - n_dis).cast("double") / n_tri).alias("dup_ratio"),
    ]


_REPETITION_SQL_COLS = """
           CAST(len(grams) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_trigrams,
           CASE WHEN len(grams) > 0 THEN
               CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
           END AS dup_ratio"""

_REPETITION_GRAMS_SQL = """
               CASE WHEN len(string_split(text, ' ')) >= 3 THEN
                   list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 2),
                       i -> array_to_string(
                                list_slice(string_split(text, ' '), i, i + 2), ' '))
               ELSE [] END AS grams"""


TILE_WORDS = 8  # intra-doc dedup granularity: 8-word tiles ("paragraphs")


def tile_dedup_cols() -> list[Column]:
    """Dolma/C4-style INTRA-document dedup with text rewrite: tile the
    token stream into fixed {TILE_WORDS}-word units (the fixture has no
    sentence/paragraph boundaries; real corpora would split on \\n\\n),
    drop every repeated tile keeping the FIRST occurrence, and emit the
    rewritten text's md5 plus before/after tile counts. Spark's
    ``array_distinct`` preserves first-occurrence order, so the rewrite
    is deterministic. Like the rest of the quality stack this is pure
    array HOFs — map-only, shuffle-free at any corpus size (the
    repetition panel SCORES duplication; this one REMOVES it). The
    token array is let-bound (``_bind``) so the tiling is O(words),
    not O(words²/TILE_WORDS)."""
    tiles = _bind(
        F.split("text", " "),
        lambda toks: F.transform(
            # floor() of the double division == integer `div` here
            # (sizes are non-negative); sequence() wants an integral
            # bound, hence the int cast.
            F.sequence(
                F.lit(0),
                F.floor((F.size(toks) - 1) / F.lit(TILE_WORDS)).cast("int"),
            ),
            lambda j: F.array_join(
                F.slice(toks, j * TILE_WORDS + 1, TILE_WORDS), " "
            ),
        ),
    )
    kept = F.array_distinct(tiles)
    return [
        F.size(tiles).cast("long").alias("n_tiles"),
        F.size(kept).cast("long").alias("n_kept_tiles"),
        F.md5(F.array_join(kept, " ").cast("binary")).alias("dedup_text_md5"),
    ]


_TILE_DEDUP_SQL = f"""
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tiles,
               CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept_tiles,
               md5(string_agg(tile, ' ' ORDER BY idx)
                   FILTER (WHERE rn = 1)) AS dedup_text_md5
        FROM (
            SELECT doc_id, tile, idx,
                   row_number() OVER (
                       PARTITION BY doc_id, tile ORDER BY idx
                   ) AS rn
            FROM (
                SELECT doc_id, j AS idx,
                       array_to_string(
                           list_slice(toks, j * {TILE_WORDS} + 1,
                                      j * {TILE_WORDS} + {TILE_WORDS}), ' '
                       ) AS tile
                FROM (SELECT doc_id, string_split(text, ' ') AS toks
                      FROM documents),
                     LATERAL (SELECT unnest(generate_series(
                         0, (len(toks) - 1) // {TILE_WORDS})) AS j) s
            )
        )
        GROUP BY doc_id"""


@register(
    "q_text_metrics",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, text, lang, {_REPETITION_GRAMS_SQL}
        FROM documents
    ),
    td AS ({_TILE_DEDUP_SQL})
    SELECT g.doc_id, {_TOKEN_STATS_SQL_COLS}, {_QUALITY_SQL_COLS},
           {_LANGID_SQL_COLS}, {_REPETITION_SQL_COLS},
           td.n_tiles, td.n_kept_tiles, td.dedup_text_md5
    FROM g JOIN td ON g.doc_id = td.doc_id
    """,
)
def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text-curation panel — token stats, quality
    heuristics, language ID, and repetition scoring — as ONE map-only
    projection. These were four separate catalog queries in round 1;
    fused they are also the right 100 TB shape: the corpus is scanned
    ONCE and every metric is a JVM-side column expression riding that
    single pass (zero exchanges, one WholeStageCodegen span), where
    four queries cost four scans. One row per document, all metrics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        *token_stat_cols(),
        *quality_cols(),
        *langid_cols(),
        *repetition_cols(),
        *tile_dedup_cols(),
    )


TOP_TERMS_PER_DOC = 3


def tokenized_docs(docs: DataFrame) -> DataFrame:
    """The shared text-derivation projection (r4 verdict #2): one scan
    computes the whitespace tokenization (``toks``) and the lowercase
    image (``tl``) next to the raw ``text``, so a caller running several
    text panels can persist THIS once instead of letting each panel
    re-scan and re-split the corpus. fp/pii read ``text``, salient/bm25
    read ``toks``, the LM reads ``tl`` — five consumers, one
    tokenization pass. The panel frames below detect the prepared
    columns and skip their own derivation when present, so they stay
    correct standalone too."""
    return docs.select(
        "doc_id",
        "text",
        F.split("text", " ").alias("toks"),
        F.lower(F.col("text")).alias("tl"),
    )


# Session-scope memo for the shared tokenized projection (ADVICE r5:
# cache accrual). Keyed by (applicationId, sf_dir) so a restarted
# session never reuses a dead frame; entries are tiny plan objects, the
# DATA lives in the Spark cache and is re-registered on demand.
_TOKENIZED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _tokenized_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _TOKENIZED_CACHE.get(key)
    if df is None:
        df = tokenized_docs(load_table(spark, sf_dir, "documents")).persist()
        _TOKENIZED_CACHE[key] = df
    elif not (df.storageLevel.useMemory or df.storageLevel.useDisk):
        # An external spark.catalog.clearCache() (bench.py does this
        # between reps) unregistered the frame — re-register rather
        # than silently running all five panels uncached.
        df.persist()
    return df


def salient_terms_frame(docs: DataFrame) -> DataFrame:
    """Per-document salient terms: top-k tokens ranked by term
    frequency, with document frequency as the rarity tie-break (tf
    DESC, df ASC, token) — the tf-idf ordering expressed in pure
    integers, so ranks are engine-exact where a float idf (ln from two
    different libm builds) could flip last-ulp ties. Shape at scale:
    explode → two partial-agg'd groupBys; the df relation is vocabulary-
    sized (tiny) so its join back is a broadcast; top-k per doc plans
    WindowGroupLimit, never a full per-doc sort."""
    toks = F.col("toks") if "toks" in docs.columns else F.split("text", " ")
    tok = docs.select("doc_id", F.explode(toks).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(F.broadcast(df), "token")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_TERMS_PER_DOC)
        .select("doc_id", "token", "tf", "df", "rank")
    )


_SALIENT_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM tok GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df
        FROM tok GROUP BY token
    )
    SELECT doc_id, token, tf, df,
           CAST(row_number() OVER
               (PARTITION BY doc_id ORDER BY tf DESC, df ASC, token)
               AS BIGINT) AS rank
    FROM tf JOIN df USING (token)
    QUALIFY rank <= {TOP_TERMS_PER_DOC}
"""


# --- PII detection + redaction (map-only, the curation gate every
# training-data pipeline runs before publishing a corpus) -------------
#
# Patterns restricted to the Java-regex ∩ RE2 common subset (char
# classes, bounded repetition — no lookaround/backrefs) so Spark and
# DuckDB match identically. Fixture texts carry no digits or '@', so
# every match is injection-planted and deterministic.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\d{3}-\d{3}-\d{4}",
    "ip": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}

_DUCK_PII_DOCS = """
    pii_docs AS (
        SELECT doc_id, text
            || CASE WHEN doc_id % 11 = 0
                    THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE '' END
            || CASE WHEN doc_id % 13 = 0
                    THEN ' 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
            || CASE WHEN doc_id % 17 = 0
                    THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.' || CAST(doc_id % 250 + 1 AS VARCHAR)
                    ELSE '' END AS pii_text
        FROM documents
    )
"""

_DUCK_PII_SQL = f"""
    SELECT d.doc_id, t.skey,
           CAST(len(regexp_extract_all(d.pii_text, t.pat)) AS BIGINT) AS n,
           CAST(len(regexp_replace(regexp_replace(regexp_replace(d.pii_text,
                '{PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
                '{PII_PATTERNS["phone"]}', '<PHONE>', 'g'),
                '{PII_PATTERNS["ip"]}', '<IP>', 'g')) AS BIGINT) AS redacted_len
    FROM pii_docs d
    CROSS JOIN (VALUES ('email', '{PII_PATTERNS["email"]}'),
                       ('phone', '{PII_PATTERNS["phone"]}'),
                       ('ip', '{PII_PATTERNS["ip"]}')) AS t(skey, pat)
"""


def pii_frame(docs: DataFrame) -> DataFrame:
    """Per-doc PII audit: (doc_id, skey=pii_type, n matches,
    redacted_len) for every type that fires. ONE corpus scan: the
    injection, the three counts, and the full redaction chain are all
    row-local column expressions; the per-type rows come from exploding
    a 3-element literal array, not from re-scanning. At 100 TB this is
    the same zero-exchange map-only shape as q_text_metrics."""
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" user"), F.col("doc_id").cast("string"),
                         F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 17 == 0,
                F.concat(
                    F.lit(" 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 250 + 1).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("pii_text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.col("pii_text"), PII_PATTERNS["email"], "<EMAIL>"
            ),
            PII_PATTERNS["phone"],
            "<PHONE>",
        ),
        PII_PATTERNS["ip"],
        "<IP>",
    )
    matches = F.array(
        *[
            F.struct(
                F.lit(t).alias("skey"),
                F.regexp_count("pii_text", F.lit(p)).cast("long").alias("n"),
            )
            for t, p in PII_PATTERNS.items()
        ]
    )
    return (
        injected.select(
            "doc_id",
            F.length(redacted).cast("long").alias("redacted_len"),
            F.explode(matches).alias("m"),
        )
        .select("doc_id", F.col("m.skey").alias("skey"), F.col("m.n").alias("n"),
                "redacted_len")
    )


# --- BM25 keyword retrieval (single-term queries, integer-exact) -----
#
# The retrieval operator every corpus-curation stack needs: rank
# documents for a keyword by BM25 (k1=1.2, b=0.75). For SINGLE-TERM
# queries the IDF factor is a per-term constant, so the BM25 *ranking*
# is decided entirely by the tf-saturation / length-normalization term
# — which means the classic log-IDF can be replaced by its exact
# rational argument (2N-2df+1)/(2df+1) without changing any ordering,
# and the whole score becomes two exact int64 ratios combined by two
# correctly-rounded IEEE divisions and one multiply: bit-identical on
# any engine, no libm log() dialect risk (the same discipline as the
# salient-terms integer ranking above).
#
# Clearing k1/b to integers: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# with avgdl = TL/N, multiplied through by 20*TL, is
# 44*tf*TL / (20*tf*TL + 6*TL + 18*dl*N) — all int64-exact
# (44*tf*TL ≲ 6e11 even at sf100; headroom to 2^63 is ~7 orders).
BM25_TERMS = ("spark", "window", "customer", "vector", "merge")
BM25_TOP_K = 10


def bm25_topk_frame(docs: DataFrame) -> DataFrame:
    """Top-``BM25_TOP_K`` documents per query term.

    100 TB shape: tf for the (fixed, small) query-term set is computed
    by per-row array HOFs over ONE hoisted tokenization — the corpus is
    never exploded token-wise and never shuffles for tf; only matched
    postings (docs with tf>0 for some query term) reach the window
    top-k, and df is a query-term-cardinality aggregate broadcast back.
    The 1-row corpus-stats frame (N, total token length) rides in-plan
    via the same broadcast-bounds shape as the incremental snapshot —
    no driver action."""
    toksed = (
        docs.select("doc_id", "toks")
        if "toks" in docs.columns
        else docs.select("doc_id", F.split("text", " ").alias("toks"))
    )
    stats = toksed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("total_len"),
    )
    tf_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.size(F.filter("toks", lambda x: x == F.lit(t)))
                .cast("long")
                .alias("tf"),
            )
            for t in BM25_TERMS
        ]
    )
    postings = (
        toksed.select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode(tf_structs).alias("m"),
        )
        .select(
            "doc_id", "dl", F.col("m.term").alias("term"), F.col("m.tf").alias("tf")
        )
        .filter(F.col("tf") > 0)
    )
    df_counts = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    # Score association is pinned to (idf_num/idf_den) * (sat_num/sat_den)
    # — two exact-int divisions then one multiply, each correctly
    # rounded, so the double is bit-identical to the oracle's.
    scored = (
        postings.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            (
                (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double")
                / (2 * F.col("df") + 1).cast("double")
            )
            * (
                (44 * F.col("tf") * F.col("total_len")).cast("double")
                / (
                    20 * F.col("tf") * F.col("total_len")
                    + 6 * F.col("total_len")
                    + 18 * F.col("dl") * F.col("n_docs")
                ).cast("double")
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("doc_id", "term", "tf", "df", "rank")
    )


_BM25_SQL = f"""
    SELECT doc_id, term, tf, df, rank FROM (
        SELECT p.doc_id, p.term, p.tf, d.df,
               CAST(row_number() OVER (
                   PARTITION BY p.term
                   ORDER BY (CAST(2 * s.n_docs - 2 * d.df + 1 AS DOUBLE)
                             / CAST(2 * d.df + 1 AS DOUBLE))
                          * (CAST(44 * p.tf * s.total_len AS DOUBLE)
                             / CAST(20 * p.tf * s.total_len + 6 * s.total_len
                                    + 18 * p.dl * s.n_docs AS DOUBLE)) DESC,
                            p.doc_id
               ) AS BIGINT) AS rank
        FROM (
            SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, t.term,
                   CAST(len(list_filter(toks, x -> x = t.term)) AS BIGINT) AS tf
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in BM25_TERMS)})
                 AS t(term)
        ) p
        JOIN (
            SELECT term, COUNT(*) AS df FROM (
                SELECT doc_id, t.term
                FROM (SELECT doc_id, string_split(text, ' ') AS toks
                      FROM documents)
                CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in BM25_TERMS)})
                     AS t(term)
                WHERE len(list_filter(toks, x -> x = t.term)) > 0
            ) GROUP BY term
        ) d USING (term)
        CROSS JOIN (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
            FROM documents
        ) s
        WHERE p.tf > 0
    ) WHERE rank <= {BM25_TOP_K}
"""


# --- Character-trigram LM quality score (CCNet-style) -------------------
#
# CCNet/Gopher-class pipelines filter training text on a language-model
# score: gibberish and boilerplate sit in the tails of the per-document
# statistic. The classic statistic is log-perplexity under a char-n-gram
# model; this implementation keeps the SAME model (corpus-trained
# character-trigram frequencies) but scores with INTEGER-EXACT
# arithmetic — qp(tri) = (LM_Q * count) DIV total, an integer division
# both engines compute identically — instead of ln(count/total):
# Java's Math.log and DuckDB's libm ln can differ in the last ulp, and
# a fixed-point floor of a transcendental is one ulp away from a flaky
# hash gate. Mean scaled frequency is a monotone transform of mean
# probability (what perplexity monotonically orders for fixed doc
# length), so the FILTERING decisions are the same; the rare-trigram
# mass (n in trigrams seen <= LM_RARE_MAX times corpus-wide) is the
# discrete tail signal a smoothed LM would assign the OOV floor.

LM_Q = 1_000_000  # probability quantization: qp = (LM_Q * c) DIV total
LM_RARE_MAX = 2  # corpus-wide count at or below which a trigram is "rare"


def lm_score_frame(docs: DataFrame) -> DataFrame:
    """Per-document char-trigram LM panel: (doc_id, lm_mass, n_tri,
    n_rare). Mean model probability of the doc is lm_mass / n_tri / LM_Q.

    Scale shape: per-doc trigram counts aggregate BEFORE the model
    join (duplicates combine map-side, the join carries one row per
    distinct (doc, tri)); the model relation is bounded by the
    charset-cubed trigram domain (~1M rows worst case for ASCII-ish
    text — broadcastable at any corpus size, the same reason CCNet can
    hold its LM in memory per worker), and the scalar total rides a
    broadcast 1-row aggregate. Docs shorter than 3 chars contribute no
    trigrams and are consistently absent in both engines."""
    lt = (
        docs.select("doc_id", "tl")
        if "tl" in docs.columns
        else docs.select("doc_id", F.lower(F.col("text")).alias("tl"))
    )
    dt = lt.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN length(tl) >= 3 THEN "
                "transform(sequence(1, length(tl) - 2), i -> substring(tl, i, 3)) "
                "ELSE CAST(array() AS array<string>) END"
            )
        ).alias("tri"),
    )
    doc_tri = dt.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("n"))
    # Model straight off the exploded stream, NOT via doc_tri: the tri
    # groupBy partial-aggregates down to the bounded trigram domain
    # map-side (cheapest possible second pass), where reusing doc_tri's
    # plan would replay its corpus-scale (doc, tri) shuffle.
    model = dt.groupBy("tri").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").alias("T"))
    scored = (
        doc_tri.join(F.broadcast(model), "tri")
        .crossJoin(F.broadcast(total))
        # LM_Q * c through DECIMAL(38,0): a bare int64 product wraps
        # silently (ansi off) once one trigram's corpus count exceeds
        # ~9.2e12 — reachable at 100 TB (~1e14 trigrams, top English
        # trigrams at 1-2%). Spark's DIV on decimal is exact floor
        # (verified against DuckDB HUGEINT // — the decimal // there
        # ROUNDS, so the oracle uses HUGEINT); agreement pinned by
        # test_lm_qp_wide_product_no_wrap.
        .withColumn(
            "qp",
            F.expr(f"CAST((CAST({LM_Q} AS DECIMAL(38,0)) * c) DIV T AS BIGINT)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum(F.col("n") * F.col("qp")).cast("long").alias("lm_mass"),
        F.sum("n").cast("long").alias("n_tri"),
        F.sum(
            F.when(F.col("c") <= LM_RARE_MAX, F.col("n")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_rare"),
    )


_LM_SQL = f"""
    WITH lm_doc_tri AS (
        SELECT doc_id, tri, COUNT(*) AS n FROM (
            SELECT doc_id, substr(tl, CAST(s.i AS INTEGER), 3) AS tri
            FROM (SELECT doc_id, lower(text) AS tl FROM documents) lt,
                 LATERAL (SELECT unnest(generate_series(1, length(tl) - 2)) AS i) s
        ) GROUP BY 1, 2
    ),
    lm_model AS (
        SELECT tri, CAST(SUM(n) AS BIGINT) AS c FROM lm_doc_tri GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(SUM(d.n * ((CAST({LM_Q} AS HUGEINT) * m.c) // t.T)) AS BIGINT) AS lm_mass,
           CAST(SUM(d.n) AS BIGINT) AS n_tri,
           CAST(SUM(CASE WHEN m.c <= {LM_RARE_MAX} THEN d.n ELSE 0 END)
                AS BIGINT) AS n_rare
    FROM lm_doc_tri d
    JOIN lm_model m USING (tri)
    CROSS JOIN (
        SELECT CAST(SUM(len(lower(text)) - 2) AS BIGINT) AS T
        FROM documents WHERE length(text) >= 3
    ) t
    GROUP BY 1
"""


_BPE_CTES, _BPE_UNION = bpe_oracle_cte()


@register(
    "q_text_mining",
    oracle=f"""
    WITH fp AS ({_FINGERPRINT_SQL}),
    terms AS ({_SALIENT_SQL}),
    {_DUCK_PII_DOCS},
    pii AS ({_DUCK_PII_SQL}),
    bm25 AS ({_BM25_SQL}),
    lm AS ({_LM_SQL}),
    {_BPE_CTES}
    SELECT 'fp' AS part, doc_id, content_md5 AS skey,
           rolling_hash AS i1, CAST(0 AS BIGINT) AS i2, CAST(0 AS BIGINT) AS i3
    FROM fp
    UNION ALL
    SELECT 'term' AS part, doc_id, token AS skey, tf AS i1, df AS i2, rank AS i3
    FROM terms
    UNION ALL
    SELECT 'pii', doc_id, skey, n, redacted_len, CAST(0 AS BIGINT)
    FROM pii WHERE n > 0
    UNION ALL
    SELECT 'bm25', doc_id, term, tf, df, rank
    FROM bm25
    UNION ALL
    SELECT 'lm', doc_id, '', lm_mass, n_tri, n_rare
    FROM lm
    UNION ALL
    SELECT 'bpe', round, pair, CAST(cnt AS BIGINT), CAST(0 AS BIGINT),
           CAST(0 AS BIGINT)
    FROM ({_BPE_UNION})
    UNION ALL
    SELECT 'bpe_enc', doc_id, enc_md5, bpe_tokens, ws_tokens,
           CAST(0 AS BIGINT)
    FROM ({bpe_apply_oracle_sql()})
    """,
)
def q_text_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text mining suite — document fingerprints (content-md5 + rolling
    hash, the map-only pass), per-doc salient terms (the tf/df
    explode-aggregate pipeline), the PII audit (regex detect + redact
    over injected emails/phones/IPs, map-only), and BM25 keyword
    retrieval (integer-exact single-term ranking, hoisted-tokenization
    HOF tf — the corpus never token-explodes), the char-trigram LM
    quality panel (``lm_score_frame`` — corpus-trained model, integer-
    exact scoring), and the BPE tokenizer — TRAIN (iterative Sennrich
    merge learning on the capped vocab, `operators/bpe.py`) and APPLY
    (map-only broadcast-merge-table encode of every doc) — as one
    part-tagged union. Seven distinct plan shapes deliberately share
    the catalog entry; each keeps its own full value surface
    ((md5, hash) / (token, tf, df, rank) / (type, count, redacted_len)
    / (term, tf, df, rank) / (lm_mass, n_tri, n_rare) / (round, pair,
    cnt) / (enc_md5, bpe_tokens, ws_tokens)) so the driver hash checks
    every cell."""
    # ONE persisted tokenized projection feeds all five parts (r4
    # verdict #2): previously each part re-scanned documents and
    # re-derived its tokens/lowercase image independently — the entry's
    # 10x-scaling ratio (3.18x, the worst in the table) was dominated
    # by that repeated tokenize term. Same justified-persist pattern as
    # q_multimodal_suite's shared decode frame. Memoized per
    # (session, sf_dir) — ADVICE r5: a fresh persist() per invocation
    # accrued one orphaned cache entry per call in a long-lived
    # session; the memo reuses ONE frame, re-registering it if an
    # external clearCache dropped it.
    docs = _tokenized_cached(spark, sf_dir)
    fp = fingerprint_frame(docs).select(
        F.lit("fp").alias("part"),
        "doc_id",
        F.col("content_md5").alias("skey"),
        F.col("rolling_hash").alias("i1"),
        F.lit(0).cast("long").alias("i2"),
        F.lit(0).cast("long").alias("i3"),
    )
    terms = salient_terms_frame(docs).select(
        F.lit("term").alias("part"),
        "doc_id",
        F.col("token").alias("skey"),
        F.col("tf").alias("i1"),
        F.col("df").alias("i2"),
        F.col("rank").alias("i3"),
    )
    pii = (
        pii_frame(docs)
        .filter(F.col("n") > 0)
        .select(
            F.lit("pii").alias("part"),
            "doc_id",
            "skey",
            F.col("n").alias("i1"),
            F.col("redacted_len").alias("i2"),
            F.lit(0).cast("long").alias("i3"),
        )
    )
    bm25 = bm25_topk_frame(docs).select(
        F.lit("bm25").alias("part"),
        "doc_id",
        F.col("term").alias("skey"),
        F.col("tf").alias("i1"),
        F.col("df").alias("i2"),
        F.col("rank").alias("i3"),
    )
    lm = lm_score_frame(docs).select(
        F.lit("lm").alias("part"),
        "doc_id",
        F.lit("").alias("skey"),
        F.col("lm_mass").alias("i1"),
        F.col("n_tri").alias("i2"),
        F.col("n_rare").alias("i3"),
    )
    # sixth part (r6): the BPE merge-table trainer (operators/bpe.py) —
    # iterative, so its rounds EXECUTE during plan construction behind
    # eager localCheckpoints (the components-CC discipline); the final
    # plan carries only the 8-row merge table. Shares the persisted
    # tokenized projection's scan via the vocab groupBy.
    merge_table = train_bpe(docs)
    bpe = merge_table.select(
        F.lit("bpe").alias("part"),
        F.col("round").alias("doc_id"),
        F.col("pair").alias("skey"),
        F.col("cnt").alias("i1"),
        F.lit(0).cast("long").alias("i2"),
        F.lit(0).cast("long").alias("i3"),
    )
    # seventh part: ENCODE every doc with the learned merges — the
    # map-only apply half (broadcast merge array, in-row fold; the
    # enc_md5 gates the full encoding, not just counts).
    bpe_enc = apply_bpe(docs, merge_table).select(
        F.lit("bpe_enc").alias("part"),
        "doc_id",
        F.col("enc_md5").alias("skey"),
        F.col("bpe_tokens").alias("i1"),
        F.col("ws_tokens").alias("i2"),
        F.lit(0).cast("long").alias("i3"),
    )
    return (
        fp.unionByName(terms)
        .unionByName(pii)
        .unionByName(bm25)
        .unionByName(lm)
        .unionByName(bpe)
        .unionByName(bpe_enc)
    )


_NORM_MD5_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')))"
)


def _norm_md5_col() -> Column:
    return F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
            )
        )
    )


# N-gram decontamination parameters: the standard fuzzy-decontamination
# method (flag a training doc if it shares any DECON_N-token n-gram
# with a held-out eval doc — the GPT-3/PaLM discipline, where exact
# hashing misses partial copies). Injection: every 7th non-eval doc
# gets the first DECON_N tokens of its nearest eval doc appended, so
# the flag is observable on a fixture whose random texts share no
# natural n-grams.
DECON_N = 8

# Training corpus with deterministic contamination injection (Spark and
# DuckDB mirror): doc_id % 7 == 0 (and not itself eval) appends the
# first 8 tokens of eval doc (doc_id - doc_id % 10).
_DUCK_DECON_CORPUS = f"""
    eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    train_docs AS (
        SELECT t.doc_id,
               CASE WHEN t.doc_id % 7 = 0
                    THEN t.text || ' ' || array_to_string(
                        (string_split(e.text, ' '))[1:{DECON_N}], ' ')
                    ELSE t.text END AS text
        FROM documents t
        LEFT JOIN eval_docs e ON e.doc_id = t.doc_id - t.doc_id % 10
        WHERE t.doc_id % 10 <> 0
    )
"""


def _decon_grams_sql(src: str) -> str:
    """Distinct DECON_N-gram relation (doc_id, g) over ``src``."""
    return f"""
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - {DECON_N - 1}),
                   i -> array_to_string(string_split(text, ' ')[i:i+{DECON_N - 1}], ' ')
               ))) AS g
        FROM {src}
        WHERE len(string_split(text, ' ')) >= {DECON_N}
    """


def _decon_grams_col() -> Column:
    """Distinct DECON_N-gram array over a pre-split ``toks`` column —
    same hoisted-tokenization discipline as the minhash shingles (an
    inline split re-evaluates per array element)."""
    return F.expr(
        "array_distinct(transform(sequence(0, size(toks) - {n}), "
        "i -> concat_ws(' ', slice(toks, i + 1, {n}))))".format(n=DECON_N)
    )


@register(
    "q_decontaminate_suite",
    oracle=f"""
    WITH eval_set AS (
        SELECT DISTINCT {_NORM_MD5_SQL} AS h
        FROM documents WHERE doc_id % 10 = 0
    ),
    {_DUCK_DECON_CORPUS},
    eval_grams AS (SELECT DISTINCT g FROM ({_decon_grams_sql('eval_docs')})),
    train_grams AS ({_decon_grams_sql('train_docs')})
    SELECT 'exact' AS part, c.doc_id, CAST(0 AS BIGINT) AS n_shared
    FROM (SELECT doc_id, {_NORM_MD5_SQL} AS h FROM documents) c
    WHERE c.h NOT IN (SELECT h FROM eval_set)
    UNION ALL
    SELECT 'ngram', tg.doc_id, COUNT(DISTINCT tg.g)
    FROM train_grams tg JOIN eval_grams eg ON tg.g = eg.g
    GROUP BY tg.doc_id
    """,
)
def q_decontaminate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination, both industry-standard granularities under one
    hash gate (the mandatory counterpart of the fuzzy leakage report
    q_split_leakage_report):

    - part 'exact': drop every training doc whose NORMALIZED content
      hash appears in the held-out eval set (simulated as the
      doc_id % 10 = 0 members of the corpus — removal is BY CONTENT,
      catching any exact copy, not by id); emits the kept doc_ids.
    - part 'ngram': flag every training doc sharing ANY distinct
      8-token n-gram with an eval doc (the GPT-3/PaLM fuzzy method —
      exact hashing misses partial copies), with the shared-gram count
      as evidence. Contamination is injected (every 7th non-eval doc
      carries 8 eval tokens) so the flag fires on random-text fixtures.

    Shape at scale: eval sets are tiny next to a 100 TB corpus, so BOTH
    parts probe broadcast structures — the exact part a broadcast
    left-anti on the fingerprint, the ngram part a broadcast inner join
    on the (distinct, deduped) eval gram set — and the corpus is
    scanned once per part with no corpus-side shuffle before the
    per-doc count aggregate."""
    docs = load_table(spark, sf_dir, "documents")

    withs = docs.select("doc_id", _norm_md5_col().alias("h"))
    eval_set = withs.filter(F.col("doc_id") % 10 == 0).select("h").distinct()
    exact = (
        withs.join(F.broadcast(eval_set), "h", "left_anti")
        .select(
            F.lit("exact").alias("part"),
            "doc_id",
            F.lit(0).cast("long").alias("n_shared"),
        )
    )

    eval_docs = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    train = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .alias("t")
        .join(
            F.broadcast(
                eval_docs.select(
                    F.col("doc_id").alias("e_id"),
                    F.concat_ws(
                        " ", F.slice(F.split("text", " "), 1, DECON_N)
                    ).alias("e_head"),
                )
            ),
            F.col("e_id") == F.col("t.doc_id") - F.col("t.doc_id") % 10,
            "left",
        )
        .select(
            F.col("t.doc_id").alias("doc_id"),
            F.when(
                F.col("t.doc_id") % 7 == 0,
                F.concat_ws(" ", F.col("t.text"), F.col("e_head")),
            )
            .otherwise(F.col("t.text"))
            .alias("text"),
        )
    )

    def grams(frame: DataFrame) -> DataFrame:
        return (
            frame.select("doc_id", F.split("text", " ").alias("toks"))
            .filter(F.size("toks") >= DECON_N)
            .select("doc_id", F.explode(_decon_grams_col()).alias("g"))
        )

    eval_grams = grams(eval_docs).select("g").distinct()
    ngram = (
        grams(train)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .select(F.lit("ngram").alias("part"), "doc_id", "n_shared")
    )
    return exact.unionByName(ngram)
