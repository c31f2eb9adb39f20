"""BPE merge-rule training (Sennrich-style byte-pair encoding) as an
iterative Spark job — the tokenizer-training half of a training-data
pipeline (the package's "BPE-ish" regex only COUNTS tokens; this
LEARNS the merge table).

Algorithm (Sennrich, Haddow, Birch 2016 — public): start from the
word-frequency table with each word as a character sequence plus an
end-of-word marker; each round counts adjacent symbol pairs weighted
by word frequency, merges the most frequent pair everywhere, repeats.

Scale shape — why this is Spark-friendly at 100 TB:
- The corpus collapses to the WORD-FREQUENCY VOCAB in one groupBy
  (the standard trainer optimization); every round then iterates on
  the bounded vocab table only — the corpus is scanned exactly once,
  no matter how many merge rounds run.
- Per round: one vocab-sized pair explode + groupBy (bounded by vocab
  × max word length), a 1-row argmax, and a map-side merge against
  the broadcast winner. The vocab is eagerly ``localCheckpoint``ed
  per round (the components-CC lineage-truncation pattern): the round
  r vocab is referenced by BOTH the round r+1 argmax and the round
  r+1 merge, so un-truncated lineage doubles the plan per round
  (2^rounds corpus scans by round 8).
- The vocab is CAPPED (top ``vocab_cap`` words by frequency,
  deterministic freq-desc/word-asc tie-break). Real trainers sample
  for the same reason; the cap is the documented contract, not a
  silent truncation.

Determinism / oracle story: pair counts are integers; the winning
pair is argmax with a total order (count DESC, pair ASC — both
engines compare ASCII strings bytewise); the merge itself is string
``replace``, LEFT-TO-RIGHT NON-OVERLAPPING in both Spark and DuckDB.
Representation matters for the merge to equal BPE's greedy scan:
tokens are joined by TWO spaces and the pair pattern consumes exactly
ONE space from each boundary (`' A  B '` → `' AB '`), so both
neighbouring boundaries survive the replacement and a chain like
``a a a a`` merges to ``aa aa`` in one pass — a single-space encoding
consumes the shared boundary and silently merges only the first pair
of each chain (caught by the greedy-semantics test against the
pure-Python reference). Symbols can never contain a space (non-space
characters plus the ``</w>`` marker), so the encoding is unambiguous.
The DuckDB oracle unrolls the rounds as chained CTEs (the PageRank
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BPE_ROUNDS = 8
BPE_VOCAB_CAP = 256

# double-spaced character sequence + end-of-word marker:
# 'ab' -> 'a  b  </w>' (see module docstring for why two spaces)
_SEQ_SPARK = "concat(regexp_replace(w, '(.)', '$1  '), '</w>')"
_SEQ_DUCK = "regexp_replace(w, '(.)', '\\1  ', 'g') || '</w>'"

# adjacent symbol pairs of the double-spaced form (t = split on two
# spaces), 1-based element_at/list indexing in both engines; the pair
# DISPLAY form keeps a single space ('e s') — the Sennrich convention
_PAIRS_SPARK = (
    "transform(sequence(1, size(t) - 1), "
    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
)

# merge expr: pad with the boundary, replace ' A  B ' -> ' AB ', trim.
# pair is stored single-spaced; the pattern re-expands it to the
# two-space boundary form
_MERGE_SPARK = (
    "trim(replace(concat('  ', seq, '  '), "
    "concat(' ', replace(pair, ' ', '  '), ' '), "
    "concat(' ', replace(pair, ' ', ''), ' ')))"
)


def word_vocab(docs: DataFrame, cap: int = BPE_VOCAB_CAP) -> DataFrame:
    """(w, f) word-frequency vocab from the lowercase image, capped to
    the top ``cap`` words (freq DESC, word ASC — total order). The one
    corpus-sized pass of the whole trainer."""
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(cap)
    )


def _pair_counts(vocab_seq: DataFrame) -> DataFrame:
    """(pair, cnt) adjacent-pair counts over (seq, f) rows. Overlapping
    occurrences each count (standard BPE counting) even though the
    merge is non-overlapping."""
    return (
        vocab_seq.select("f", F.split("seq", "  ").alias("t"))
        .filter(F.size("t") >= 2)
        .select("f", F.explode(F.expr(_PAIRS_SPARK)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    cap: int = BPE_VOCAB_CAP,
) -> DataFrame:
    """Learn ``rounds`` merge rules; returns (round, pair, cnt) — the
    merge table, in learned order. ``docs`` needs a ``text`` column."""
    vocab = word_vocab(docs, cap).select(
        F.expr(_SEQ_SPARK).alias("seq"), "f"
    )
    merge_rows = []
    for r in range(1, rounds + 1):
        vocab = vocab.localCheckpoint(eager=True)  # lineage truncation
        # best is NOT checkpointed: its whole lineage is one pair-count
        # + argmax over the just-checkpointed bounded vocab, so both
        # consumers (the merge-table union and the next round's merge)
        # re-execute only a vocab-sized subtree — and dropping the
        # eager materialization HALVES the trainer's job-barrier count
        # (16 → 8 eager jobs; measured 7.0 → 6.5 s best-of-3 for the
        # whole 7-part q_text_mining at sf0.1).
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("round"), "pair", "cnt"
            )
        )
        merge_rows.append(best)
        vocab = vocab.crossJoin(
            F.broadcast(best.select("pair"))
        ).select(F.expr(_MERGE_SPARK).alias("seq"), "f")
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def apply_bpe(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """ENCODE: tokenize every document with the learned merge table —
    the apply half of the trainer, and the part that actually runs at
    corpus scale. Returns (doc_id, bpe_tokens, ws_tokens, enc_md5).

    Scale shape: pure map-only. The merge table (8 rows) collapses to
    ONE ordered array via a 1-row broadcast crossJoin (the bounds-frame
    pattern — no collect), and each doc encodes in-row: words →
    double-spaced char seq → an ``aggregate`` fold applying the merges
    in learned order → token counts + an md5 over the full encoded doc
    so the gate checks the ENCODING, not just counts. Zero exchanges,
    zero Python; cost is merges × chars per doc, linear in the corpus.
    Word-level apply (BPE never merges across word boundaries), so the
    fold nests inside a ``transform`` over the word array."""
    marr = merges.agg(
        F.array_sort(F.collect_list(F.struct("round", "pair"))).alias("msp")
    ).select(F.expr("transform(msp, m -> m.pair)").alias("ms"))
    enc = (
        "transform(filter(split(lower(text), ' '), w -> length(w) > 0), "
        f"w -> aggregate(ms, {_SEQ_SPARK}, (acc, p) -> "
        "trim(replace(concat('  ', acc, '  '), "
        "concat(' ', replace(p, ' ', '  '), ' '), "
        "concat(' ', replace(p, ' ', ''), ' ')))))"
    )
    return docs.crossJoin(F.broadcast(marr)).select(
        "doc_id",
        F.expr(
            f"aggregate({enc}, 0L, (a, e) -> a + size(split(e, '  ')))"
        ).alias("bpe_tokens"),
        F.expr(f"cast(size({enc}) as long)").alias("ws_tokens"),
        F.expr(f"md5(concat_ws('|', {enc}))").alias("enc_md5"),
    )


def bpe_apply_oracle_sql(rounds: int = BPE_ROUNDS) -> str:
    """DuckDB mirror of ``apply_bpe``; expects the ``bpe_b{r}`` CTEs
    from ``bpe_oracle_cte`` to be in scope (the merge-list scalar
    subquery reads them in round order)."""
    unions = " UNION ALL ".join(
        f"SELECT round, pair FROM bpe_b{r}" for r in range(1, rounds + 1)
    )
    return f"""
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(encs,
                    e -> len(string_split(e, '  ')))), 0) AS BIGINT)
               AS bpe_tokens,
           CAST(len(encs) AS BIGINT) AS ws_tokens,
           md5(array_to_string(encs, '|')) AS enc_md5
    FROM (
        SELECT doc_id,
               list_transform(words, w -> list_reduce(
                   list_prepend({_SEQ_DUCK}, ms),
                   (acc, p) -> trim(replace('  ' || acc || '  ',
                       ' ' || replace(p, ' ', '  ') || ' ',
                       ' ' || replace(p, ' ', '') || ' ')))) AS encs
        FROM (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               w -> len(w) > 0) AS words
            FROM documents
        ),
        (SELECT list(pair ORDER BY round) AS ms FROM ({unions}))
    )
    """


def bpe_oracle_cte(
    rounds: int = BPE_ROUNDS, cap: int = BPE_VOCAB_CAP
) -> tuple[str, str]:
    """DuckDB mirror: returns ``(ctes, unions)`` — the vocab CTE plus
    one (pairs, best, vocab) CTE triple per unrolled round, and the
    UNION ALL over the per-round best-pair CTEs that reassembles the
    merge table (callers splice both into their oracle SQL)."""
    parts = [
        f"""bpe_v0 AS (
        SELECT {_SEQ_DUCK} AS seq, f FROM (
            SELECT w, COUNT(*) AS f FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS w
                FROM documents
            ) WHERE length(w) > 0 GROUP BY w
            ORDER BY f DESC, w ASC LIMIT {cap}
        )
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""bpe_p{r} AS (
        SELECT pair, SUM(f) AS cnt FROM (
            SELECT f, unnest(list_transform(
                range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS pair
            FROM (SELECT f, string_split(seq, '  ') AS t FROM bpe_v{r - 1})
            WHERE len(t) >= 2
        ) GROUP BY pair
    ),
    bpe_b{r} AS (
        SELECT CAST({r} AS BIGINT) AS round, pair, cnt
        FROM bpe_p{r} ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    bpe_v{r} AS (
        SELECT trim(replace('  ' || seq || '  ',
                            ' ' || replace(b.pair, ' ', '  ') || ' ',
                            ' ' || replace(b.pair, ' ', '') || ' ')) AS seq,
               f
        FROM bpe_v{r - 1}, bpe_b{r} b
    )""")
    unions = "\n        UNION ALL ".join(
        f"SELECT round, pair, cnt FROM bpe_b{r}" for r in range(1, rounds + 1)
    )
    return ",\n    ".join(parts), unions
