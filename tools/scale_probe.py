"""Synthetic N× scale probe for the document/embedding operator family.

TESTDATA.md tops out at sf0.1 (5k docs / 2k vectors), so every claim
above that scale rested on plan shape + ceilings + the 10× sf0.01→sf0.1
measurements (r4 verdict "What's missing" #3). This tool adds a third,
bigger point: it synthesizes a DETERMINISTIC ``N×`` corpus from the
sf0.1 fixtures into /tmp and times the heavy catalog entries against it.

Synthesis (DuckDB, single pass, no RNG):
- documents: copy k (1..N-1) of doc d takes the FIRST HALF of d's words
  and the SECOND HALF of doc ``(d + 977·k) mod D``'s words — realistic
  token/shingle distributions, but the halves' shingle overlap with any
  parent stays ~50%, so copies are genuinely new documents, not planted
  near-dup cliques that would change the workload's output character
  (straight copies would hand LSH 5000 20-cliques). Text stays printable
  ASCII (concatenation of ASCII halves) — the load_table probe enforces
  it. n_chars is recomputed; lang/source inherit from the first parent.
- embeddings: copy k of vector v is the element-wise MEAN of v and
  vector ``(v + 353·k) mod V`` — norms stay O(1), the distribution stays
  isotropic-ish, and copies decorrelate from both parents.
- every other table is copied from sf0.1 unchanged (the probed entries
  only scan documents/embeddings; load_table needs the files present).

Usage:
    python tools/scale_probe.py --scale 20 --out /tmp/scale_probe
    python tools/scale_probe.py --scale 20 --out /tmp/scale_probe --measure

Measurement protocol matches bench.py: warm run, then best-of-3 with
clearCache between reps, one line per entry plus a final JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

HEAVY_ENTRIES = [
    "q_text_metrics",
    "q_text_mining",
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_components",
    "q_dedup_embedding_cosine",
    "q_ann_topk_suite",
    "q_embedding_suite",
    "q_multimodal_suite",
    "q_decontaminate_suite",
    # r6: the leakage report gained the component remediation part —
    # its pair-graph cc run is a heavy doc-family kernel now
    "q_split_leakage_report",
]

OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events".split()
)

# r6 (r5 verdict #4): the 20× probe covered documents/embeddings only;
# the warehouse core (etl clean, snapshot build+append, SCD2
# build/merge/PIT, fact build, event sessionization, streaming drains)
# had no measured point beyond sf0.1. These entries run against a
# deterministic key-offset replication of customer/orders/lineitem/
# events (copy k shifts every key by k×its-table's-key-stride, with
# o_custkey/l_orderkey/user_id remapped consistently so referential
# integrity holds and every derived total re-derives); dims and
# documents stay 1×, as dims would at a real 20× fact scale-up. The
# same parquet dir feeds tools/oracle_check.py, so 20× correctness is
# cross-checkable against DuckDB, not just timed.
WAREHOUSE_ENTRIES = [
    "q_etl_clean_staging",
    "q_etl_stages_suite",
    "q_fact_sales",
    "q_fact_monthly_snapshot",
    "q_snapshot_incremental_mom",
    "q55_snapshot_lifetime_read",
    "q_scd2_build",
    "q_scd2_point_in_time",
    "q_merge_upsert_customers",
    "q_sessionize_batch",
    "q_event_funnel_asof",
    "q_stream_windows",
    "q_stream_joins_stateful",
]

# Key strides: one above each table's max key at sf0.1 (customer 15000,
# orders 150000, events event_id 100000 / user_id 1500), so copies are
# collision-free and the scd2 merge fixture's 20M brand-new-key offset
# stays far above every replicated custkey (315k at 20×).
_C_STRIDE, _O_STRIDE, _E_STRIDE, _U_STRIDE = 15_000, 150_000, 100_000, 1_500


def generate_warehouse(scale: int, out: str) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT unnest(generate_series(1, {scale - 1})) AS k)"
    specs = {
        "customer": (
            f"SELECT c_custkey + n.k * {_C_STRIDE} AS c_custkey, c_name, "
            "c_nationkey, c_acctbal, c_mktsegment FROM base a CROSS JOIN "
            "nums n"
        ),
        "orders": (
            f"SELECT o_orderkey + n.k * {_O_STRIDE} AS o_orderkey, "
            f"o_custkey + n.k * {_C_STRIDE} AS o_custkey, o_orderstatus, "
            "o_totalprice, o_orderdate, o_orderpriority FROM base a CROSS "
            "JOIN nums n"
        ),
        "lineitem": (
            f"SELECT l_orderkey + n.k * {_O_STRIDE} AS l_orderkey, "
            "l_partkey, l_suppkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_discount, l_tax, l_returnflag, "
            "l_linestatus, l_shipdate FROM base a CROSS JOIN nums n"
        ),
        "events": (
            f"SELECT event_id + n.k * {_E_STRIDE} AS event_id, ts, "
            f"user_id + n.k * {_U_STRIDE} AS user_id, event_type, value, "
            "props FROM base a CROSS JOIN nums n"
        ),
    }
    for t, mixed_sql in specs.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        con.execute(
            f"""
            COPY (
              WITH base AS (SELECT * FROM {src}), nums AS {reps}
              SELECT * FROM (SELECT * FROM {src}
                             UNION ALL {mixed_sql})
              ORDER BY 1
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
            """
        )
    for t in OTHER_TABLES + ["documents", "embeddings"]:
        if t not in specs:
            shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    n_ord = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/orders.parquet')"
    ).fetchone()[0]
    n_li = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/lineitem.parquet')"
    ).fetchone()[0]
    print(f"# generated {out}: {n_ord} orders, {n_li} lineitems", file=sys.stderr)


def generate(scale: int, out: str) -> None:
    import duckdb

    if scale > 50:
        # _injected_dup_corpus re-ids duplicates at vec_id + 100000;
        # original ids reach scale*2000 - 1, so scale 51+ would alias
        # injected ids onto real vectors and corrupt the workload.
        raise ValueError("doc-corpus synthesis caps at scale 50 "
                         "(vec_id + 100000 dup-injection headroom)")

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    d = f"read_parquet('{SRC}/documents.parquet')"
    con.execute(
        f"""
        COPY (
          WITH base AS (SELECT *, string_split(text, ' ') AS tw FROM {d}),
          nums AS (SELECT unnest(generate_series(1, {scale - 1})) AS k),
          mixed AS (
            SELECT a.doc_id + n.k * 5000 AS doc_id,
                   array_to_string(
                       a.tw[1 : len(a.tw) // 2] ||
                       b.tw[len(b.tw) // 2 + 1 : len(b.tw)], ' ') AS text,
                   a.lang, a.source
            FROM base a
            CROSS JOIN nums n
            JOIN base b ON b.doc_id = (a.doc_id + 977 * n.k) % 5000
          )
          SELECT doc_id, text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM (SELECT doc_id, text, lang, source FROM {d}
                UNION ALL SELECT * FROM mixed)
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    e = f"read_parquet('{SRC}/embeddings.parquet')"
    con.execute(
        f"""
        COPY (
          WITH nums AS (SELECT unnest(generate_series(1, {scale - 1})) AS k),
          mixed AS (
            SELECT a.vec_id + n.k * 2000 AS vec_id,
                   list_transform(list_zip(a.embedding, b.embedding),
                       p -> CAST((p[1] + p[2]) / 2 AS FLOAT)) AS embedding,
                   a.label
            FROM {e} a
            CROSS JOIN nums n
            JOIN {e} b ON b.vec_id = (a.vec_id + 353 * n.k) % 2000
          )
          SELECT * FROM (SELECT * FROM {e} UNION ALL SELECT * FROM mixed)
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in OTHER_TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    n_vec = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')"
    ).fetchone()[0]
    print(f"# generated {out}: {n_docs} docs, {n_vec} vectors", file=sys.stderr)


def generate_bpe_corpus(
    out: str,
    n_docs: int,
    n_vocab: int = 6000,
    words_per_doc: int = 80,
) -> None:
    """Synthetic document corpus with a REAL vocabulary (r8 verdict
    #5): the warehouse fixture's generator writes only 31 distinct
    words, so BPE merges run dry at 107 — useless for probing
    tokenizer-scale merge depth (real tokenizers run 32k merges over
    ~100k-word vocabularies). This builds ≥``n_vocab`` distinct words
    from a 95-syllable CV alphabet (2-4 syllables per word, salted-LCG
    picked — deterministic, seedless-random-free like every generator
    here), then ``n_docs`` documents of ``words_per_doc`` uniform
    picks. Schema matches the warehouse ``documents`` table so
    ``load_table`` reads it unchanged. Vectorized in numpy: the 100k×
    80 word-pick grid generates in seconds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    cons = list("bcdfghjklmnpqrstvwz")
    vow = list("aeiou")
    syll = np.array([c + v for c in cons for v in vow])
    A, C, M = 1103515245, 12345, 2**31
    h = (np.arange(n_vocab, dtype=np.int64) * A + C) % M
    n_syll = 2 + (h % 3)
    parts = []
    hh = h.copy()
    for _ in range(4):
        hh = (hh * A + C) % M
        parts.append(syll[hh % len(syll)])
    stacked = np.stack(parts, axis=1)
    vocab = np.array(
        ["".join(stacked[i, : n_syll[i]]) for i in range(n_vocab)]
    )
    idx = (
        np.arange(n_docs, dtype=np.uint64)[:, None]
        * np.uint64(words_per_doc)
        + np.arange(words_per_doc, dtype=np.uint64)[None, :]
    )
    # uint64 LCG — wraps mod 2^64 by construction, no Python bigints
    g = idx * np.uint64(6364136223846793005) + np.uint64(
        1442695040888963407
    )
    picks = vocab[((g >> np.uint64(16)) % np.uint64(n_vocab)).astype(np.int64)]
    texts = [" ".join(row) for row in picks]
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs, type=pa.string()),
            "source": pa.array(["synthetic-bpe"] * n_docs, type=pa.string()),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, f"{out}/documents.parquet")
    n_distinct = len(set(w for row in picks[: min(n_docs, 2000)] for w in row))
    print(
        f"# generated {out}: {n_docs} docs x {words_per_doc} words, "
        f"vocab {n_vocab} (sampled distinct in first 2k docs: {n_distinct})",
        file=sys.stderr,
    )


def _force_full(df) -> int:
    """Materialize EVERY cell of the result: sum of xxhash64 over all
    columns. A bare count() lets Catalyst PRUNE the expensive value
    columns (a window-heavy 24M-row snapshot counted in 0.4s because
    the cumulative sums were never computed) — the checksum keeps the
    whole value surface in the measured plan while returning one row.
    Used for the warehouse probe; the r5 doc-family table keeps its
    original count() protocol for comparability."""
    from pyspark.sql import functions as F

    df = df.select(
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h"),
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_h").alias("chk")
    ).collect()[0]
    return row.n


def measure(sf_dir: str, scale: int, entries=None, force_full=False) -> None:
    from retail_datawarehouse_spark.registry import catalog
    from retail_datawarehouse_spark.session import get_spark

    spark = get_spark(app_name=f"scale-probe-{scale}x")
    cat = catalog()
    timings: dict[str, float] = {}
    for name in entries or HEAVY_ENTRIES:
        b = cat[name].builder
        act = _force_full if force_full else (lambda d: d.count())
        act(b(spark, sf_dir))  # warm
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = act(b(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 2)
        print(f"# {name}: {best:.2f}s rows={n}", file=sys.stderr)
    print(json.dumps({"scale": scale, "sf_dir": sf_dir, "queries": timings}))
    spark.stop()


def measure_adaptive(sf_dir: str, scale: int, no_fixed: bool = False) -> None:
    """Isolate the r5 probe finding: the embedding-dedup pair
    generators at FIXED fixture capacity (bits=8 / cells=16) vs
    occupancy-constant ADAPTIVE capacity (bits ≈ log2(N/8), cells ≈
    √N) on the same N× corpus. Fixed shows the super-linear per-bucket
    quadratic; adaptive restores the linear term."""
    import math

    from retail_datawarehouse_spark.operators.similarity import (
        _injected_dup_corpus,
        lsh_dup_pairs,
        semdedup_pairs,
    )
    from retail_datawarehouse_spark.session import get_spark
    from retail_datawarehouse_spark.sources.readers import load_table

    spark = get_spark(app_name=f"scale-probe-adaptive-{scale}x")
    corpus = _injected_dup_corpus(load_table(spark, sf_dir, "embeddings"))
    n = corpus.count()
    bits = max(8, min(20, round(math.log2(max(n, 1) / 8))))
    cells = max(16, int(math.isqrt(n)))
    out: dict[str, float] = {}
    coarse = max(4, int(math.isqrt(cells)))
    configs = (
        ("lsh_fixed", lambda: lsh_dup_pairs(corpus)),
        ("lsh_adaptive", lambda: lsh_dup_pairs(corpus, bits=bits)),
        ("sem_fixed", lambda: semdedup_pairs(corpus)),
        ("sem_adaptive_flat", lambda: semdedup_pairs(corpus, cells=cells)),
        ("sem_adaptive_2level",
         lambda: semdedup_pairs(corpus, cells=cells, coarse=coarse)),
        # r6: the in-plan auto modes — must track their hand-derived
        # twins above (same capacity formulae, derived from a 1-row
        # in-plan count instead of a driver-side count()).
        ("lsh_auto", lambda: lsh_dup_pairs(corpus, bits="auto")),
        ("sem_auto", lambda: semdedup_pairs(corpus, cells="auto")),
    )
    if no_fixed:
        # At 50×+ the fixed configs are the KNOWN quadratic and the
        # flat-√N assignment the KNOWN bottleneck (both measured at
        # 20×, BASELINE.md r5) — skipping them bounds the run, not the
        # evidence.
        configs = tuple(
            c for c in configs
            if "fixed" not in c[0] and "flat" not in c[0]
        )
    for label, fn in configs:
        fn().count()  # warm
        best, rows = None, 0
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = fn().count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[label] = round(best, 2)
        print(f"# {label}: {best:.2f}s pairs={rows}", file=sys.stderr)
    print(
        json.dumps(
            {"scale": scale, "n": n, "bits": bits, "cells": cells,
             "coarse": coarse, "timings": out}
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--adaptive", action="store_true",
                    help="fixed vs occupancy-constant capacity A/B on "
                         "the embedding-dedup pair generators")
    ap.add_argument("--no-fixed", action="store_true",
                    help="adaptive mode: skip the fixed-capacity "
                         "configs (quadratic at large N)")
    ap.add_argument("--warehouse", action="store_true",
                    help="synthesize/measure the warehouse-core entries "
                         "(key-offset replicated customer/orders/"
                         "lineitem/events) instead of the doc family")
    ap.add_argument("--baseline", action="store_true",
                    help="measure sf0.1 itself (the 1x reference)")
    ap.add_argument("--bpe-corpus", type=int, default=0, metavar="N_DOCS",
                    help="generate the ≥6k-word synthetic BPE corpus "
                         "with N_DOCS documents into --out and exit "
                         "(r8 verdict #5: the fixture's 31-word vocab "
                         "runs merges dry at 107)")
    args = ap.parse_args()
    if args.bpe_corpus:
        generate_bpe_corpus(args.out, args.bpe_corpus)
        return
    if args.baseline:
        measure(SRC, 1, WAREHOUSE_ENTRIES if args.warehouse else None,
                force_full=args.warehouse)
        return
    if args.warehouse:
        if not os.path.exists(f"{args.out}/orders.parquet"):
            generate_warehouse(args.scale, args.out)
        if args.measure:
            measure(args.out, args.scale, WAREHOUSE_ENTRIES, force_full=True)
        return
    if not os.path.exists(f"{args.out}/documents.parquet"):
        generate(args.scale, args.out)
    if args.adaptive:
        measure_adaptive(args.out, args.scale, no_fixed=args.no_fixed)
    elif args.measure:
        measure(args.out, args.scale)


if __name__ == "__main__":
    main()
