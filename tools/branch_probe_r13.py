"""r13 optimization probe: per-branch attribution of the bench headline
rows (guide §1 — measure first, isolate with the noop-equivalent
force_full action the bench times).

Usage: python tools/branch_probe_r13.py [sf_dir]

Prints one JSON line per probe: {"probe": name, "sec": best_of_3,
"rows": n}. Each probe clearCache()s first so persisted shared frames
are rebuilt inside the measured region exactly as a bench rep pays
them (bench.py clears between reps).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import force_full  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402


def timed(spark, name, build, reps=3):
    best, n = None, 0
    build(spark)  # warm (plan/codegen/listing; stored-index build memoized)
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = force_full(build(spark))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"probe": name, "sec": round(best, 4), "rows": n}))
    sys.stdout.flush()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="branch-probe-r13")

    from retail_datawarehouse_spark.operators import similarity as sim

    emb = lambda s: sim.load_table(s, sf_dir, "embeddings")  # noqa: E731

    # --- ANN suite branch attribution -----------------------------------
    def shared_build(s):
        # returns the corpus frame; force_full over the union of the
        # shared persisted frames approximates the one-time build cost a
        # rep pays before any branch scores
        sh = sim._suite_shared(s, sf_dir)
        return (
            sh["assigned"]
            .select("id")
            .unionByName(sh["coded"].select(F.col("candidate_id").alias("id")))
            .unionByName(
                sh["coded_res"].select(F.col("candidate_id").alias("id"))
            )
        )

    timed(spark, "suite_shared_build", shared_build)

    def mk_branch(which):
        def build(s):
            sh = sim._suite_shared(s, sf_dir)
            q = sim._ann_queries(emb(s))
            if which == "exact":
                return sim._exact_topk(q, sh["corpus"])
            if which == "vectorized":
                return sim._vectorized_topk(q, sh["corpus"])
            if which == "lsh":
                return sim._lsh_topk(q, sh["corpus"])
            if which == "adc":
                return sim._adc_topk(q, sh["corpus"])
            if which == "ivf3":
                a, b, c = sim._ivf_pair_branches(q, sh, sim.IVF_NPROBE)
                return a.unionByName(b).unionByName(c)
            if which == "stored_pair":
                flt, adc = sim._stored_suite_branches(s, sf_dir, q)
                return flt.unionByName(adc)
            raise ValueError(which)

        return build

    for which in ("exact", "vectorized", "lsh", "adc", "ivf3", "stored_pair"):
        timed(spark, f"suite_{which}", mk_branch(which))

    from retail_datawarehouse_spark.registry import catalog

    cat = catalog()
    timed(spark, "suite_full", lambda s: cat["q_ann_topk_suite"].builder(s, sf_dir))

    # --- ETL clean variants ---------------------------------------------
    from retail_datawarehouse_spark.etl import clean

    timed(
        spark,
        "etl_clean_current",
        lambda s: cat["q_etl_clean_staging"].builder(s, sf_dir),
    )

    def etl_narrow_anti(s):
        # offenders from a NARROW recompute (3 cols, no part join),
        # anti-joined into the wide pipeline: no wide-payload shuffle.
        staging = clean.build_staging(s, sf_dir)
        df = clean.rename_columns(staging)
        df = clean.drop_critical_nulls(df)
        df = clean.fill_unknown(df)
        df = clean.parse_date(df)
        df = clean.parse_time(df)
        df = clean.cast_ids(df)
        # narrow offender side
        li = sim.load_table(s, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate"
        )
        orders = sim.load_table(s, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        date_str = F.date_format("l_shipdate", "M/d/yyyy")
        slim = (
            li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
            .select(
                F.col("l_orderkey").cast("long").alias("transaction_id"),
                F.col("o_custkey").cast("long").alias("Customer_ID"),
                F.try_to_date(
                    F.when(F.col("l_orderkey") % 97 == 0, F.lit(None))
                    .when(F.col("l_orderkey") % 89 == 0, F.lit("not-a-date"))
                    .otherwise(date_str),
                    "M/d/yyyy",
                ).alias("Date_dt"),
            )
            .filter(
                F.col("Customer_ID").isNotNull() & F.col("Date_dt").isNotNull()
            )
        )
        offenders = (
            slim.groupBy("transaction_id")
            .agg(
                F.min("Customer_ID").alias("_mnc"),
                F.max("Customer_ID").alias("_mxc"),
                F.min("Date_dt").alias("_mnd"),
                F.max("Date_dt").alias("_mxd"),
            )
            .filter(
                (F.col("_mnc") != F.col("_mxc"))
                | (F.col("_mnd") != F.col("_mxd"))
            )
            .select("transaction_id")
        )
        df = df.join(F.broadcast(offenders), "transaction_id", "left_anti")
        df = clean.derive_smart_keys(df)
        df = clean.sentinel_fill(df)
        return clean.project_final(df, clean.FINAL_COLUMNS)

    timed(spark, "etl_narrow_anti", etl_narrow_anti)

    # --- snapshot variants ----------------------------------------------
    timed(
        spark,
        "snapshot_current",
        lambda s: cat["q_fact_monthly_snapshot"].builder(s, sf_dir),
    )

    def snapshot_count1(s):
        # countDistinct(o_orderkey) -> count(1): o_orderkey is the orders
        # PK, unique per row, so the distinct rewrite's extra exchange
        # buys nothing.
        from retail_datawarehouse_spark.functions.money import dec
        from pyspark.sql import Window

        orders = sim.load_table(s, sf_dir, "orders")
        customer = sim.load_table(s, sf_dir, "customer")
        monthly = orders.groupBy(
            F.col("o_custkey").alias("customer_key"),
            F.date_trunc("month", "o_orderdate").cast("date").alias(
                "month_start"
            ),
        ).agg(
            F.sum(dec("o_totalprice")).alias("month_spend"),
            F.count(F.lit(1)).alias("month_orders"),
        )
        months = monthly.select("month_start").distinct()
        spine = customer.select(
            F.col("c_custkey").alias("customer_key")
        ).crossJoin(F.broadcast(months))
        snap = (
            spine.join(monthly, ["customer_key", "month_start"], "left")
            .withColumn(
                "month_total_dec",
                F.coalesce(F.col("month_spend"), F.lit(0).cast("decimal(18,4)")),
            )
            .withColumn(
                "month_order_count", F.coalesce(F.col("month_orders"), F.lit(0))
            )
        )
        w = (
            Window.partitionBy("customer_key")
            .orderBy("month_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        snap = snap.withColumn("lifetime_dec", F.sum("month_total_dec").over(w))
        return snap.select(
            "customer_key",
            F.date_format("month_start", "MMyyyy").alias("month_key"),
            F.date_format("month_start", "yyyy-MM-dd").alias("month_iso"),
            F.col("month_total_dec").cast("double").alias("month_total_spent"),
            "month_order_count",
            F.col("lifetime_dec").cast("double").alias(
                "customer_lifetime_spent"
            ),
        )

    timed(spark, "snapshot_count1", snapshot_count1)

    def snapshot_repart(s):
        # count1 fix + repartition the 15k-row customer side BEFORE the
        # spine cross join: the broadcast joins preserve the left
        # partitioning, so the window's exchange moves from AFTER
        # densification (customers x months wide rows) to BEFORE it
        # (customer keys only) — guide §2.3/§2.4: shuffle fewer bytes,
        # establish the partitioning once.
        from retail_datawarehouse_spark.functions.money import dec
        from pyspark.sql import Window

        orders = sim.load_table(s, sf_dir, "orders")
        customer = sim.load_table(s, sf_dir, "customer")
        monthly = orders.groupBy(
            F.col("o_custkey").alias("customer_key"),
            F.date_trunc("month", "o_orderdate").cast("date").alias(
                "month_start"
            ),
        ).agg(
            F.sum(dec("o_totalprice")).alias("month_spend"),
            F.count(F.lit(1)).alias("month_orders"),
        )
        months = monthly.select("month_start").distinct()
        spine = (
            customer.select(F.col("c_custkey").alias("customer_key"))
            .repartition("customer_key")
            .crossJoin(F.broadcast(months))
        )
        snap = (
            spine.join(F.broadcast(monthly), ["customer_key", "month_start"], "left")
            .withColumn(
                "month_total_dec",
                F.coalesce(F.col("month_spend"), F.lit(0).cast("decimal(18,4)")),
            )
            .withColumn(
                "month_order_count", F.coalesce(F.col("month_orders"), F.lit(0))
            )
        )
        w = (
            Window.partitionBy("customer_key")
            .orderBy("month_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        snap = snap.withColumn("lifetime_dec", F.sum("month_total_dec").over(w))
        return snap.select(
            "customer_key",
            F.date_format("month_start", "MMyyyy").alias("month_key"),
            F.date_format("month_start", "yyyy-MM-dd").alias("month_iso"),
            F.col("month_total_dec").cast("double").alias("month_total_spent"),
            "month_order_count",
            F.col("lifetime_dec").cast("double").alias(
                "customer_lifetime_spent"
            ),
        )

    timed(spark, "snapshot_repart", snapshot_repart)

    timed(
        spark,
        "q55_current",
        lambda s: cat["q55_snapshot_lifetime_read"].builder(s, sf_dir),
    )

    def q55_repart(s):
        from retail_datawarehouse_spark.functions.money import dec
        from pyspark.sql import Window

        orders = sim.load_table(s, sf_dir, "orders")
        customer = sim.load_table(s, sf_dir, "customer")
        monthly = orders.groupBy(
            F.col("o_custkey").alias("customer_key"),
            F.date_trunc("month", "o_orderdate").cast("date").alias(
                "month_start"
            ),
        ).agg(F.sum(dec("o_totalprice")).alias("month_spend"))
        months = monthly.select("month_start").distinct()
        spine = (
            customer.select(F.col("c_custkey").alias("customer_key"))
            .repartition("customer_key")
            .crossJoin(F.broadcast(months))
        )
        snap = spine.join(
            F.broadcast(monthly), ["customer_key", "month_start"], "left"
        ).withColumn(
            "month_total_spent",
            F.coalesce(F.col("month_spend"), F.lit(0).cast("decimal(18,4)")),
        )
        w = (
            Window.partitionBy("customer_key")
            .orderBy("month_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            snap.withColumn("lifetime", F.sum("month_total_spent").over(w))
            .filter(F.col("month_start") == F.lit("1998-06-01").cast("date"))
            .select(
                "customer_key",
                F.col("month_total_spent").cast("double").alias(
                    "month_total_spent"
                ),
                F.col("lifetime").cast("double").alias(
                    "customer_lifetime_spent"
                ),
            )
            .orderBy("customer_key")
        )

    timed(spark, "q55_repart", q55_repart)

    # --- serving row: handle-less vs memoized open ------------------------
    timed(
        spark,
        "q51_current",
        lambda s: cat["q51_sales_by_hour"].builder(s, sf_dir),
    )
    timed(
        spark,
        "q_text_metrics_current",
        lambda s: cat["q_text_metrics"].builder(s, sf_dir),
    )

    def text_metrics_toks_once(s):
        # Two-level projection: derive toks/tl ONCE in a lower Project;
        # CollapseProject keeps the boundary because the aliases are
        # non-cheap and multiply referenced, so every panel reads the
        # same computed array instead of re-splitting text per panel.
        from retail_datawarehouse_spark.operators import textual as tx

        docs = tx.load_table(s, sf_dir, "documents")
        bound = docs.select(
            "doc_id",
            "text",
            "lang",
            F.split("text", " ").alias("_toks"),
        )
        toks = F.col("_toks")
        text = F.col("text")
        n_tokens = F.size(toks).cast("long")
        n_stop = None
        for w in tx.STOPWORDS:
            c = tx._count_occurrences(text, w)
            n_stop = c if n_stop is None else (n_stop + c)
        sw_ratio = n_stop.cast("double") / n_tokens
        n_distinct = F.size(F.array_distinct(toks)).cast("long")
        ttr = n_distinct.cast("double") / n_tokens
        mean_word = (F.length(text) - n_tokens + 1).cast("double") / n_tokens
        quality = [
            n_tokens.alias("n_tokens"),
            n_stop.alias("n_stopwords"),
            sw_ratio.alias("stopword_ratio"),
            (
                F.regexp_count(text, F.lit("[^A-Za-z0-9 ]")).cast("double")
                / F.length(text)
            ).alias("punct_ratio"),
            (F.length(text).cast("double") / n_tokens).alias("avg_token_len"),
            ((F.length(text) >= 100) & sw_ratio.between(0.01, 0.6)).alias(
                "passes_quality"
            ),
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
        grams = F.when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.transform(F.array(F.lit(0)), lambda _: grams).getItem(0)
        n_tri = F.size(grams).cast("long")
        n_dis = F.size(F.array_distinct(grams)).cast("long")
        repetition = [
            n_tri.alias("n_trigrams"),
            n_dis.alias("n_distinct_trigrams"),
            F.when(n_tri > 0, (n_tri - n_dis).cast("double") / n_tri).alias(
                "dup_ratio"
            ),
        ]
        tiles = F.transform(
            F.sequence(
                F.lit(0),
                F.floor((F.size(toks) - 1) / F.lit(tx.TILE_WORDS)).cast("int"),
            ),
            lambda j: F.array_join(
                F.slice(toks, j * tx.TILE_WORDS + 1, tx.TILE_WORDS), " "
            ),
        )
        tiles = F.transform(F.array(F.lit(0)), lambda _: tiles).getItem(0)
        kept = F.array_distinct(tiles)
        tile_cols = [
            F.size(tiles).cast("long").alias("n_tiles"),
            F.size(kept).cast("long").alias("n_kept_tiles"),
            F.md5(F.array_join(kept, " ").cast("binary")).alias(
                "dedup_text_md5"
            ),
        ]
        token_stats = [
            F.length("text").cast("long").alias("n_chars"),
            F.size(toks).cast("long").alias("n_ws_tokens"),
            F.regexp_count("text", F.lit(tx.WORD_TOKEN_RE))
            .cast("long")
            .alias("n_word_tokens"),
            F.regexp_count("text", F.lit("[0-9]+"))
            .cast("long")
            .alias("n_number_tokens"),
        ]
        return bound.select(
            "doc_id",
            *token_stats,
            *quality,
            *tx.langid_cols(),
            *repetition,
            *tile_cols,
        )

    timed(spark, "text_metrics_toks_once", text_metrics_toks_once)
    timed(
        spark,
        "minhash_current",
        lambda s: cat["q_dedup_minhash_lsh"].builder(s, sf_dir),
    )
    spark.stop()


if __name__ == "__main__":
    main()
