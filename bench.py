"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timed action is a FULL-WIDTH checksum (``force_full``), not count():
count() lets Catalyst prune computed columns out of the timed plan,
under-measuring projection-shaped entries (r7 verdict #1 — rebaselined
r8; the paired count/checksum run is in BASELINE.md).

r11 rebaseline (r10 verdict #1): the record additionally times the
STORED-INDEX serving path (two ``x_ann_serve_*`` rows inside
``queries``/``value`` — bench builds one IVF×PQ index per run, see
``bench_serving``) and carries a fixed-work calibration figure
(``calib_sec``/``box_factor``) so a loaded-box record is
self-interpreting without BASELINE.md archaeology (r10 verdict
"what's wrong" #2). r11+ totals therefore sit ~1-2 s above the
r8-r10 lineage by construction; per-row values stay comparable.

r12 measurement tightening (r11 verdict #3/#4): calibration samples
BOTH ends of the run (``calib_pre``/``calib_post``; ``box_factor`` =
max — a burst at either boundary can no longer self-report quiet) and
the two serving rows report MEDIAN-of-``SERVE_REPS``=5 instead of
best-of-3 (they are ~1.5 s quantities with ~2x quiet spread under
min-of-3; the median is the two-sided robust estimator the decode-tax
canary needs). Catalog rows keep the exact r8+ protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.registry import catalog  # noqa: E402
from retail_datawarehouse_spark.session import get_spark  # noqa: E402

# Headline set: the reference's five analytical queries + the heavy
# engine pieces (ETL clean, snapshot build, dedup, ANN). Every name MUST
# exist in the catalog — a silent skip would shrink the measured set and
# flatter the recorded total after a rename, so absence is a hard error.
HEADLINE = [
    "q51_sales_by_hour",
    "q52_top10_products",
    "q53_sales_by_shipping_tier",
    "q54_rising_spend_customers",
    "q55_snapshot_lifetime_read",
    "q_etl_clean_staging",
    "q_fact_monthly_snapshot",
    "q_dedup_minhash_lsh",
    # Renamed by the round-2 catalog consolidation: the ANN suite runs
    # all four top-k strategies (exact + vectorized + lsh + ivf) and
    # q_text_metrics fuses the four per-doc text panels into one scan —
    # so these two rows measure MORE work than their r1 ancestors
    # (q_ann_cosine_topk, q_text_quality); see BASELINE.md.
    "q_ann_topk_suite",
    "q_text_metrics",
]

# Timed reps per headline entry; the reported figure is the best (min).
# Pinned by tests/test_oracle_parity.py — lowering it back to 1 would
# silently re-expose the driver BENCH rows to box noise.
BENCH_REPS = 3

# Serving rows get a WIDER protocol (r12; r11 verdict #4): the
# decode-tax canary keys on a ~1.5 s row that showed ~2x spread across
# quiet runs under best-of-3 (r11 verdict "what's wrong" #2 — job
# latency noise on a small quantity, while catalog rows move ±20%).
# MEDIAN of SERVE_REPS=5 is robust to one slow rep in either direction
# where min-of-3 keeps whichever tail the box hands it; bands re-derived
# from the r12 quiet profiles (tools/bench_profile_r12.json).
SERVE_REPS = 5

# Per-entry driver-protocol budget (r6 verdict #2): the SHARE of the
# headline total each row may spend. Shares, not seconds, because box
# load inflates entries roughly uniformly (the r6 attribution analysis:
# untouched kernels +14-27% across the board) — a share band detects
# the one failure mode that actually bit (a single entry accreting
# fixed latency: the r6 PQ branch grew one row +183% to 37% of the
# headline) on ANY box, quiet or loaded. Bands sit ~2x above each
# entry's widest observed share across the TWO r8 quiet FULL-WIDTH
# profiles (re-derived with the force_full rebaseline, r7 verdict #1;
# BASELINE.md round-8 table records the derivation and the committed
# profiles live in tools/bench_profile_r08.json); exceeding one means
# a structural change landed in that entry's plan, not that the box
# got slow. check_budgets is pure so the canary mechanism is
# unit-testable red (tests/test_oracle_parity.py slows one entry
# synthetically), and a standing test replays it over every committed
# BENCH_r{N>=8}.json at HEAD. The ANN suite band is deliberately
# tighter than 2x (observed 26%) — it is the dominant row and the one
# that has actually accreted before.
BENCH_SHARE_BUDGET = {
    "q51_sales_by_hour": 0.07,
    "q52_top10_products": 0.16,
    "q53_sales_by_shipping_tier": 0.17,
    "q54_rising_spend_customers": 0.09,
    "q55_snapshot_lifetime_read": 0.17,
    "q_etl_clean_staging": 0.32,
    "q_fact_monthly_snapshot": 0.20,
    "q_dedup_minhash_lsh": 0.24,
    "q_ann_topk_suite": 0.45,
    "q_text_metrics": 0.16,
    # Stored-index SERVING rows (r11, r10 verdict #1): the decode-tax
    # class — wave cost growing with a store-time knob — regressed
    # invisibly in r10 because no BENCH record timed query_ivf_index.
    # Bands ~2x the r11 quiet profile shares
    # (tools/bench_profile_r11.json); note the committed-records replay
    # checks these only on records that CONTAIN them (r11+).
    "x_ann_serve_default": 0.20,
    "x_ann_serve_adc": 0.10,
    # Debt-bearing serving row (r13; r12 verdict #2): the tombstone
    # screen (_without_tombstones — a broadcast anti-join on every
    # serving tier) was a permanent hot-path node with NO budgeted row,
    # the exact unmeasured-class blind spot the r10 decode tax
    # exploited. This row serves the default operating point AFTER
    # deleting ~1% of the index's ids, so the screen's cost is inside a
    # banded measurement. Quiet share 6.9%/6.4% (the r13 quiet profile
    # + quiet tail, tools/bench_profile_r13.json) → band 0.20 ≈ 2.9×
    # headroom, matching the default row's ratio; the band fired
    # ORGANICALLY during the r13 profiling session on a sustained tail
    # burst (22% of headline, named) — recorded in the profile file.
    "x_ann_serve_debt": 0.20,
}

# Serving-row names (not catalog entries — they need a stored on-disk
# index, which bench builds once per run; see bench_serving).
SERVE_ROWS = ("x_ann_serve_default", "x_ann_serve_adc", "x_ann_serve_debt")

# Fraction of the built index's ids tombstoned before the debt row is
# timed (r13): ~1% — a realistic steady-state debt for a corpus under
# max_tombstones policy, large enough (≥hundreds of ids at sf0.1) that
# a screen-cost regression moves the row, small enough that the row
# measures the SCREEN, not a different index.
SERVE_DEBT_FRACTION = 0.01

# Quiet-box reference for the fixed calibration job (r10 verdict
# "what's wrong" #2: a loaded-box BENCH record needed BASELINE.md
# archaeology to read correctly). The calibration workload is
# repo-code-independent (a fixed-size xxhash64 fold over range()), so
# box_factor = calib_sec / CALIB_QUIET_SEC travels IN the record and
# makes it self-interpreting: ~1.0 on a quiet box, >1.3 says the row
# inflation is box load, not code. Re-measure deliberately if Spark or
# the container image changes (recorded in BASELINE.md round 11).
CALIB_QUIET_SEC = 0.55
CALIB_N = 4_000_000_000

# Quiet reference for the PRE-run sample (r12): the two calibration
# samples live at DIFFERENT JVM lifecycle points — the pre-run sample
# is the session's second-ever job (one warm rep notwithstanding,
# executor pools/JIT tiers/memory arenas keep warming for minutes),
# and the committed r12 quiet pair measured pre 0.72-0.85 vs post
# 0.51-0.62 on the same idle box with near-identical catalog totals.
# One shared reference would brand every quiet record ~1.4 loaded on
# the pre side; separate references normalize each sample against its
# own lifecycle point (tools/bench_profile_r12.json records the
# derivation).
CALIB_QUIET_PRE_SEC = 0.80


def force_full(df) -> int:
    """The timed action: materialize EVERY cell of the result via a
    full-width xxhash64 checksum, returning the row count. A bare
    ``count()`` lets Catalyst PRUNE every computed column the count
    doesn't need — verified r7: q_text_metrics' optimized plan under
    count() collapsed to ``Aggregate[count(1)] ← Project[] ← parquet``
    (the five-panel computation never ran; the row measured a bare
    scan) and q_fact_monthly_snapshot's Window node vanished entirely
    (0.31 s counted vs 1.72 s full-width at the same sf — 5.5×
    under-measured). The checksum keeps the whole value surface in the
    measured plan while still returning one row to the driver — the
    exact recipe tools/scale_probe.py adopted after the same
    count()-pruning discovery in r6. BASELINE.md's round-8 table
    records one paired count()/checksum run so the 2×-gate lineage
    survives the rebaseline."""
    row = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_h").alias("chk"))
        .collect()[0]
    )
    return row.n


def calibration(spark) -> float:
    """Warm rep + best-of-3 of the fixed calibration job: a
    CALIB_N-row xxhash64 fold through range() — pure JVM, zero repo
    code, constant work — so its ratio against CALIB_QUIET_SEC reports
    the box state INSIDE the record (see the constant's comment).

    The unrecorded WARM rep matters for the r12 PRE-run sample: as the
    session's very first job, even best-of-3 stayed JIT/codegen-cold —
    measured calib_pre ≈ 0.77 twice on an IDLE box (post ≈ 0.51),
    i.e. a systematic 1.4× bias that the max rule would read as
    permanent load. The warm rep removes the bias; the post-run sample
    is warm either way, so its value is unchanged."""

    def run() -> float:
        t0 = time.perf_counter()
        (
            spark.range(CALIB_N)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.sum("h"))
            .collect()
        )
        return time.perf_counter() - t0

    run()  # warm: JIT tiers + codegen for this plan
    return round(min(run() for _ in range(BENCH_REPS)), 4)


def bench_serving(spark, sf_dir: str, timings: dict[str, float]) -> float:
    """Time the STORED-INDEX serving path (r10 verdict #1: bench never
    timed ``query_ivf_index``, so the decode-tax regression — ADC wave
    cost growing O(PQ_M²·pq_k) with the store-time code budget — stayed
    invisible to every BENCH record while all ten catalog rows stayed
    green). Builds one IVF×PQ index per run over a deterministic 10×
    expansion of the sf dir's embeddings (directional perturbations, so
    the corpus isn't just scale-invariant copies), then times two waves
    with a warm rep + MEDIAN-of-SERVE_REPS protocol (r12 — the catalog
    rows keep best-of-BENCH_REPS; see the SERVE_REPS comment for why
    these two rows get the wider, two-sided estimator):

    - ``x_ann_serve_default``: the recommended operating point — ADC
      nomination + exact rerank (nprobe=K//8, R=64).
    - ``x_ann_serve_adc``: the pure-ADC wave (codes only, no float
      reads) — the row that would have caught the decode tax.

    Returns the one-time index build seconds (recorded in the JSON as
    ``ann_index_build_sec`` — informational, not a budgeted row: it is
    a once-per-deployment cost, not a wave cost)."""
    import shutil
    import tempfile

    from retail_datawarehouse_spark.operators.ann_index import (
        delete_from_ivf_index,
        open_ivf_index,
        query_ivf_index,
        store_ivf_index,
    )
    from retail_datawarehouse_spark.operators.similarity import N_QUERIES
    from retail_datawarehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    # 10× deterministic expansion: copy k perturbs each component by a
    # k- and position-dependent sine, so copies spread directionally
    # (pure scale copies would collapse into their parents' cells and
    # understate probe fan-out). Offset base = max(id)+1 keeps ids
    # collision-free at any sf.
    base = corpus.agg(F.max("id")).first()[0] + 1
    ks = spark.range(1, 10).select(F.col("id").cast("int").alias("k"))
    expanded = corpus.select("id", "emb").unionByName(
        corpus.crossJoin(ks).select(
            (F.col("id") + F.col("k").cast("long") * F.lit(base)).alias(
                "id"
            ),
            F.transform(
                "emb",
                lambda x, i: x
                + F.lit(0.05)
                * F.col("k")
                * F.sin((i + 1) * (F.col("k") + 1)),
            ).alias("emb"),
        )
    )
    workdir = tempfile.mkdtemp(prefix="bench_ann_index_")
    index_dir = f"{workdir}/index"
    try:
        t0 = time.perf_counter()
        store_ivf_index(expanded, index_dir, pq=True)
        build_sec = round(time.perf_counter() - t0, 4)
        handle = open_ivf_index(spark, index_dir, persist=True)
        k = handle.centroids.count()
        nprobe = max(1, k // 8)
        waves = {
            "x_ann_serve_default": {"pq": True, "rerank": 64},
            "x_ann_serve_adc": {"pq": True, "rerank": None},
        }
        import statistics

        def timed_row(name, kw, h):
            run = lambda: force_full(  # noqa: E731
                query_ivf_index(
                    queries, index_dir, nprobe=nprobe, handle=h, **kw
                )
            )
            run()  # warm
            # median of SERVE_REPS (r12): robust two-sided estimator
            # for the small-magnitude serving rows the decode-tax
            # canary keys on — see the SERVE_REPS constant's comment
            reps, n = [], 0
            for _ in range(SERVE_REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = run()
                reps.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(reps), 4)
            print(
                f"# {name}: {timings[name]:.3f}s rows={n} "
                f"(K={k} nprobe={nprobe} reps={[round(r, 3) for r in reps]})",
                file=sys.stderr,
            )

        for name, kw in waves.items():
            timed_row(name, kw, handle)
        # Debt-bearing serving (r13; r12 verdict #2): tombstone ~1% of
        # the index's ids, refresh the handle (the wave-boundary
        # consistency point), and time the DEFAULT operating point with
        # the screen's broadcast anti-join live in the plan. Runs LAST
        # so the zero-debt rows keep their exact r11/r12 lineage.
        mod = max(2, int(1 / SERVE_DEBT_FRACTION))
        victims = (
            spark.read.parquet(handle.cells_path)
            .select("id")
            .filter(F.col("id") % mod == 0)
        )
        n_debt = delete_from_ivf_index(victims, index_dir)
        handle = handle.refresh(spark)
        print(f"# x_ann_serve_debt: {n_debt} tombstones", file=sys.stderr)
        timed_row(
            "x_ann_serve_debt", {"pq": True, "rerank": 64}, handle
        )
        handle.close()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return build_sec


def box_fields(
    calib_pre: float, calib_mid: float, calib_post: float
) -> dict:
    """Self-interpretation fields for the record (r12; r11 verdict
    #3): the calibration samples BOTH ends of the run — the r11
    single end-of-run sample let a 40.29 s burst record self-report
    quiet (box_factor 1.101) because the burst ended before the
    calibration ran. ``box_factor`` is the MAX of the samples'
    ratios, each normalized against its OWN lifecycle-point quiet
    reference (see ``CALIB_QUIET_PRE_SEC``), so a burst present at
    either boundary shows. r13 adds the MID-run sample (r12 verdict
    #5): taken between the catalog phase and the serving build, it
    closes most of the strictly-interior-burst residual — a burst must
    now dodge three sample points instead of two to self-report quiet
    (per-row calibration remains deliberately out: it would dwarf the
    rows it measures). The mid sample is warm (the catalog phase ran),
    so it shares the post sample's quiet reference.
    ``calib_sec`` keeps its exact r8-r12 lineage meaning — the
    POST-run sample, same protocol every prior record used."""
    return {
        "calib_pre": calib_pre,
        "calib_mid": calib_mid,
        "calib_post": calib_post,
        "calib_sec": calib_post,
        "box_factor": round(
            max(
                calib_pre / CALIB_QUIET_PRE_SEC,
                calib_mid / CALIB_QUIET_SEC,
                calib_post / CALIB_QUIET_SEC,
            ),
            3,
        ),
    }


def check_budgets(timings: dict[str, float]) -> list[str]:
    """Entries whose share of the headline total exceeds their budget
    band. Returns violation strings (empty = all within budget)."""
    total = sum(timings.values())
    if total <= 0:
        return []
    out = []
    for name, sec in timings.items():
        band = BENCH_SHARE_BUDGET.get(name)
        if band is not None and sec / total > band:
            out.append(
                f"{name}: {sec / total:.0%} of headline exceeds its "
                f"{band:.0%} budget ({sec:.2f}s of {total:.2f}s)"
            )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="retail-dw-bench")
    cat = catalog()

    missing = [name for name in HEADLINE if name not in cat]
    if missing:
        raise SystemExit(
            f"bench.py: headline queries absent from catalog: {missing}. "
            "Renamed entries must be updated here, never skipped."
        )

    calib_pre = calibration(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        builder = cat[name].builder
        force_full(builder(spark, sf_dir))  # warm: JVM/code paths, listing
        # Best-of-N timed reps: on a shared box a single rep inherits
        # whatever scheduling jitter lands on it and a one-off slow rep
        # reads as a code regression (round-4 recorded minhash at 3.29 s
        # against a quiet 2.5-2.6 s band with zero code change on that
        # path). The MIN of 3 reps is the run least polluted by external
        # noise — the quantity the 2x gate is meant to compare.
        # clearCache between reps so persisted diamond intermediates are
        # recomputed and every rep measures full computation.
        best, n = None, 0
        for _ in range(BENCH_REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = force_full(builder(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    calib_mid = calibration(spark)  # r13: the interior sample
    build_sec = bench_serving(spark, sf_dir, timings)
    calib_post = calibration(spark)

    # budget canary: warn on stderr (stdout stays ONE JSON line for the
    # driver); the pytest canary turns these into failures
    for violation in check_budgets(timings):
        print(f"# BUDGET EXCEEDED — {violation}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "ann_index_build_sec": build_sec,
                **box_fields(calib_pre, calib_mid, calib_post),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
