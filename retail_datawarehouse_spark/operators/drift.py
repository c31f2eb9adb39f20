"""Distribution-drift detection between a reference and a current slice.

A training-data pipeline re-ingests sources continuously; the question
"did this batch's distribution move?" has to be answered BEFORE the
batch joins the corpus. This module implements the two standard drift
tests in a cross-engine-exact (oracle-hashable) formulation:

- **Categorical drift** — scaled total-variation distance (TVD) between
  the reference and current frequency vectors of a key column. True
  TVD is ``0.5·Σ|p_cur(k) − p_ref(k)|``; to keep the statistic exact
  (the correctness gate hash-compares against DuckDB, and any division
  produces engine-dependent low bits), we work with the *scaled*
  integer form ``tvd_scaled = Σ|c_cur(k)·N_ref − c_ref(k)·N_cur|``
  where ``TVD = tvd_scaled / (2·N_ref·N_cur)`` — pure integer
  arithmetic, identical in both engines, and the drift FLAG compares
  it against a per-mille threshold in the same integer domain:
  ``drift ⇔ tvd_scaled·1000 > 2·N_ref·N_cur·thresh_permille``.

- **Numeric drift** — Kolmogorov–Smirnov statistic over a *binned*
  ECDF. Exact KS needs the full ordered CDF (a global sort — at 100 TB
  you never do that for a monitoring statistic); the standard scale
  formulation bins the value into fixed-width buckets and evaluates
  the CDF gap at bin edges, which lower-bounds the true D by at most
  the probability mass of one bin. Monetary doubles go through the
  exact-cents image (``CAST(x AS DECIMAL(18,4))·100 → BIGINT``, the
  ``functions/money.py`` convention) so binning is integer-exact in
  both engines. The statistic is again scaled:
  ``ks_scaled = max_b |cum_cur(b)·N_ref − cum_ref(b)·N_cur|`` with
  ``D = ks_scaled / (N_ref·N_cur)``.

Why no PSI: the Population Stability Index needs ``ln(p_cur/p_ref)``
— a transcendental whose last ulp differs between the JVM and DuckDB's
libm, the exact class of drift the r4 pairwise-summation incident
taught us to keep off the hash-gated surface. The TVD/KS pair covers
the same decision (is the batch distribution-shifted?) in exact
integer arithmetic; tests additionally assert the statistics against
an independent pure-Python computation.

Scale shape (100 TB):
- Both statistics are ONE pass over the fact + one shuffle whose size
  is the key/bin cardinality, not the data (categorical: distinct
  keys; KS: ≤ value_range/bin_width bins). Totals derive from the
  already-aggregated count frame (rows = key cardinality) and join
  back as a 1-row broadcast — the fact is never re-scanned.
- The KS cumulative window runs UN-partitioned, which is only sound
  because its input is the bounded bin frame (same bounded-domain
  argument as the LM trigram model, `operators/textual.py`), never
  the raw data.
- Products ``count × N`` are computed in DECIMAL(38,0): at 1e12 rows
  a BIGINT product overflows (1e12·1e12 = 1e24), the same widening the
  LM trigram counts needed. The catalog surface casts the scaled
  statistics back to BIGINT — exact at every test SF; a true 100 TB
  deployment keeps the DECIMAL surface.

Reference basis: drift monitoring is not in the reference repo's
surface (RafaelNTeixeira/Retail-DataWarehouse has no streaming/batch
monitoring); this is part of the training-data-pipeline extension
family, same status as dedup/decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"

# Default drift thresholds, in per-mille of the normalized statistic:
# 50‰ = 0.05 — the conventional "investigate" line for TVD/KS on
# monitoring dashboards (PSI's 0.1/0.25 convention has no exact-integer
# analog; 0.05 TVD is the comparable sensitivity).
DEFAULT_THRESH_PERMILLE = 50

# o_totalprice spans ~[1e3, 5e5] dollars → cents up to 5e7; 16384-cent
# (~$164) bins keep the bin frame ≤ ~3100 rows at ANY corpus size —
# the bounded domain that justifies the un-partitioned cumsum window.
DEFAULT_BIN_CENTS = 16384


def _side_counts(tagged: DataFrame, key: Column, side: Column) -> DataFrame:
    """One-pass per-key (c_ref, c_cur) counts from a side-tagged frame.

    One shuffle, keyed on the drift key; partial aggregation makes the
    exchange carry key-cardinality rows per map task, not data.
    Counts surface as DECIMAL(38,0) so downstream products can't wrap
    int64 at warehouse row counts.
    """
    return tagged.groupBy(key.alias("k")).agg(
        F.sum(F.when(side == 0, 1).otherwise(0)).cast(DEC).alias("c_ref"),
        F.sum(F.when(side == 1, 1).otherwise(0)).cast(DEC).alias("c_cur"),
    )


def _with_totals(counts: DataFrame) -> DataFrame:
    """Attach (n_ref, n_cur) totals as a 1-row broadcast cross join.

    The totals re-aggregate the COUNT frame (key-cardinality rows),
    not the fact — the data is scanned exactly once overall.
    """
    totals = counts.agg(
        F.sum("c_ref").cast(DEC).alias("n_ref"),
        F.sum("c_cur").cast(DEC).alias("n_cur"),
    )
    return counts.crossJoin(F.broadcast(totals))


def categorical_drift(
    tagged: DataFrame, key: Column, side: Column
) -> DataFrame:
    """Per-key scaled TVD contributions between ref (side=0) and cur
    (side=1) slices of a side-tagged frame.

    Returns (k, c_ref, c_cur, dev) where
    ``dev = |c_cur·N_ref − c_ref·N_cur|`` — exact DECIMAL(38,0).
    Keys present in only one side contribute their full count (the
    groupBy sees them with a zero on the other side), so emerging /
    vanishing categories are part of the statistic, not dropped.
    """
    return _with_totals(_side_counts(tagged, key, side)).select(
        "k",
        "c_ref",
        "c_cur",
        F.abs(
            F.col("c_cur") * F.col("n_ref") - F.col("c_ref") * F.col("n_cur")
        ).alias("dev"),
        "n_ref",
        "n_cur",
    )


def categorical_drift_summary(
    tagged: DataFrame,
    key: Column,
    side: Column,
    thresh_permille: int = DEFAULT_THRESH_PERMILLE,
) -> DataFrame:
    """1-row (tvd_scaled, n_ref, n_cur, flag) summary.

    ``flag`` is the integer-domain threshold test
    ``tvd_scaled·1000 > 2·N_ref·N_cur·thresh_permille`` ⇔
    ``TVD > thresh_permille/1000`` — no division anywhere.

    Degenerate inputs ALARM instead of passing quietly (ADVICE r6): a
    global aggregate (never an empty frame) emits the row even when the
    tagged input is empty, and an empty side forces ``flag=1`` — a wave
    whose payload vanished is the loudest possible distribution shift,
    not "no drift" (the cross-product statistic alone degenerates to 0
    there).
    """
    per_key = categorical_drift(tagged, key, side)
    return per_key.agg(
        F.coalesce(F.sum("dev").cast(DEC), F.lit(0).cast(DEC)).alias(
            "tvd_scaled"
        ),
        F.coalesce(F.max("n_ref"), F.lit(0).cast(DEC)).alias("n_ref"),
        F.coalesce(F.max("n_cur"), F.lit(0).cast(DEC)).alias("n_cur"),
    ).select(
        "tvd_scaled",
        "n_ref",
        "n_cur",
        F.when((F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(1))
        .otherwise(
            (
                F.col("tvd_scaled") * 1000
                > F.lit(2) * F.col("n_ref") * F.col("n_cur") * thresh_permille
            ).cast("long")
        )
        .cast("long")
        .alias("flag"),
    )


def categorical_drift_from_profiles(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    thresh_permille: int = DEFAULT_THRESH_PERMILLE,
) -> DataFrame:
    """Same 1-row summary as ``categorical_drift_summary``, but from
    two PRE-AGGREGATED (k, c) count profiles — the monitoring shape:
    the reference profile is computed once from the corpus and reused
    against every arriving batch, so steady-state drift checks never
    touch the reference data again.

    Folding the two profiles goes through a union + re-groupBy rather
    than a full-outer join (full outer can't broadcast, and a join
    would drop single-side keys under the wrong join type); both
    inputs are key-cardinality frames, so the one shuffle here is
    metadata-sized.
    """
    unioned = ref_counts.select(
        F.col("k"),
        F.col("c").cast(DEC).alias("c_ref"),
        F.lit(0).cast(DEC).alias("c_cur"),
    ).unionByName(
        cur_counts.select(
            F.col("k"),
            F.lit(0).cast(DEC).alias("c_ref"),
            F.col("c").cast(DEC).alias("c_cur"),
        )
    )
    counts = unioned.groupBy("k").agg(
        F.sum("c_ref").cast(DEC).alias("c_ref"),
        F.sum("c_cur").cast(DEC).alias("c_cur"),
    )
    per_key = _with_totals(counts).select(
        F.abs(
            F.col("c_cur") * F.col("n_ref") - F.col("c_ref") * F.col("n_cur")
        ).alias("dev"),
        "n_ref",
        "n_cur",
    )
    # Global aggregate + empty-side alarm: same degenerate-case
    # discipline as categorical_drift_summary (ADVICE r6) — an empty
    # batch or profile yields an explicit flag=1 row, never an empty
    # frame or a quiet tvd=0 pass.
    return per_key.agg(
        F.coalesce(F.sum("dev").cast(DEC), F.lit(0).cast(DEC)).alias(
            "tvd_scaled"
        ),
        F.coalesce(F.max("n_ref"), F.lit(0).cast(DEC)).alias("n_ref"),
        F.coalesce(F.max("n_cur"), F.lit(0).cast(DEC)).alias("n_cur"),
    ).select(
        "tvd_scaled",
        "n_ref",
        "n_cur",
        F.when((F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(1))
        .otherwise(
            (
                F.col("tvd_scaled") * 1000
                > F.lit(2) * F.col("n_ref") * F.col("n_cur") * thresh_permille
            ).cast("long")
        )
        .cast("long")
        .alias("flag"),
    )


def embedding_centroid_drift(
    tall: DataFrame,
    thresh_permille: int = DEFAULT_THRESH_PERMILLE,
    q_scale: int = 65536,
) -> DataFrame:
    """Embedding-distribution drift: fixed-point centroid shift between
    a reference (side=0) and current (side=1) vector population.

    ``tall`` is the exploded fixed-point image (side int, pos long —
    1-based dimension, q long — floor(v·q_scale), q2 long —
    floor(v·v·q_scale)); the caller owns quantization so injection /
    preprocessing stays engine-mirrorable. The default q_scale is 2^16
    (not the centroid pipeline's 2^20): the cross-multiplied products
    below grow with (q_scale·n)², and 2^16 keeps the DECIMAL(38,0)
    headroom good to ~10^5 vectors/side (the 100× probe scale) — scaling
    by a power of two is an EXACT double operation, so any power-of-two
    choice stays engine-identical. The centroid discipline is
    `q_embedding_centroids`' (floor-quantize, exact int64 sums — float
    means can't be hash-compared), and the drift test is scale-FREE:
    the mean-vector shift is compared against the reference's RMS
    vector norm, not the mean-vector norm (embeddings are near
    zero-centered, so ‖μ_ref‖ is itself sampling noise — a threshold
    relative to it is unstable; E‖v‖² is O(1) regardless of
    centering):

        drift ⇔ ‖Δμ‖² > ε² · E‖v‖²_ref
              ⇔ Σ_pos(s_cur·n_ref − s_ref·n_cur)² · 10⁶
                   > permille² · Σ_pos s2_ref · q_scale · n_ref · n_cur²

    — all integer (DECIMAL(38,0) products). Output is part-shaped for
    a suite fold: per-dimension rows (key_s='dim', pos, n=n_ref,
    iv = s_cur − s_ref — WHICH dimensions moved, the diagnostic a
    scalar statistic can't give) plus one flag row (key_s='flag').

    Scale: one K×dim-sized shuffle (partial-agg'd posexplode groupBy,
    the centroid cost), then 1-row math; the per-pos frame persists
    (dim-count rows) because both the dim rows and the flag reference
    it. The cross-multiplied form keeps every step division-free; its
    DECIMAL(38,0) headroom covers ~10^10 rows/side — beyond that,
    switch the comparison to per-side floor-divided means (bounded at
    any n; costs one documented trunc-vs-floor division-semantics
    pin between engines).
    """
    side = F.col("side")
    per_pos = (
        tall.groupBy("pos")
        .agg(
            F.sum(F.when(side == 0, F.col("q")).otherwise(0))
            .cast(DEC)
            .alias("sr"),
            F.sum(F.when(side == 1, F.col("q")).otherwise(0))
            .cast(DEC)
            .alias("sc"),
            F.sum(F.when(side == 0, 1).otherwise(0)).cast(DEC).alias("nr"),
            F.sum(F.when(side == 1, 1).otherwise(0)).cast(DEC).alias("nc"),
            F.sum(F.when(side == 0, F.col("q2")).otherwise(0))
            .cast(DEC)
            .alias("s2r"),
        )
        .persist()
    )
    dim_rows = per_pos.select(
        F.lit("dim").alias("key_s"),
        F.col("pos").cast("long").alias("pos"),
        F.col("nr").cast("long").alias("n"),
        (F.col("sc") - F.col("sr")).cast("long").alias("iv"),
    )
    d = F.col("sc") * F.col("nr") - F.col("sr") * F.col("nc")
    # Empty-side alarm (ADVICE r6 discipline): with one side empty the
    # cross-multiplied shift degenerates to 0·0 > 0 — a vanished vector
    # population must read as the loudest drift, not the quietest.
    flag_row = (
        per_pos.agg(
            F.coalesce(F.sum(d * d).cast(DEC), F.lit(0).cast(DEC)).alias(
                "d2"
            ),
            F.coalesce(F.sum("s2r").cast(DEC), F.lit(0).cast(DEC)).alias(
                "s2"
            ),
            F.coalesce(F.max("nr"), F.lit(0).cast(DEC)).alias("nr"),
            F.coalesce(F.max("nc"), F.lit(0).cast(DEC)).alias("nc"),
        )
        .select(
            F.lit("flag").alias("key_s"),
            F.lit(0).cast("long").alias("pos"),
            F.lit(None).cast("long").alias("n"),
            F.when((F.col("nr") == 0) | (F.col("nc") == 0), F.lit(1))
            .otherwise(
                (
                    F.col("d2") * 1000000
                    > F.lit(thresh_permille * thresh_permille)
                    * F.col("s2")
                    * q_scale
                    * F.col("nr")
                    * F.col("nc")
                    * F.col("nc")
                ).cast("long")
            )
            .cast("long")
            .alias("iv"),
        )
    )
    return dim_rows.unionByName(flag_row)


def key_profile(df: DataFrame, key: Column) -> DataFrame:
    """(k, c) count profile of a frame — the stored reference side of
    ``categorical_drift_from_profiles``. One partial-agg'd shuffle of
    key cardinality."""
    return df.groupBy(key.alias("k")).agg(
        F.count(F.lit(1)).cast(DEC).alias("c")
    )


def binned_ks_drift(
    tagged: DataFrame,
    cents: Column,
    side: Column,
    bin_cents: int = DEFAULT_BIN_CENTS,
    thresh_permille: int = DEFAULT_THRESH_PERMILLE,
) -> DataFrame:
    """1-row (ks_scaled, n_ref, n_cur, flag, n_bins) binned-ECDF KS.

    ``cents`` must be an exact-integer image of the value (for money:
    ``F.col(x).cast("decimal(18,4)") * 100`` cast to long — see
    ``functions/money.py``). The bin frame is bounded by the value
    range over ``bin_cents``, which is what licenses the
    un-partitioned cumulative window (bounded domain, like the LM
    trigram model); the raw data is never globally sorted.
    """
    from pyspark.sql import Window

    binned = _side_counts(
        tagged.select(
            (cents - (cents % F.lit(bin_cents))).alias("_b"),
            side.alias("_s"),
        ),
        F.col("_b"),
        F.col("_s"),
    )
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = _with_totals(binned).select(
        "n_ref",
        "n_cur",
        F.sum("c_ref").over(w).cast(DEC).alias("cum_ref"),
        F.sum("c_cur").over(w).cast(DEC).alias("cum_cur"),
    )
    # Global aggregate + empty-side alarm (ADVICE r6): an empty input
    # still yields the 1-row summary (n_bins=0) and an empty side is
    # flag=1 — the cross-product KS statistic alone degenerates to 0
    # when one side vanishes.
    return cum.agg(
        F.coalesce(
            F.max(
                F.abs(
                    F.col("cum_cur") * F.col("n_ref")
                    - F.col("cum_ref") * F.col("n_cur")
                )
            ).cast(DEC),
            F.lit(0).cast(DEC),
        ).alias("ks_scaled"),
        F.coalesce(F.max("n_ref"), F.lit(0).cast(DEC)).alias("n_ref"),
        F.coalesce(F.max("n_cur"), F.lit(0).cast(DEC)).alias("n_cur"),
        F.count(F.lit(1)).alias("n_bins"),
    ).select(
        "ks_scaled",
        "n_ref",
        "n_cur",
        F.when((F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(1))
        .otherwise(
            (
                F.col("ks_scaled") * 1000
                > F.col("n_ref") * F.col("n_cur") * thresh_permille
            ).cast("long")
        )
        .cast("long")
        .alias("flag"),
        "n_bins",
    )
