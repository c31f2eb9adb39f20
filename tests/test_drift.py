"""Drift detection (operators/drift.py): the scaled-integer TVD and
binned-ECDF KS statistics against independent pure-Python computations,
flag semantics on planted drift, and the lower-bound property of the
binned KS vs the exact statistic."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.drift import (
    binned_ks_drift,
    categorical_drift,
    categorical_drift_summary,
)


def _tagged(spark, rows):
    return spark.createDataFrame(rows, "side int, k string, cents long")


def _py_tvd_scaled(rows):
    ref = Counter(k for s, k, _ in rows if s == 0)
    cur = Counter(k for s, k, _ in rows if s == 1)
    nr, nc = sum(ref.values()), sum(cur.values())
    keys = set(ref) | set(cur)
    return sum(abs(cur[k] * nr - ref[k] * nc) for k in keys), nr, nc


def _py_ks_scaled(rows, bin_cents):
    ref = sorted(c for s, _, c in rows if s == 0)
    cur = sorted(c for s, _, c in rows if s == 1)
    nr, nc = len(ref), len(cur)
    bins = sorted({c - (c % bin_cents) for _, _, c in rows})
    best = 0
    for b in bins:
        edge = b + bin_cents  # CDF evaluated after the whole bin
        cr = sum(1 for c in ref if c < edge)
        cc = sum(1 for c in cur if c < edge)
        best = max(best, abs(cc * nr - cr * nc))
    return best, nr, nc


def _py_exact_ks_scaled(rows):
    ref = sorted(c for s, _, c in rows if s == 0)
    cur = sorted(c for s, _, c in rows if s == 1)
    nr, nc = len(ref), len(cur)
    best = 0
    for v in {c for _, _, c in rows}:
        cr = sum(1 for c in ref if c <= v)
        cc = sum(1 for c in cur if c <= v)
        best = max(best, abs(cc * nr - cr * nc))
    return best


def _planted_shift_rows():
    """Ref: 60/40 a/b, values 0..9999; cur: 20/80 a/b, values shifted
    +50000 — drifted on BOTH the categorical and numeric axes."""
    rows = []
    for i in range(300):
        rows.append((0, "a" if i % 5 < 3 else "b", (i * 37) % 10000))
    for i in range(200):
        rows.append((1, "a" if i % 5 < 1 else "b", 50000 + (i * 41) % 10000))
    return rows


def test_categorical_tvd_matches_python_and_fires(spark):
    rows = _planted_shift_rows()
    got = categorical_drift_summary(
        _tagged(spark, rows), F.col("k"), F.col("side")
    ).collect()[0]
    want, nr, nc = _py_tvd_scaled(rows)
    assert int(got.tvd_scaled) == want
    assert (int(got.n_ref), int(got.n_cur)) == (nr, nc)
    # 60/40 -> 20/80 is TVD 0.4 >> 0.05
    assert want * 1000 > 2 * nr * nc * 50
    assert got.flag == 1


def test_categorical_no_drift_flag_quiet(spark):
    rows = [(s, "a" if i % 3 else "b", i) for s in (0, 1) for i in range(90)]
    got = categorical_drift_summary(
        _tagged(spark, rows), F.col("k"), F.col("side")
    ).collect()[0]
    assert int(got.tvd_scaled) == 0
    assert got.flag == 0


def test_vanishing_and_emerging_categories_counted(spark):
    rows = [(0, "old_only", 1)] * 10 + [(1, "new_only", 1)] * 10
    per_key = {
        r.k: r
        for r in categorical_drift(
            _tagged(spark, rows), F.col("k"), F.col("side")
        ).collect()
    }
    # each side's exclusive key contributes its full count x other N
    assert int(per_key["old_only"].dev) == 10 * 10
    assert int(per_key["new_only"].dev) == 10 * 10
    got = categorical_drift_summary(
        _tagged(spark, rows), F.col("k"), F.col("side")
    ).collect()[0]
    assert got.flag == 1  # total disjoint support = TVD 1.0


def test_binned_ks_matches_python_and_fires(spark):
    rows = _planted_shift_rows()
    got = binned_ks_drift(
        _tagged(spark, rows), F.col("cents"), F.col("side"), bin_cents=1024
    ).collect()[0]
    want, nr, nc = _py_ks_scaled(rows, 1024)
    assert int(got.ks_scaled) == want
    # disjoint value ranges -> KS 1.0
    assert want == nr * nc
    assert got.flag == 1


def test_binned_ks_stationary_quiet_and_lower_bounds_exact(spark):
    # same wrapped progression both sides, current shifted by a small
    # offset: tiny true drift (measured KS 0.0025, well under 0.05),
    # nonzero so the statistic is exercised, and the binned statistic
    # must stay at or below the exact one
    rows = []
    for i in range(400):
        rows.append((0, "x", (i * 13) % 5000))
        rows.append((1, "x", (i * 13 + 257) % 5000))
    got = binned_ks_drift(
        _tagged(spark, rows), F.col("cents"), F.col("side"), bin_cents=512
    ).collect()[0]
    want, nr, nc = _py_ks_scaled(rows, 512)
    assert int(got.ks_scaled) == want
    assert int(got.ks_scaled) <= _py_exact_ks_scaled(rows)
    assert got.flag == 0  # both sides cover 0..4999 near-uniformly
    assert int(got.n_bins) == len({c - (c % 512) for _, _, c in rows})


def test_audit_entry_carries_drift_panel(spark, sf_dir):
    from retail_datawarehouse_spark.queries.sinks import q_etl_audit_metrics

    m = {r.metric: r.value for r in q_etl_audit_metrics(spark, sf_dir).collect()}
    # injected ~1/7 priority relabel on the current side -> TVD ~0.11
    assert m["drift_cat_flag"] == 1
    # untouched price distribution is stationary across the date split
    assert m["drift_ks_flag"] == 0
    assert m["drift_ks_scaled"] > 0  # finite-sample noise, never exactly 0
    assert m["drift_ks_bins"] > 100  # real binning, bounded domain


def _emb_tall(spark, vecs):
    """(side, pos, q, q2) q16 image of {vec_id: [floats]}."""
    import math

    rows = []
    for vid, v in vecs.items():
        for i, x in enumerate(v):
            rows.append(
                (
                    vid % 2,
                    i + 1,
                    math.floor(x * 65536.0),
                    math.floor((x * x) * 65536.0),
                )
            )
    return spark.createDataFrame(
        rows, "side int, pos long, q long, q2 long"
    ), rows


def _py_emb_drift(rows, permille, q_scale):
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # sr, sc, nr, nc, s2r
    for side, pos, q, q2 in rows:
        a = agg[pos]
        if side == 0:
            a[0] += q
            a[2] += 1
            a[4] += q2
        else:
            a[1] += q
            a[3] += 1
    d2 = sum((a[1] * a[2] - a[0] * a[3]) ** 2 for a in agg.values())
    s2 = sum(a[4] for a in agg.values())
    nr = max(a[2] for a in agg.values())
    nc = max(a[3] for a in agg.values())
    dims = {p: (a[2], a[1] - a[0]) for p, a in agg.items()}
    flag = 1 if d2 * 1000000 > permille * permille * s2 * q_scale * nr * nc * nc else 0
    return dims, flag


def test_embedding_drift_matches_python_fires_on_shift(spark):
    # current side (odd ids) shifted +0.5 in dim 1: well past 5% of RMS
    vecs = {}
    for vid in range(40):
        base = [((vid * 7 + i * 3) % 11 - 5) / 5.0 for i in range(8)]
        if vid % 2 == 1:
            base[0] += 0.5
        vecs[vid] = base
    tall, rows = _emb_tall(spark, vecs)
    from retail_datawarehouse_spark.operators.drift import (
        embedding_centroid_drift,
    )

    got = embedding_centroid_drift(tall, q_scale=65536).collect()
    dims = {r.pos: (r.n, r.iv) for r in got if r.key_s == "dim"}
    flag = [r.iv for r in got if r.key_s == "flag"]
    want_dims, want_flag = _py_emb_drift(rows, 50, 65536)
    assert dims == want_dims
    assert flag == [want_flag] == [1]
    # the shifted dimension carries (by far) the largest |delta-sum|
    assert max(dims, key=lambda p: abs(dims[p][1])) == 1


def test_embedding_drift_quiet_on_identical_populations(spark):
    # both sides the SAME 20 vectors -> delta sums exactly 0, flag 0
    vecs = {}
    for vid in range(40):
        j = vid // 2
        vecs[vid] = [((j * 7 + i * 3) % 11 - 5) / 5.0 for i in range(8)]
    tall, rows = _emb_tall(spark, vecs)
    from retail_datawarehouse_spark.operators.drift import (
        embedding_centroid_drift,
    )

    got = embedding_centroid_drift(tall, q_scale=65536).collect()
    assert all(r.iv == 0 for r in got if r.key_s == "dim")
    assert [r.iv for r in got if r.key_s == "flag"] == [0]


def test_embedding_drift_fixture_uninjected_quiet_injected_fires(spark):
    """The raw parity split of the fixture sits BELOW the 5% line
    (sampling noise only) while the entry's injected split fires —
    the statistic separates noise from shift on real data rather than
    firing on everything. The quiet half needs sf0.1: the fixture's
    vectors are unit-normalized (E‖v‖² = 1, per-dim RMS 0.125), so
    the mean-shift noise floor is √(2·dim/n_side)·0.125 of RMS —
    89‰ at sf0.01's 250/side (correctly above the line: a 64-dim mean
    from 250 samples IS that uncertain) and 28‰ at sf0.1's
    2500/side. The embeddings table at sf0.1 is 5000 rows — cheap."""
    sf_dir = "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from retail_datawarehouse_spark.operators.drift import (
        embedding_centroid_drift,
    )
    from retail_datawarehouse_spark.operators.similarity import (
        q_embedding_drift,
    )
    from retail_datawarehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("v").cast("double")
    plain = (
        emb.select(
            (F.col("vec_id") % 2).cast("int").alias("side"),
            F.posexplode("embedding").alias("pos0", "v"),
        )
        .select("side", (F.col("pos0") + 1).cast("long").alias("pos"), "v")
        .select(
            "side",
            "pos",
            F.floor(v * F.lit(65536.0)).cast("long").alias("q"),
            F.floor((v * v) * F.lit(65536.0)).cast("long").alias("q2"),
        )
    )
    quiet = embedding_centroid_drift(plain, q_scale=65536)
    assert [r.iv for r in quiet.collect() if r.key_s == "flag"] == [0]
    fired = q_embedding_drift(spark, sf_dir)
    assert [r.iv for r in fired.collect() if r.key_s == "flag"] == [1]
    # and at sf0.01 the UN-injected parity split fires too — the noise
    # floor of a 250-sample 64-dim mean genuinely exceeds 5% of RMS;
    # pin it so the threshold's small-sample honesty is documented
    # behavior, not an accident
    emb001 = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    plain001 = (
        emb001.select(
            (F.col("vec_id") % 2).cast("int").alias("side"),
            F.posexplode("embedding").alias("pos0", "v"),
        )
        .select("side", (F.col("pos0") + 1).cast("long").alias("pos"), "v")
        .select(
            "side",
            "pos",
            F.floor(v * F.lit(65536.0)).cast("long").alias("q"),
            F.floor((v * v) * F.lit(65536.0)).cast("long").alias("q2"),
        )
    )
    noisy = embedding_centroid_drift(plain001, q_scale=65536)
    assert [r.iv for r in noisy.collect() if r.key_s == "flag"] == [1]


def test_degenerate_sides_alarm_not_quiet(spark):
    """ADVICE r6: an empty current side (a wave whose payload vanished)
    must read as an ALARM — the cross-product statistic alone
    degenerates to 0 there — and an empty input must still emit the
    1-row summary instead of an empty frame."""
    ref_only = [(0, "a", 100), (0, "b", 200), (0, "a", 300)]
    cat = categorical_drift_summary(
        _tagged(spark, ref_only), F.col("k"), F.col("side")
    ).collect()
    assert len(cat) == 1
    assert (int(cat[0].n_ref), int(cat[0].n_cur)) == (3, 0)
    assert cat[0].flag == 1
    ks = binned_ks_drift(
        _tagged(spark, ref_only), F.col("cents"), F.col("side")
    ).collect()
    assert len(ks) == 1 and ks[0].flag == 1
    # fully empty input: explicit zero-count row, flagged
    empty = _tagged(spark, []).filter(F.lit(False))
    cat0 = categorical_drift_summary(
        empty, F.col("k"), F.col("side")
    ).collect()
    assert len(cat0) == 1
    assert (int(cat0[0].n_ref), int(cat0[0].n_cur), cat0[0].flag) == (0, 0, 1)
    ks0 = binned_ks_drift(empty, F.col("cents"), F.col("side")).collect()
    assert len(ks0) == 1 and ks0[0].flag == 1 and ks0[0].n_bins == 0


def test_profile_drift_empty_batch_alarms(spark):
    """The monitoring shape: reference profile vs an EMPTY arriving
    batch profile — explicit flag=1 verdict, not 'no drift'."""
    from retail_datawarehouse_spark.operators.drift import (
        categorical_drift_from_profiles,
        key_profile,
    )

    ref = key_profile(
        _tagged(spark, [(0, "a", 1)] * 6 + [(0, "b", 2)] * 4), F.col("k")
    )
    cur = key_profile(
        _tagged(spark, []).filter(F.lit(False)), F.col("k")
    )
    got = categorical_drift_from_profiles(ref, cur).collect()
    assert len(got) == 1
    assert (int(got[0].n_ref), int(got[0].n_cur), got[0].flag) == (10, 0, 1)


def test_embedding_drift_empty_side_alarms(spark):
    """Centroid-shift drift: a vanished current vector population
    flags instead of reading 0·0 > 0 as quiet."""
    from retail_datawarehouse_spark.operators.drift import (
        embedding_centroid_drift,
    )

    rows = [(0, p, q, q * q) for p in (1, 2) for q in (3, 4)]
    tall = spark.createDataFrame(
        rows, "side int, pos long, q long, q2 long"
    )
    got = {r.key_s: r for r in embedding_centroid_drift(tall).collect()}
    assert got["flag"].iv == 1
