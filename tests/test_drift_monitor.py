"""Streaming drift monitor (streaming/monitor.py): per-wave verdicts
against a stored reference profile — statistics equal the batch-path
computation wave-for-wave, the flag fires only on the drifted wave,
checkpointed restart monitors only new waves, and replayed verdicts
dedupe on the wave key."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.drift import (
    categorical_drift_from_profiles,
    key_profile,
)
from retail_datawarehouse_spark.streaming.monitor import (
    read_verdicts,
    run_drift_monitor_available_now,
)


@pytest.fixture()
def mon_root(tmp_path):
    return str(tmp_path)


# wave 1 matches the reference 60/40 a/b mix; wave 0 skews mildly
# (still under the 5% TVD line); wave 2 is hard-drifted
_WAVES = [
    {"a": 55, "b": 45},
    {"a": 60, "b": 40},
    {"a": 5, "b": 95},
]
_REF = {"a": 600, "b": 400}


def _frame(spark, wave, mix):
    rows = [(wave, k) for k, n in mix.items() for _ in range(n)]
    return spark.createDataFrame(rows, "wave long, k string")


def _land(spark, root, landing, i):
    tmp = f"{root}/w{i}"
    _frame(spark, i, _WAVES[i]).coalesce(1).write.parquet(tmp)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.copy(src, f"{landing}/wave-{i}.parquet")


def _setup(spark, root):
    landing = f"{root}/landing"
    os.makedirs(landing)
    ref_rows = [(k, int(n)) for k, n in _REF.items()]
    (
        spark.createDataFrame(ref_rows, "k string, n long")
        .select("k", F.col("n").cast("decimal(38,0)").alias("c"))
        .write.parquet(f"{root}/ref_profile")
    )
    return landing, f"{root}/ref_profile", f"{root}/verdicts"


def test_monitor_matches_batch_path_and_flags_only_drifted(spark, mon_root):
    landing, ref_dir, verdict_dir = _setup(spark, mon_root)
    for i in range(3):
        _land(spark, mon_root, landing, i)
    run_drift_monitor_available_now(spark, landing, ref_dir, verdict_dir)
    got = {
        r.wave: (int(r.tvd_scaled), int(r.n_ref), int(r.n_cur), r.flag)
        for r in read_verdicts(spark, verdict_dir).collect()
    }
    assert set(got) == {0, 1, 2}
    ref = spark.read.parquet(ref_dir)
    for i in range(3):
        batch = categorical_drift_from_profiles(
            ref, key_profile(_frame(spark, i, _WAVES[i]), F.col("k"))
        ).collect()[0]
        assert got[i] == (
            int(batch.tvd_scaled),
            int(batch.n_ref),
            int(batch.n_cur),
            batch.flag,
        )
    assert [got[i][3] for i in range(3)] == [0, 0, 1]
    # spot-check the integer statistic itself: wave 2 vs 60/40 ref is
    # TVD 0.55 -> scaled = 2 * 0.55 * 1000 * 100
    assert got[2][0] == 110000


def test_checkpointed_restart_monitors_only_new_waves(spark, mon_root):
    landing, ref_dir, verdict_dir = _setup(spark, mon_root)
    ckpt = f"{mon_root}/ckpt"
    _land(spark, mon_root, landing, 0)
    _land(spark, mon_root, landing, 1)
    run_drift_monitor_available_now(
        spark, landing, ref_dir, verdict_dir, checkpoint_dir=ckpt
    )
    assert {r.wave for r in read_verdicts(spark, verdict_dir).collect()} == {0, 1}
    n_files_before = len(glob.glob(f"{verdict_dir}/*.parquet"))
    _land(spark, mon_root, landing, 2)
    run_drift_monitor_available_now(
        spark, landing, ref_dir, verdict_dir, checkpoint_dir=ckpt
    )
    v = read_verdicts(spark, verdict_dir)
    assert {r.wave for r in v.collect()} == {0, 1, 2}
    # waves 0/1 were NOT re-scored after the restart (offsets held)
    n_files_after = len(glob.glob(f"{verdict_dir}/*.parquet"))
    assert n_files_after > n_files_before
    raw = spark.read.parquet(verdict_dir)
    assert raw.groupBy("wave").count().filter("count > 1").count() == 0


def test_replayed_verdicts_dedupe_on_wave(spark, mon_root):
    landing, ref_dir, verdict_dir = _setup(spark, mon_root)
    _land(spark, mon_root, landing, 0)
    # un-checkpointed: a second drain replays everything — the sidecar
    # holds two identical verdict rows; read_verdicts dedupes
    run_drift_monitor_available_now(spark, landing, ref_dir, verdict_dir)
    run_drift_monitor_available_now(spark, landing, ref_dir, verdict_dir)
    raw = spark.read.parquet(verdict_dir)
    assert raw.count() == 2
    v = read_verdicts(spark, verdict_dir).collect()
    assert len(v) == 1 and v[0].wave == 0


def test_read_verdicts_empty_dir(spark, mon_root):
    assert read_verdicts(spark, f"{mon_root}/nope").count() == 0


def test_multi_wave_file_fails_loudly(spark, mon_root):
    """ADVICE r6: a landing file mixing two waves must not produce one
    verdict attributed to min(wave) — the drain raises instead of
    silently averaging a drifted and a clean wave."""
    landing, ref_dir, verdict_dir = _setup(spark, mon_root)
    rows = [(0, "a"), (0, "b"), (1, "a"), (1, "b")]
    frame = spark.createDataFrame(rows, "wave long, k string")
    tmp = f"{mon_root}/mixed"
    frame.coalesce(1).write.parquet(tmp)
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0], f"{landing}/wave-x.parquet"
    )
    with pytest.raises(Exception, match="spans 2 waves"):
        run_drift_monitor_available_now(spark, landing, ref_dir, verdict_dir)


def test_classifier_monitor_flags_prediction_mix_shift(
    spark, sf_correctness_dir, tmp_path
):
    """Classifier monitoring E2E (r10 continuation): waves of
    embeddings are labeled by the STORED NCM prototypes and the
    predicted-class mix is TVD-scored against the training-time
    prediction profile. Two clean waves (the fixture's own test split —
    prediction-mix noise ~100‰ at n≈250 with 10 balanced classes) stay
    QUIET at the 300‰ line; a class-collapsed wave (every vector
    re-signed to class 3 — the broken-extractor scenario) reads ~880‰
    and FIRES. The drained waves' predictions equal the batch
    classifier row-for-row (spot-pinned through the verdict's n_cur),
    and verdicts dedupe per wave."""
    from retail_datawarehouse_spark.operators.similarity import (
        classify_by_prototypes,
        train_prototypes,
    )
    from retail_datawarehouse_spark.sources.readers import load_table
    from retail_datawarehouse_spark.streaming.monitor import (
        run_classifier_monitor_available_now,
    )

    root = str(tmp_path)
    emb = load_table(spark, sf_correctness_dir, "embeddings")

    def signed(df, label_col):
        # the suite's injected class signature: +0.5 where pos%10==label
        return df.select(
            F.col("vec_id").alias("id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    (i % 10) == label_col, x.cast("double") + F.lit(0.5)
                ).otherwise(x.cast("double")),
            ).alias("emb"),
        )

    train = signed(emb.filter(F.col("vec_id") % 2 == 0), F.col("label"))
    test = signed(emb.filter(F.col("vec_id") % 2 == 1), F.col("label"))
    collapsed = signed(emb.filter(F.col("vec_id") % 2 == 1), F.lit(3))

    protos_dir = f"{root}/protos"
    ref_dir = f"{root}/ref_profile"
    train_lab = emb.filter(F.col("vec_id") % 2 == 0).select(
        "label",
        F.transform(
            "embedding",
            lambda x, i: F.when(
                (i % 10) == F.col("label"), x.cast("double") + F.lit(0.5)
            ).otherwise(x.cast("double")),
        ).alias("emb"),
    )
    train_prototypes(train_lab).write.parquet(protos_dir)
    ref_preds = classify_by_prototypes(train, spark.read.parquet(protos_dir))
    from retail_datawarehouse_spark.operators.drift import key_profile as _kp

    _kp(ref_preds, F.col("pred_label").cast("string")).write.parquet(ref_dir)

    landing = f"{root}/landing"
    os.makedirs(landing, exist_ok=True)

    def land(wave, df):
        tmp = f"{root}/w{wave}"
        df.select(
            F.lit(wave).cast("long").alias("wave"), "id", "emb"
        ).coalesce(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(f"{tmp}/part-*.parquet")[0],
            f"{landing}/wave-{wave}.parquet",
        )

    land(0, test)
    land(1, test.filter(F.col("id") % 3 != 0))  # a second clean mix
    land(2, collapsed)
    verdicts = f"{root}/verdicts"
    run_classifier_monitor_available_now(
        spark,
        landing,
        protos_dir,
        ref_dir,
        verdicts,
        checkpoint_dir=f"{root}/ckpt",
        thresh_permille=300,
    )
    got = {
        r.wave: (int(r.flag), int(r.n_cur))
        for r in read_verdicts(spark, verdicts).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0][0] == 0 and got[1][0] == 0, got
    assert got[2][0] == 1, got
    # n_cur pins each wave was scored over exactly its landed rows
    assert got[0][1] == test.count()
    assert got[2][1] == collapsed.count()
    # drain ≡ batch on the clean wave's prediction mix: recompute the
    # batch-side profile and assert the same TVD verdict values
    batch_cur = _kp(
        classify_by_prototypes(test, spark.read.parquet(protos_dir)),
        F.col("pred_label").cast("string"),
    )
    batch_verdict = categorical_drift_from_profiles(
        spark.read.parquet(ref_dir), batch_cur, 300
    ).collect()[0]
    drain_row = (
        read_verdicts(spark, verdicts).filter(F.col("wave") == 0).collect()[0]
    )
    assert drain_row.tvd_scaled == batch_verdict.tvd_scaled
