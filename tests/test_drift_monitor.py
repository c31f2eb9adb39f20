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
