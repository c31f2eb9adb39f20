"""Unified media featurizer (operators/media.py) + streaming ingest
drain (streaming/media.py): the magic-byte dispatch agrees with every
per-modality featurizer on interleaved batches, unknown containers fail
loudly, and the drain's feature sidecar equals the batch image with
checkpointed restarts featurizing only new waves."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.audio import (
    featurize_audio,
    with_wav_payload,
)
from retail_datawarehouse_spark.operators.media import (
    featurize_media,
    sniff_media,
    with_mixed_media_payload,
)
from retail_datawarehouse_spark.operators.multimodal import (
    featurize,
    with_pgm_payload,
)
from retail_datawarehouse_spark.operators.video import (
    sample_frames,
    with_y4m_payload,
)
from retail_datawarehouse_spark.streaming.media import (
    read_media_features,
    run_media_ingest_available_now,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"document number {i} with some body text {'y' * (i % 7)}") for i in ids],
        "doc_id long, text string",
    )


def test_dispatch_agrees_with_every_modality_featurizer(spark):
    """featurize_media over an interleaved fixture == the three
    standalone featurizers run on their own modality slices, field by
    field — the dispatch adds routing, not decoding."""
    docs = _docs(spark, range(12))
    got = {
        (r.doc_id, r.idx): r
        for r in featurize_media(with_mixed_media_payload(docs)).collect()
    }
    img_docs = docs.filter(F.col("doc_id") % 3 == 0)
    for r in featurize(with_pgm_payload(img_docs)).collect():
        m = got[(r.doc_id, 0)]
        assert (m.media, m.f1, m.f2, m.fhash, m.fd) == (
            "image",
            r.width,
            r.height,
            r.pixel_md5,
            r.pixel_mean,
        )
    aud_docs = docs.filter(F.col("doc_id") % 3 == 1)
    for r in featurize_audio(with_wav_payload(aud_docs)).collect():
        m = got[(r.doc_id, 0)]
        assert (m.media, m.f1, m.f2, m.fhash, m.fd) == (
            "audio",
            r.amp_sum,
            r.extrema,
            r.sample_md5,
            r.duration_ms,
        )
    vid_docs = docs.filter(F.col("doc_id") % 3 == 2)
    vid = sample_frames(with_y4m_payload(vid_docs)).collect()
    assert vid  # at least one sampled frame in the fixture
    for r in vid:
        m = got[(r.doc_id, r.frame_idx)]
        assert (m.media, m.f1, m.fhash, m.fd) == (
            "video",
            r.frame_sum,
            r.frame_md5,
            r.duration_ms,
        )
    # row-count audit: every fixture row accounted for, nothing extra
    n_vid_rows = len(vid)
    assert len(got) == img_docs.count() + aud_docs.count() + n_vid_rows


def test_unknown_container_fails_loudly():
    with pytest.raises(ValueError, match="unrecognized media container"):
        sniff_media(b"\x89PNG\r\n\x1a\n....")


def _land_wave(spark, root, landing, wave, ids):
    frame = with_mixed_media_payload(_docs(spark, ids)).select(
        F.lit(wave).cast("long").alias("wave"), "doc_id", "payload"
    )
    tmp = f"{root}/w{wave}"
    frame.coalesce(1).write.parquet(tmp)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.copy(src, f"{landing}/wave-{wave}.parquet")


def _rows(df):
    """Sorted value-tuples without the wave column — exceptAll over a
    dropDuplicates-of-parquet frame trips a Catalyst internal
    (ATTRIBUTE_NOT_FOUND) in pyspark 4.1.2, so compare materialized."""
    cols = [c for c in df.columns if c != "wave"]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_drain_equals_batch_image_and_restart_is_incremental(spark, tmp_path):
    root = str(tmp_path)
    landing = f"{root}/landing"
    features = f"{root}/features"
    ckpt = f"{root}/ckpt"
    os.makedirs(landing)
    _land_wave(spark, root, landing, 0, range(0, 6))
    _land_wave(spark, root, landing, 1, range(6, 12))
    run_media_ingest_available_now(spark, landing, features, ckpt)
    got01 = read_media_features(spark, features)
    batch01 = featurize_media(with_mixed_media_payload(_docs(spark, range(12))))
    assert _rows(got01) == _rows(batch01)
    # wave 2 lands; the checkpointed re-drain featurizes ONLY it — the
    # raw (pre-dedupe) sidecar has no duplicated rows from waves 0/1
    _land_wave(spark, root, landing, 2, range(12, 18))
    run_media_ingest_available_now(spark, landing, features, ckpt)
    raw = spark.read.parquet(features)
    deduped = read_media_features(spark, features)
    assert raw.count() == deduped.count()  # no replay happened
    batch_all = featurize_media(
        with_mixed_media_payload(_docs(spark, range(18)))
    )
    assert _rows(deduped) == _rows(batch_all)


def test_multi_wave_file_fails_loudly(spark, tmp_path):
    """ADVICE r6: a landing file that (illegally) mixes two waves must
    not be silently attributed to min(wave) — the drain raises instead
    of mis-tagging features."""
    root = str(tmp_path)
    landing = f"{root}/landing"
    os.makedirs(landing)
    mixed = with_mixed_media_payload(_docs(spark, range(4))).select(
        (F.col("doc_id") % 2).cast("long").alias("wave"), "doc_id", "payload"
    )
    tmp = f"{root}/mixed"
    mixed.coalesce(1).write.parquet(tmp)
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0], f"{landing}/wave-x.parquet"
    )
    with pytest.raises(Exception, match="spans 2 waves"):
        run_media_ingest_available_now(
            spark, landing, f"{root}/features", f"{root}/ckpt"
        )


def test_replayed_wave_dedupes_at_read(spark, tmp_path):
    """At-least-once foreachBatch can append a wave's deterministic
    rows twice across a crash; the reader collapses them."""
    root = str(tmp_path)
    landing = f"{root}/landing"
    features = f"{root}/features"
    os.makedirs(landing)
    _land_wave(spark, root, landing, 0, range(0, 6))
    # two un-checkpointed drains = a full replay of wave 0
    run_media_ingest_available_now(spark, landing, features, f"{root}/c1")
    run_media_ingest_available_now(spark, landing, features, f"{root}/c2")
    raw = spark.read.parquet(features)
    deduped = read_media_features(spark, features)
    assert raw.count() == 2 * deduped.count()
    batch = featurize_media(with_mixed_media_payload(_docs(spark, range(6))))
    assert deduped.count() == batch.count()


def test_modality_mix_drift_flags_broken_extractor(spark, tmp_path):
    """Composition: the drift monitor watches the MEDIA-TAG profile of
    featurized arriving waves — a wave whose payloads collapsed to one
    modality (the broken-extractor failure: every doc suddenly lands
    as an image) flags at the door, while a healthy wave from the same
    generator stays quiet. Reuses the streaming monitor verbatim: the
    featurizer's media tag IS the categorical key."""
    import glob as _glob
    import shutil

    from retail_datawarehouse_spark.operators.drift import key_profile
    from retail_datawarehouse_spark.operators.multimodal import (
        with_pgm_payload,
    )
    from retail_datawarehouse_spark.streaming.monitor import (
        read_verdicts,
        run_drift_monitor_available_now,
    )

    root = str(tmp_path)
    landing = f"{root}/landing"
    os.makedirs(landing)
    # reference profile: the healthy generator's media-row mix
    ref = key_profile(
        featurize_media(with_mixed_media_payload(_docs(spark, range(600)))),
        F.col("media"),
    )
    ref.write.parquet(f"{root}/ref_profile")

    def land(wave, frame):
        keyed = frame.select(
            F.lit(wave).cast("long").alias("wave"),
            F.col("media").alias("k"),
        )
        tmp = f"{root}/w{wave}"
        keyed.coalesce(1).write.parquet(tmp)
        shutil.copy(
            _glob.glob(f"{tmp}/part-*.parquet")[0],
            f"{landing}/wave-{wave}.parquet",
        )

    healthy = featurize_media(
        with_mixed_media_payload(_docs(spark, range(600, 900)))
    )
    broken = featurize_media(
        with_pgm_payload(_docs(spark, range(900, 1200)))
    )  # extractor collapse: every doc an image
    land(0, healthy)
    land(1, broken)
    run_drift_monitor_available_now(
        spark, landing, f"{root}/ref_profile", f"{root}/verdicts"
    )
    flags = {
        r.wave: r.flag
        for r in read_verdicts(spark, f"{root}/verdicts").collect()
    }
    assert flags == {0: 0, 1: 1}
