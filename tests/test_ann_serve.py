"""Streaming ANN serving (streaming/ann_serve.py): query waves drained
against the stored IVF(×PQ) index — drain ≡ batch query wave-for-wave,
checkpointed restart answers only new waves, appends to the index are
visible to the next wave without restart, replays REPLACE their wave
(dynamic partition overwrite — consistent even across an index
append), and a multi-wave landing file fails loudly."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.ann_index import (
    append_to_ivf_index,
    query_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.operators.similarity import (
    IVF_CELLS,
    IVF_NPROBE,
    N_QUERIES,
)
from retail_datawarehouse_spark.sources.readers import load_table
from retail_datawarehouse_spark.streaming.ann_serve import (
    read_ann_results,
    run_ann_serve_available_now,
)


def _fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    return corpus, queries


def _land_wave(spark, root, landing, wave, qdf):
    frame = qdf.select(
        F.lit(wave).cast("long").alias("wave"), "id", "emb"
    )
    tmp = f"{root}/qw{wave}"
    frame.coalesce(1).write.parquet(tmp)
    os.makedirs(landing, exist_ok=True)
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0], f"{landing}/wave-{wave}.parquet"
    )


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.candidate_id, r.cosine) for r in df.collect()
    )


def test_drain_equals_batch_and_restart_is_incremental(
    spark, sf_correctness_dir, tmp_path
):
    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results, ckpt = f"{root}/results", f"{root}/ckpt"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    q0 = queries.filter(F.col("id") < 5)
    q1 = queries.filter(F.col("id") >= 5)
    _land_wave(spark, root, landing, 0, q0)
    _land_wave(spark, root, landing, 1, q1)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE, checkpoint_dir=ckpt
    )
    got = read_ann_results(spark, results)
    for wave, qdf in ((0, q0), (1, q1)):
        batch = query_ivf_index(qdf, idx, nprobe=IVF_NPROBE)
        assert _rows(got.filter(F.col("wave") == wave).drop("wave")) == _rows(
            batch
        )
    # wave 2 lands; the checkpointed re-drain answers ONLY it
    _land_wave(spark, root, landing, 2, q0.limit(2))
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE, checkpoint_dir=ckpt
    )
    raw = spark.read.parquet(results)
    deduped = read_ann_results(spark, results)
    assert raw.count() == deduped.count()  # no replay happened
    assert deduped.filter(F.col("wave") == 2).count() == 2 * 3


def test_index_appends_visible_to_next_wave_without_restart(
    spark, sf_correctness_dir, tmp_path
):
    """The drain reads the index table as-of each batch: a vector
    appended BETWEEN waves is retrieved by the next wave's identical
    query at rank 1 with self-cosine 1 — no restart, no
    re-registration."""
    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 17 == 0)
    base = corpus.filter(F.col("id") % 17 != 0)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results, ckpt = f"{root}/results", f"{root}/ckpt"
    store_ivf_index(base, idx, cells=IVF_CELLS)
    probe = holdout.limit(1)
    probe_id = probe.collect()[0].id
    _land_wave(spark, root, landing, 0, probe)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=1, checkpoint_dir=ckpt
    )
    append_to_ivf_index(holdout, idx)
    _land_wave(spark, root, landing, 1, probe)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=1, checkpoint_dir=ckpt
    )
    got = read_ann_results(spark, results)
    before = {
        r.rank: r
        for r in got.filter(
            (F.col("wave") == 0) & (F.col("query_id") == probe_id)
        ).collect()
    }
    after = {
        r.rank: r
        for r in got.filter(
            (F.col("wave") == 1) & (F.col("query_id") == probe_id)
        ).collect()
    }
    assert before[1].candidate_id != probe_id  # held out: not in index
    assert after[1].candidate_id == probe_id  # appended: now rank 1
    assert abs(after[1].cosine - 1.0) < 1e-12


def test_pq_drain_matches_batch_pq_query_and_replay_replaces(
    spark, sf_correctness_dir, tmp_path
):
    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results = f"{root}/results"
    store_ivf_index(corpus, idx, cells=IVF_CELLS, pq=True)
    _land_wave(spark, root, landing, 0, queries)
    # two un-checkpointed drains = a full replay of wave 0; dynamic
    # partition overwrite REPLACES the wave directory, so the raw
    # table never accumulates replay duplicates (ADVICE r7)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE,
        checkpoint_dir=f"{root}/c1", pq=True, rerank=64,
    )
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE,
        checkpoint_dir=f"{root}/c2", pq=True, rerank=64,
    )
    raw = spark.read.parquet(results)
    deduped = read_ann_results(spark, results)
    assert raw.count() == deduped.count()
    batch = query_ivf_index(
        queries, idx, nprobe=IVF_NPROBE, pq=True, rerank=64
    )
    assert _rows(deduped.drop("wave")) == _rows(batch)


def test_replay_after_index_append_is_consistent_not_mixed(
    spark, sf_correctness_dir, tmp_path
):
    """The ADVICE r7 scenario: an append_to_ivf_index lands BETWEEN a
    wave's original serving and its replay. Overwrite-per-wave means
    the stored rows for that wave are wholly the REPLAY's serving
    (consistent against the grown index) — never an arbitrary mix of
    old-index and new-index candidates, which a row-level
    (wave, query_id, rank) dedupe over appended duplicates would
    have kept."""
    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 17 == 0)
    base = corpus.filter(F.col("id") % 17 != 0)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results = f"{root}/results"
    store_ivf_index(base, idx, cells=IVF_CELLS)
    probe = holdout.limit(1)
    probe_id = probe.collect()[0].id
    _land_wave(spark, root, landing, 0, probe)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=1, checkpoint_dir=f"{root}/c1"
    )
    append_to_ivf_index(holdout, idx)
    # fresh checkpoint: full replay of wave 0 against the grown index
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=1, checkpoint_dir=f"{root}/c2"
    )
    got = read_ann_results(spark, results).filter(
        (F.col("wave") == 0) & (F.col("query_id") == probe_id)
    )
    batch = query_ivf_index(probe, idx, nprobe=1)
    # row-for-row the grown-index serving — including the appended
    # vector at rank 1 — and nothing left over from the pre-append one
    assert _rows(got.drop("wave")) == _rows(batch)
    by_rank = {r.rank: r for r in got.collect()}
    assert by_rank[1].candidate_id == probe_id


def test_compaction_between_waves_serves_next_wave_from_new_generation(
    spark, sf_correctness_dir, tmp_path
):
    """Maintenance composes with serving (r8): a compaction landing
    BETWEEN waves is picked up by the next wave without restart — the
    per-batch query path resolves the generation pointer at execution,
    exactly like appends. Wave 0 serves gen-0; then compact + append;
    wave 1 must serve the compacted gen-1 INCLUDING the post-compaction
    append, row-for-row equal to the batch query at HEAD."""
    from retail_datawarehouse_spark.operators.ann_index import (
        _cells_generation,
        compact_ivf_index,
    )

    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 13 == 0)
    base = corpus.filter(F.col("id") % 13 != 0)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results, ckpt = f"{root}/results", f"{root}/ckpt"
    store_ivf_index(base, idx, cells=IVF_CELLS)
    append_to_ivf_index(holdout.limit(3), idx)  # accrete some files
    q = queries.limit(4)
    _land_wave(spark, root, landing, 0, q)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE, checkpoint_dir=ckpt
    )
    wave0 = read_ann_results(spark, results).filter(F.col("wave") == 0)
    compact_ivf_index(spark, idx)
    assert _cells_generation(idx) == 1
    probe = holdout.filter(~F.col("id").isin(
        [r.id for r in holdout.limit(3).collect()]
    )).limit(1)
    append_to_ivf_index(probe, idx)  # lands in gen-1
    _land_wave(spark, root, landing, 1, q)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE, checkpoint_dir=ckpt
    )
    got = read_ann_results(spark, results)
    wave1 = got.filter(F.col("wave") == 1)
    batch = query_ivf_index(q, idx, nprobe=IVF_NPROBE)
    assert _rows(wave1.drop("wave")) == _rows(batch)
    # wave 0's stored rows are untouched by the compaction
    assert _rows(got.filter(F.col("wave") == 0).drop("wave")) == _rows(
        wave0.drop("wave")
    )


def test_multi_wave_query_file_fails_loudly(
    spark, sf_correctness_dir, tmp_path
):
    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx, landing = f"{root}/idx", f"{root}/landing"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    mixed = queries.select(
        (F.col("id") % 2).cast("long").alias("wave"), "id", "emb"
    )
    tmp = f"{root}/mixed"
    mixed.coalesce(1).write.parquet(tmp)
    os.makedirs(landing, exist_ok=True)
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0], f"{landing}/wave-x.parquet"
    )
    with pytest.raises(Exception, match="spans 2 waves"):
        run_ann_serve_available_now(
            spark, landing, idx, f"{root}/results", nprobe=IVF_NPROBE,
            checkpoint_dir=f"{root}/ckpt",
        )


def test_mid_drain_rebuild_serves_next_wave_wholly_from_new_generation(
    spark, sf_correctness_dir, tmp_path, monkeypatch
):
    """r8 verdict #4 (whole-index rebuild atomicity under a live
    drain): a REBUILD — new corpus, new cell count, i.e. new quantizer
    AND new cells — committing at a wave boundary must be picked up by
    the handle refresh so the wave is served ENTIRELY by the new
    generation. Mixing would pair the old 16-centroid sidecar with the
    new 8-cell table: a full probe would then open at most a lucky
    subset of the new cells and miss candidates — so equality with
    brute force over the grown corpus at nprobe=8 pins no-mixing. The
    rebuild is injected at the second wave's refresh boundary via
    monkeypatch — exactly the moment a drift-triggered retrain would
    land."""
    from pyspark.sql import Window  # noqa: F401 (parity with peers)

    from retail_datawarehouse_spark.operators import ann_index as ai

    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    holdout = corpus.filter(F.col("id") % 17 == 0)
    base = corpus.filter(F.col("id") % 17 != 0)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results, ckpt = f"{root}/results", f"{root}/ckpt"
    store_ivf_index(base, idx, cells=IVF_CELLS)
    q = queries.limit(4)
    # wave 0's expectation, computed against gen-0 BEFORE the rebuild
    # supersedes it (nprobe=8 of 16 cells is a partial probe there, so
    # brute force is not the right pin for wave 0 — the batch query is)
    expected_w0 = _rows(query_ivf_index(q, idx, nprobe=8))
    _land_wave(spark, root, landing, 0, q)
    _land_wave(spark, root, landing, 1, q)

    real_refresh = ai.IvfIndexHandle.refresh
    calls = {"n": 0}

    def refresh_with_rebuild(self, sp):
        calls["n"] += 1
        if calls["n"] == 2:  # the second wave's boundary
            store_ivf_index(corpus, idx, cells=8)
        return real_refresh(self, sp)

    monkeypatch.setattr(ai.IvfIndexHandle, "refresh", refresh_with_rebuild)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=8, checkpoint_dir=ckpt
    )
    monkeypatch.undo()
    assert ai._cells_generation(idx) == 1
    got = read_ann_results(spark, results)
    # wave 0 served the old generation (holdout absent from base)
    from tests.test_ann_index import _brute_force

    w0 = got.filter(F.col("wave") == 0).drop("wave")
    w1 = got.filter(F.col("wave") == 1).drop("wave")
    assert _rows(w1) == _rows(_brute_force(corpus, q))
    assert _rows(w0) == expected_w0  # served wholly by gen-0
    assert _rows(w0) != _rows(w1)  # the rebuild is observable


def test_full_maintenance_lifecycle_under_live_serving(
    spark, sf_correctness_dir, tmp_path
):
    """The whole operational loop a long-lived serving index runs,
    composed end-to-end under a live (checkpointed, incremental) drain
    (r9 verdict next-round #3): ingest appends until the file cap
    trips → ``maintain_ivf_index`` autopilot compacts → a planted
    skewed ingest trips ``rebuild_recommended`` → the caller executes
    the rebuild as the next generation → superseded generations are
    reaped — with serving EXACTNESS asserted at every wave boundary
    (each wave ≡ brute force over exactly the rows the index holds, at
    full probe of the current generation's cell count) and identity
    asserted across the pure-maintenance steps (compaction and reap
    change no answer)."""
    from retail_datawarehouse_spark.operators.ann_index import (
        _cells_generation,
        _cells_path,
        maintain_ivf_index,
        reap_ivf_generations,
        rebuild_ivf_index,
    )
    from tests.test_ann_index import _brute_force

    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx, landing = f"{root}/idx", f"{root}/landing"
    results, ckpt = f"{root}/results", f"{root}/ckpt"
    q = queries.limit(4)

    def drain(wave):
        _land_wave(spark, root, landing, wave, q)
        # full probe = CENTROID count (a Lloyd cell can be empty, so
        # counting cell directories can under-probe)
        cents = _cells_path(idx).rsplit("/", 1)[0] + "/centroids"
        nprobe = spark.read.parquet(cents).count()
        run_ann_serve_available_now(
            spark, landing, idx, results, nprobe=nprobe, checkpoint_dir=ckpt
        )
        return _rows(
            read_ann_results(spark, results)
            .filter(F.col("wave") == wave)
            .drop("wave")
        )

    def held(*dfs):
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # wave 0: fresh index
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    assert drain(0) == _rows(_brute_force(corpus, q))

    # ingest: appends fragment cells past the file cap
    batch = corpus.filter(F.col("id") % 31 == 0)
    batches = []
    for i in range(9):
        b = batch.select(
            (F.col("id") + (i + 1) * 1_000_000).alias("id"), "emb"
        )
        append_to_ivf_index(b, idx)
        batches.append(b)
    w1 = drain(1)
    assert w1 == _rows(_brute_force(held(corpus, *batches), q))

    # autopilot: stats -> compact (gen-1); serving identical pre/post
    rep = maintain_ivf_index(spark, idx, max_files_per_cell=8)
    assert rep["compacted"] is True and rep["superseded"] is False
    assert _cells_generation(idx) == 1
    assert drain(2) == w1

    # TAKEDOWN DRAIN mid-lifecycle (r13; r12 verdict #4): a wave of
    # deletion requests lands through the streaming takedown gate
    # between maintenance steps — the next serving wave must exclude
    # the victims (logical delete, wave-boundary visibility), and the
    # later rebuild must remove them physically while the takedown
    # receipts stand.
    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_takedown_reports,
        run_takedown_available_now,
    )

    victims = [
        r.id + 1_000_000 for r in batch.select("id").limit(3).collect()
    ]
    td_landing, td_reports = f"{root}/td_landing", f"{root}/td_reports"
    _land_takedown(spark, root, td_landing, 0, victims)
    run_takedown_available_now(
        spark, td_landing, idx, td_reports, checkpoint_dir=f"{root}/td_ckpt"
    )
    assert {
        (r.id, r.tombstoned)
        for r in read_takedown_reports(spark, td_reports).collect()
    } == {(i, True) for i in victims}
    alive = held(corpus, *batches).filter(~F.col("id").isin(victims))
    w2b = drain(3)
    assert w2b == _rows(_brute_force(alive, q))

    # planted skew trips the rebuild flag (the drift signal the TVD
    # monitor can't see: occupancy piling into one cell)
    one = corpus.limit(1)
    skewed = (
        one.crossJoin(
            spark.range(1, 400).select((F.col("id") * 2).alias("_m"))
        )
        .select(
            (F.col("id") * 100_000 + F.col("_m")).alias("id"),
            F.transform(
                "emb", lambda x: x * (F.col("_m") / F.lit(100.0))
            ).alias("emb"),
        )
        .select("id", F.col("emb").cast("array<float>").alias("emb"))
    )
    append_to_ivf_index(skewed, idx)
    rep2 = maintain_ivf_index(
        spark, idx, max_files_per_cell=50, skew_ratio=3.0
    )
    assert rep2["rebuild_recommended"] is True and rep2["compacted"] is False

    # execute the recommended rebuild through the first-class API: the
    # corpus is the index's own current generation, pinned as the SAME
    # listing the fold-forward excludes (zero provenance gap) — and the
    # rebuild PHYSICALLY drops the takedown victims (tombstones applied
    # in the rewrite, sidecar cleared in the new generation)
    rebuild_ivf_index(spark, idx, cells=8)
    assert _cells_generation(idx) == 2
    raw_after_rebuild = spark.read.parquet(f"{idx}/gen-2/cells")
    assert raw_after_rebuild.filter(F.col("id").isin(victims)).count() == 0
    assert not os.path.isdir(f"{idx}/gen-2/tombstones")
    w3 = drain(4)
    assert w3 == _rows(
        _brute_force(held(alive, skewed), q)
    )

    # reap superseded generations; serving unchanged
    removed = reap_ivf_generations(idx)
    assert f"{idx}/cells" in removed and f"{idx}/gen-1" in removed
    assert not os.path.isdir(f"{idx}/gen-1")
    spark.catalog.refreshByPath(_cells_path(idx))
    assert drain(5) == w3


def test_metric_drain_matches_batch_metric_query(
    spark, sf_correctness_dir, tmp_path
):
    """The serving drain passes metric/route through (r10): an l2
    drain's wave must equal the batch l2 query row-for-row, carry the
    metric's own value column (``score``, not ``cosine``), and an
    ip/flat drain must likewise mirror its batch twin."""
    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)

    def srows(df):
        return sorted(
            (r.query_id, r.rank, r.candidate_id, r.score)
            for r in df.collect()
        )

    for wave, (metric, route) in enumerate(
        (("l2", "symmetric"), ("ip", "flat"))
    ):
        landing = f"{root}/landing_{metric}"
        results = f"{root}/results_{metric}"
        _land_wave(spark, root, landing, wave, queries)
        run_ann_serve_available_now(
            spark,
            landing,
            idx,
            results,
            nprobe=IVF_NPROBE,
            metric=metric,
            route=route,
        )
        got = read_ann_results(spark, results, metric=metric)
        assert "score" in got.columns and "cosine" not in got.columns
        batch = query_ivf_index(
            queries, idx, nprobe=IVF_NPROBE, metric=metric, route=route
        )
        assert srows(got.drop("wave")) == srows(batch)
        # a reader declaring the WRONG metric for a landed table raises
        # instead of silently renaming the value column
        with pytest.raises(ValueError, match="one metric per results"):
            read_ann_results(spark, results)


def test_read_ann_results_empty_schema_matches_metric(spark, tmp_path):
    """ADVICE r10: the empty results frame (no waves landed) must carry
    the DEPLOYMENT metric's value column — previously it always said
    ``cosine``, so an ip/l2 reader keyed on the empty-case schema broke
    the moment the first wave landed and the column became ``score``."""
    missing = str(tmp_path / "nowaves")
    assert read_ann_results(spark, missing).columns == [
        "wave", "query_id", "candidate_id", "cosine", "rank",
    ]
    for metric in ("ip", "l2"):
        assert read_ann_results(spark, missing, metric=metric).columns == [
            "wave", "query_id", "candidate_id", "score", "rank",
        ]


def test_read_ann_results_metric_none_is_legacy_autodetect(
    spark, sf_correctness_dir, tmp_path
):
    """ADVICE r11 #4: the r11 declared-metric contract broke external
    call sites that relied on the pre-r11 auto-detection.
    ``metric=None`` is the explicit migration opt-in: the stored schema
    decides the value column (and the empty table says ``cosine``, the
    legacy default) — while the default-argument path keeps the
    declared-metric raise."""
    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    landing = f"{root}/landing"
    results = f"{root}/results"
    _land_wave(spark, root, landing, 0, queries)
    run_ann_serve_available_now(
        spark, landing, idx, results, nprobe=IVF_NPROBE, metric="l2"
    )
    # declared wrong metric still raises; None auto-detects 'score'
    with pytest.raises(ValueError, match="one metric per results"):
        read_ann_results(spark, results)
    auto = read_ann_results(spark, results, metric=None)
    assert "score" in auto.columns and auto.count() > 0
    declared = read_ann_results(spark, results, metric="l2")
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, declared.collect())
    )
    # empty table under None = the legacy cosine schema
    assert read_ann_results(
        spark, str(tmp_path / "nowaves"), metric=None
    ).columns == ["wave", "query_id", "candidate_id", "cosine", "rank"]
    with pytest.raises(ValueError, match="legacy auto-detect"):
        read_ann_results(spark, results, metric="dot")


def _novel(seed, dim=64):
    import numpy as np

    return np.random.default_rng(seed).normal(size=dim).tolist()


def test_admission_drain_equals_sequential_batch_admission(
    spark, sf_correctness_dir, tmp_path
):
    """r11 verdict #5: the streaming ingestion gate must equal
    sequential batch admission on the same waves — same per-vector
    verdicts (id, nearest, score, admitted) and the same final index
    contents. Wave 0 carries a corpus duplicate + a novel vector;
    wave 1 a fresh-id copy of wave 0's novel (rejected against the
    now-stored copy — the convergence property) + another novel."""
    from retail_datawarehouse_spark.operators.ann_index import (
        admit_novel_vectors,
    )
    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_admission_reports,
        run_admission_available_now,
    )

    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    idx, twin = f"{root}/idx", f"{root}/twin"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    store_ivf_index(corpus, twin, cells=IVF_CELLS)
    parent = corpus.limit(1).collect()[0]
    w0 = [(9001, list(parent.emb)), (9002, _novel(3))]
    w1 = [(9102, _novel(3)), (9103, _novel(4))]  # 9102 = copy of 9002

    landing, reports = f"{root}/landing", f"{root}/reports"
    ckpt = f"{root}/ckpt"
    waves_f32 = {}
    for wave, rows in ((0, w0), (1, w1)):
        qdf = spark.createDataFrame(
            rows, "id long, emb array<double>"
        ).select("id", F.col("emb").cast("array<float>").alias("emb"))
        waves_f32[wave] = qdf
        _land_wave(spark, root, landing, wave, qdf)
        run_admission_available_now(
            spark, landing, idx, reports, threshold=0.99, nprobe=4,
            checkpoint_dir=ckpt,
        )

    # batch twin: the same waves through the batch API, sequentially
    want_rows = []
    for wave, rows in ((0, w0), (1, w1)):
        # the SAME float32-cast frames the drain consumed — the twin
        # must see bit-identical inputs for score equality
        rep = admit_novel_vectors(
            waves_f32[wave], twin, threshold=0.99, nprobe=4,
        )
        want_rows += [
            (wave, r.id, r.nearest_id, round(r.score, 9) if r.score is not None else None, r.admitted)
            for r in rep.collect()
        ]

    got = sorted(
        (r.wave, r.id, r.nearest_id,
         round(r.score, 9) if r.score is not None else None, r.admitted)
        for r in read_admission_reports(spark, reports).collect()
    )
    assert got == sorted(want_rows) and len(got) == 4
    # verdict shape: corpus dup + re-submitted copy rejected, novels in
    verdicts = {r[1]: r[4] for r in got}
    assert verdicts == {9001: False, 9002: True, 9102: False, 9103: True}
    # identical final index contents
    ids_idx = {r.id for r in spark.read.parquet(f"{idx}/cells").collect()}
    ids_twin = {r.id for r in spark.read.parquet(f"{twin}/cells").collect()}
    assert ids_idx == ids_twin and 9002 in ids_idx and 9103 in ids_idx


def test_admission_drain_restart_midfeed_admits_exactly_once(
    spark, sf_correctness_dir, tmp_path
):
    """At-least-once replay, exactly-once ADMISSION: wiping the
    checkpoint mid-feed forces a full replay of wave 0 — its rows now
    probe as duplicates OF THEMSELVES, so nothing is re-appended, and
    the replayed report still says admitted=true for the originally
    admitted row (the self-match rule) instead of flipping it."""
    import shutil as _shutil

    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_admission_reports,
        run_admission_available_now,
    )

    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    parent = corpus.limit(1).collect()[0]
    landing, reports, ckpt = (
        f"{root}/landing", f"{root}/reports", f"{root}/ckpt",
    )
    w0 = spark.createDataFrame(
        [(9001, list(parent.emb)), (9002, _novel(7))],
        "id long, emb array<double>",
    ).select("id", F.col("emb").cast("array<float>").alias("emb"))
    _land_wave(spark, root, landing, 0, w0)
    run_admission_available_now(
        spark, landing, idx, reports, threshold=0.99, nprobe=4,
        checkpoint_dir=ckpt,
    )
    n_after_w0 = spark.read.parquet(f"{idx}/cells").count()

    # crash-equivalent: checkpoint gone, wave 1 lands, full re-drain
    _shutil.rmtree(ckpt)
    w1 = spark.createDataFrame(
        [(9103, _novel(8))], "id long, emb array<double>"
    ).select("id", F.col("emb").cast("array<float>").alias("emb"))
    _land_wave(spark, root, landing, 1, w1)
    run_admission_available_now(
        spark, landing, idx, reports, threshold=0.99, nprobe=4,
        checkpoint_dir=ckpt,
    )
    # wave 0's novel admitted EXACTLY once across original + replay
    cells = spark.read.parquet(f"{idx}/cells")
    assert cells.filter(F.col("id") == 9002).count() == 1
    assert cells.count() == n_after_w0 + 1  # + wave 1's novel only
    rep = {
        (r.wave, r.id): r
        for r in read_admission_reports(spark, reports).collect()
    }
    assert len(rep) == 3  # deduped on (wave, id)
    assert rep[(0, 9002)].admitted  # self-match keeps the verdict
    assert rep[(0, 9002)].nearest_id == 9002  # and says why
    assert not rep[(0, 9001)].admitted
    assert rep[(1, 9103)].admitted
    # empty-report reader schema
    assert read_admission_reports(spark, f"{root}/nowaves").columns == [
        "wave", "id", "nearest_id", "score", "admitted",
    ]


def test_admission_drain_replay_keeps_intra_wave_duplicate_verdicts(
    spark, sf_correctness_dir, tmp_path
):
    """r12 review finding: two exact copies with fresh ids in ONE wave
    are both admitted (intra-batch dups probe the stored corpus only
    — the documented admit_novel_vectors contract). On replay both are
    stored and tie at score 1.0; the higher id's rank-1 resolves to
    its twin, so a nearest-is-self rescue would flip its verdict to
    rejected. The membership-based rescue (resident_ids) must keep
    BOTH verdicts admitted=true across the replay, and the index must
    hold each id exactly once."""
    import shutil as _shutil

    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_admission_reports,
        run_admission_available_now,
    )

    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    dup_emb = _novel(21)
    w0 = spark.createDataFrame(
        [(9001, dup_emb), (9002, dup_emb)], "id long, emb array<double>"
    ).select("id", F.col("emb").cast("array<float>").alias("emb"))
    landing, reports, ckpt = (
        f"{root}/landing", f"{root}/reports", f"{root}/ckpt",
    )
    _land_wave(spark, root, landing, 0, w0)
    run_admission_available_now(
        spark, landing, idx, reports, threshold=0.99, nprobe=4,
        checkpoint_dir=ckpt,
    )
    first = {
        r.id: r.admitted
        for r in read_admission_reports(spark, reports).collect()
    }
    assert first == {9001: True, 9002: True}
    # forced replay of the SAME wave
    _shutil.rmtree(ckpt)
    run_admission_available_now(
        spark, landing, idx, reports, threshold=0.99, nprobe=4,
        checkpoint_dir=ckpt,
    )
    replayed = {
        r.id: r.admitted
        for r in read_admission_reports(spark, reports).collect()
    }
    assert replayed == {9001: True, 9002: True}, replayed
    cells = spark.read.parquet(f"{idx}/cells")
    assert cells.filter(F.col("id") == 9001).count() == 1
    assert cells.filter(F.col("id") == 9002).count() == 1


def _land_takedown(spark, root, landing, wave, ids):
    frame = spark.createDataFrame(
        [(wave, int(i)) for i in ids], "wave long, id long"
    )
    tmp = f"{root}/tdw{wave}"
    frame.coalesce(1).write.parquet(tmp)
    os.makedirs(landing, exist_ok=True)
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0],
        f"{landing}/wave-{wave}.parquet",
    )


def test_takedown_drain_equals_sequential_batch_deletes(
    spark, sf_correctness_dir, tmp_path
):
    """r12 verdict #4: takedown requests arrive as a stream exactly
    like ingestion; the drain must leave the index in the SAME state
    as sequential batch ``delete_from_ivf_index`` calls on the same
    waves — identical tombstone sets, identical serving — and every
    request receives a ``tombstoned=true`` receipt (the wave-2 repeat
    of a wave-0 id included: the receipt is membership, not
    wrote-a-row)."""
    from retail_datawarehouse_spark.operators.ann_index import (
        delete_from_ivf_index,
    )
    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_takedown_reports,
        run_takedown_available_now,
    )

    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx, twin = f"{root}/idx", f"{root}/twin"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    store_ivf_index(corpus, twin, cells=IVF_CELLS)
    all_ids = [r.id for r in corpus.select("id").orderBy("id").collect()]
    w0, w1 = all_ids[:3], [all_ids[0], all_ids[5]]  # w1 repeats one id

    landing, reports = f"{root}/landing", f"{root}/reports"
    ckpt = f"{root}/ckpt"
    for wave, ids in ((0, w0), (1, w1)):
        _land_takedown(spark, root, landing, wave, ids)
    run_takedown_available_now(
        spark, landing, idx, reports, checkpoint_dir=ckpt
    )
    for ids in (w0, w1):
        delete_from_ivf_index(
            spark.createDataFrame([(i,) for i in ids], "id long"), twin
        )

    ts = lambda p: {  # noqa: E731
        r.id for r in spark.read.parquet(f"{p}/tombstones").collect()
    }
    assert ts(idx) == ts(twin) == set(w0) | set(w1)
    got = query_ivf_index(queries, idx, nprobe="all")
    want = query_ivf_index(queries, twin, nprobe="all")
    assert _rows(got) == _rows(want)
    assert not ({r.candidate_id for r in got.collect()} & (set(w0) | set(w1)))
    receipts = read_takedown_reports(spark, reports)
    acked = {
        (r.wave, r.id): r.tombstoned for r in receipts.collect()
    }
    assert acked == {
        **{(0, i): True for i in w0},
        **{(1, i): True for i in w1},
    }


def test_takedown_drain_restart_midfeed_writes_no_duplicate_tombstones(
    spark, sf_correctness_dir, tmp_path
):
    """At-least-once replay, exactly-once TOMBSTONES: wiping the
    checkpoint forces a full replay of every wave — the delete's own
    anti-join dedupe writes ZERO new sidecar rows (the admission
    drain's correctness-from-the-predicate design), the debt-bounded
    broadcast never grows from replays, and the membership-rescued
    receipts read identically."""
    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_takedown_reports,
        run_takedown_available_now,
    )

    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    all_ids = [r.id for r in corpus.select("id").orderBy("id").collect()]
    w0, w1 = all_ids[:2], all_ids[2:5]
    landing, reports = f"{root}/landing", f"{root}/reports"
    ckpt = f"{root}/ckpt"
    for wave, ids in ((0, w0), (1, w1)):
        _land_takedown(spark, root, landing, wave, ids)
    run_takedown_available_now(
        spark, landing, idx, reports, checkpoint_dir=ckpt
    )
    sidecar = lambda: spark.read.schema("id long").parquet(  # noqa: E731
        f"{idx}/tombstones"
    )
    n_rows = sidecar().count()
    before = sorted(
        (r.wave, r.id, r.tombstoned)
        for r in read_takedown_reports(spark, reports).collect()
    )
    shutil.rmtree(ckpt)  # checkpoint lost: every wave replays
    run_takedown_available_now(
        spark, landing, idx, reports, checkpoint_dir=f"{root}/ckpt2"
    )
    assert sidecar().count() == n_rows  # zero duplicate tombstones
    assert {r.id for r in sidecar().collect()} == set(w0) | set(w1)
    after = sorted(
        (r.wave, r.id, r.tombstoned)
        for r in read_takedown_reports(spark, reports).collect()
    )
    assert after == before  # receipts replay-stable (membership rescue)


def test_takedown_receipts_survive_racing_compaction(
    spark, sf_correctness_dir, tmp_path, monkeypatch
):
    """r13 review: a compaction committing between a wave's delete and
    the handle refresh PHYSICALLY applies the wave's tombstones and
    clears the sidecar in the new generation — a pure membership
    receipt would then misread the victims as un-acknowledged
    (tombstoned=false) although the index no longer serves them. The
    drain detects the generation flip and trusts the lock-serialized
    delete's own guarantee. Injected deterministically: the drain's
    delete call is wrapped to run a compaction immediately after."""
    from retail_datawarehouse_spark.operators.ann_index import (
        compact_ivf_index,
        delete_from_ivf_index,
    )
    from retail_datawarehouse_spark.streaming import ann_serve

    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    victims = [r.id for r in corpus.select("id").orderBy("id").limit(3).collect()]

    def delete_then_compact(ids, index_dir, coordinator=None):
        n = delete_from_ivf_index(ids, index_dir, coordinator=coordinator)
        compact_ivf_index(spark, index_dir, coordinator=coordinator)
        return n

    monkeypatch.setattr(
        ann_serve, "delete_from_ivf_index", delete_then_compact
    )
    landing, reports = f"{root}/landing", f"{root}/reports"
    _land_takedown(spark, root, landing, 0, victims)
    ann_serve.run_takedown_available_now(
        spark, landing, idx, reports, checkpoint_dir=f"{root}/ckpt"
    )
    # physically gone (gen-1, sidecar cleared) AND receipts acknowledge
    assert not os.path.isdir(f"{idx}/gen-1/tombstones")
    raw = spark.read.parquet(f"{idx}/gen-1/cells")
    assert raw.filter(F.col("id").isin(victims)).count() == 0
    got = {
        (r.id, r.tombstoned)
        for r in ann_serve.read_takedown_reports(spark, reports).collect()
    }
    assert got == {(i, True) for i in victims}
    assert not (
        {r.candidate_id for r in query_ivf_index(queries, idx, nprobe="all").collect()}
        & set(victims)
    )


def test_takedown_then_resubmit_composes_through_both_drains(
    spark, sf_correctness_dir, tmp_path
):
    """The full takedown-then-resubmit story END-TO-END through the
    STREAMING surfaces (r13 — the batch composition was pinned in
    r12): (1) an admission wave carrying an exact copy of a stored
    parent is REJECTED by the gate; (2) a takedown wave removes the
    parent through the takedown drain; (3) a later admission wave
    resubmitting the same content under a fresh id is ADMITTED — the
    deleted parent no longer blocks it — and is immediately served at
    rank 1 while the parent stays screened out. Three checkpointed
    drains over one live index, deletes visible across drains at
    wave boundaries."""
    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_admission_reports,
        read_takedown_reports,
        run_admission_available_now,
        run_takedown_available_now,
    )

    root = str(tmp_path)
    corpus, _ = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    parent = corpus.limit(1).collect()[0]

    adm_landing, adm_reports = f"{root}/adm_landing", f"{root}/adm_reports"
    adm_ckpt = f"{root}/adm_ckpt"

    def admit_wave(wave, rows):
        qdf = spark.createDataFrame(
            rows, "id long, emb array<double>"
        ).select("id", F.col("emb").cast("array<float>").alias("emb"))
        _land_wave(spark, root, adm_landing, wave, qdf)
        run_admission_available_now(
            spark, adm_landing, idx, adm_reports, threshold=0.99,
            nprobe=4, checkpoint_dir=adm_ckpt,
        )

    # (1) the stored parent blocks its copy
    admit_wave(0, [(9001, list(parent.emb))])
    verdicts = {
        (r.wave, r.id): r.admitted
        for r in read_admission_reports(spark, adm_reports).collect()
    }
    assert verdicts[(0, 9001)] is False

    # (2) takedown drain removes the parent
    _land_takedown(spark, root, f"{root}/td_landing", 0, [parent.id])
    run_takedown_available_now(
        spark, f"{root}/td_landing", idx, f"{root}/td_reports",
        checkpoint_dir=f"{root}/td_ckpt",
    )
    assert {
        (r.id, r.tombstoned)
        for r in read_takedown_reports(spark, f"{root}/td_reports").collect()
    } == {(parent.id, True)}

    # (3) the same content under a fresh id is now ADMITTED...
    admit_wave(1, [(9002, list(parent.emb))])
    verdicts = {
        (r.wave, r.id): r.admitted
        for r in read_admission_reports(spark, adm_reports).collect()
    }
    assert verdicts[(1, 9002)] is True
    # ...and served at rank 1, with the deleted parent screened out
    probe = spark.createDataFrame(
        [(1, list(parent.emb))], "id long, emb array<double>"
    )
    served = query_ivf_index(probe, idx, nprobe="all")
    got = {r.candidate_id for r in served.collect()}
    assert 9002 in got and parent.id not in got
    top1 = served.filter(F.col("rank") == 1).collect()[0]
    assert top1.candidate_id == 9002


def test_streaming_takedown_debt_drives_the_maintenance_policy(
    spark, sf_correctness_dir, tmp_path
):
    """The debt POLICY LOOP closed over the streaming surface (r13):
    takedown waves accumulate tombstone debt through the drain; the
    autopilot sweep's ``max_tombstones`` trigger compacts it away
    (physical removal, sidecar cleared, debt recounted to 0 in the
    SAME report); serving is exact throughout; and the drain keeps
    working against the POST-compaction generation (a later wave's
    tombstones land in the new generation's sidecar). This is the
    steady state a 100 TB corpus under continuous takedown runs:
    debt bounded by policy, never by an operator remembering to
    compact."""
    from retail_datawarehouse_spark.operators.ann_index import (
        maintain_ivf_index,
    )
    from retail_datawarehouse_spark.streaming.ann_serve import (
        run_takedown_available_now,
    )
    from tests.test_ann_index import _brute_force

    root = str(tmp_path)
    corpus, queries = _fixture(spark, sf_correctness_dir)
    idx = f"{root}/idx"
    store_ivf_index(corpus, idx, cells=IVF_CELLS)
    all_ids = [r.id for r in corpus.select("id").orderBy("id").collect()]
    w0, w1 = all_ids[:3], all_ids[3:6]
    landing, reports, ckpt = (
        f"{root}/landing", f"{root}/reports", f"{root}/ckpt"
    )
    for wave, ids in ((0, w0), (1, w1)):
        _land_takedown(spark, root, landing, wave, ids)
    run_takedown_available_now(
        spark, landing, idx, reports, checkpoint_dir=ckpt
    )
    # debt visible to the sweep; below-threshold sweep only reports
    rep = maintain_ivf_index(
        spark, idx, max_files_per_cell=99, max_tombstones=10
    )
    assert rep["tombstones"] == 6 and not rep["compacted"]
    # the policy trigger: debt > max_tombstones → compaction, physical
    # removal, and the SAME report already shows the cleared debt
    rep = maintain_ivf_index(
        spark, idx, max_files_per_cell=99, max_tombstones=4
    )
    assert rep["compacted"] and rep["tombstones"] == 0
    raw = spark.read.parquet(f"{idx}/gen-1/cells")
    assert raw.filter(F.col("id").isin(w0 + w1)).count() == 0
    alive = corpus.filter(~F.col("id").isin(w0 + w1))
    got = query_ivf_index(queries, idx, nprobe="all")
    assert _rows(got) == _rows(_brute_force(alive, queries))
    # the drain continues against the post-compaction generation
    w2 = all_ids[6:8]
    _land_takedown(spark, root, landing, 2, w2)
    run_takedown_available_now(
        spark, landing, idx, reports, checkpoint_dir=ckpt
    )
    side = spark.read.schema("id long").parquet(f"{idx}/gen-1/tombstones")
    assert {r.id for r in side.collect()} == set(w2)
    got2 = {
        r.candidate_id
        for r in query_ivf_index(queries, idx, nprobe="all").collect()
    }
    assert not (got2 & set(w0 + w1 + w2))
