"""Injectable index coordinator (r11; r10 verdict #6): the stored
index's control plane — pointer, lock, listings, markers — runs
through ``operators/index_fs.py``. The default ``PosixCoordinator`` is
byte-identical to the pre-r11 inlined code (every other test in the
repo pins that, running through the default); these tests drive the
FULL lifecycle (store → append → query → stats → compact → rebuild →
reap) through an ``ArrowFsCoordinator`` rooted on a
``pyarrow.fs.SubTreeFileSystem`` — the rebased-path proxy for an
object store (the coordinator sees subtree-relative paths; Spark reads
through the mapped absolute paths) — and pin value-identity against
the same corpus under the POSIX default."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.operators.ann_index import (
    append_to_ivf_index,
    compact_ivf_index,
    ivf_index_stats,
    maintain_ivf_index,
    open_ivf_index,
    query_ivf_index,
    reap_ivf_generations,
    rebuild_ivf_index,
    store_ivf_index,
)
from retail_datawarehouse_spark.operators.index_fs import (
    ArrowFsCoordinator,
)


def _corpus_rows(n: int = 120, dim: int = 8) -> list:
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(n, dim))
    return [(100 + i, mat[i].tolist()) for i in range(n)]


def _subtree_co(tmp_path):
    pafs = pytest.importorskip("pyarrow.fs")
    root = str(tmp_path)
    fs = pafs.SubTreeFileSystem(root, pafs.LocalFileSystem())
    return ArrowFsCoordinator(
        fs, spark_path_fn=lambda p: f"{root}/{p}" if p else root
    )


def _served(df):
    return sorted(
        (r.query_id, r.rank, r.candidate_id, round(r.cosine, 9))
        for r in df.collect()
    )


def test_full_lifecycle_through_subtree_coordinator(spark, tmp_path):
    """store → append → query → stats → compact → rebuild → reap, all
    addressed by subtree-RELATIVE paths through the coordinator, with
    every serving result value-identical to the POSIX twin of the same
    corpus (same build inputs ⇒ same cells, codes, scores)."""
    co = _subtree_co(tmp_path / "store")
    rows = _corpus_rows()
    corpus = spark.createDataFrame(rows, "id long, emb array<double>")
    queries = spark.createDataFrame(
        rows[:5], "id long, emb array<double>"
    )
    idx = "warehouse/idx"  # a path WITHIN the subtree, not absolute
    store_ivf_index(corpus, idx, cells=6, pq=True, coordinator=co)

    # POSIX twin on the identical corpus: serving values must be
    # byte-identical (the coordinator changes WHERE bytes live and how
    # the pointer commits, never a single value)
    posix_idx = str(tmp_path / "posix_idx")
    store_ivf_index(corpus, posix_idx, cells=6, pq=True)
    got = query_ivf_index(
        queries, idx, nprobe="all", pq=True, rerank=8, coordinator=co
    )
    want = query_ivf_index(queries, posix_idx, nprobe="all", pq=True, rerank=8)
    assert _served(got) == _served(want)

    # append lands through the coordinator and is immediately served
    extra = spark.createDataFrame(
        [(9000, rows[0][1])], "id long, emb array<double>"
    )
    append_to_ivf_index(extra, idx, coordinator=co)
    after = query_ivf_index(
        queries, idx, nprobe="all", coordinator=co
    )
    assert 9000 in {r.candidate_id for r in after.collect()}

    # stats: footer mode routes through the coordinator's own
    # filesystem; scan mode reads via the mapped Spark paths — the two
    # must stay value-identical on the coordinator-backed index too
    foot = {
        (r.cell, r.n_rows, r.n_files)
        for r in ivf_index_stats(spark, idx, coordinator=co).collect()
    }
    scan = {
        (r.cell, r.n_rows, r.n_files)
        for r in ivf_index_stats(
            spark, idx, mode="scan", coordinator=co
        ).collect()
    }
    assert foot == scan and foot

    # compact commits gen-1 through the coordinator's pointer protocol
    compact_ivf_index(spark, idx, coordinator=co)
    h = open_ivf_index(spark, idx, persist=False, coordinator=co)
    assert h.gen == 1
    assert co.read_text(f"{idx}/CURRENT").strip() == "1"
    post_compact = query_ivf_index(
        queries, idx, nprobe="all", coordinator=co
    )
    assert {r.candidate_id for r in post_compact.collect()} == {
        r.candidate_id for r in after.collect()
    }

    # rebuild retrains and advances the generation; the autopilot
    # report runs its stats panel through the same coordinator
    rebuild_ivf_index(spark, idx, cells=6, coordinator=co)
    h2 = open_ivf_index(spark, idx, persist=False, coordinator=co)
    assert h2.gen == 2
    report = maintain_ivf_index(spark, idx, coordinator=co)
    assert report["k"] > 0 and report["stale_staging"] == []

    # reap removes the superseded generations (gen-1 and the flat
    # gen-0 layout), never the current one
    removed = reap_ivf_generations(idx, coordinator=co)
    assert any(p.endswith("gen-1") for p in removed)
    assert not co.isdir(f"{idx}/gen-1") and co.isdir(f"{idx}/gen-2")
    final = query_ivf_index(queries, idx, nprobe="all", coordinator=co)
    assert 9000 in {r.candidate_id for r in final.collect()}


def test_subtree_coordinator_lock_and_staging_semantics(spark, tmp_path):
    """The coordinator's lock file and staging markers live INSIDE the
    subtree namespace, and a held lock blocks a second maintainer until
    released (the check-then-create semantics ArrowFsCoordinator
    documents as single-writer-safe)."""
    co = _subtree_co(tmp_path / "store")
    rows = _corpus_rows(40)
    corpus = spark.createDataFrame(rows, "id long, emb array<double>")
    idx = "idx"
    store_ivf_index(corpus, idx, cells=4, coordinator=co)
    with co.lock(idx):
        assert co.exists(f"{idx}/MAINTENANCE.lock")
        with pytest.raises(TimeoutError, match="MAINTENANCE.lock"):
            with co.lock(idx, timeout=0.3):
                pass
    assert not co.exists(f"{idx}/MAINTENANCE.lock")


def test_ann_serve_drain_through_subtree_coordinator(spark, tmp_path):
    """The streaming ANN drain serves a coordinator-backed index: the
    handle opens/refreshes through the same control plane the
    maintainers use, waves land idempotently, and the drained results
    equal the batch query row-for-row (the drain ≡ batch contract,
    now under a SubTreeFileSystem-rooted index)."""
    from retail_datawarehouse_spark.streaming.ann_serve import (
        read_ann_results,
        run_ann_serve_available_now,
    )

    root = tmp_path / "store"
    co = _subtree_co(root)
    rows = _corpus_rows()
    corpus = spark.createDataFrame(rows, "id long, emb array<double>")
    queries = spark.createDataFrame(
        rows[:5], "id long, emb array<double>"
    )
    idx = "idx"
    store_ivf_index(corpus, idx, cells=6, coordinator=co)

    landing = str(tmp_path / "landing")
    results = str(tmp_path / "results")
    queries.select(
        F.lit(0).cast("long").alias("wave"),
        "id",
        F.col("emb").cast("array<float>").alias("emb"),
    ).coalesce(1).write.mode("append").parquet(landing)
    run_ann_serve_available_now(
        spark,
        landing,
        idx,
        results,
        nprobe=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        coordinator=co,
    )
    got = sorted(
        (r.query_id, r.rank, r.candidate_id)
        for r in read_ann_results(spark, results).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.candidate_id)
        for r in query_ivf_index(
            queries, idx, nprobe=3, coordinator=co
        ).collect()
    )
    assert got == want and got


def test_arrowfs_lock_holder_token_detects_stolen_lock(tmp_path):
    """ADVICE r11 #3: the check-then-create lock is single-writer-safe
    by deployment contract, but a misdeployed SECOND writer previously
    failed silently (lost commits). The lock now writes a unique holder
    token and re-reads it before release: a stolen lock raises
    ``LockLostError`` loudly and never deletes the thief's lock file."""
    from retail_datawarehouse_spark.operators.index_fs import (
        LockLostError,
    )

    co = _subtree_co(tmp_path)
    co.makedirs("idx")
    lock_path = "idx/MAINTENANCE.lock"
    # normal hold/release: token written, file removed at exit
    with co.lock("idx"):
        assert len(co.read_text(lock_path)) == 32  # a real holder token
    assert not co.exists(lock_path)
    # a second writer overwrites the lock mid-hold: loud error, and
    # the thief's lock file survives (we must not release THEIR lock)
    with pytest.raises(LockLostError, match="second writer"):
        with co.lock("idx"):
            co.write_text(lock_path, "intruder-token")
    assert co.read_text(lock_path) == "intruder-token"
    co.remove(lock_path)
    # a body exception is NOT masked by the lost-lock check: the
    # body's error is the primary signal
    with pytest.raises(RuntimeError, match="body failure"):
        with co.lock("idx"):
            co.write_text(lock_path, "intruder-token")
            raise RuntimeError("body failure")
    co.remove(lock_path)


def test_arrowfs_list_gen_dirs_tolerates_missing_base_path(tmp_path):
    """ADVICE r11 #5: a fresh index dir (no base path yet) must list as
    empty through allow_not_found — not depend on which OSError
    subclass a particular pyarrow filesystem raises."""
    co = _subtree_co(tmp_path)
    assert co.list_gen_dirs("never/created/index") == []
