"""Coordinator CONTRACT KIT (r12; r11 verdict #2): the protocol
assertions the POSIX concurrency tests pin — lock mutual exclusion,
pointer-commit atomicity/visibility, staging-marker semantics, listing
shapes — extracted into an abstract suite parameterized on a
coordinator INSTANCE, so a deployer's lease-backed subclass (the
injection point ``index_fs.py`` documents for multi-writer object
stores) certifies against the same contract the shipped coordinators
pass, without re-deriving what "correct" means from test archaeology.

Usage (a deployer's test suite)::

    from retail_datawarehouse_spark.operators.index_fs_contract import (
        run_coordinator_contract,
    )
    co = MyLeaseCoordinator(S3FileSystem(...), ...)
    run_coordinator_contract(co, "bucket/contract-scratch")

``run_coordinator_contract`` raises ``AssertionError`` naming the
violated clause on the first failure and returns the list of check
names on success. Checks create everything they need under
``scratch_root`` (one sub-namespace per check, so a failed run leaves
inspectable state) and use only the coordinator's own surface — no
Spark session, no local-filesystem assumptions — so the kit runs
against any store the coordinator can reach. The kit is enforced on
both shipped coordinators and red-tested against deliberately broken
ones in ``tests/test_index_coordinator.py``.

What the kit does NOT cover, honestly: lease TTL/expiry semantics
(deployment-specific — see ``TokenLeaseCoordinator`` for the reference
shape and its tests for how to pin takeover and fencing) and
cross-PROCESS mutual exclusion (the kit contends threads; a
distributed lease needs a harness with real concurrent writers).
"""

from __future__ import annotations

import threading
import time


def _check_text_roundtrip(co, root):
    co.makedirs(f"{root}/idx")
    assert co.read_text(f"{root}/idx/CURRENT") is None, (
        "read_text on a missing file must return None (the fresh-index "
        "pointer probe), never raise"
    )
    co.write_text(f"{root}/idx/CURRENT", "3")
    assert co.read_text(f"{root}/idx/CURRENT") == "3", (
        "write_text/read_text must round-trip exactly"
    )
    assert co.exists(f"{root}/idx/CURRENT"), "exists must see a written file"
    assert not co.isdir(f"{root}/idx/CURRENT"), "a file is not a directory"
    assert co.isdir(f"{root}/idx"), "isdir must see a created directory"
    co.remove(f"{root}/idx/CURRENT")
    assert not co.exists(f"{root}/idx/CURRENT"), "remove must delete"


def _check_makedirs_collision(co, root):
    co.makedirs(f"{root}/idx")
    try:
        co.makedirs(f"{root}/idx")
    except FileExistsError:
        return
    raise AssertionError(
        "makedirs on an existing directory must raise FileExistsError — "
        "_reserve_generation depends on it for reservation uniqueness "
        "under the lock"
    )


def _check_rmtree_semantics(co, root):
    co.makedirs(f"{root}/idx/gen-1")
    co.write_text(f"{root}/idx/gen-1/.staging", "src=0\n")
    co.rmtree(f"{root}/idx/gen-1")
    assert not co.isdir(f"{root}/idx/gen-1"), "rmtree must remove the tree"
    # ignore_errors swallows a missing target (the abort path cleans a
    # directory that may already be gone)...
    co.rmtree(f"{root}/idx/gen-1", ignore_errors=True)
    # ...and the strict form surfaces it
    try:
        co.rmtree(f"{root}/idx/never-existed")
    except Exception:
        return
    raise AssertionError(
        "rmtree without ignore_errors must raise on a missing target — "
        "silent success would mask store-layer faults"
    )


def _check_gen_listing_shape(co, root):
    assert co.list_gen_dirs(f"{root}/fresh-index") == [], (
        "list_gen_dirs on a missing index dir must return [] — a fresh "
        "index's first reservation sweep runs before anything exists"
    )
    co.makedirs(f"{root}/idx/gen-2")
    co.makedirs(f"{root}/idx/gen-10")
    co.makedirs(f"{root}/idx/cells")  # non-gen dir: excluded
    co.write_text(f"{root}/idx/gen-5", "a FILE named like a gen")
    got = co.list_gen_dirs(f"{root}/idx")
    assert [g.rsplit("/", 1)[-1] for g in got] == ["gen-10", "gen-2"], (
        "list_gen_dirs must return exactly the gen-* DIRECTORIES, "
        f"lexicographically sorted: got {got!r}"
    )


def _check_cell_listing_shape(co, root):
    cells = f"{root}/idx/cells"
    assert co.list_cell_files(cells) == set(), (
        "list_cell_files on a missing cells dir must be empty"
    )
    co.makedirs(f"{cells}/cell=0")
    co.makedirs(f"{cells}/cell=1")
    co.write_text(f"{cells}/cell=0/part-0.parquet", "p")
    co.write_text(f"{cells}/cell=1/part-0.parquet", "p")
    co.write_text(f"{cells}/cell=1/_started", "not data")
    co.write_text(f"{cells}/_SUCCESS", "not data")
    # Spark job-commit debris from a crashed write — MUST be excluded:
    # feeding it to the maintenance late-fold duplicates rows
    co.makedirs(f"{cells}/_temporary/0/cell=1")
    co.write_text(f"{cells}/_temporary/0/cell=1/part-0.parquet", "debris")
    got = {p.rsplit("/cells/", 1)[-1] for p in co.list_cell_files(cells)}
    assert got == {"cell=0/part-0.parquet", "cell=1/part-0.parquet"}, (
        "list_cell_files must return exactly the depth-1 "
        f"cell=*/[...].parquet files: got {got!r}"
    )


def _check_parquet_listing_shape(co, root):
    ts = f"{root}/idx/tombstones"
    assert co.list_parquet_files(ts) == set(), (
        "list_parquet_files on a missing dir must be empty"
    )
    co.makedirs(ts)
    co.write_text(f"{ts}/part-0.parquet", "p")
    co.write_text(f"{ts}/_SUCCESS", "not data")
    co.makedirs(f"{ts}/_temporary/0")
    co.write_text(f"{ts}/_temporary/0/part-1.parquet", "debris")
    got = {p.rsplit("/", 1)[-1] for p in co.list_parquet_files(ts)}
    assert got == {"part-0.parquet"}, (
        "list_parquet_files must return exactly the top-level "
        f"*.parquet files: got {got!r}"
    )


def _check_pointer_commit(co, root):
    idx = f"{root}/idx"
    co.makedirs(idx)
    co.commit_pointer(idx, 1)
    assert co.read_text(f"{idx}/CURRENT").strip() == "1", (
        "commit_pointer must make the generation visible in CURRENT"
    )
    co.commit_pointer(idx, 2)
    assert co.read_text(f"{idx}/CURRENT").strip() == "2", (
        "commit_pointer must move the pointer forward over an "
        "existing CURRENT"
    )
    leftovers = [
        p
        for p in (f"{idx}/CURRENT.tmp-1", f"{idx}/CURRENT.tmp-2")
        if co.exists(p)
    ]
    assert not leftovers, (
        f"commit_pointer must not leave temp files behind: {leftovers!r}"
    )


def _check_lock_blocks_and_releases(co, root):
    idx = f"{root}/idx"
    co.makedirs(idx)
    with co.lock(idx):
        try:
            with co.lock(idx, timeout=0.3):
                raise AssertionError(
                    "a second lock acquisition while held must NOT "
                    "succeed — mutual exclusion is the whole contract"
                )
        except TimeoutError:
            pass
    # released: re-acquire must now succeed promptly
    with co.lock(idx, timeout=5.0):
        pass


def _check_lock_mutual_exclusion_threads(co, root):
    idx = f"{root}/idx"
    co.makedirs(idx)
    state = {"active": 0, "max_active": 0, "errors": []}
    guard = threading.Lock()

    def worker():
        try:
            for _ in range(4):
                with co.lock(idx, timeout=60.0):
                    with guard:
                        state["active"] += 1
                        state["max_active"] = max(
                            state["max_active"], state["active"]
                        )
                    time.sleep(0.01)
                    with guard:
                        state["active"] -= 1
        except Exception as exc:  # surfaced below — a thread must not die
            state["errors"].append(repr(exc))

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not state["errors"], (
        f"lock contention must not error: {state['errors']}"
    )
    assert state["max_active"] == 1, (
        "two writers held the lock SIMULTANEOUSLY "
        f"(max concurrent holders = {state['max_active']}) — this "
        "coordinator cannot protect the maintenance protocol"
    )


def _check_spark_path_inversion(co, root):
    path = f"{root}/idx/cells/cell=3/part-0.parquet"
    mapped = co.spark_path(path)
    # DataFrame.inputFiles returns file: URIs on local stores; the
    # coordinator must recover its own path from either form
    assert co.from_spark_path(mapped) == path, (
        "from_spark_path must invert spark_path"
    )
    assert co.from_spark_path(f"file://{mapped}") == path or not str(
        mapped
    ).startswith("/"), (
        "from_spark_path must strip a file:// scheme off a mapped "
        "absolute path"
    )


CONTRACT_CHECKS = [
    ("text_roundtrip", _check_text_roundtrip),
    ("makedirs_collision", _check_makedirs_collision),
    ("rmtree_semantics", _check_rmtree_semantics),
    ("gen_listing_shape", _check_gen_listing_shape),
    ("cell_listing_shape", _check_cell_listing_shape),
    ("parquet_listing_shape", _check_parquet_listing_shape),
    ("pointer_commit", _check_pointer_commit),
    ("lock_blocks_and_releases", _check_lock_blocks_and_releases),
    ("lock_mutual_exclusion_threads", _check_lock_mutual_exclusion_threads),
    ("spark_path_inversion", _check_spark_path_inversion),
]


def run_coordinator_contract(co, scratch_root: str) -> list[str]:
    """Certify ``co`` against the index-coordinator protocol. Each
    check runs in its own namespace under ``scratch_root`` (created
    here; must not already contain a same-named namespace). Raises
    ``AssertionError`` naming the violated clause; returns the check
    names on success."""
    ran = []
    for name, check in CONTRACT_CHECKS:
        ns = f"{scratch_root}/{name}"
        co.makedirs(ns)
        try:
            check(co, ns)
        except AssertionError as exc:
            raise AssertionError(f"[{name}] {exc}") from exc
        ran.append(name)
    return ran
