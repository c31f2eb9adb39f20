"""The gate: every catalog query with an oracle must hash-match DuckDB.

This replicates the driver's t2 correctness check (sf0.01) locally, at
exact-equality strictness, so mismatches surface before a round ends.
"""

from __future__ import annotations

import pytest

from retail_datawarehouse_spark.registry import catalog
from tests.oracle import compare_to_oracle, duck_connection


def _oracle_names():
    return [name for name, q in sorted(catalog().items()) if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_correctness_dir):
    con = duck_connection(sf_correctness_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(name, spark, sf_correctness_dir, con):
    q = catalog()[name]
    res = compare_to_oracle(name, q.builder(spark, sf_correctness_dir), con, q.oracle)
    assert res.ok, res.message()
    assert res.spark_rows > 0, f"{name}: empty result — not exercising anything"


def test_catalog_fits_driver_window():
    """The driver records exactly the FIRST 50 sorted catalog names; a
    51st entry silently evicts the sort-order tail from the correctness
    gate (round-1 postmortem). New operators must fold into an existing
    suite query instead of adding an entry — see COVERAGE.md."""
    from retail_datawarehouse_spark.registry import catalog

    assert len(catalog()) <= 50, (
        f"catalog has {len(catalog())} entries; the driver checks only "
        "the first 50 sorted names — consolidate before registering more"
    )


def test_bench_headline_absence_is_hard_error(spark, monkeypatch):
    """bench.py must refuse to run with a headline name missing from
    the catalog (round-3 verdict #5): a silent skip after a rename
    would shrink the measured set and flatter the recorded total."""
    import bench

    assert set(bench.HEADLINE) <= set(catalog()), (
        "HEADLINE out of sync with catalog"
    )
    monkeypatch.setattr(bench, "HEADLINE", [*bench.HEADLINE, "q_renamed_away"])
    with pytest.raises(SystemExit, match="q_renamed_away"):
        bench.main()
