"""Driver-session parity: catalog queries must hold on a BARE session.

The driver hands every catalog query its OWN SparkSession, built without
any of our session-factory configs. Round 2's one red row
(q_sink_warehouse_roundtrip) was exactly this class of bug: the
partition-type-inference guard lived only in session.py, so the local
factory-session tests passed while the driver's session corrupted the
read-back month_key to INT. Any conf that exists only in the factory is
invisible to the driver.

This test replicates the driver's environment: a ``newSession()`` whose
runtime confs are explicitly reset to Spark's out-of-the-box defaults
(ANSI on, partition-type inference on, a non-UTC timezone, nanos conf
unset) runs every oracle-backed catalog query at sf0.001 against the
same DuckDB oracle the driver uses. Every query must self-pin whatever
semantics it needs (via sources.readers.load_table's runtime pins).
"""

from __future__ import annotations

import pytest

from retail_datawarehouse_spark.registry import catalog
from tests.oracle import compare_to_oracle, duck_connection

# Spark's defaults as the driver's session would have them — plus an
# adversarial non-UTC timezone (the driver machine's zone is unknown;
# date/hour semantics must not depend on it).
BARE_DEFAULTS = {
    "spark.sql.ansi.enabled": "true",  # Spark 4 default
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.sources.partitionColumnTypeInference.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
}


def _oracle_names():
    return [name for name, q in sorted(catalog().items()) if q.oracle is not None]


@pytest.fixture(scope="module")
def bare_spark(spark):
    """A session sharing the JVM but with DRIVER-like session state.

    ``newSession()`` clones the builder-time defaults, so the factory's
    configs must be actively reset to stock values to model a session
    the factory never touched.
    """
    bare = spark.newSession()
    for k, v in BARE_DEFAULTS.items():
        bare.conf.set(k, v)
    return bare


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _oracle_names())
def test_bare_session_parity(name, bare_spark, sf_dir, con):
    q = catalog()[name]
    res = compare_to_oracle(name, q.builder(bare_spark, sf_dir), con, q.oracle)
    assert res.ok, res.message()
