"""Skew mitigation utilities (the 100 TB reality: retail keys are hot —
a handful of customers/products dominate row counts, and one shuffle
partition then runs for hours while the rest finish in seconds).

Division of labor:

- **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in our
  session factory) splits oversized sort-merge join partitions at
  runtime — prefer it; it needs no code change.
- **Salting** (here) is the explicit-plan fallback for the cases AQE
  does not cover: broadcast-ineligible hash joins planned before stats
  exist, hot-key aggregations whose skew survives partial aggregation
  (exact count-distinct, collect_list), and any operator pinned to one
  partition per key.

Both helpers are deterministic (salt = pmod(xxhash64(...), n)) so
results are reproducible run-to-run and testable against the unsalted
plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_cols: list[str], n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from row-identifying columns."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(n_salts))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int,
    salt_from: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions: big rows get a deterministic salt, the small side is
    replicated n× (explode) so every (key, salt) bucket finds its match.
    Cost: small side ×n — use only when the hot key would otherwise pin
    one task; result is identical to ``big.join(small, key, how)``.
    """
    salted_big = with_salt(big, salt_from, n_salts)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, [key, "_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, n_salts: int
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group, two-phase:
    (group, salt-of-value) partial distinct → final sum per group. The
    hot group's distinct set is built on ``n_salts`` reducers instead of
    one; phase-2 input is one row per (group, salt) — tiny.

    Returns (group_col, n_distinct).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.countDistinct(distinct_col).alias("_nd")
    )
    return partial.groupBy(group_col).agg(
        F.sum("_nd").cast("long").alias("n_distinct")
    )
