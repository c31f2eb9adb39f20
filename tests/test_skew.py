"""Skew-mitigation helpers must be result-identical to their unsalted
plans — salting changes the physical distribution, never the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.skew import (
    salted_count_distinct,
    salted_join,
)
from retail_datawarehouse_spark.sources.readers import load_table


def _skewed_lineitem(spark, sf_dir):
    """Fixture with a manufactured hot key: fold 90% of orderkeys onto
    one value, the long-tail shape salting exists for."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.withColumn(
        "skew_key",
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(7)).otherwise(
            F.col("l_orderkey")
        ),
    )


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = _skewed_lineitem(spark, sf_dir).select(
        "skew_key", "l_orderkey", "l_linenumber", "l_quantity"
    )
    dim = (
        li.select("skew_key").distinct().withColumn("dim_val", F.col("skew_key") * 2)
    )
    plain = li.join(dim, "skew_key")
    salted = salted_join(
        li, dim, "skew_key", n_salts=8, salt_from=["l_orderkey", "l_linenumber"]
    )
    assert salted.count() == plain.count()
    cols = ["skew_key", "l_orderkey", "l_linenumber", "l_quantity", "dim_val"]
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0


def test_salted_count_distinct_exact(spark, sf_dir):
    li = _skewed_lineitem(spark, sf_dir)
    truth = (
        li.groupBy("skew_key")
        .agg(F.countDistinct("l_partkey").alias("n_distinct"))
    )
    salted = salted_count_distinct(li, "skew_key", "l_partkey", n_salts=16)
    assert salted.count() == truth.count()
    assert salted.exceptAll(truth).count() == 0
