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


def test_aqe_skew_join_splits_hot_partition_at_runtime(spark, sf_dir):
    """The session's first line of skew defense is AQE's skew-join —
    prove it actually fires: a sort-merge join on a 90%-hot key, with
    the skew thresholds dropped low enough for fixture scale, must show
    ``skew=true`` on the join in the FINAL adaptive plan (the physical
    proof one straggler partition was split into parallel chunks at
    runtime — the behavior that turns an hours-long straggler task at
    100 TB into even slices). Asserting on the post-execution plan, not
    configs: a future conf or version change that silently stops the
    split fails here by name."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # Force SMJ (no broadcast) and make the hot partition count as
        # "skewed" at kilobyte scale.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # 90%-hot key on a relation big enough that the hot shuffle
        # partition clears the (lowered) byte thresholds. Both join
        # sides must be bare Sort-over-shuffle-stage shapes: an
        # aggregate between them (e.g. a .distinct() dim) defeats the
        # OptimizeSkewedJoin pattern match — itself a useful fact for
        # plan authors, discovered pinning this test.
        big = spark.range(0, 1_000_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1_000_000).select(
            F.col("id").alias("k"), F.lit(1).alias("tag")
        )
        joined = big.join(right, "k")
        joined.collect()  # executes THIS frame's plan (a sink would re-plan)
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """AQE's other runtime lever: a fine-grained shuffle (many declared
    partitions, tiny data) must coalesce to far fewer ACTUAL partitions
    after execution — the mechanism that keeps a 100 TB plan from
    drowning in empty reducers when a filter collapses the data. Pinned
    on the executed RDD's partition count, not the conf."""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        agg = (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .count()
        )
        n_parts = agg.rdd.getNumPartitions()
        assert n_parts < 20, (
            f"AQE failed to coalesce: {n_parts} partitions for a "
            "5-group aggregate"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
