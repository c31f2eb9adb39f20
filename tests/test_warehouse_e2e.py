"""End-to-end warehouse lifecycle (SURVEY.md §3.3): dims and facts are
BUILT, WRITTEN to a partitioned parquet warehouse, READ BACK, and the
analytical queries run against the written tables — results must equal
the same queries computed straight from the fixtures. This pins the
whole read → transform → write → read → query chain, including the
physical layout (facts partitioned by month_key)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.facts.sales import q_fact_sales
from retail_datawarehouse_spark.facts.snapshot import q_fact_monthly_snapshot
from retail_datawarehouse_spark.plans.explain import formatted_plan
from retail_datawarehouse_spark.sources.writers import write_parquet_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="warehouse_e2e_")
    fact = q_fact_sales(spark, sf_dir)
    write_parquet_table(fact, f"{d}/fact_sales", partition_by=["month_key"])
    snap = q_fact_monthly_snapshot(spark, sf_dir)
    write_parquet_table(snap, f"{d}/fact_snapshot", partition_by=["month_key"])
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_written_fact_equals_built_fact(spark, sf_dir, warehouse):
    built = q_fact_sales(spark, sf_dir)
    read_back = spark.read.parquet(f"{warehouse}/fact_sales")
    assert read_back.count() == built.count()
    cols = sorted(built.columns)
    assert sorted(read_back.columns) == cols
    assert read_back.select(cols).exceptAll(built.select(cols)).count() == 0


def test_month_scoped_query_prunes_written_partitions(spark, warehouse):
    snap = spark.read.parquet(f"{warehouse}/fact_snapshot")
    months = [r.month_key for r in snap.select("month_key").distinct().limit(1).collect()]
    one = snap.filter(F.col("month_key") == months[0])
    plan = formatted_plan(one)
    pf = plan.split("PartitionFilters")[1].split("]")[0] if "PartitionFilters" in plan else ""
    assert "month_key" in pf, plan
    assert one.count() > 0


def test_snapshot_read_from_warehouse_matches_builder(spark, sf_dir, warehouse):
    """q5.5-style semi-additive read against the WRITTEN snapshot equals
    the builder's output for the same month."""
    built = q_fact_monthly_snapshot(spark, sf_dir)
    month = built.select(F.max("month_key").alias("m")).first()["m"]
    from_builder = built.filter(F.col("month_key") == month)
    from_disk = spark.read.parquet(f"{warehouse}/fact_snapshot").filter(
        F.col("month_key") == month
    )
    cols = sorted(built.columns)
    assert from_disk.select(cols).exceptAll(from_builder.select(cols)).count() == 0
    assert from_disk.count() == from_builder.count() > 0
