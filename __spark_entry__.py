"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``retail_datawarehouse_spark``; this module is a
thin adapter over its query registry (one entry per implemented operator
from SURVEY.md §2 + the LLM-pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from retail_datawarehouse_spark.registry import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the 5.2 analog (top-10 products by revenue): scan → broadcast
    star join → hash aggregate → TakeOrderedAndProject.
    """
    cat = catalog()
    return cat["q52_top10_products"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in sorted(catalog().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each (SQL-expressible) query."""
    return {
        name: q.oracle
        for name, q in sorted(catalog().items())
        if q.oracle is not None
    }
