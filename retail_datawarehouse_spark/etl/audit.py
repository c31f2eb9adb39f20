"""ETL audit metrics (SURVEY.md S5/A9).

The reference prints row counts between stages (clean_data.py:74,87,92,128)
and specs an audit step ("Record row counts, rejections, and data quality
metrics", README.md:177-178). Naively that's an extra ``count()`` action —
an extra full pass — per stage. ``df.observe`` attaches accumulator-style
metrics to the ONE real pass instead, which is the only affordable form at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, *metrics) -> tuple[DataFrame, Observation]:
    """Attach audit metrics to the plan; read them after the next action.

    Default metrics: row count + per-critical-column null counts.
    """
    obs = Observation(name)
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *metrics), obs


def null_counts(*cols: str):
    """Metric expressions: count of NULLs per column (DQ check input)."""
    return [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        for c in cols
    ]
