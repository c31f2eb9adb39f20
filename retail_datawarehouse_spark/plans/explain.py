"""Physical-plan inspection helpers.

The 100 TB design contract is enforced in tests with these: a fact-dim
join must be a BroadcastHashJoin, a projection must prune the Parquet
ReadSchema, a filter must appear in PushedFilters, and a pipeline that
should be shuffle-free must show zero Exchange nodes
(SURVEY.md §4.2 — everything Catalyst gives us, verified not assumed).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange is data movement to every executor, not a shuffle,
    and is excluded)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_shuffle(df: DataFrame) -> bool:
    return shuffle_count(df) > 0


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def wholestage_codegen_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (formatted explain annotates
    member operators with ``[codegen id : N]``)."""
    ids = set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df)))
    return len(ids)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every Parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out
