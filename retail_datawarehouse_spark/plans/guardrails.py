"""Semantic guardrails over analyzed logical plans.

SURVEY.md §4.2 names one: the W2 semi-additive discipline. The monthly
snapshot's ``customer_lifetime_spent`` is a running (semi-additive)
measure — correct to read at one month, or to MIN/MAX/latest across
months, but summing or averaging it across months double-counts every
prior month's activity (reference README.md:256-258 reads it at a
single month for exactly this reason). Nothing in the type system
distinguishes it from an additive measure, so the mistake compiles,
runs, and returns a plausible-looking wrong number — the worst failure
class. This validator closes the gap at the API layer (no custom
Catalyst rule needed, per SURVEY §4.2): walk the ANALYZED plan, find
every Aggregate that SUM/AVGs the measure, and require either

- the time grain in that Aggregate's grouping (a per-month aggregate —
  the measure is additive WITHIN a month), or
- an equality pin on the grain somewhere below the Aggregate (a
  single-month slice — q55's read shape).

Anything else raises ``SemiAdditiveViolation`` before a single task
runs. Plan-level, so it sees through column aliases introduced by
``select``/``withColumn`` renames only when the underlying attribute
name survives — callers renaming the measure take responsibility for
re-tagging (documented limitation; an engine-level fix would carry the
tag in column metadata, which Spark drops across many operators).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

SEMI_ADDITIVE_MEASURES: tuple[str, ...] = ("customer_lifetime_spent",)
GRAIN_COLUMNS: tuple[str, ...] = ("month_start", "month_key")

# sum(...)/avg(...) (and their ANSI aliases) over the measure; min/max/
# first/last are legitimate semi-additive reads and stay allowed.
_FORBIDDEN_AGG = ("sum", "avg", "mean", "try_sum", "try_avg")


class SemiAdditiveViolation(ValueError):
    """A plan aggregates a semi-additive measure across the time grain."""


def _children(node):
    for i in range(node.children().length()):
        yield node.children().apply(i)


def _subtree_pins_grain(node, grains: tuple[str, ...]) -> bool:
    """True if any Filter at-or-below ``node`` carries an equality pin
    on a grain column (``month_start = <lit>`` — the single-month
    slice). IN-lists and ranges deliberately do NOT count: they admit
    multiple months into the aggregate."""
    if node.getClass().getSimpleName() == "Filter":
        cond = node.condition().toString()
        for g in grains:
            if re.search(rf"\b{g}#\d+\s*=", cond):
                return True
    return any(_subtree_pins_grain(c, grains) for c in _children(node))


def assert_semi_additive_safe(
    df: DataFrame,
    measures: tuple[str, ...] = SEMI_ADDITIVE_MEASURES,
    grains: tuple[str, ...] = GRAIN_COLUMNS,
) -> DataFrame:
    """Validate and return ``df`` (chainable). Raises
    ``SemiAdditiveViolation`` if any Aggregate in the analyzed plan
    SUM/AVGs a semi-additive measure without a per-grain grouping or a
    single-grain filter below it. Driver-side plan walk only — no job
    is triggered."""
    plan = df._jdf.queryExecution().analyzed()
    agg_re = re.compile(
        r"\b(" + "|".join(_FORBIDDEN_AGG) + r")\((?:DISTINCT )?("
        + "|".join(re.escape(m) for m in measures)
        + r")#\d+",
        re.IGNORECASE,
    )

    def walk(node):
        if node.getClass().getSimpleName() == "Aggregate":
            aggs = node.aggregateExpressions().mkString(" | ")
            m = agg_re.search(aggs)
            if m:
                grouping = node.groupingExpressions().mkString(" | ")
                grain_grouped = any(
                    re.search(rf"\b{g}#\d+", grouping) for g in grains
                )
                if not grain_grouped and not _subtree_pins_grain(node, grains):
                    raise SemiAdditiveViolation(
                        f"{m.group(1)}({m.group(2)}) aggregates a "
                        "SEMI-ADDITIVE measure across the time grain: the "
                        f"grouping [{grouping or '<global>'}] carries none of "
                        f"{list(grains)} and no single-month filter pins the "
                        "grain below the aggregate. Lifetime values "
                        "double-count prior months under SUM/AVG — read ONE "
                        "month (W2), group by the grain, or use "
                        "MIN/MAX/latest instead."
                    )
        for c in _children(node):
            walk(c)

    walk(plan)
    return df
