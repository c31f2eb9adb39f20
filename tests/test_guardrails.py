"""The W2 semi-additive guardrail (SURVEY §4.2's named candidate,
r4 verdict #7): SUM/AVG of ``customer_lifetime_spent`` across months is
a plausible-looking wrong number; the validator rejects it at plan
level, while every legitimate read shape passes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_datawarehouse_spark.plans.guardrails import (
    SemiAdditiveViolation,
    assert_semi_additive_safe,
)
from tests.builders import builder


@pytest.fixture()
def snap(spark):
    """A miniature lifetime snapshot: 2 customers × 3 months."""
    rows = [
        (1, "1998-01-01", 10.0, 10.0),
        (1, "1998-02-01", 5.0, 15.0),
        (1, "1998-03-01", 0.0, 15.0),
        (2, "1998-01-01", 7.0, 7.0),
        (2, "1998-02-01", 0.0, 7.0),
        (2, "1998-03-01", 2.0, 9.0),
    ]
    return spark.createDataFrame(
        rows,
        "customer_key long, month_start string, month_total_spent double,"
        " customer_lifetime_spent double",
    )


def test_rejects_cross_month_sum(snap):
    bad = snap.groupBy("customer_key").agg(
        F.sum("customer_lifetime_spent").alias("s")
    )
    with pytest.raises(SemiAdditiveViolation, match="SEMI-ADDITIVE"):
        assert_semi_additive_safe(bad)


def test_rejects_global_avg(snap):
    bad = snap.agg(F.avg("customer_lifetime_spent").alias("a"))
    with pytest.raises(SemiAdditiveViolation, match="avg"):
        assert_semi_additive_safe(bad)


def test_accepts_single_month_filter_then_sum(snap):
    """q55's read shape: pin ONE month, then aggregating the lifetime
    column is a legitimate point-in-time total."""
    ok = (
        snap.filter(F.col("month_start") == "1998-02-01")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    out = assert_semi_additive_safe(ok)
    assert out.first().s == 22.0  # 15 + 7 at Feb


def test_accepts_per_month_grouping(snap):
    ok = snap.groupBy("month_start").agg(
        F.sum("customer_lifetime_spent").alias("s")
    )
    assert_semi_additive_safe(ok)


def test_accepts_min_max_latest_across_months(snap):
    """MIN/MAX are the semi-additive-legal aggregates across the grain."""
    ok = snap.groupBy("customer_key").agg(
        F.max("customer_lifetime_spent").alias("peak"),
        F.min("customer_lifetime_spent").alias("low"),
    )
    out = {r.customer_key: r.peak for r in assert_semi_additive_safe(ok).collect()}
    assert out == {1: 15.0, 2: 9.0}


def test_accepts_sum_of_additive_measure(snap):
    """The ADDITIVE measure sums freely across months — the guardrail
    is measure-scoped, not a blanket aggregation ban."""
    ok = snap.groupBy("customer_key").agg(
        F.sum("month_total_spent").alias("total")
    )
    out = {r.customer_key: r.total for r in assert_semi_additive_safe(ok).collect()}
    assert out == {1: 15.0, 2: 9.0}


def test_rejects_range_filter_sum(snap):
    """A RANGE of months is still multiple months — only an equality
    pin makes the slice single-grain."""
    bad = (
        snap.filter(F.col("month_start") >= "1998-02-01")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_q55_read_passes_the_guardrail(spark, sf_dir):
    """The catalog's own semi-additive read (filter to one month, no
    cross-month aggregate) passes — the validator accepts the shipped
    W2 discipline, it doesn't fight it."""
    assert_semi_additive_safe(builder("q55_snapshot_lifetime_read")(spark, sf_dir))


def test_q55_misuse_is_rejected(spark, sf_dir):
    """And the precise mistake SURVEY warns about — re-aggregating the
    q55 output's lifetime column per customer after widening back to
    all months — is rejected when built from the snapshot frame."""
    snap = builder("q_fact_monthly_snapshot")(spark, sf_dir)
    bad = snap.groupBy("customer_key").agg(
        F.sum("customer_lifetime_spent").alias("s")
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_renamed_measure(snap):
    """r5 verdict #3: withColumnRenamed used to defeat the toString()
    regex silently. exprId lineage follows the rename."""
    bad = (
        snap.withColumnRenamed("customer_lifetime_spent", "ltv")
        .groupBy("customer_key")
        .agg(F.sum("ltv").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation, match="SEMI-ADDITIVE"):
        assert_semi_additive_safe(bad)


def test_rejects_rename_chain_and_derived_alias(snap):
    """Two-hop rename chain, and a derived column (measure + 1 aliased)
    — both stay tainted through Alias propagation."""
    bad = (
        snap.withColumnRenamed("customer_lifetime_spent", "a")
        .withColumnRenamed("a", "b")
        .withColumn("c", F.col("b") + 1)
        .groupBy("customer_key")
        .agg(F.avg("c").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_wrapped_aggregate_arguments(snap):
    """ADVICE r5: sum(measure * 2), sum(coalesce(measure, 0)) and
    sum(CAST(measure)) escaped the attr-right-after-paren regex; the
    expression walk finds the measure anywhere in the argument tree."""
    for expr in (
        F.sum(F.col("customer_lifetime_spent") * 2),
        F.sum(F.coalesce(F.col("customer_lifetime_spent"), F.lit(0.0))),
        F.sum(F.col("customer_lifetime_spent").cast("decimal(18,4)")),
    ):
        bad = snap.groupBy("customer_key").agg(expr.alias("s"))
        with pytest.raises(SemiAdditiveViolation):
            assert_semi_additive_safe(bad)


def test_rejects_not_equal_filter_sum(snap):
    """ADVICE r5 (medium): month_start != lit EXCLUDES one month and
    admits the rest — the regex matched Spark's Not(EqualTo) print as
    a pin and failed open on exactly this misuse."""
    bad = (
        snap.filter(F.col("month_start") != "1998-02-01")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_column_equality_filter_sum(snap):
    """ADVICE r5 (medium): month_start = other_column is a join-style
    predicate, not a single-month pin — multiple months survive it."""
    bad = (
        snap.withColumn("m2", F.col("month_start"))
        .filter(F.col("month_start") == F.col("m2"))
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_in_list_filter_sum(snap):
    """An IN-list of months admits several months — not a pin."""
    bad = (
        snap.filter(F.col("month_start").isin("1998-01-01", "1998-02-01"))
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_pin_inside_or_disjunction(snap):
    """ADVICE r6 (medium): ``month = X OR <anything>`` admits every
    month through the other disjunct — an equality only pins when it is
    a CONJUNCT of the condition."""
    bad = (
        snap.filter(
            (F.col("month_start") == "1998-02-01")
            | (F.col("month_total_spent") > 0)
        )
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_accepts_pin_as_conjunct_of_and(snap):
    """The pin may share the condition with other conjuncts: every
    surviving row is still single-month."""
    ok = (
        snap.filter(
            (F.col("month_start") == "1998-02-01")
            & (F.col("month_total_spent") >= 0)
        )
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    assert assert_semi_additive_safe(ok).first().s == 22.0


def test_rejects_not_not_equal_double_negation(snap):
    """NOT(month != X) is logically a pin but sits under Not — the
    walker fails CLOSED on shapes it doesn't prove, so this raises
    (a false alarm, never a silent pass)."""
    bad = (
        snap.filter(~(F.col("month_start") != "1998-02-01"))
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_pin_on_unrelated_join_branch(spark, snap):
    """ADVICE r6 (medium): a month pin on the DIMENSION side of a join
    filters dimension rows, not the measure's fact rows — every month
    of the fact still reaches the SUM."""
    dim = spark.createDataFrame(
        [(1, "gold", "1998-02-01"), (2, "blue", "1998-02-01")],
        "customer_key long, segment string, month_start string",
    )
    pinned_dim = (
        dim.filter(F.col("month_start") == "1998-02-01")
        .select("customer_key", "segment")
    )
    bad = (
        snap.join(pinned_dim, "customer_key")
        .groupBy("segment")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_accepts_pin_on_measure_branch_of_join(spark, snap):
    """The mirror case stays legal: the pin restricts the FACT branch
    (the measure's lineage) before the join."""
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "blue")], "customer_key long, segment string"
    )
    ok = (
        snap.filter(F.col("month_start") == "1998-02-01")
        .join(dim, "customer_key")
        .groupBy("segment")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    out = {r.segment: r.s for r in assert_semi_additive_safe(ok).collect()}
    assert out == {"gold": 15.0, "blue": 7.0}


def test_accepts_star_schema_slice_via_pinned_date_dim(spark, snap):
    """ADVICE r7: the reference warehouse's standard read — the fact
    joined INNER on the grain key to a date dimension filtered to one
    month. The join propagates the dim's pin to every surviving fact
    row, so this is the q55 single-month slice in star-schema form and
    must pass."""
    dim_date = spark.createDataFrame(
        [("1998-01-01", "Jan"), ("1998-02-01", "Feb"), ("1998-03-01", "Mar")],
        "month_start string, month_name string",
    )
    ok = (
        snap.join(
            dim_date.filter(F.col("month_start") == "1998-02-01"),
            "month_start",
        )
        .groupBy("month_name")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    out = {r.month_name: r.s for r in assert_semi_additive_safe(ok).collect()}
    assert out == {"Feb": 22.0}


def test_rejects_outer_join_to_pinned_date_dim(spark, snap):
    """LEFT OUTER to the pinned dim does NOT restrict the fact:
    unmatched months survive with nulls and still reach the SUM —
    the join-propagation rule must only accept inner/semi joins."""
    dim_date = spark.createDataFrame(
        [("1998-02-01", "Feb")], "month_start string, month_name string"
    )
    bad = (
        snap.join(
            dim_date.filter(F.col("month_start") == "1998-02-01"),
            "month_start",
            "left",
        )
        .groupBy()
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_grain_join_to_unpinned_dim(spark, snap):
    """An inner grain-key join alone proves nothing: with no pin on
    the dim side every month still flows through."""
    dim_date = spark.createDataFrame(
        [("1998-01-01", "Jan"), ("1998-02-01", "Feb"), ("1998-03-01", "Mar")],
        "month_start string, month_name string",
    )
    bad = (
        snap.join(dim_date, "month_start")
        .groupBy()
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_accepts_pin_on_renamed_grain(snap):
    """Grain lineage follows renames too: pinning the RENAMED month
    column is still a single-month slice."""
    ok = (
        snap.withColumnRenamed("month_start", "period")
        .filter(F.col("period") == "1998-02-01")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    out = assert_semi_additive_safe(ok)
    assert out.first().s == 22.0


def test_rejects_reaggregated_safe_monthly_sum(snap):
    """The alias of a per-month SUM of the measure is itself
    semi-additive across months; summing it again across the grain is
    the classic double-count and stays caught through the alias."""
    monthly = snap.groupBy("month_start").agg(
        F.sum("customer_lifetime_spent").alias("monthly_ltv")
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(
            monthly.agg(F.sum("monthly_ltv").alias("s"))
        )


def test_mom_read_ships_guarded_and_misuse_rejected(spark, sf_dir):
    """r5 verdict #8: q_snapshot_incremental_mom — the other entry
    exposing lifetime values — now runs the live guardrail (its builder
    would raise here if the read shape regressed), and summing its
    lifetime column across months is rejected."""
    out = builder("q_snapshot_incremental_mom")(spark, sf_dir)
    bad = out.groupBy("customer_key").agg(
        F.sum("customer_lifetime_spent").alias("s")
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_window_running_sum_across_months(snap):
    """r6: closes the r5 documented residual — a RUNNING window SUM of
    the lifetime measure ordered across months is the same double-count
    as the aggregate form and is now caught."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("customer_key")
        .orderBy("month_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bad = snap.withColumn(
        "run", F.sum("customer_lifetime_spent").over(w)
    )
    with pytest.raises(SemiAdditiveViolation, match="window sum"):
        assert_semi_additive_safe(bad)


def test_accepts_window_sum_partitioned_by_grain(snap):
    """A window PARTITIONED by the month can never cross months — the
    within-month frame is legal (additive inside the grain)."""
    from pyspark.sql import Window

    w = Window.partitionBy("month_start")
    ok = snap.withColumn(
        "month_share", F.sum("customer_lifetime_spent").over(w)
    )
    assert_semi_additive_safe(ok).count()


def test_accepts_lag_lead_minmax_windows_over_measure(snap):
    """LAG/LEAD (the W3 MoM delta read) and MIN/MAX window reads of the
    measure stay legal across months — only SUM/AVG double-count."""
    from pyspark.sql import Window

    w = Window.partitionBy("customer_key").orderBy("month_start")
    ok = snap.select(
        "customer_key",
        "month_start",
        F.lag("customer_lifetime_spent").over(w).alias("prev"),
        F.max("customer_lifetime_spent")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("peak"),
    )
    assert_semi_additive_safe(ok).count()


def test_accepts_window_sum_under_single_month_pin(snap):
    """With one month pinned below the Window, the frame holds a single
    month by construction — legal."""
    from pyspark.sql import Window

    w = Window.partitionBy("customer_key")
    ok = snap.filter(F.col("month_start") == "1998-02-01").withColumn(
        "s", F.sum("customer_lifetime_spent").over(w)
    )
    assert_semi_additive_safe(ok).count()


def test_snapshot_builder_window_stays_legal(spark, sf_dir):
    """The builder that CREATES the measure (cumulative window over the
    ADDITIVE month totals) must keep passing — taint seeds from the
    measure's references, not its birth alias."""
    assert_semi_additive_safe(builder("q_fact_monthly_snapshot")(spark, sf_dir))


def test_rejects_pin_behind_left_join_inside_pinned_branch(spark, snap):
    """ADVICE r8 (medium): ``fact INNER JOIN (dimA LEFT JOIN
    pinned-dimB) ON fact.month = dimA.month`` used to pass — dimB's
    pin sits under the pinned side but dimA.month (the attribute the
    fact is actually equated with) is never restricted by it, so every
    month still reaches the SUM. The pin must tie to the EQUATED grain
    attribute."""
    dim_a = spark.createDataFrame(
        [("1998-01-01", 1), ("1998-02-01", 2), ("1998-03-01", 3)],
        "month_start string, month_num long",
    )
    dim_b = spark.createDataFrame(
        [("1998-02-01", "Feb")], "month_start string, month_name string"
    )
    pinned_b = dim_b.filter(F.col("month_start") == "1998-02-01").select(
        F.col("month_start").alias("b_month"), "month_name"
    )
    dim_side = dim_a.join(
        pinned_b, dim_a.month_start == pinned_b.b_month, "left"
    ).select("month_start", "month_num", "month_name")
    bad = (
        snap.join(dim_side, "month_start")
        .groupBy()
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_derived_expression_grain_equality(spark, snap):
    """ADVICE r8 (medium): an equality over a DERIVED expression of
    grain attributes (``concat(month_start, '') = dim.month_start``)
    equates the derived value, not the attribute the pin restricts —
    only bare attribute-to-attribute equality propagates a pin."""
    dim_date = spark.createDataFrame(
        [("1998-02-01", "Feb")], "month_start string, month_name string"
    )
    pinned = dim_date.filter(F.col("month_start") == "1998-02-01")
    bad = (
        snap.join(
            pinned,
            F.concat(snap.month_start, F.lit("")) == pinned.month_start,
        )
        .groupBy()
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_accepts_star_slice_with_renamed_dim_grain(spark, snap):
    """The pure-rename lineage the tightened rule still follows: the
    dim pins ``month_start``, then renames it before the grain-key
    equi-join — value-preserving, so the pin propagates and the read
    stays a single-month slice."""
    dim_date = spark.createDataFrame(
        [("1998-01-01", "Jan"), ("1998-02-01", "Feb"), ("1998-03-01", "Mar")],
        "month_start string, month_name string",
    )
    pinned = (
        dim_date.filter(F.col("month_start") == "1998-02-01")
        .withColumnRenamed("month_start", "month_key")
    )
    ok = (
        snap.join(pinned, snap.month_start == pinned.month_key)
        .groupBy("month_name")
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    out = {r.month_name: r.s for r in assert_semi_additive_safe(ok).collect()}
    assert out == {"Feb": 22.0}


def test_rejects_null_safe_grain_equality_join(spark, snap):
    """``<=>`` matches NULL with NULL, so a null-filled row from an
    outer join inside the pinned branch could survive the propagation
    join un-pinned — the tightened rule trusts only null-rejecting
    EqualTo (fail-closed: this exact-month <=> join is semantically
    safe here, and it still alarms)."""
    dim_date = spark.createDataFrame(
        [("1998-02-01", "Feb")], "month_start string, month_name string"
    )
    pinned = dim_date.filter(F.col("month_start") == "1998-02-01")
    bad = (
        snap.join(pinned, snap.month_start.eqNullSafe(pinned.month_start))
        .groupBy()
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)


def test_rejects_pin_behind_union_inside_pinned_branch(spark, snap):
    """Union reuses its FIRST child's exprIds for values merged from
    EVERY child, so a pin filter on one union child does not pin the
    union output — the safe-path whitelist stops the descent at Union
    and the plan correctly alarms (fail-closed), even though the
    pinned child's attribute id is exactly the one the join equates."""
    dim_all = spark.createDataFrame(
        [("1998-01-01", "Jan"), ("1998-02-01", "Feb"), ("1998-03-01", "Mar")],
        "month_start string, month_name string",
    )
    pinned_child = dim_all.filter(F.col("month_start") == "1998-02-01")
    dim_side = pinned_child.unionByName(dim_all)  # first child pinned
    bad = (
        snap.join(dim_side, "month_start")
        .groupBy()
        .agg(F.sum("customer_lifetime_spent").alias("s"))
    )
    with pytest.raises(SemiAdditiveViolation):
        assert_semi_additive_safe(bad)
