"""SCD Type 2: versioned dimension build + point-in-time join.

Reference README.md:145-147 recommends SCD2 on DimCustomer/DimProduct
("effective_date / end_date and surrogate keys"). The fixtures carry no
attribute history, so versions are derived from each customer's order
stream (attribute = o_orderpriority at that point in time) — the build
mechanics (W1) and the point-in-time range join (J8) are exactly what a
real attribute feed would use.

Build: one window per natural key — ``lead(effective_date)`` closes each
version; NULL end = current. One shuffle on the natural key.

Point-in-time join (J8): the join keeps the EQUI conjunct (natural key)
plus a residual range predicate — Catalyst plans sort-merge/shuffled-hash
on the key with the range as a post-join filter. Dropping the equi part
would degrade to a broadcast-nested-loop; never do that at fact scale
(SURVEY.md §7 risk 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retail_datawarehouse_spark.registry import register
from retail_datawarehouse_spark.sources.readers import load_table


def build_scd2(
    df: DataFrame, natural_key: str, effective_col: str, order_cols: list[str]
) -> DataFrame:
    """W1 — close each version with lead(effective) over the natural key."""
    w = Window.partitionBy(natural_key).orderBy(*order_cols)
    return (
        df.withColumn("effective_date", F.col(effective_col).cast("date"))
        .withColumn("end_date", F.lead("effective_date").over(w))
        .withColumn("is_current", F.col("end_date").isNull())
        .withColumn("version_seq", F.row_number().over(w).cast("long"))
    )


def _scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dim versions from the order stream (attr = priority)."""
    orders = load_table(spark, sf_dir, "orders")
    scd = build_scd2(
        orders, "o_custkey", "o_orderdate", ["o_orderdate", "o_orderkey"]
    )
    return scd.select(
        F.lit("customer").alias("entity"),
        F.col("o_custkey").alias("natural_key"),
        F.col("o_orderkey").alias("version_id"),
        F.col("o_orderpriority").alias("attr_value"),
        F.date_format("effective_date", "yyyy-MM-dd").alias("effective_date"),
        F.date_format("end_date", "yyyy-MM-dd").alias("end_date"),
        "is_current",
        "version_seq",
    )


def _scd2_product_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product dim versions from the lineitem stream (attr = return flag).

    Reference README.md:145-147 recommends SCD2 for Customer AND
    Product; the same generic ``build_scd2`` runs over parts here.
    First line of each order (l_linenumber = 1) gives one candidate
    version per (order, part) with a unique (shipdate, orderkey) order
    within each part — the same determinism contract as the customer
    build.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    scd = build_scd2(li, "l_partkey", "l_shipdate", ["l_shipdate", "l_orderkey"])
    return scd.select(
        F.lit("product").alias("entity"),
        F.col("l_partkey").alias("natural_key"),
        F.col("l_orderkey").alias("version_id"),
        F.col("l_returnflag").alias("attr_value"),
        F.date_format("effective_date", "yyyy-MM-dd").alias("effective_date"),
        F.date_format("end_date", "yyyy-MM-dd").alias("end_date"),
        "is_current",
        "version_seq",
    )


def scd2_merge_batch(dim: DataFrame, changes: DataFrame) -> DataFrame:
    """SCD2 MERGE: apply one change batch onto a versioned dim — the
    close-out + insert-new-version composition every warehouse runs
    nightly (round-3 verdict #8), as a single batch plan.

    ``dim`` carries the standard SCD2 columns (natural_key, version_id,
    attr_value, effective_date, end_date, is_current, version_seq);
    ``changes`` carries at most ONE row per natural_key with
    (natural_key, version_id, attr_value, effective_date).

    Semantics per change row against the dim's current version:
    - attr differs  → close the current version (end_date = change's
      effective_date, is_current = false) AND insert a new current
      version with version_seq + 1;
    - attr equal    → no-op (idempotent re-delivery of the same state
      must not spawn a version — the SCD2 analogue of MERGE's
      "WHEN MATCHED AND changed" guard);
    - no current row → insert: a brand-new key starts at version_seq 1,
      and a key whose versions are ALL closed (expired entity — a
      legitimate SCD2 state) reactivates at MAX(version_seq) + 1,
      never at a colliding seq.
    History (non-current) rows always carry through untouched.

    Scale shape: the change batch is the small side — the close-out
    pass is a BroadcastHashJoin against it, so the dim (the 100 TB
    side) NEVER shuffles for close-out; the insert pass preserves the
    change side and therefore sort-merges, moving only the tiny change
    relation plus the dim's already-key-partitioned current slice. In
    a real warehouse the dim is a stored table bucketed by natural_key,
    making both joins co-located."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    ch = changes.withColumn("_ch_matched", F.lit(True))

    # Close-out / carry pass: dim-preserved left join, change side
    # broadcast. Match detection keys off the _ch_matched literal, not
    # a payload column, and the changed-test is NULL-SAFE (<=>): with a
    # plain !=, a change batch that legitimately sets the attribute to
    # NULL compares as NULL → false on BOTH the close predicate and the
    # insert filter, and the change silently drops as a no-op.
    j = cur.alias("t").join(
        F.broadcast(ch).alias("c"), on="natural_key", how="left"
    )
    closes = F.col("c._ch_matched").isNotNull() & ~F.col(
        "c.attr_value"
    ).eqNullSafe(F.col("t.attr_value"))
    carried = j.select(
        "natural_key",
        F.col("t.version_id").alias("version_id"),
        F.col("t.attr_value").alias("attr_value"),
        F.col("t.effective_date").alias("effective_date"),
        F.when(closes, F.col("c.effective_date"))
        .otherwise(F.col("t.end_date"))
        .alias("end_date"),
        (~closes).alias("is_current"),
        F.col("t.version_seq").alias("version_seq"),
    )

    # Insert pass: change-preserved left join (sort-merge; the change
    # side is tiny). A change inserts iff there is no current version
    # or the attribute actually moved. Two per-key states feed it
    # separately: the CURRENT attr (with an explicit _has_cur marker —
    # a NULL current attr is a value, not an absence) decides WHETHER
    # to insert, while the seq base is MAX(version_seq) over ALL of the
    # key's versions — a key whose versions are all closed (expired
    # entity, a legitimate SCD2 state) reactivates at max+1, never at
    # a colliding seq 1.
    key_state = (
        dim.groupBy("natural_key")
        .agg(F.max("version_seq").alias("_max_seq"))
        .join(
            cur.select(
                "natural_key",
                F.col("attr_value").alias("_cur_attr"),
                F.lit(True).alias("_has_cur"),
            ),
            "natural_key",
            "left",
        )
    )
    inserted = (
        ch.alias("c")
        .join(key_state.alias("t"), on="natural_key", how="left")
        .filter(
            F.col("t._has_cur").isNull()
            | ~F.col("t._cur_attr").eqNullSafe(F.col("c.attr_value"))
        )
        .select(
            "natural_key",
            F.col("c.version_id").alias("version_id"),
            F.col("c.attr_value").alias("attr_value"),
            F.col("c.effective_date").alias("effective_date"),
            F.lit(None).cast("string").alias("end_date"),
            F.lit(True).alias("is_current"),
            (F.coalesce(F.col("t._max_seq"), F.lit(0)) + F.lit(1))
            .cast("long")
            .alias("version_seq"),
        )
    )
    return hist.select(*carried.columns).unionByName(carried).unionByName(inserted)


def scd2_apply_change_stream(dim: DataFrame, changes: DataFrame) -> DataFrame:
    """SCD2 merge of a MULTI-WAVE change feed in one set-based plan —
    the micro-batch kernel of the streaming CDC → SCD2 composition
    (r4 verdict #4).

    ``changes`` carries (natural_key, version_id, attr_value,
    effective_date, wave): ``wave`` (>= 0) orders change deliveries per
    key — a streaming micro-batch may contain SEVERAL nightly-shaped
    waves at once (restart backlogs do), and applying only the last one
    per key would lose intermediate versions. Within a wave there is at
    most one row per key (the same contract ``scd2_merge_batch`` has
    for its whole batch).

    Equivalent BY CONSTRUCTION to folding ``scd2_merge_batch`` over the
    waves in ascending order (pinned by a hypothesis property test),
    but with no driver-side loop and no per-wave pass over the dim:

    1. anchor each batch key's CURRENT dim version at wave -1;
    2. drop consecutive-duplicate attrs per key in wave order
       (null-safe ``lag`` compare — sound because a dropped row's attr
       equals its predecessor's, so comparing to the immediate
       predecessor equals comparing to the last survivor);
    3. each surviving change becomes a version: ``end_date`` is the
       NEXT survivor's effective_date (``lead``; open for the last),
       ``version_seq`` continues from MAX(version_seq) over ALL of the
       key's versions (expired-entity reactivation, never a colliding
       seq);
    4. the old current row closes at the FIRST survivor's
       effective_date; untouched keys and history rows carry through
       byte-identically.

    Scale shape — the dim (the 100 TB side) NEVER shuffles: the anchor
    pass is a broadcast LEFT-SEMI of change keys against the current
    slice, the window/versioning machinery runs on batch-key rows only
    (batch-sized, not dim-sized), and the close-out pass is a broadcast
    left join against the tiny first-survivor frame — the same contract
    ``scd2_merge_batch`` proves in
    ``test_scd2_merge_close_pass_broadcasts_the_change_batch``."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    ch_keys = changes.select("natural_key").distinct()

    # Wave -1 anchor: current versions of keys the batch touches.
    anchor = cur.join(F.broadcast(ch_keys), "natural_key", "left_semi").select(
        "natural_key",
        "version_id",
        "attr_value",
        "effective_date",
        F.lit(-1).cast("long").alias("wave"),
        F.lit(True).alias("_anchor"),
    )
    cand = changes.select(
        "natural_key",
        "version_id",
        "attr_value",
        "effective_date",
        F.col("wave").cast("long").alias("wave"),
        F.lit(False).alias("_anchor"),
    )
    w = Window.partitionBy("natural_key").orderBy("wave")
    u = (
        anchor.unionByName(cand)
        .withColumn("_prev_attr", F.lag("attr_value").over(w))
        .withColumn("_has_prev", F.lag(F.lit(True)).over(w))
    )
    survivors = u.filter(
        ~F.col("_anchor")
        & (
            F.col("_has_prev").isNull()
            | ~F.col("attr_value").eqNullSafe(F.col("_prev_attr"))
        )
    )
    sv = (
        survivors.withColumn("_rn", F.row_number().over(w).cast("long"))
        .withColumn("_next_eff", F.lead("effective_date").over(w))
    )
    # NOTE _rn: row_number over the SURVIVOR frame restarts at 1 per
    # key (anchors were filtered out before the second window pass).
    # Seq base: MAX over ALL versions, but computed only for batch keys
    # — the semi-join runs BELOW the groupBy so the aggregate shuffles
    # batch-key rows, never the whole dim.
    key_state = (
        dim.join(F.broadcast(ch_keys), "natural_key", "left_semi")
        .groupBy("natural_key")
        .agg(F.max("version_seq").alias("_max_seq"))
    )
    inserted = (
        sv.join(F.broadcast(key_state), "natural_key", "left")
        .select(
            "natural_key",
            "version_id",
            "attr_value",
            "effective_date",
            F.col("_next_eff").alias("end_date"),
            F.col("_next_eff").isNull().alias("is_current"),
            (F.coalesce(F.col("_max_seq"), F.lit(0)) + F.col("_rn"))
            .cast("long")
            .alias("version_seq"),
        )
    )
    first_ch = sv.filter(F.col("_rn") == 1).select(
        "natural_key", F.col("effective_date").alias("_close_date")
    )
    j = cur.alias("t").join(
        F.broadcast(first_ch).alias("c"), "natural_key", "left"
    )
    closes = F.col("c._close_date").isNotNull()
    carried = j.select(
        "natural_key",
        F.col("t.version_id").alias("version_id"),
        F.col("t.attr_value").alias("attr_value"),
        F.col("t.effective_date").alias("effective_date"),
        F.when(closes, F.col("c._close_date"))
        .otherwise(F.col("t.end_date"))
        .alias("end_date"),
        (~closes).alias("is_current"),
        F.col("t.version_seq").alias("version_seq"),
    )
    return hist.select(*carried.columns).unionByName(carried).unionByName(inserted)


# The deterministic change batch for the catalog entry, derived purely
# from the fixtures so the DuckDB oracle can mirror it: updates for
# every 5th customer key (synthetic priority), idempotent re-sends for
# every 11th CURRENT dim row (same attr — must no-op), and brand-new
# keys offset by +20M for every 97th customer. The three key sets are
# disjoint by construction (%5-and-not-%11 / %11 / +20M offset), so the
# batch has one row per key. Customers that never ordered have no dim
# row, so their "update" exercises the brand-new-key path too.
_MERGE_EFF = "2002-01-15"  # after every o_orderdate/l_shipdate in the fixtures
_MERGE_KEY_OFFSET = 20_000_000


def _scd2_customer_merge_changes(
    spark: SparkSession, sf_dir: str, cur: DataFrame
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    upd = cust.filter(
        (F.col("c_custkey") % 5 == 0) & (F.col("c_custkey") % 11 != 0)
    ).select(
        F.col("c_custkey").alias("natural_key"),
        (-F.col("c_custkey")).alias("version_id"),
        F.lit("SYNTH-PRIORITY").alias("attr_value"),
        F.lit(_MERGE_EFF).alias("effective_date"),
    )
    noop = cur.filter(F.col("natural_key") % 11 == 0).select(
        "natural_key",
        (-F.col("natural_key")).alias("version_id"),
        "attr_value",
        F.lit(_MERGE_EFF).alias("effective_date"),
    )
    # Disjointness guard (ADVICE r4): the brand-new-key construction is
    # only collision-free while every real custkey sits BELOW the
    # offset — TPC-H custkey tops out at 150k*sf, so at sf>=~134 the
    # offset keys would silently alias existing dim keys and the merge
    # would corrupt real histories. Per-row raise_error inside the key
    # expression (not a separate audit pass, which column pruning could
    # drop): any out-of-range key fails the job loudly at the exact row.
    offset_key = F.when(
        F.col("c_custkey") < F.lit(_MERGE_KEY_OFFSET),
        F.col("c_custkey") + F.lit(_MERGE_KEY_OFFSET),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "scd2 merge fixture: c_custkey %s >= _MERGE_KEY_OFFSET "
                + str(_MERGE_KEY_OFFSET)
                + " — brand-new-key batch would collide with a real key; "
                "raise the offset for this scale factor",
                F.col("c_custkey"),
            )
        )
    )
    new = cust.filter(F.col("c_custkey") % 97 == 0).select(
        offset_key.alias("natural_key"),
        (-offset_key).alias("version_id"),
        F.lit("NEW-CUSTOMER").alias("attr_value"),
        F.lit(_MERGE_EFF).alias("effective_date"),
    )
    return upd.unionByName(noop).unionByName(new)


def _scd2_customer_merged(
    spark: SparkSession, sf_dir: str, dim: DataFrame
) -> DataFrame:
    """Customer dim AFTER one nightly merge batch, tagged for the suite.

    ``dim`` is the (persisted) pre-merge version frame: in a real
    warehouse the merge reads a STORED dim table, it does not rebuild
    it — the persist models that, and keeps the entry's plan from
    re-running the version window for each of the merge's four
    references (hist / close pass / insert probe / no-op change feed)."""
    changes = _scd2_customer_merge_changes(
        spark, sf_dir, dim.filter(F.col("is_current"))
    )
    return scd2_merge_batch(dim, changes).select(
        F.lit("customer_merged").alias("entity"), "*"
    )


@register(
    "q_scd2_build",
    oracle="""
    WITH ver AS (
        SELECT o_custkey AS natural_key,
               o_orderkey AS version_id,
               o_orderpriority AS attr_value,
               strftime(o_orderdate, '%Y-%m-%d') AS effective_date,
               strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS end_date,
               lead(o_orderdate) OVER w IS NULL AS is_current,
               row_number() OVER w AS version_seq
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    cur AS (SELECT * FROM ver WHERE is_current),
    changes AS (
        SELECT c_custkey AS natural_key, -c_custkey AS version_id,
               'SYNTH-PRIORITY' AS attr_value, '2002-01-15' AS eff
        FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 11 <> 0
        UNION ALL
        SELECT natural_key, -natural_key, attr_value, '2002-01-15'
        FROM cur WHERE natural_key % 11 = 0
        UNION ALL
        SELECT c_custkey + 20000000, -(c_custkey + 20000000),
               'NEW-CUSTOMER', '2002-01-15'
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT 'customer' AS entity, * FROM ver
    UNION ALL
    SELECT 'product' AS entity,
           l_partkey AS natural_key,
           l_orderkey AS version_id,
           l_returnflag AS attr_value,
           strftime(l_shipdate, '%Y-%m-%d') AS effective_date,
           strftime(lead(l_shipdate) OVER w2, '%Y-%m-%d') AS end_date,
           lead(l_shipdate) OVER w2 IS NULL AS is_current,
           row_number() OVER w2 AS version_seq
    FROM lineitem
    WHERE l_linenumber = 1
    WINDOW w2 AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey)
    UNION ALL
    SELECT 'customer_merged', * FROM (
        SELECT natural_key, version_id, attr_value, effective_date,
               end_date, is_current, version_seq
        FROM ver WHERE NOT is_current
        UNION ALL
        SELECT t.natural_key, t.version_id, t.attr_value, t.effective_date,
               CASE WHEN c.natural_key IS NOT NULL
                         AND c.attr_value IS DISTINCT FROM t.attr_value
                    THEN c.eff ELSE t.end_date END,
               NOT (c.natural_key IS NOT NULL
                    AND c.attr_value IS DISTINCT FROM t.attr_value),
               t.version_seq
        FROM cur t LEFT JOIN changes c ON t.natural_key = c.natural_key
        UNION ALL
        SELECT c.natural_key, c.version_id, c.attr_value, c.eff,
               NULL, TRUE, COALESCE(b.mx, 0) + 1
        FROM changes c
        LEFT JOIN cur t ON c.natural_key = t.natural_key
        LEFT JOIN (SELECT natural_key, MAX(version_seq) AS mx
                   FROM ver GROUP BY 1) b
          ON c.natural_key = b.natural_key
        WHERE t.natural_key IS NULL OR t.attr_value IS DISTINCT FROM c.attr_value
    )
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version build over BOTH dims the reference recommends it for
    (README.md:145-147, Customer and Product): effective/end dates via
    lead(), is_current flag, per-key version sequence — one generic
    builder, two entity streams, tagged and unioned. A third branch
    (entity='customer_merged') composes the build with the batch-MERGE
    upsert (``scd2_merge_batch``): the customer dim AFTER one nightly
    change batch — close-out + insert-new-version + idempotent no-op in
    a single plan (round-3 verdict #8)."""
    dim = _scd2_customer_versions(spark, sf_dir).drop("entity").persist()
    # The 'customer' branch reads the SAME persisted frame (re-tagged):
    # building it from the raw plan would run the orders window twice —
    # once for this branch, once as the merge's cache build.
    return (
        dim.select(F.lit("customer").alias("entity"), "*")
        .unionByName(_scd2_product_versions(spark, sf_dir))
        .unionByName(_scd2_customer_merged(spark, sf_dir, dim))
    )


@register(
    "q_scd2_point_in_time",
    oracle="""
    WITH versions AS (
        SELECT o_custkey AS customer_key,
               o_orderkey AS version_id,
               CAST(o_orderdate AS DATE) AS effective_date,
               CAST(lead(o_orderdate) OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS DATE) AS end_date
        FROM orders
    ),
    fact AS (
        SELECT o.o_custkey AS customer_key,
               CAST(l.l_shipdate AS DATE) AS ship_date,
               l.l_extendedprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT v.customer_key, v.version_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS version_sales
    FROM fact f
    JOIN versions v
      ON f.customer_key = v.customer_key
     AND f.ship_date >= v.effective_date
     AND (v.end_date IS NULL OR f.ship_date < v.end_date)
    GROUP BY 1, 2
    """,
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — point-in-time join: each fact line lands in the dimension
    version whose [effective, end) range covers its date; aggregates per
    version. Equi conjunct on the natural key keeps the plan hash-based."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    versions = (
        build_scd2(orders, "o_custkey", "o_orderdate", ["o_orderdate", "o_orderkey"])
        .select(
            F.col("o_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("version_id"),
            "effective_date",
            "end_date",
        )
    )
    fact = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("f_customer_key"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price_dec"),
    )
    joined = fact.join(
        versions,
        (fact.f_customer_key == versions.customer_key)
        & (fact.ship_date >= versions.effective_date)
        & (versions.end_date.isNull() | (fact.ship_date < versions.end_date)),
    )
    return joined.groupBy("customer_key", "version_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("price_dec").cast("double").alias("version_sales"),
    )
