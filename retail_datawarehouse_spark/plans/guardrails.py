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
Catalyst rule needed, per SURVEY §4.2): walk the ANALYZED plan as
EXPRESSION TREES (r5 verdict #3 — the first cut regexed
``toString()`` output, which a ``withColumnRenamed`` or a ``!=``
filter defeated), find every Aggregate whose SUM/AVG argument tree
references the measure, and require either

- the time grain in that Aggregate's grouping (a per-month aggregate —
  the measure is additive WITHIN a month), or
- an equality pin on the grain below the Aggregate (a single-month
  slice — q55's read shape): an ``EqualTo``/``EqualNullSafe`` whose
  one side carries the grain attribute and whose other side contains
  NO attribute (a literal/foldable value), standing as a CONJUNCT of
  its Filter condition (reached through ``And`` only) — so ``!=``
  (printed as Not(EqualTo)), IN-lists, ranges, column-to-column
  equality, and a pin hidden inside an OR disjunction (``month = X OR
  status = 'F'`` admits every month; ADVICE r6) all correctly fail to
  qualify. The Filter must sit on the branch that carries the
  measure's lineage, OR on the far side of an INNER/SEMI equi-join
  whose join key is itself a grain column (the star-schema
  single-month slice via a filtered date dimension — the reference
  warehouse's standard read; ADVICE r7): there the join propagates
  the pin to every surviving measure row. A pin on a branch joined on
  a NON-grain key, or across an outer join, does not restrict the
  measure's months and correctly does not count (ADVICE r6) — and any
  shape this walk cannot prove is a deliberate fail-closed
  over-approximation: a false ALARM, never a silent double-count.

Attribute identity is tracked by ``exprId`` LINEAGE, not by name:
every ``AttributeReference`` literally named a measure/grain seeds the
tainted set, and any ``Alias`` whose subtree references a tainted id
taints its own id — so the measure is followed through
``withColumnRenamed``/``select(...alias...)`` chains, wrapped forms
(``sum(measure * 2)``, ``sum(coalesce(measure, 0))``, casts), and
derived columns (the alias of a per-month SUM of the measure is
itself semi-additive across months, and re-aggregating it is caught).

Mechanics: the whole analyzed plan crosses the py4j boundary ONCE as
``toJSON()`` (Catalyst's pre-order + num-children flat encoding,
expression subtrees included with exprIds), and the walk is pure
Python — a per-expression py4j traversal would cost thousands of JVM
round-trips on the live q55/snapshot read path.

``Window`` nodes are checked too (r6, closing the r5 documented
residual): a window SUM/AVG of the measure is the same double-count
when its frame ranges across months — legal only when the grain sits
in the window's PARTITION spec (per-month frames) or a single-month
pin sits below. The builder that CREATES the measure is a window sum
of the ADDITIVE input, which stays legal because taint seeds from the
measure's references, not its birth alias; LAG/LEAD/MIN/MAX over the
measure (the W3 delta read) stay legal everywhere.

Anything else raises ``SemiAdditiveViolation`` before a single task
runs. Driver-side plan walk only — no job is triggered.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

SEMI_ADDITIVE_MEASURES: tuple[str, ...] = ("customer_lifetime_spent",)
GRAIN_COLUMNS: tuple[str, ...] = ("month_start", "month_key")

# Sum covers sum/try_sum (TRY is an eval mode, not a class); Average
# covers avg/mean/try_avg. min/max/first/last are legitimate
# semi-additive reads and stay allowed.
_FORBIDDEN_AGG_CLASSES = ("Sum", "Average")


class SemiAdditiveViolation(ValueError):
    """A plan aggregates a semi-additive measure across the time grain."""


def _simple(node: dict) -> str:
    return node["class"].rsplit(".", 1)[-1]


def _decode_flat(flat: list[dict]) -> dict:
    """Catalyst's flat pre-order + num-children encoding -> a tree of
    dicts, children under '_kids'."""
    pos = 0

    def rec() -> dict:
        nonlocal pos
        node = flat[pos]
        pos += 1
        node["_kids"] = [rec() for _ in range(node.get("num-children", 0))]
        return node

    root = rec()
    if pos != len(flat):  # trailing garbage would mean a decode bug
        raise ValueError("plan JSON decode mismatch")
    return root


def _expr_fields(node: dict):
    """Decoded expression trees hanging off a plan/expression node:
    a field is a single tree (flat list of class-dicts) or a list of
    trees (list of flat lists)."""
    for key, val in node.items():
        if key in ("class", "num-children", "_kids") or not isinstance(
            val, list
        ) or not val:
            continue
        if all(isinstance(e, dict) and "class" in e for e in val):
            yield _decode_flat(val)
        elif all(
            isinstance(t, list)
            and t
            and all(isinstance(e, dict) and "class" in e for e in t)
            for t in val
        ):
            for t in val:
                yield _decode_flat(t)


def _walk(tree: dict):
    stack = [tree]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(n["_kids"])


def _refs_any(tree: dict, ids: set[int]) -> bool:
    return any(
        _simple(e) == "AttributeReference" and e["exprId"]["id"] in ids
        for e in _walk(tree)
    )


def _has_attrs(tree: dict) -> bool:
    return any(_simple(e) == "AttributeReference" for e in _walk(tree))


def _plan_tree(df: DataFrame) -> dict:
    return _decode_flat(
        json.loads(df._jdf.queryExecution().analyzed().toJSON())
    )


def _collect_tainted(plan: dict, names: tuple[str, ...]) -> set[int]:
    """exprIds carrying a named column, followed through aliases.

    Seeds: every AttributeReference whose name matches. Propagation:
    any Alias whose child tree references a tainted id adds its own
    id. Plan nodes visit children-first and expression trees
    post-order, so taint flows bottom-up in one pass."""
    tainted: set[int] = set()
    lowered = tuple(n.lower() for n in names)

    def visit_expr(e: dict) -> None:
        for c in e["_kids"]:
            visit_expr(c)
        k = _simple(e)
        if k == "AttributeReference" and e["name"].lower() in lowered:
            tainted.add(e["exprId"]["id"])
        elif (
            k == "Alias"
            and e["_kids"]
            and _refs_any(e["_kids"][0], tainted)
        ):
            tainted.add(e["exprId"]["id"])

    def visit(node: dict) -> None:
        for c in node["_kids"]:
            visit(c)
        for tree in _expr_fields(node):
            visit_expr(tree)

    visit(plan)
    return tainted


def _pin_in_condition(e: dict, grain_ids: set[int]) -> bool:
    """True only when a single-grain equality is a CONJUNCT of the
    condition: recurse through And (both conjuncts restrict every
    surviving row) and STOP at everything else — an equality under Or
    admits rows the equality never pinned (``month = X OR status =
    'F'`` passes every month; ADVICE r6), and under Not it is ``!=``.
    Stopping rather than enumerating bad wrappers keeps the fail-closed
    direction: an exotic shape is a false ALARM, never a silent pass."""
    k = _simple(e)
    if k == "And":
        return any(_pin_in_condition(c, grain_ids) for c in e["_kids"])
    if k in ("EqualTo", "EqualNullSafe") and len(e["_kids"]) == 2:
        left, right = e["_kids"]
        for a, b in ((left, right), (right, left)):
            if _refs_any(a, grain_ids) and not _has_attrs(b):
                return True
    return False


def _node_refs(node: dict, ids: set[int]) -> bool:
    """Any expression field anywhere in the plan subtree references one
    of ``ids``. Leaf relations serialize their output attributes as
    expression fields, so this answers 'does this branch carry the
    column' — the lineage test that keeps a pin on an unrelated join
    branch (one that never produces the measure's rows) from
    qualifying (ADVICE r6)."""
    if any(_refs_any(tree, ids) for tree in _expr_fields(node)):
        return True
    return any(_node_refs(c, ids) for c in node["_kids"])


def _attr_ids(node: dict) -> set[int]:
    """All attribute exprIds a plan subtree references OR DEFINES —
    AttributeReference ids plus Alias ids (an ``AS`` defines a new
    attribute that is only ever referenced ABOVE its Project, so a
    branch's renamed outputs would otherwise not count as the
    branch's). A superset of the branch's output, good enough to
    decide which child of a join an equality side belongs to (exprIds
    are globally unique per attribute)."""
    out: set[int] = set()

    def visit(n: dict) -> None:
        for tree in _expr_fields(n):
            for e in _walk(tree):
                if _simple(e) in ("AttributeReference", "Alias"):
                    out.add(e["exprId"]["id"])
        for c in n["_kids"]:
            visit(c)

    visit(node)
    return out


def _bare_attr_id(e: dict) -> int | None:
    """The exprId if ``e`` is a BARE AttributeReference, else None —
    the join-propagation rule only trusts attribute-to-attribute
    equality (ADVICE r8): an equality over a DERIVED expression of a
    grain attribute (``month + 1 = dim.month``, ``substr(month, ..)``)
    equates the derived VALUE, so a pin on the underlying attribute
    says nothing about the value actually joined on."""
    if _simple(e) == "AttributeReference" and not e["_kids"]:
        return e["exprId"]["id"]
    return None


def _grain_equi_pairs(
    e: dict,
    grain_ids: set[int],
    left_ids: set[int],
    right_ids: set[int],
) -> list[tuple[int, int]]:
    """(left_attr_id, right_attr_id) pairs for every conjunct (through
    And only — the `_pin_in_condition` fail-closed recursion) that
    equates a BARE grain attribute of one join child with a BARE grain
    attribute of the other. EqualTo ONLY, deliberately excluding
    EqualNullSafe (ADVICE r8 tightening): ``<=>`` matches NULL with
    NULL, so a null-filled row produced by an outer join INSIDE the
    pinned branch could survive the top join un-pinned — plain
    equality is null-rejecting, which is exactly what makes
    through-the-branch propagation sound (see `_pin_filter_tied`)."""
    k = _simple(e)
    if k == "And":
        return [
            p
            for c in e["_kids"]
            for p in _grain_equi_pairs(c, grain_ids, left_ids, right_ids)
        ]
    if k == "EqualTo" and len(e["_kids"]) == 2:
        a, b = (_bare_attr_id(c) for c in e["_kids"])
        if a in grain_ids and b in grain_ids and a is not None:
            if a in left_ids and b in right_ids:
                return [(a, b)]
            if b in left_ids and a in right_ids:
                return [(b, a)]
    return []


def _alias_closure(node: dict, seed: set[int]) -> set[int]:
    """Downward rename-lineage within one plan branch: starting from
    the join-equated attribute ids, add the id of any attribute that a
    PURE-RENAME Alias (child is a bare AttributeReference — nothing
    computed) maps onto a member. Only pure renames are followed: an
    Alias over an expression (concat, arithmetic) changes the VALUE,
    so a pin on its input would not pin the aliased output
    (fail-closed; ADVICE r8)."""
    renames: list[tuple[int, int]] = []  # (alias_id, source_id)

    def visit(n: dict) -> None:
        for tree in _expr_fields(n):
            for e in _walk(tree):
                if _simple(e) == "Alias" and len(e["_kids"]) == 1:
                    src = _bare_attr_id(e["_kids"][0])
                    if src is not None:
                        renames.append((e["exprId"]["id"], src))
        for c in n["_kids"]:
            visit(c)

    visit(node)
    out = set(seed)
    changed = True
    while changed:
        changed = False
        for alias_id, src in renames:
            if alias_id in out and src not in out:
                out.add(src)
                changed = True
    return out


# Plan nodes through which a pinned attribute's VALUES provably flow
# unchanged from the pin Filter to the join child's output (its exprId
# is preserved and no other branch can smuggle values under the same
# id). Join is safe here because exprIds are globally unique per
# producing branch and the top-level equi-conjunct is null-rejecting
# EqualTo, so outer-join null-fill inside the branch cannot survive
# the propagation join. Union-like nodes are deliberately ABSENT:
# Union reuses its FIRST child's exprIds for values merged from every
# child, so a pin on one child does not pin the union output —
# stopping descent there keeps the fail-closed direction.
_SAFE_PIN_PATH = frozenset(
    {
        "Project",
        "Filter",
        "Join",
        "SubqueryAlias",
        "Sort",
        "GlobalLimit",
        "LocalLimit",
        "Repartition",
        "RepartitionByExpression",
        "Sample",
        "Window",
        "Aggregate",
        "Deduplicate",
        "Hint",
        "ResolvedHint",
    }
)


def _pin_filter_tied(node: dict, tied_ids: set[int]) -> bool:
    """A Filter at-or-below ``node`` whose condition carries a
    single-grain equality pin AS A CONJUNCT on one of the TIED
    attribute ids — the attributes actually equated by the join
    conjunct (plus their pure-rename lineage), not just any
    grain-named column on the branch (ADVICE r8: a pin on dimB.month
    under ``dimA LEFT JOIN dimB`` proves nothing about the dimA.month
    the fact is joined on). Descent from the join child to the Filter
    is restricted to ``_SAFE_PIN_PATH`` node classes; anything exotic
    (Union, Expand, Generate, ...) stops the search — a false alarm,
    never a silent pass."""
    if _simple(node) == "Filter":
        for tree in _expr_fields(node):
            if _pin_in_condition(tree, tied_ids):
                return True
    if _simple(node) not in _SAFE_PIN_PATH:
        return False
    return any(_pin_filter_tied(c, tied_ids) for c in node["_kids"])


def _join_propagates_grain_pin(
    node: dict, grain_ids: set[int], measure_ids: set[int]
) -> bool:
    """The canonical star-schema single-month slice (ADVICE r7,
    tightened per ADVICE r8): an INNER (or LEFT SEMI) equi-join
    between the measure's branch and a branch pinned to one grain
    value, where a join conjunct equates a BARE grain attribute on
    each side and the pinned side's Filter pins ONE OF THE EQUATED
    attributes (or a pure rename of one) along an id-preserving path —
    every surviving measure row then carries the pinned grain value,
    so the read is a single-month slice exactly like a direct Filter
    on the fact. Rejected by construction: LEFT OUTER at the top
    (unmatched measure rows survive unrestricted), non-grain join keys
    (ADVICE r6), derived-expression equalities and ``<=>``
    (`_grain_equi_pairs`), pins on a grain column that is NOT the
    equated one — e.g. on dimB under ``fact JOIN (dimA LEFT JOIN
    pinned-dimB) ON fact.month = dimA.month`` (ADVICE r8) — and pins
    under Or/Not (same `_pin_in_condition` rules as direct filters)."""
    jt = (node.get("joinType") or {}).get("object", "")
    if not jt.endswith(("Inner$", "LeftSemi$")):
        return False
    left, right = node["_kids"]
    left_ids = _attr_ids(left)
    right_ids = _attr_ids(right)
    pairs = [
        p
        for tree in _expr_fields(node)
        for p in _grain_equi_pairs(tree, grain_ids, left_ids, right_ids)
    ]
    if not pairs:
        return False
    for measure_side, pinned_side, pick in ((left, right, 1), (right, left, 0)):
        if not _node_refs(measure_side, measure_ids):
            continue
        tied = _alias_closure(
            pinned_side, {p[pick] for p in pairs}
        )
        if _pin_filter_tied(pinned_side, tied):
            return True
    return False


def _subtree_pins_grain(
    node: dict, grain_ids: set[int], measure_ids: set[int]
) -> bool:
    """True if the measure's rows are provably restricted to one grain
    value below this node, by either accepted shape:

    - a Filter at-or-below carrying a single-grain equality pin AS A
      CONJUNCT, sitting on the branch that carries the measure's
      lineage, or
    - an inner/semi equi-join ON A GRAIN KEY whose other side is so
      pinned — the reference warehouse's standard read (fact joined to
      a single-month date-dimension slice; ADVICE r7).

    Everything else is a deliberate fail-closed over-approximation:
    shapes that MIGHT restrict the rows (a pin inside an OR that
    happens to be exhaustive, an outer join whose null rows are later
    dropped, a range that happens to cover one month) still raise —
    an exotic-but-safe plan costs a false alarm, never a silent
    double-count (see module docstring)."""
    if _simple(node) == "Filter" and _node_refs(node, measure_ids):
        for tree in _expr_fields(node):
            if _pin_in_condition(tree, grain_ids):
                return True
    if _simple(node) == "Join" and _join_propagates_grain_pin(
        node, grain_ids, measure_ids
    ):
        return True
    return any(
        _subtree_pins_grain(c, grain_ids, measure_ids) for c in node["_kids"]
    )


def assert_semi_additive_safe(
    df: DataFrame,
    measures: tuple[str, ...] = SEMI_ADDITIVE_MEASURES,
    grains: tuple[str, ...] = GRAIN_COLUMNS,
) -> DataFrame:
    """Validate and return ``df`` (chainable). Raises
    ``SemiAdditiveViolation`` if any Aggregate in the analyzed plan
    SUM/AVGs a semi-additive measure (by exprId lineage — renames and
    expression wrapping included) without a per-grain grouping or a
    single-grain filter below it. Driver-side plan walk only — no job
    is triggered."""
    plan = _plan_tree(df)
    measure_ids = _collect_tainted(plan, measures)
    grain_ids = _collect_tainted(plan, grains)

    def check_aggregate(node: dict) -> None:
        hit = None
        for tree in _expr_fields(node):
            for e in _walk(tree):
                if _simple(e) != "AggregateExpression" or not e["_kids"]:
                    continue
                fn = e["_kids"][0]  # the aggregateFunction subtree
                if _simple(fn) in _FORBIDDEN_AGG_CLASSES and _refs_any(
                    fn, measure_ids
                ):
                    hit = {"Sum": "sum", "Average": "avg"}[_simple(fn)]
        if hit is None:
            return
        grouping = [
            _decode_flat(t)
            for t in node.get("groupingExpressions", [])
            if isinstance(t, list) and t
        ]
        if any(_refs_any(g, grain_ids) for g in grouping):
            return
        if _subtree_pins_grain(node, grain_ids, measure_ids):
            return
        raise SemiAdditiveViolation(
            f"{hit}() aggregates a SEMI-ADDITIVE measure (lineage of "
            f"{list(measures)}) across the time grain: the grouping "
            f"carries none of {list(grains)} and no single-month equality "
            "pin sits below the aggregate (!=, IN, ranges, and "
            "column-to-column equality do not pin). Lifetime values "
            "double-count prior months under SUM/AVG — read ONE month "
            "(W2), group by the grain, or use MIN/MAX/latest instead."
        )

    def check_window(node: dict) -> None:
        """A WindowExpression's children are (windowFunction,
        windowSpec); a forbidden window agg is safe only when a grain
        attribute sits in the spec's PARTITION columns (the frame can
        never cross months) or a single-month pin sits below."""
        hit = None
        safe = False
        for tree in _expr_fields(node):
            for e in _walk(tree):
                if _simple(e) != "WindowExpression" or len(e["_kids"]) != 2:
                    continue
                fnw, spec = e["_kids"]
                aggs = [
                    x["_kids"][0]
                    for x in _walk(fnw)
                    if _simple(x) == "AggregateExpression" and x["_kids"]
                ]
                bad = [
                    a
                    for a in aggs
                    if _simple(a) in _FORBIDDEN_AGG_CLASSES
                    and _refs_any(a, measure_ids)
                ]
                if not bad:
                    continue
                hit = {"Sum": "sum", "Average": "avg"}[_simple(bad[0])]
                # WindowSpecDefinition flattens partitionSpec ++
                # orderSpec ++ frame as positional children; partition
                # entries are the ones that are neither SortOrder nor
                # a frame node.
                part = [
                    k
                    for k in spec["_kids"]
                    if _simple(k) != "SortOrder"
                    and "WindowFrame" not in _simple(k)
                ]
                safe = any(_refs_any(p, grain_ids) for p in part)
        if hit is None or safe or _subtree_pins_grain(
            node, grain_ids, measure_ids
        ):
            return
        raise SemiAdditiveViolation(
            f"window {hit}() runs a SEMI-ADDITIVE measure (lineage of "
            f"{list(measures)}) over a frame that can cross the time "
            f"grain: none of {list(grains)} is in the window PARTITION "
            "spec and no single-month equality pin sits below. A running/"
            "frame SUM of a lifetime value double-counts prior months — "
            "partition the window by the grain, pin one month, or use "
            "LAG/LEAD/MIN/MAX instead."
        )

    def walk_plan(node: dict) -> None:
        k = _simple(node)
        if k == "Aggregate":
            check_aggregate(node)
        elif k == "Window":
            check_window(node)
        for c in node["_kids"]:
            walk_plan(c)

    walk_plan(plan)
    return df
