"""Property-based fidelity tests (hypothesis): the smart-key rules
F1/F2 (zero-padded strings, SSMMHH ordering) must hold for ARBITRARY
dates/times, not just fixture values — a regression here silently
flips every oracle hash downstream."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.keys import (
    date_key,
    month_key,
    time_bucket_period,
    time_key,
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1901, 1, 1),
            max_value=dt.datetime(2199, 12, 31, 23, 59, 59),
        ).map(lambda d: d.replace(microsecond=0)),
        min_size=1,
        max_size=40,
    )
)
def test_smart_keys_match_python_reference(spark, timestamps):
    """date_key==DDMMYYYY, month_key==MMYYYY, time_key==SSMMHH — each a
    zero-padded string identical to Python strftime on the same value."""
    df = spark.createDataFrame([(t,) for t in timestamps], ["ts"])
    rows = df.select(
        "ts",
        date_key(F.col("ts")).alias("dk"),
        month_key(F.col("ts")).alias("mk"),
        time_key(F.col("ts")).alias("tk"),
    ).collect()
    for r in rows:
        t = r["ts"]
        assert r["dk"] == t.strftime("%d%m%Y")
        assert r["mk"] == t.strftime("%m%Y")
        assert r["tk"] == f"{t.second:02d}{t.minute:02d}{t.hour:02d}"


def test_time_bucket_period_total_cover(spark):
    """Every hour 0-23 lands in exactly one period; boundaries per the
    reference spec (6-11 Morning, 12-17 Afternoon, 18-22 Evening)."""
    df = spark.range(24).select(F.col("id").cast("int").alias("h"))
    rows = {
        r["h"]: r["p"]
        for r in df.select(
            "h", time_bucket_period(F.col("h")).alias("p")
        ).collect()
    }
    expect = lambda h: (  # noqa: E731
        "Morning"
        if 6 <= h <= 11
        else "Afternoon"
        if 12 <= h <= 17
        else "Evening"
        if 18 <= h <= 22
        else "Night"
    )
    assert rows == {h: expect(h) for h in range(24)}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_zorder_value_interleaves_quantized_bits_exactly(spark, pairs):
    """zorder_value must be EXACTLY the bit interleaving of the two
    min-max-quantized coordinates for arbitrary non-negative ints: the
    even/odd bit planes of z reconstruct each column's quantization,
    and z stays within 2*bits total bits. This pins the arithmetic the
    multi-dimension locality guarantee rests on (a bit-order bug would
    still 'cluster' but on a garbled curve)."""
    from pyspark.sql import functions as FF

    from retail_datawarehouse_spark.sources.writers import (
        ZORDER_BITS,
        zorder_value,
    )

    df = spark.createDataFrame(pairs, "a long, b long")
    bounds = df.agg(
        *[
            agg(c).alias(f"__{tag}_{c}")
            for c in ("a", "b")
            for tag, agg in (("min", FF.min), ("max", FF.max))
        ]
    )
    rows = (
        df.crossJoin(FF.broadcast(bounds))
        .withColumn("z", zorder_value(["a", "b"]))
        .collect()
    )
    los = {c: min(p[i] for p in pairs) for i, c in enumerate("ab")}
    his = {c: max(p[i] for p in pairs) for i, c in enumerate("ab")}

    def quant(v, c):
        span = his[c] - los[c]
        if span <= 0:
            return 0
        import math

        return math.floor((v - los[c]) * ((1 << ZORDER_BITS) - 1) / span)

    for r in rows:
        qa, qb = quant(r.a, "a"), quant(r.b, "b")
        expect = 0
        for j in range(ZORDER_BITS):
            expect |= ((qa >> j) & 1) << (2 * j)
            expect |= ((qb >> j) & 1) << (2 * j + 1)
        assert r.z == expect, (r.a, r.b, r.z, expect)
        assert 0 <= r.z < (1 << (2 * ZORDER_BITS))
