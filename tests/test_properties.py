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
