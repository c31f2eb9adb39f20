"""Smart-key and calendar column expressions (SURVEY.md P9/P10/P15/P16).

Fidelity decisions F1/F2 (SURVEY.md §2.6): all smart keys are
zero-padded STRINGS — exactly what the reference's executed layer
produces (reference ``scripts/clean_data.py:97-104``) — because as
integers the leading zeros vanish (00:05:09 → 90500). ``time_key`` is
SSMMHH, seconds FIRST (reference ``clean_data.py:104``).

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen'd,
zero Python UDFs (SURVEY.md §2.5 target).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(d: Column) -> Column:
    """DDMMYYYY string (reference clean_data.py:97)."""
    return F.date_format(d, "ddMMyyyy")


def month_key(d: Column) -> Column:
    """MMYYYY string (reference clean_data.py:98).

    Does not sort chronologically (F2) — internally always carry a real
    date column and emit this only at the warehouse edge.
    """
    return F.date_format(d, "MMyyyy")


def time_key(t: Column) -> Column:
    """SSMMHH zero-padded string — seconds first (reference clean_data.py:100-104)."""
    return F.format_string("%02d%02d%02d", F.second(t), F.minute(t), F.hour(t))


def time_bucket_period(hour: Column) -> Column:
    """Morning/Afternoon/Evening/Night bucket (reference README.md:57)."""
    return (
        F.when(hour.between(6, 11), "Morning")
        .when(hour.between(12, 17), "Afternoon")
        .when(hour.between(18, 22), "Evening")
        .otherwise("Night")
    )


def time_bucket_12hr(t: Column) -> Column:
    """'8:00 AM - 8:59 AM'-style hourly label (reference README.md:57).

    Built with arithmetic + when(), NOT ``date_format('h a')`` — the
    pattern letters go through the JVM default locale, so a non-English
    JVM would emit different AM/PM markers. Same construction as
    ``dims.date_dim.build_dim_time_of_day`` (the two must agree).
    """
    hour = F.hour(t)
    hour12 = ((hour + 11) % 12) + 1
    ampm = F.when(hour < 12, "AM").otherwise("PM")
    return F.concat(
        hour12.cast("string"), F.lit(":00 "), ampm,
        F.lit(" - "),
        hour12.cast("string"), F.lit(":59 "), ampm,
    )


# Fixed-date holiday lookup (month, day, name) — THE single source of
# truth for is_holiday_flag (round-2 verdict: calendar_attrs and
# build_dim_date had diverged). A real deployment swaps this constant
# for a curated per-locale holiday table joined broadcast-left; with an
# in-code constant list the flag is a pure expression, so no join at
# all. Reference README.md:51 declares the flag NULLABLE: TRUE when the
# lookup matches, NULL (unknown) otherwise — never FALSE, because
# absence from an incomplete holiday table is not evidence of a workday.
HOLIDAYS: list[tuple[int, int, str]] = [
    (1, 1, "New Year's Day"),
    (7, 4, "Independence Day"),
    (12, 25, "Christmas Day"),
]


def is_holiday_flag(d: Column) -> Column:
    """Nullable TRUE/NULL holiday flag from the static HOLIDAYS list.

    Pure codegen'd expression (no lookup join needed for a compile-time
    constant list); both ``calendar_attrs`` and
    ``dims.date_dim.build_dim_date`` emit exactly this.
    """
    match = F.lit(False)
    for m, day, _name in HOLIDAYS:
        match = match | ((F.month(d) == m) & (F.dayofmonth(d) == day))
    return F.when(match, F.lit(True)).otherwise(F.lit(None).cast("boolean"))


def calendar_attrs(d: Column) -> dict[str, Column]:
    """DimDate attribute block (reference README.md:51).

    ``dayofweek`` is 1=Sunday..7=Saturday; weekend = Sun|Sat.
    ``is_holiday_flag`` delegates to the shared HOLIDAYS expression.
    """
    return {
        "day_of_week": F.dayofweek(d),
        "day_name": F.date_format(d, "EEEE"),
        "month": F.month(d),
        "month_name": F.date_format(d, "MMMM"),
        "quarter": F.quarter(d),
        "year": F.year(d),
        "is_weekend": F.dayofweek(d).isin(1, 7),
        "is_holiday_flag": is_holiday_flag(d),
    }


def surrogate_key_hash(*natural_key: Column | str) -> Column:
    """Deterministic, shuffle-free surrogate key: xxhash64(natural key).

    Preferred at 100 TB over ``row_number()`` (which needs a global
    sort/exchange); collisions over 64 bits are negligible at warehouse
    dimension cardinalities (SURVEY.md §1.1). Oracle-checked queries use
    ``row_number`` ordering instead only because DuckDB lacks xxhash64.
    """
    return F.xxhash64(*natural_key)
