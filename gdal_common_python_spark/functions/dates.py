"""Date functions (D1-D6, date.py in the reference) as Column expressions.

The reference's leap-year rule is ``year % 4 == 0`` (date.py:68) — wrong at
century years (1900 -> True). ``*_ref`` variants replicate the reference rule
bit-for-bit (what fixtures pin); plain variants use the correct calendar.
``add_years`` in the reference raises on Feb-29 -> non-leap
(dt.replace, date.py:23); Spark's add_months clamps instead — documented
divergence, fixtures avoid Feb-29 (SURVEY §2.8 D2).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_DAYS_IN_MONTH = [0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def day_of_year(col: Column) -> Column:  # D1 (date.py:8-14)
    return F.dayofyear(col)


def add_years(col: Column, years: int) -> Column:  # D2 (date.py:17-23)
    return F.add_months(col, 12 * years)


def add_days(col: Column, days) -> Column:  # D3 (date.py:26-32)
    return F.timestamp_add("DAY", F.lit(days) if not isinstance(days, Column) else days, col)


def add_hours(col: Column, hours) -> Column:  # D3 (date.py:35-41)
    return F.timestamp_add("HOUR", F.lit(hours) if not isinstance(hours, Column) else hours, col)


def add_minutes(col: Column, minutes) -> Column:  # D3 (date.py:44-50)
    return F.timestamp_add("MINUTE", F.lit(minutes) if not isinstance(minutes, Column) else minutes, col)


def add_seconds(col: Column, seconds) -> Column:  # D3 (date.py:53-59)
    return F.timestamp_add("SECOND", F.lit(seconds) if not isinstance(seconds, Column) else seconds, col)


def is_leap_year_ref(year: Column) -> Column:  # D4, reference rule (date.py:68)
    return year % 4 == 0


def is_leap_year(year: Column) -> Column:  # correct Gregorian rule
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def days_in_month_ref(month: Column, year: Column) -> Column:
    """D5 with the reference leap rule (date.py:71-83): out-of-range -> 0."""
    base = F.lit(0)
    expr = F.lit(0)
    for m in range(1, 13):
        expr = F.when(month == m, F.lit(_DAYS_IN_MONTH[m])).otherwise(expr)
    expr = F.when((month == 2) & is_leap_year_ref(year), F.lit(29)).otherwise(expr)
    return F.when((month <= 0) | (month > 12), base).otherwise(expr)


def month_name(col: Column) -> Column:  # D6 (date.py:86-94)
    return F.date_format(col, "MMMM")


def month_abbreviation(col: Column) -> Column:  # D6 (date.py:97-105)
    return F.date_format(col, "MMM")
