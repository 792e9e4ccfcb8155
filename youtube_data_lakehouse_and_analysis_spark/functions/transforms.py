"""The reference's scalar transform library (SURVEY.md §2.8, F1-F9),
re-expressed as composable Spark Column functions — all JVM built-ins, zero
Python UDFs, so every use stays inside whole-stage codegen.

Citations are to /root/reference/app.py (read-only reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iso8601_duration_seconds(col: Column | str) -> Column:
    """F1 — parse ISO-8601 `PT#H#M#S` durations to total seconds
    (app.py:110-126: regexes `(\\d+)H/M/S`, missing component → 0).

    regexp_extract returns '' on no-match; try_cast('' as long) is NULL
    (plain cast throws under ANSI mode); coalesce restores the reference's
    missing-component-is-zero semantics."""
    c = F.col(col) if isinstance(col, str) else col

    def part(pattern: str, mult: int) -> Column:
        return F.coalesce(F.regexp_extract(c, pattern, 1).try_cast("long"), F.lit(0)) * mult

    return (part(r"(\d+)H", 3600) + part(r"(\d+)M", 60) + part(r"(\d+)S", 1)).alias("duration_s")


def parse_zoned_timestamp(col: Column | str) -> Column:
    """F2 — strict zoned parse `%Y-%m-%dT%H:%M:%S%z` (app.py:335, 383)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ssXXX")


def format_date(col: Column | str) -> Column:
    """F3 — lenient parse + `%Y-%m-%d` formatting (app.py:220)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def year_of(col: Column | str) -> Column:
    """F4/F5 — year extraction (app.py:221-223, 564)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(c)


def fill_null_with_constant(col: Column | str, value) -> Column:
    """F7/F9 — `fillna(const)` / `int(x.get(k, 0))` (app.py:224, 310-312)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(value))


def to_long(col: Column | str) -> Column:
    """F8 — `.astype(int)` counter casts; LongType at 100 TB scale
    (app.py:225-233)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("long")


def int_with_default(col: Column | str, default: int = 0) -> Column:
    """F9 — `int(x.get(k, 0))` load-time coercion (app.py:334, 338-341)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("long"), F.lit(default))
