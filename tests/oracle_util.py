"""Shared oracle-comparison helpers for tests: strict order-insensitive
equality between a Spark DataFrame and a DuckDB result (same canon rules as
tools/verify_local.py — if these pass, the driver's weaker hash passes)."""

from __future__ import annotations

import datetime as dt
import math


def canon(v):
    # Tag every value so sort keys are totally ordered even when a column
    # mixes NULLs with values (e.g. ROLLUP grouping keys).
    if v is None:
        return ("0none",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, canon(x)) for k, x in v.items())))
    if isinstance(v, bytes):
        return ("bin", v)
    return ("other", str(v))


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def assert_matches_oracle(sdf, ddb, sql: str):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount spark={len(srows)} duckdb={len(drows)}"
    assert sorted(scols) == sorted(dcols), f"columns spark={sorted(scols)} duckdb={sorted(dcols)}"
    sm = rows_multiset(scols, srows)
    dm = rows_multiset(dcols, drows)
    assert sm == dm, f"value mismatch; first spark rows={sm[:3]} duckdb={dm[:3]}"
