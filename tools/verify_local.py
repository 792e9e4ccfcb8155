"""Local replica of the driver's correctness gate.

For every entry in __spark_entry__.queries(), run the Spark DataFrame and the
DuckDB oracle SQL at the given sf dir, then compare:
  * row count
  * column names (sorted)
  * order-insensitive value comparison (strict equality after canonicalizing
    timestamps to naive-UTC and floats bit-for-bit)

This is intentionally STRICTER than any plausible driver hash — if this
passes, the driver's comparison passes.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")


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
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    spark = get_spark("verify_local")
    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[2:])
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sm = rows_multiset(scols, [tuple(r) for r in srows])
            dm = rows_multiset(dcols, drows)
            if sm != dm:
                diff_i = next(i for i, (a, b) in enumerate(zip(sm, dm)) if a != b) if len(sm) == len(dm) else -1
                problems.append(
                    f"values differ (first diff at sorted idx {diff_i}): "
                    f"spark={sm[diff_i] if diff_i >= 0 else sm[:2]} "
                    f"duckdb={dm[diff_i] if diff_i >= 0 else dm[:2]}"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
