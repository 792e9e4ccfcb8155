"""Degenerate-input sweep: every catalog query must survive empty and
near-empty tables (r7 verdict ask #3).

The oracle gate at sf0.01 can never see the empty-relation edge cases —
ta20's N_MERGES<8 hazard (fixed r7, ADVICE.md) proved the class is real.
This sweep rebuilds the full ten-table layout seven ways and runs every
registered query against each:

  * ``empty``        — 0-row parquet, schemas byte-identical to the
                       driver's (pyarrow slice(0,0) of sf0.001);
  * ``one_row``      — exactly the first row of each table (joins mostly
                       miss, groups are singletons, windows are width-1);
  * ``null_payload`` — one row per table with every NON-KEY column NULL
                       (keys kept so the layout is realistic: a warehouse
                       never nulls primary keys, but every payload column
                       is nullable and WILL be null at 100 TB);
  * ``empty_facts``  — fact tables (orders/lineitem/events/documents/
                       embeddings) 0-row, dimensions populated: the
                       day-one-deploy shape that exercises joins with
                       exactly one empty side, broadcasts of real dims
                       into nothing, and aggregates over empty facts.
  * ``clones``       — every table is its first row repeated 64x, ALL
                       keys identical: the extreme-duplication shape
                       (join fan-out n x m on one key, every window a
                       single all-tied frame, every LSH bucket maximally
                       hot) that exercises tie-breaking and hot-bucket
                       caps.
  * ``maxvals``      — one row per table with every payload column at a
                       MAGNITUDE extreme (r8 verdict ask #3): int64
                       counters at 2^62, int32s at 2^31-1, money doubles
                       at the largest double that casts into
                       DECIMAL(18,2) (9999999999999998.0), [0,1]-rate
                       columns at 1.0, timestamps at year 9998 (and
                       l_shipdate at 1583 for the far-past side — the
                       round-trippable edges, see _maxvals_value),
                       documents.text at ~1 MB of distinct tokens, other
                       strings at 64 KB, embeddings alternating
                       +/-FLT_MAX.  Under ANSI mode any unguarded
                       overflow (cast, sum, multiply) is a crash — this
                       layout pins the overflow-bound ARGUMENTS
                       (e.g. olap3.py w13's v*cnt_lt bound) the way the
                       null_payload layout pinned the division class.

  * ``unicode_payload`` — one row per table with every STRING payload
                       column carrying CJK + astral emoji + modifier
                       sequences + RTL + NFD combining marks +
                       U+3000 (r10): no query may assume ASCII in any
                       string column (props stays valid JSON).

Contract: the query returns a DataFrame whose collect() succeeds.  No
row-count assertions — a global aggregate legitimately returns one row of
NULL/0 over an empty fact table; the point is no crash, no hang, and a
resolvable schema.
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from youtube_data_lakehouse_and_analysis_spark.catalog import TABLES

SRC = pathlib.Path("/root/testdata/sf0.001")

_KEY_COLS = {
    "c_custkey", "c_nationkey", "doc_id", "vec_id", "event_id", "user_id",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "n_nationkey",
    "n_regionkey", "o_orderkey", "o_custkey", "p_partkey", "r_regionkey",
    "s_suppkey", "s_nationkey",
}


def _null_payload_row(table: pa.Table) -> pa.Table:
    one = table.slice(0, 1)
    cols = []
    for field in one.schema:
        if field.name in _KEY_COLS:
            cols.append(one.column(field.name))
        else:
            cols.append(pa.nulls(1, field.type))
    return pa.table(cols, schema=one.schema)


_FACT_TABLES = {"orders", "lineitem", "events", "documents", "embeddings"}

# --- maxvals layout ---------------------------------------------------------

_RATE_COLS = {"l_discount", "l_tax"}  # [0,1] domain: extreme is 1.0
_FAR_PAST_COLS = {"l_shipdate"}  # year-1 side of the timestamp extreme
_DEC18_2_MAX_DOUBLE = 9999999999999998.0  # largest double fitting DECIMAL(18,2)
_FLT_MAX = 3.4028234663852886e38  # float32 max ("+/-inf-adjacent")
_BIG_TEXT = " ".join(f"w{i}" for i in range(140_000))  # ~1 MB, distinct tokens
_BIG_STR = "x" * 65_536


def _maxvals_value(field: pa.Field, table_name: str):
    import datetime

    t = field.type
    if field.name in _RATE_COLS:
        return pa.array([1.0], t)
    if pa.types.is_timestamp(t):
        # Temporal extremes are the edges of the ROUND-TRIPPABLE range,
        # not the storage range (r10): pyspark's driver-side conversion
        # rebases zoned timestamps through the hybrid Julian/Gregorian
        # calendar, so instants before 1582-10-15 land in year 0 — below
        # Python datetime's floor — and Python's year-9999 ceiling means
        # any +interval arithmetic on a 9999-12-31 value (due dates,
        # +3 months, session-window ends) is unrepresentable at collect
        # regardless of plan.  1583-01-01 / 9998-12-01 keep full
        # magnitude pressure while leaving ≥ 13 months of arithmetic
        # headroom; both documented limits are pyspark/Python driver
        # boundaries, not plan bugs.
        dt = (
            datetime.datetime(1583, 1, 1, 0, 0, 0)
            if field.name in _FAR_PAST_COLS
            else datetime.datetime(9998, 12, 1, 23, 59, 59)
        )
        return pa.array([dt], t)
    if pa.types.is_float64(t):
        return pa.array([_DEC18_2_MAX_DOUBLE], t)
    if pa.types.is_int64(t):
        return pa.array([2**62], t)
    if pa.types.is_int32(t):
        return pa.array([2**31 - 1], t)
    if pa.types.is_string(t):
        if field.name == "text":
            return pa.array([_BIG_TEXT], t)
        if field.name == "props":
            return pa.array(['{"k":"' + _BIG_STR + '"}'], t)
        return pa.array([_BIG_STR], t)
    if pa.types.is_list(t):
        return pa.array([[(_FLT_MAX if i % 2 == 0 else -_FLT_MAX) for i in range(64)]], t)
    raise AssertionError(f"maxvals: unhandled type {t} for {table_name}.{field.name}")


def _maxvals_row(table: pa.Table, name: str) -> pa.Table:
    one = table.slice(0, 1)
    cols = []
    for field in one.schema:
        if field.name in _KEY_COLS:
            cols.append(one.column(field.name))
        else:
            cols.append(_maxvals_value(field, name))
    return pa.table(cols, schema=one.schema)


# --- unicode_payload layout --------------------------------------------------

# Every STRING payload column carries the full hazard mix: CJK, an astral
# emoji, a skin-tone modifier sequence, RTL Arabic, a combining mark (NFD),
# and an ideographic space.  The separate unicode sweep
# (tests/test_unicode_text.py) proves ORACLE PARITY for the documents
# queries; this layout proves CRASH-SAFETY for every query whose string
# columns (names, event types, markets, JSON props, …) a real corpus
# would eventually fill with non-ASCII — no query may assume ASCII in any
# string column (r10).
_UNI_MIX = "数据湖 😀 👍🏽 مرحبا é　spark"


def _unicode_value(field: pa.Field, one: pa.Table, name: str):
    if not pa.types.is_string(field.type):
        return one.column(field.name)
    if field.name == "props":
        # stays valid JSON: extraction paths must yield NULL via try_cast,
        # not crash, when $.k holds non-numeric unicode
        return pa.array(['{"k":"' + _UNI_MIX + '"}'], field.type)
    return pa.array([_UNI_MIX + " " + field.name], field.type)


def _unicode_row(table: pa.Table, name: str) -> pa.Table:
    one = table.slice(0, 1)
    cols = []
    for field in one.schema:
        if field.name in _KEY_COLS:
            cols.append(one.column(field.name))
        elif field.name == "n_chars":
            # keep the metadata invariant n_chars == code-point length
            text = _UNI_MIX + " text"
            cols.append(pa.array([len(text)], field.type))
        else:
            cols.append(_unicode_value(field, one, name))
    return pa.table(cols, schema=one.schema)


@pytest.fixture(scope="session")
def degenerate_dirs(tmp_path_factory) -> dict[str, str]:
    root = tmp_path_factory.mktemp("degenerate")
    dirs = {}
    for kind in ("empty", "one_row", "null_payload", "empty_facts", "clones", "maxvals", "unicode_payload"):
        d = root / kind
        d.mkdir()
        dirs[kind] = str(d)
    for name in TABLES:
        src = pq.read_table(SRC / f"{name}.parquet")
        pq.write_table(src.slice(0, 0), f"{dirs['empty']}/{name}.parquet")
        pq.write_table(src.slice(0, 1), f"{dirs['one_row']}/{name}.parquet")
        pq.write_table(_null_payload_row(src), f"{dirs['null_payload']}/{name}.parquet")
        facts_slice = src.slice(0, 0) if name in _FACT_TABLES else src
        pq.write_table(facts_slice, f"{dirs['empty_facts']}/{name}.parquet")
        pq.write_table(pa.concat_tables([src.slice(0, 1)] * 64), f"{dirs['clones']}/{name}.parquet")
        pq.write_table(_maxvals_row(src, name), f"{dirs['maxvals']}/{name}.parquet")
        pq.write_table(_unicode_row(src, name), f"{dirs['unicode_payload']}/{name}.parquet")
    return dirs


# Per-(query, layout) wall-clock bound.  One row per table means any run
# beyond this is a complexity bug, not load: the maxvals 1 MB document
# exposed an O(L²)-per-row class (expressions re-evaluated per lambda
# element; substr's per-call code-point scan) that turned single queries
# into hours — a bound converts a future regression of that class into a
# fast, attributable failure instead of a hung suite (r10).
_COLLECT_TIMEOUT_S = 120


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_degenerate_inputs(spark, degenerate_dirs, name):
    import signal

    fn = entrymod.queries()[name]
    prev = signal.signal(signal.SIGALRM, _alarm)
    try:
        for kind, d in degenerate_dirs.items():
            signal.alarm(_COLLECT_TIMEOUT_S)
            try:
                df = fn(spark, d)
                rows = df.collect()
            except _Timeout:
                spark.sparkContext.cancelAllJobs()
                raise AssertionError(
                    f"{name} exceeded {_COLLECT_TIMEOUT_S}s on {kind} input — "
                    "super-linear blow-up on a one-row layout"
                ) from None
            except Exception as exc:  # noqa: BLE001 — rewrap with fixture context
                raise AssertionError(f"{name} crashed on {kind} input: {exc}") from exc
            finally:
                signal.alarm(0)
            assert isinstance(rows, list), (name, kind)
            assert df.schema is not None
    finally:
        signal.signal(signal.SIGALRM, prev)


def test_ts03_multi_extreme_frame_oracle_parity(spark, tmp_path):
    """ts03's cross-multiplied z-score must stay exact — and oracle-equal —
    when a single 10-row frame is FULL of magnitude-extreme cents rows
    (r12, closing the r11 ADVICE item).  The maxvals layout plants one
    extreme row per table, so every frame held at most one ~1e18-scale
    product; here one user gets 12 rows alternating ±2.5e17 cents (the
    documented |cents| bound, value = ±$2.5e15), driving every
    intermediate to its ceiling: |dev| ≤ 5e18, dev² ≤ 2.5e37,
    4·n·Q ≤ 2.5e37 — representable in DECIMAL(38,0)/HUGEINT but far past
    BIGINT, so the pre-r12 form (n*cents and dev*dev in BIGINT) crashes
    under ANSI on exactly this shape."""
    import datetime

    d = tmp_path / "extreme_frames"
    d.mkdir()
    for name in TABLES:
        src = pq.read_table(SRC / f"{name}.parquet")
        if name != "events":
            pq.write_table(src.slice(0, 1), str(d / f"{name}.parquet"))
            continue
        schema = src.schema
        n_rows = 12
        bound = 2.5e15  # dollars; floor(value*100) = ±2.5e17 cents
        rows = {
            "event_id": list(range(n_rows)),
            "ts": [datetime.datetime(2024, 1, 1, 0, i) for i in range(n_rows)],
            "user_id": [7] * n_rows,
            "event_type": ["error"] * n_rows,
            # constant +bound with two -bound spikes: constant frames
            # give dev = 0, var = 0 (not anomalous), while each spike is
            # a >2σ outlier in its low-variance frame — both outcomes
            # occur, and the spike frames drive |dev| to ~4.5e18 and the
            # moment products to ~2e37 (BIGINT-impossible, decimal-safe)
            "value": [(-bound if i in (5, 9) else bound) for i in range(n_rows)],
            "props": ['{"k": 1}'] * n_rows,
        }
        pq.write_table(
            pa.table({f.name: pa.array(rows[f.name], f.type) for f in schema}, schema=schema),
            str(d / "events.parquet"),
        )

    import duckdb

    from tests.oracle_util import assert_matches_oracle

    sdf = entrymod.queries()["ts03_rolling_zscore"](spark, str(d))
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        assert_matches_oracle(sdf, con, entrymod.oracle_sql()["ts03_rolling_zscore"])
    finally:
        con.close()
    # the layout must actually exercise both decisions on full frames
    flags = {r["is_anomaly"] for r in sdf.collect() if r["n"] >= 5}
    assert flags == {True, False}, flags
