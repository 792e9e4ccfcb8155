"""Degenerate-input sweep: every catalog query must survive empty and
near-empty tables (r7 verdict ask #3).

The oracle gate at sf0.01 can never see the empty-relation edge cases —
ta20's N_MERGES<8 hazard (fixed r7, ADVICE.md) proved the class is real.
This sweep rebuilds the full ten-table layout three ways and runs every
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


@pytest.fixture(scope="session")
def degenerate_dirs(tmp_path_factory) -> dict[str, str]:
    root = tmp_path_factory.mktemp("degenerate")
    dirs = {}
    for kind in ("empty", "one_row", "null_payload", "empty_facts", "clones"):
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
    return dirs


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_degenerate_inputs(spark, degenerate_dirs, name):
    fn = entrymod.queries()[name]
    for kind, d in degenerate_dirs.items():
        try:
            df = fn(spark, d)
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001 — rewrap with fixture context
            raise AssertionError(f"{name} crashed on {kind} input: {exc}") from exc
        assert isinstance(rows, list), (name, kind)
        assert df.schema is not None
