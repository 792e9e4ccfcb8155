"""Driver-hashability gate for every oracle SQL output column.

The driver's correctness harness hashes result values dtype-sensitively:
DuckDB HUGEINT (the default result of integer SUM — plain, FILTER, CASE,
and windowed) hashes differently from Spark's BIGINT even when values are
identical, and LIST/STRUCT/MAP columns raise ``unhashable type`` in its
hasher outright. Round 1 lost four green queries to exactly this (dd05,
ses01, f12, f13), with six more latent.

This test converts that lesson into a permanent invariant: every
``oracle_sql()`` entry is planned under DuckDB with ``LIMIT 0`` (schema
only — no data scanned, so the full registry checks in well under a
second) and every output column must be one of the driver-hashable
scalar types. Any new query whose oracle emits HUGEINT or a nested type
fails here before the driver ever samples it.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

# Types whose Python-side values hash identically between a Spark collect()
# and a DuckDB fetchall(): plain ints/floats/strings/dates/bools. TIMESTAMP
# and TIMESTAMP_NS both surface as datetime (events.ts is TIMESTAMP_NS at
# the source and passed the round-1 driver as-is: as01/scd01).
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "BOOLEAN",
}

ORACLES = sorted(entry.oracle_sql().items())


@pytest.fixture(scope="module")
def schema_con():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name,sql", ORACLES, ids=[n for n, _ in ORACLES])
def test_oracle_output_dtypes_are_driver_hashable(schema_con, name, sql):
    rel = schema_con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} are not driver-hashable "
        f"(allowed: {sorted(ALLOWED)}). CAST integer SUMs to BIGINT and "
        f"serialize LIST/STRUCT outputs to VARCHAR on both engines."
    )
