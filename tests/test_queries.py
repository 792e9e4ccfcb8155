"""Every registered query must match its DuckDB oracle at sf0.001 (strict
order-insensitive value equality). Queries without an oracle must at least
run and return a stable schema."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .conftest import SF_DIR
from .oracle_util import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["l_orderkey", "l_linenumber", "l_extendedprice"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    if name in ORACLE:
        assert_matches_oracle(sdf, ddb, ORACLE[name])
    else:
        rows = sdf.collect()
        assert isinstance(rows, list)
        assert len(sdf.columns) > 0


def test_q5_tie_semantics(spark):
    """Q5 keeps ALL rows tied for the per-group max (reference join form,
    /root/reference/app.py:519-525): every returned row's price equals its
    group max, and both Q5 forms agree."""
    a = QUERIES["q05_groupwise_max"](spark, SF_DIR)
    b = QUERIES["q05_groupwise_max_window"](spark, SF_DIR)
    sa = sorted(map(tuple, a.collect()))
    sb = sorted(map(tuple, b.collect()))
    assert sa == sb


def test_reference_workload_sql_twins(spark):
    """S8/C4 (SURVEY §2): the reference workload must be runnable through
    BOTH APIs — every q-series oracle SQL is ANSI enough to execute
    unmodified via spark.sql over the registered views, and its result
    must equal the DataFrame form's (same engine, so plain value
    equality; the cross-engine check is test_queries' oracle gate)."""
    from youtube_data_lakehouse_and_analysis_spark.catalog import register_views

    register_views(spark, SF_DIR)

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    for name in sorted(q for q in QUERIES if q.startswith("q") and q in ORACLE):
        df_form = QUERIES[name](spark, SF_DIR)
        sql_form = spark.sql(ORACLE[name])
        assert canon(df_form) == canon(sql_form), name


def test_sql_pipe_syntax_parity(spark):
    """Spark 4 SQL pipe syntax (|>) is part of the engine's SQL surface:
    the piped form of the q09 aggregation must equal the DataFrame form
    exactly (same engine, so plain value equality)."""
    from youtube_data_lakehouse_and_analysis_spark.catalog import register_views

    register_views(spark, SF_DIR)
    piped = spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity IS NOT NULL
        |> AGGREGATE COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE) AS avg_qty
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )
    from pyspark.sql import functions as F

    li = spark.table("lineitem").filter(F.col("l_quantity").isNotNull())
    expect = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) / F.count("*"))
            .cast("double")
            .alias("avg_qty"),
        )
        .orderBy("l_returnflag")
    )
    assert [tuple(r) for r in piped.collect()] == [tuple(r) for r in expect.collect()]
