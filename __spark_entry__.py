"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``youtube_data_lakehouse_and_analysis_spark``;
this module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import youtube_data_lakehouse_and_analysis_spark.plans  # noqa: F401 — registers all query modules
from youtube_data_lakehouse_and_analysis_spark.plans.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q5 groupwise-max (the reference's only join+agg,
    /root/reference/app.py:517-526) on sf0.001."""
    return QUERIES["q05_groupwise_max"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
