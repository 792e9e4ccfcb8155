"""Bucketed (co-located) joins — the shuffle eliminator for repeated
big-big joins.

At 100 TB the fact-fact join (e.g. lineitem ⋈ orders on orderkey) is the
dominant shuffle: both sides rewrite over the network every run. Writing
both tables bucketed (and sorted) by the join key ONCE moves that cost to
ingestion; every later join reads co-located buckets and sort-merges with
no Exchange at all. The plan-visible contract (asserted in
tests/test_plans.py-style gates): `Exchange` absent above both scans.

Bucket count is a layout decision: pick it so one bucket of the larger
table ≈ one task's memory budget (128–512 MB) at the target scale, and
keep it IDENTICAL on both tables — mismatched bucket counts fall back to
a shuffle on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (+ sorted) managed table. Sorting within
    buckets lets the later sort-merge join skip its sort too."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with identical bucketing on the
    join key — planner elides both exchanges (and both sorts if sorted)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
