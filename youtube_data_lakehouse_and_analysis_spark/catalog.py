"""Testdata catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under a scale-factor dir.

At 100 TB these would be partitioned/bucketed managed tables; reading by
explicit path keeps the same DataFrame surface. Column pruning and filter
pushdown reach the parquet scan either way (verified in tests via
.explain("formatted") — PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The DuckDB oracle hashes naive-UTC timestamps; pin the session zone so
    # results agree even when the caller's JVM default zone is not UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects. Read nanos as long (session-settable legacy
        # conf) and truncate to microseconds — the same truncation DuckDB's
        # TIMESTAMP_NS → Python datetime conversion applies, so oracle
        # comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (mirrors the DuckDB
    oracle environment, where the same names are pre-registered)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
