"""SparkSession factory tuned for the driver's local[32] harness while
remaining cluster-correct: every setting below is either scale-neutral or
the documented best practice for a large multi-executor deployment.

Scale notes (100 TB design):
  * AQE on — runtime coalescing, skew-join splitting, dynamic broadcast.
  * shuffle.partitions — sized to cores locally; on a real cluster AQE
    coalesces from a high initial number, so the literal value is a local
    concern only.
  * session timezone pinned UTC — the reference parses zoned timestamps
    (/root/reference/app.py:335,383) and the DuckDB oracle hashes naive-UTC
    timestamps, so both engines must agree.
  * Arrow enabled — fast toPandas()/pandas_udf exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "youtube_lakehouse_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Adopted r14 (SCALE.md "partition knee", tools/ab_partitions.py):
        # shuffles START at 256 partitions and AQE coalesces back toward
        # core-count parallelism (parallelismFirst stays default true).
        # Measured: frozen headline at sf0.1 10.53 -> 9.50 s (5
        # interleaved reps/query, quiet box) — the shuffle-heavy queries
        # win (j05 1.25->0.96, q09 1.18->0.96) — and the longdocs x64
        # exploded stages ~2x (259 -> 139/111 s, r13).  On a real
        # cluster a high initial count + AQE coalesce is standard
        # posture; the size-only variant (parallelismFirst=false)
        # measured 12.65 s at sf0.1 and is deliberately NOT used.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "256"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
