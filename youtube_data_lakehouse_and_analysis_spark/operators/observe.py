"""Piggybacked data-quality metrics via the Observation API.

`dq01_expectations` is the standalone validation job; this is the other
deployment mode: attach metric expressions to a DataFrame inside an
EXISTING pipeline job (`df.observe`), and read them off after the action
— row counts, null counts, domain violations cost ZERO extra scans
because they ride the pass the pipeline was already making. At 100 TB
this is the difference between "validation doubles the bill" and
"validation is free"; the standalone job remains for gating a promotion
before any consumer runs.

Metrics are accumulator-style: exact for the counts/sums used here, and
observed on the physical rows the action actually processed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observed(df: DataFrame, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach metrics to `df`; returns (instrumented_df, observation).
    Run any action on the returned DataFrame, then read `observation.get`."""
    obs = Observation()
    return df.observe(obs, *metrics), obs


def standard_quality_metrics(key: str, *domain_checks: Column) -> list[Column]:
    """The default per-batch metric set: row count, null-key count, plus
    caller-supplied boolean violation predicates (counted as count_if)."""
    cols = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col(key).isNull()).alias("n_null_key"),
    ]
    for i, check in enumerate(domain_checks):
        cols.append(F.count_if(check).alias(f"n_violation_{i}"))
    return cols
