"""Runtime bloom-filter join pruning (semi-join reduction).

When a big-big shuffle join has a selective predicate on one side,
Catalyst can build a bloom filter over the selective side's join keys at
runtime and push `might_contain(key)` into the other side's scan stage —
rows that cannot match are dropped BEFORE the shuffle, which at 100 TB is
the difference between shuffling the whole fact table and shuffling the
few % that survive. This is Spark's built-in runtime filtering
(`spark.sql.optimizer.runtime.bloomFilter.*`); this module pins the knobs
and gives them an explicit, test-asserted surface.

The reference has no notion of this (its one join runs in MySQL over a
handful of rows, app.py:517-526); at our target scale it's load-bearing.

Semantics are unchanged (bloom filters have no false negatives) — so
there is no oracle query for this operator; `tests/test_plans.py`
asserts both the plan shape (might_contain on the probe side) and result
equality with the filter disabled.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Defaults tuned for local[32] test scale: inject whenever the creation
# side is plausible and the probe side scans at least 1 KB. On a real
# cluster keep Spark's defaults (10 MB creation / 10 GB probe) — tiny
# probe sides don't repay the filter's build+broadcast cost.
_LOCAL_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
}


def enable_runtime_bloom(spark: SparkSession, local_scale: bool = True) -> dict[str, str]:
    """Turn on runtime bloom-filter injection; returns the previous conf
    values so callers (tests) can restore them."""
    prev: dict[str, str] = {}
    confs = (
        _LOCAL_CONFS
        if local_scale
        else {"spark.sql.optimizer.runtime.bloomFilter.enabled": "true"}
    )
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None  # type: ignore[assignment]
        spark.conf.set(k, v)
    return prev


def restore_confs(spark: SparkSession, prev: dict[str, str]) -> None:
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
