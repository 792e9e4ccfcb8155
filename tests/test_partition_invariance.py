"""Partition-count invariance for the accumulation-sensitive queries.

The catalog's determinism story (README §Determinism) rests on claims of
order-independent accumulation: exact integer/decimal partial sums, float
math only AFTER aggregation, rank tiebreaks total.  Shuffle partition
count is the knob that most directly reorders accumulation (different
partial-sum groupings, different merge orders), so this test runs the
most float/order-sensitive queries under 3 vs 32 shuffle partitions and
requires bit-identical result multisets.

This is the same property tests/test_sketch_merge.py proves for the
sketch family (merge == recompute under 1/4/32-partition layouts),
applied to the statistics/window/ANN surface.  A query that passes the
DuckDB oracle but fails this test would be a flaky-at-scale bug the
oracle can't see (the oracle only ever runs one partitioning).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .conftest import SF_DIR

# The queries where accumulation order could plausibly leak into values:
# moment statistics, windowed medians/percentiles, float scoring, sketch
# estimates, histogram CDFs.
SENSITIVE = [
    "a09_exact_moments",
    "a11_corr_stats",
    "a13_histogram",
    "a14_median_abs_deviation",
    "f11_percentiles",
    "w09_sliding_median",
    "w13_gini_concentration",
    "sim01_bruteforce_topk",
    "sim06_kmeans_step",
    "sk01_hll_from_scratch",
    "sk02_kmv_set_ops",
    "sk03_countmin_heavy_hitters",
    "sm07a_histogram_cdf_sampling",
    "ta19a_lm_gate_histogram",
    "pd03_grouped_agg_udf",
]


def _multiset(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_partition_count_invariance(spark, name):
    fn = entrymod.queries()[name]
    # vary the AQE initial partition count too: since r14 the session
    # pins initialPartitionNum=256, which takes precedence over
    # shuffle.partitions for coalesced exchanges — without varying it
    # the 3-vs-32 comparison would run 256-vs-256 and prove nothing
    init = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_init = spark.conf.get(init)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set(init, "32")
        wide = _multiset(fn(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set(init, "3")
        narrow = _multiset(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(init, prev_init)
    assert wide == narrow, (
        f"{name}: result depends on shuffle partition count — "
        "accumulation is not order-independent"
    )
