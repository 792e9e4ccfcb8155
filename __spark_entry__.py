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


# The driver correctness gate samples the FIRST 50 entries of queries()
# in dict order.  Round 15 continues the evidence drain prescribed in
# r13/r14 and recomputed mechanically from CORRECTNESS_r01..r14
# (latest-round histogram before this rotation: r8:20, r9:44, r11:46,
# r12:46, r13:50, r14:50).  Front-loaded: (a) the four pair-machinery
# queries — r15 factors the jaccard t/ts bound derivation out of
# jaccard_pairs into a shared helper (also used by tools/tau_knee.py),
# touching dd04/dd18/dd22 directly and dd21 via jaccard_truth_pairs —
# plus the NEW dd23 (residual-LSH blocked near-dup) — then (b) all 20
# remaining r8 rows and (c) the 25 alphabetically-first of the 44 r9
# rows.  After this round no sampled query's driver
# evidence is older than r9; r16 takes the remaining 19 r9 rows
# (q02, q03, q04, q05w, q06, q07-q11, rj01, sim04, sj01, sm01, sm04,
# ta09, ta10, u01, w06) and whatever then remains oldest.  Queries
# outside the sample are covered by the local strict sweep
# (tools/verify_local.py).
_SAMPLE_PRIORITY = [
    # --- new in r15 (residual-LSH blocked near-dup, SCALE.md
    # "SemDeDup blocking") + code changed in r15 (shared jaccard
    # bound derivation) ---
    "dd23_residual_blocked_near_dup",
    "dd04_jaccard_pairs", "dd18_containment_pairs",
    "dd21_lsh_band_eval", "dd22_jaccard_pairs_strict",
    # --- last sampled r8 (all 20) ---
    "sim01_bruteforce_topk", "sim09_ann_recall", "sim10_multiprobe_recall",
    "sim14_index_balance", "sim15_margin_knn", "sim16_hard_negatives",
    "sk01_hll_from_scratch", "sk02_kmv_set_ops", "sk04_theta_a_not_b",
    "sm07a_histogram_cdf_sampling", "sm07b_cdf_ntile_agreement",
    "sm10_length_bucketed_batches", "ta19_lm_quality_gate",
    "ta19a_lm_gate_histogram", "ta19b_lm_gate_agreement",
    "w01_topk_per_group", "w08a_global_price_quartile",
    "w08b_global_quartile_agreement", "w09_sliding_median",
    "w13_gini_concentration",
    # --- last sampled r9 (alphabetically first 26 of 44) ---
    "a02_count_distinct", "a04_rollup", "a05_cube", "a06_having",
    "a07_minmax_stats", "a08_grouping_sets", "as01_asof_join",
    "as02_asof_tolerance", "cdc01_snapshot_diff", "dd06_embedding_near_dup",
    "dd10_decontaminate", "dq01_expectations", "ev02_retention_cohorts",
    "ev04_last_touch", "ev05_timed_conversion", "ev06_transition_matrix",
    "f10_fill_with_first", "f11_percentiles", "f12_array_agg_sorted",
    "f13_higher_order", "fe01_feature_hashing", "ia01_incremental_agg",
    "ir01_keyword_topk", "j07_like_dim_join", "q01_project_filter",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _SAMPLE_PRIORITY}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
