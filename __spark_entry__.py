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
# in dict order.  Round 8 finishes the gate-surface rotation: (a) the 11
# late-round-7 queries the r7 verdict queued (its ask #1) — after this
# sample, EVERY oracled query in the catalog has been driver-sampled at
# least once; (b) the queries whose code changed in round 8 (ADVICE.md
# fixes: w13's Gini normalization — listed in (a) — and the d04/d06/d10
# channel_name projection); (c) spot re-checks weighted toward the
# operators changed most recently (gr03 degree-oriented rewrite, sk02
# two-phase top-K, the checkpoint-fed histogram-CDF forms) plus a spread
# across every query family (joins, aggs, windows, dedup, ANN, events,
# TPC-H, SCD/CDC, text, pandas-ops).
_SAMPLE_PRIORITY = [
    # --- (a) the 11 queued late-r7 queries (r7 verdict ask #1) ---
    "ta19a_lm_gate_histogram", "ta19b_lm_gate_agreement",
    "ia03_incremental_lsh_index", "gr04_kcore_peel",
    "sim14_index_balance", "sim15_margin_knn", "sim16_hard_negatives",
    "sm10_length_bucketed_batches", "sk04_theta_a_not_b",
    "w13_gini_concentration", "dq04_column_profile",
    # --- (b) changed in round 8 (ADVICE.md: channel_name projection) ---
    "d04_comments_per_video", "d06_likes_top10", "d10_top10_commented",
    # --- (c) queries whose code changed later in round 8 (degenerate-
    # input hardening: try_divide/NULLIF guards, NULL-safe workers; the
    # HLL small-range correction; mm03's new oracle) ---
    "a09_exact_moments", "a11_corr_stats", "f14_map_ops",
    "w09_sliding_median", "sk01_hll_from_scratch",
    "mm02_decode_features", "mm03_frame_sample", "mm04_modality_budget",
    "mm06_modality_packing",
    "pd01_group_regression", "pd03_grouped_agg_udf", "pd04_map_in_arrow",
    "sim01_bruteforce_topk", "sim09_ann_recall", "sim10_multiprobe_recall",
    "ta19_lm_quality_gate", "pp02_llm_corpus_build",
    # --- (d) re-checks: r7-changed operators + family spread ---
    "gr03_triangle_count", "sk02_kmv_set_ops",
    "sm07a_histogram_cdf_sampling", "sm07b_cdf_ntile_agreement",
    "ev10a_rfm_segments_approx", "ev10b_rfm_agreement",
    "w08a_global_price_quartile", "w08b_global_quartile_agreement",
    "q05_groupwise_max", "a01_pricing_summary", "w01_topk_per_group",
    "j05_star_join", "dd01_exact_dedup", "dd08_canonical_corpus",
    "ev01_funnel", "ses01_gap_sessions", "scd01_scd2_history",
    "mg01_apply_changes", "h08_market_share",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _SAMPLE_PRIORITY}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
