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
# in dict order.  Round 14 front-loads (a) the four pair-machinery
# queries whose code changed this round — the spill-leg AllPairs filter
# now keys on a 128-bit (dual-seeded xxhash64) pair instead of a single
# 64-bit hash, touching dd04/dd18/dd22 directly and dd21 via
# jaccard_truth_pairs — then (b) the 20 queries whose latest driver row
# is r7 and (c) the 26 alphabetically-first of the 46 r8 rows, computed
# mechanically from CORRECTNESS_r01..r13 (latest-round histogram before
# this rotation: r7:20, r8:46, r9:44, r11:46, r12:50, r13:50).  After
# this round no sampled query's driver evidence is older than r8, and
# the r15 rotation continues the drain mechanically: the 20 remaining
# r8 rows (sim01, sim09, sim10, sim14, sim15, sim16, sk01, sk02, sk04,
# sm07a, sm07b, sm10, ta19, ta19a, ta19b, w01, w08a, w08b, w09, w13)
# + the 30 alphabetically-first r9 rows (a02, a04-a08, as01, as02,
# cdc01, dd06, dd10, dq01, ev02, ev04-ev06, f10-f13, fe01, ia01, ir01,
# j07, q01-q06 incl. q05w) + any r15-changed queries; r16 takes the
# last 14 r9 rows and whatever then remains oldest.  Queries outside
# the sample are covered by the local strict sweep
# (tools/verify_local.py).
_SAMPLE_PRIORITY = [
    # --- code changed in r14 (128-bit spill-leg keys) ---
    "dd04_jaccard_pairs", "dd18_containment_pairs",
    "dd21_lsh_band_eval", "dd22_jaccard_pairs_strict",
    # --- last sampled r7 (all 20) ---
    "dq03_vintage_drift", "ev10_rfm_segments", "ev12_dau_wau",
    "ev13_cohort_ltv", "ev14_time_decay_scores", "fe03_quality_classifier",
    "gr02_butterfly_count", "h17_small_qty_avg_yearly",
    "h18_large_volume_topk", "ir02_bm25", "scd02_point_in_time",
    "sim11_pq_topk", "sim12_ivfpq_topk", "sim13_pq_recall",
    "sk03_countmin_heavy_hitters", "sm08_epoch_shuffle_manifest",
    "sm09_dsir_affinity", "ta17_langid_confusion", "ta18_keywords",
    "w12_pareto_curve",
    # --- last sampled r8 (alphabetically first 26 of 46) ---
    "a01_pricing_summary", "a11_corr_stats", "d04_comments_per_video",
    "d06_likes_top10", "d10_top10_commented", "dq04_column_profile",
    "ev01_funnel", "ev10a_rfm_segments_approx", "ev10b_rfm_agreement",
    "f14_map_ops", "gr03_triangle_count", "gr04_kcore_peel",
    "h08_market_share", "ia03_incremental_lsh_index", "j05_star_join",
    "mg01_apply_changes", "mm02_decode_features", "mm03_frame_sample",
    "mm04_modality_budget", "mm06_modality_packing",
    "pd01_group_regression", "pd03_grouped_agg_udf", "pd04_map_in_arrow",
    "q05_groupwise_max", "scd01_scd2_history", "ses01_gap_sessions",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _SAMPLE_PRIORITY}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
