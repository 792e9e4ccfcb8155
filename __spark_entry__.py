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
# in dict order.  Round 10 keeps the r9 staleness rotation policy but
# front-loads the two queries whose SPARK PLANS changed this round
# (dd18/dd04 prefix-filtered candidate generation — output contract
# unchanged, so driver hash-parity on the new plans is the evidence that
# matters most), then fills with the 48 queries whose most recent
# CORRECTNESS_r{N} row is oldest: the full 33-query r4 remainder plus the
# first 15 (name order) of the r5 cohort.  Computed mechanically from
# CORRECTNESS_r01..r09 (max round per query, sort ascending by
# (round, name)); after this rotation no oracled query's latest driver
# row is older than r5.  Queries changed in round 10 but outside this
# sample are covered by the local strict sweep (tools/verify_local.py)
# and queue for the r11 rotation.
_SAMPLE_PRIORITY = [
    # --- Spark plan changed in r10 (prefix filtering; last driver r7/r9) ---
    "dd18_containment_pairs", "dd04_jaccard_pairs",
    # --- last driver-sampled in r4 (33 queries) ---
    "a12_grouping_id",
    "a13_histogram", "h02_best_supplier_per_part", "h04_order_priority_check",
    "h06_forecast_revenue", "h07_volume_shipping", "h09_product_profit",
    "h10_returned_items", "h11_important_stock", "h12_priority_by_status",
    "h13_customer_distribution", "h14_promo_revenue", "h15_top_supplier",
    "h16_parts_supplier_counts", "h19_disjunctive_revenue", "h20_potential_promotion",
    "h21_waiting_suppliers", "h22_idle_rich_customers", "p02_unpivot",
    "s01_union_all", "s02_intersect", "s03_except",
    "s04_union_distinct", "s05_bag_set_ops", "sim02_lsh_ann_topk",
    "ta01_token_stats", "ta05_bpe_token_count", "w02_running_sum",
    "w03_lag_lead", "w04_rank_flavors", "w05_sliding_avg",
    "w07_range_frame", "w08_ntile_buckets",
    # --- last driver-sampled in r5 (first 15 by name) ---
    "a10_mode_per_user",
    "dd09_repeated_ngrams", "evj01_interval_join", "f01_duration_parse",
    "j01_inner_join_agg", "j02_left_join_count", "j03_semi_join",
    "j04_anti_join", "j06_cross_join", "j08_full_outer_join",
    "j09_shipping_priority", "j10_not_in_subquery", "j11_local_supplier_volume",
    "j12_large_volume_customer", "j13_exists_subquery",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _SAMPLE_PRIORITY}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
