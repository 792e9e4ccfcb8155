"""Physical-plan quality gates: the optimizations that matter at 100 TB
must be visible in the plan — parquet filter/column pushdown, broadcast
joins for dims, top-k without global sort, whole-stage codegen."""

from __future__ import annotations

import __spark_entry__ as entrymod

from .conftest import SF_DIR

QUERIES = entrymod.queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q01_filter_pushdown(spark):
    plan = formatted(spark, "q01_project_filter")
    assert "PushedFilters: [IsNotNull(c_name)]" in plan
    # column pruning: only c_name read
    assert "ReadSchema: struct<c_name:string>" in plan


def test_q03_topk_no_global_sort(spark):
    plan = plan_of(spark, "q03_topk_orders")
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no full sort


def test_j05_dims_broadcast(spark):
    plan = plan_of(spark, "j05_star_join")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_q05_window_single_shuffle(spark):
    plan = plan_of(spark, "q05_groupwise_max_window")
    # one exchange for the window partitioning; the final orderBy adds a
    # range exchange — but no join-related exchanges
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q08_year_predicate_reaches_scan(spark):
    plan = formatted(spark, "q08_distinct_year")
    # year(ts)=k must at least push IsNotNull + be applied pre-aggregation
    assert "PushedFilters" in plan
    assert "Scan parquet" in plan


def test_wholestage_codegen_on_agg(spark):
    df = QUERIES["a01_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE only materializes codegen spans in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert "*(" in plan, plan[:500]


def test_j01_partial_aggregation(spark):
    """The join-then-agg must partial-aggregate before the final shuffle
    (HashAggregate appears twice: partial + final)."""
    plan = plan_of(spark, "j01_inner_join_agg")
    assert plan.count("HashAggregate") >= 2
