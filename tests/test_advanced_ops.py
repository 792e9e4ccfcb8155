"""Unit tests for the as-of join operator and the custom stateful
streaming operator (beyond the oracle checks in test_queries)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from youtube_data_lakehouse_and_analysis_spark.operators.asof import asof_join
from youtube_data_lakehouse_and_analysis_spark.streaming.stateful import running_user_totals
from youtube_data_lakehouse_and_analysis_spark.streaming.windows import run_to_memory


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_matches_merge_asof(spark):
    left_rows = [(1, _ts(5)), (1, _ts(10)), (1, _ts(2)), (2, _ts(7))]
    right_rows = [(1, _ts(3), 100.0), (1, _ts(10), 200.0), (2, _ts(9), 300.0)]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, px double")
    got = {
        (r["k"], r["ts"]): (r["asof_ts"], r["px"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["px"]).collect()
    }
    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "px"]).sort_values("ts")
    want_pd = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward", suffixes=("", "_r"))
    for _, row in want_pd.iterrows():
        asof_ts, px = got[(row["k"], row["ts"].to_pydatetime())]
        if pd.isna(row["px"]):
            assert px is None and asof_ts is None
        else:
            assert px == row["px"]
    # tie at ts=10 matches the simultaneous right row (ASOF <= semantics)
    assert got[(1, _ts(10))] == (_ts(10), 200.0)
    # left row before any right row → null match
    assert got[(1, _ts(2))] == (None, None)


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(30))], "k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(5), 1.0)], "k long, ts timestamp, px double")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["px"], tolerance="10 minutes"
    ).collect()[0]
    assert out["px"] is None and out["asof_ts"] is None  # 25 min old > 10 min tolerance


def test_stateful_running_totals(spark, tmp_path):
    rows = [
        (1, _ts(0), 10, "click", 1.5, "{}"),
        (2, _ts(1), 10, "view", 2.5, "{}"),
        (3, _ts(2), 11, "click", 4.0, "{}"),
    ]
    src = str(tmp_path / "ev")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    run_to_memory(running_user_totals(stream), "stateful_out", output_mode="update")
    got = {
        r["user_id"]: (r["n_events_total"], r["value_total"])
        for r in spark.sql("SELECT * FROM stateful_out").collect()
    }
    assert got == {10: (2, 4.0), 11: (1, 4.0)}


def test_range_join_matches_naive(spark):
    from youtube_data_lakehouse_and_analysis_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 19.99, 20.0, 55.5, 399.9, 500.0])],
        "pid long, x double",
    )
    iv = spark.createDataFrame(
        [(j, j * 15.0, j * 15.0 + 40.0) for j in range(25)], "band long, lo double, hi double"
    )
    got = {
        (r["pid"], r["band"])
        for r in range_join(pts, iv, point_col="x", lo_col="lo", hi_col="hi", bucket_width=20.0).collect()
    }
    want = {
        (r["pid"], r["band"])
        for r in pts.crossJoin(iv).filter((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))).collect()
    }
    assert got == want and len(got) > 0
    # point outside every interval drops on inner...
    assert not any(p == 6 for p, _ in got)
    # ...but survives left_outer with null band
    lo = range_join(pts, iv, point_col="x", lo_col="lo", hi_col="hi", bucket_width=20.0, how="left_outer")
    assert [r["band"] for r in lo.filter(F.col("pid") == 6).collect()] == [None]


def test_near_dup_pairs_semantics(spark):
    from youtube_data_lakehouse_and_analysis_spark.operators.similarity import near_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),   # near-dup of 1, same cell
        (3, [0.0, 1.0, 0.0, 0.0], 0),      # orthogonal, same cell
        (4, [1.0, 0.0, 0.0, 0.0], 1),      # identical to 1 but other cell -> blocked
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = near_dup_pairs(emb, threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["keep_id"], r["drop_id"]) for r in out] == [(1, 2, 1, 2)]
    assert out[0]["cosine"] > 0.99


def test_salted_join_equals_plain_join(spark):
    from youtube_data_lakehouse_and_analysis_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(k, i) for k in [1, 1, 1, 1, 1, 2, 3] for i in range(3)], "k long, payload long"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (4, "unmatched")], "k long, tag string")
    got = sorted((r["k"], r["payload"], r["tag"]) for r in salted_join(fact, dim, on="k", salt_buckets=4).collect())
    want = sorted((r["k"], r["payload"], r["tag"]) for r in fact.join(dim, on="k").collect())
    assert got == want
    # left_outer keeps unmatched fact keys exactly once per fact row
    lo = salted_join(fact, dim, on="k", salt_buckets=4, how="left_outer")
    assert lo.count() == fact.count()
    assert lo.filter(F.col("k") == 3).collect()[0]["tag"] is None


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from youtube_data_lakehouse_and_analysis_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    left = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("a", F.col("k") * 2)
    right = spark.range(0, 500).withColumnRenamed("id", "k").withColumn("b", F.col("k") + 7)
    write_bucketed(left, "bkt_left", ["k"], num_buckets=4, sort_cols=["k"])
    write_bucketed(right, "bkt_right", ["k"], num_buckets=4, sort_cols=["k"])
    # at test scale the planner would broadcast (both tables are tiny);
    # disable it so the plan shows the big-big bucketed sort-merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_left", "bkt_right", on=["k"])
        assert joined.count() == 500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with NO exchange on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_connected_components(spark):
    from youtube_data_lakehouse_and_analysis_spark.operators.cluster import connected_components

    # two components: a 4-chain (worst case for propagation) and a triangle,
    # plus an isolated self-pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 20)],
        "doc_a long, doc_b long",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges, "doc_a", "doc_b").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_observe_metrics_free_ride(spark):
    """Observation metrics must report exact counts from a pipeline's own
    pass — validated against separately computed values — without adding
    a scan (one FileScan in the instrumented plan)."""
    import pyspark.sql.functions as F

    from youtube_data_lakehouse_and_analysis_spark.catalog import load
    from youtube_data_lakehouse_and_analysis_spark.operators.observe import (
        observed,
        standard_quality_metrics,
    )
    from .conftest import SF_DIR

    li = load(spark, SF_DIR, "lineitem")
    inst, obs = observed(
        li,
        *standard_quality_metrics(
            "l_orderkey", F.col("l_quantity") <= 0, F.col("l_extendedprice") <= 0
        ),
    )
    # the "pipeline job": an unrelated aggregation
    result = inst.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    assert len(result) > 0
    m = obs.get
    assert m["n_rows"] == li.count()
    assert m["n_null_key"] == 0
    assert m["n_violation_0"] == li.filter(F.col("l_quantity") <= 0).count()
    assert m["n_violation_1"] == 0
    plan = inst._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    """Z-order layout: per-file extents of BOTH interleaved columns must be
    small fractions of the global extent (that's what makes min/max
    skipping work for either predicate), whereas a single-column sort
    leaves the secondary column's per-file extent at ~100%."""
    from youtube_data_lakehouse_and_analysis_spark.catalog import load
    from youtube_data_lakehouse_and_analysis_spark.operators.zorder import zorder_by
    from .conftest import SF_DIR

    orders = load(spark, SF_DIR, "orders").select(
        "o_custkey", (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").alias("cents")
    )
    n_files = 16

    def mean_extent_fraction(df_sorted, col):
        path = str(tmp_path / f"probe_{col}_{df_sorted.semanticHash()}")
        df_sorted.write.mode("overwrite").parquet(path)
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        spans = [r["span"] for r in per_file.collect()]
        glob = df_sorted.agg(F.max(col) - F.min(col)).collect()[0][0]
        return sum(spans) / len(spans) / glob

    z = zorder_by(orders, "o_custkey", "cents", n_files)
    single = orders.repartitionByRange(n_files, "o_custkey").sortWithinPartitions("o_custkey")

    z_cents = mean_extent_fraction(z, "cents")
    single_cents = mean_extent_fraction(single, "cents")
    z_cust = mean_extent_fraction(z, "o_custkey")

    assert single_cents > 0.9          # single-col sort: secondary dim unbounded
    assert z_cents < 0.5 * single_cents  # z-order bounds the secondary dim...
    assert z_cust < 0.6                  # ...while still bounding the primary


def test_dd23_is_a_subset_of_dd06_with_full_exact_dup_recall(spark):
    """dd23 (residual-LSH sub-blocked) must return a SUBSET of dd06's
    label-blocked pairs — sub-blocking only prunes candidates, never
    invents them — and can never lose an exact-duplicate pair (identical
    vectors share a residual, hence a bucket)."""
    from youtube_data_lakehouse_and_analysis_spark.plans.advanced import (
        dd06_embedding_near_dup,
        dd23_residual_blocked_near_dup,
    )

    from .conftest import SF_DIR

    d06 = {
        (r["doc_a"], r["doc_b"])
        for r in dd06_embedding_near_dup(spark, SF_DIR).collect()
    }
    d23 = {
        (r["doc_a"], r["doc_b"])
        for r in dd23_residual_blocked_near_dup(spark, SF_DIR).collect()
    }
    assert d23 <= d06
    # exact dups (cosine == 1.0 in dd06's output) can never be pruned
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dd06_embedding_near_dup(spark, SF_DIR).collect()
        if r["cosine"] >= 0.999999
    }
    assert exact <= d23
