"""Mergeability property tests for the from-scratch sketches (sk01/sk02/
sk03): the invariant that makes a sketch a SKETCH at 100 TB is that
per-partition partial sketches, merged hierarchically in any grouping,
bit-equal the sketch computed over the whole dataset in one pass — the
ia01 merge==recompute discipline applied to HLL registers (merge = MAX),
KMV synopses (merge = K-smallest of union), and count-min rows (merge = +).

Each property is checked under 1/4/32-partition layouts with a two-level
(pairwise-style) merge tree, so associativity and commutativity of the
merge operator are exercised, not just the trivial single merge.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from youtube_data_lakehouse_and_analysis_spark.catalog import load
from youtube_data_lakehouse_and_analysis_spark.functions.text import md5_prefix_long
from youtube_data_lakehouse_and_analysis_spark.plans.corpus6 import (
    _CMS_D,
    _CMS_W,
    _HLL_M,
    _HLL_R,
    _KMV_K,
)

from .conftest import SF_DIR

LAYOUTS = [1, 4, 32]


def _hashed_events(spark):
    ev = load(spark, SF_DIR, "events")
    return ev.select(
        "event_type", md5_prefix_long(F.col("user_id").cast("string"), 15).alias("h")
    )


def _hll_base(spark):
    """(event_type, j, rho) — sk01's register update stream."""
    return _hashed_events(spark).select(
        "event_type",
        (F.col("h") % _HLL_M).alias("j"),
        F.expr(
            f"CASE WHEN h div {_HLL_M} = 0 THEN {_HLL_R}"
            f" ELSE length(bin((h div {_HLL_M}) & -(h div {_HLL_M}))) END"
        ).alias("rho"),
    )


def _reg_dict(rows):
    return {(r["event_type"], r["j"]): r["mj"] for r in rows}


def test_hll_registers_merge_invariant(spark):
    base = _hll_base(spark)
    glob = _reg_dict(
        base.groupBy("event_type", "j").agg(F.max("rho").alias("mj")).collect()
    )
    for k in LAYOUTS:
        part = base.repartition(k).withColumn("pid", F.spark_partition_id())
        partial = part.groupBy("pid", "event_type", "j").agg(F.max("rho").alias("mj"))
        # two-level merge tree: partitions → 4 groups → global
        level1 = (
            partial.withColumn("g", F.col("pid") % 4)
            .groupBy("g", "event_type", "j")
            .agg(F.max("mj").alias("mj"))
        )
        merged = _reg_dict(
            level1.groupBy("event_type", "j").agg(F.max("mj").alias("mj")).collect()
        )
        assert merged == glob, f"HLL register merge diverged at {k} partitions"


def test_kmv_synopsis_merge_invariant(spark):
    h = _hashed_events(spark).select("h").distinct()
    glob = sorted(r["h"] for r in h.orderBy("h").limit(_KMV_K).collect())
    for k in LAYOUTS:
        part = h.repartition(k).withColumn("pid", F.spark_partition_id())
        # per-partition synopsis: the K smallest distinct hashes seen there
        from pyspark.sql.window import Window

        w = Window.partitionBy("pid").orderBy("h")
        partial = (
            part.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .select("h")
        )
        # merge: K smallest of the union of synopses
        merged = sorted(
            r["h"] for r in partial.distinct().orderBy("h").limit(_KMV_K).collect()
        )
        assert merged == glob, f"KMV synopsis merge diverged at {k} partitions"


def test_countmin_rows_merge_invariant(spark):
    w = load(spark, SF_DIR, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("s")
    cellno = (
        md5_prefix_long(F.concat(F.col("s").cast("string"), F.lit("|"), F.col("word")))
        % _CMS_W
    )
    base = w.select("word", seeds).select("s", cellno.alias("cell"))
    glob = {
        (r["s"], r["cell"]): r["c"]
        for r in base.groupBy("s", "cell").agg(F.count("*").alias("c")).collect()
    }
    for k in LAYOUTS:
        part = base.repartition(k).withColumn("pid", F.spark_partition_id())
        partial = part.groupBy("pid", "s", "cell").agg(F.count("*").alias("c"))
        level1 = (
            partial.withColumn("g", F.col("pid") % 4)
            .groupBy("g", "s", "cell")
            .agg(F.sum("c").alias("c"))
        )
        merged = {
            (r["s"], r["cell"]): r["c"]
            for r in level1.groupBy("s", "cell").agg(F.sum("c").alias("c")).collect()
        }
        assert merged == glob, f"CMS cell merge diverged at {k} partitions"


def test_topk_smallest_partitioning_invariant(spark):
    """The two-phase per-partition-heads + bounded-merge top-K (the r7
    rewrite of sk02/sk04's sketch construction) must return exactly the
    global K smallest per group under ANY input layout."""
    from youtube_data_lakehouse_and_analysis_spark.plans.corpus6 import (
        _topk_smallest,
    )

    h = _hashed_events(spark)
    base = {
        (r["event_type"], r["h"])
        for r in _topk_smallest(h, ["event_type"], _KMV_K).collect()
    }
    assert base
    for k in LAYOUTS:
        alt = {
            (r["event_type"], r["h"])
            for r in _topk_smallest(h.repartition(k), ["event_type"], _KMV_K).collect()
        }
        assert alt == base, f"two-phase top-K diverged at {k} partitions"
    # ungrouped (union-sketch) form
    uh = h.select("h").distinct()
    ubase = {r["h"] for r in _topk_smallest(uh, [], _KMV_K).collect()}
    for k in LAYOUTS:
        ualt = {r["h"] for r in _topk_smallest(uh.repartition(k), [], _KMV_K).collect()}
        assert ualt == ubase, f"ungrouped two-phase top-K diverged at {k} partitions"
