"""Semantic properties of the r7 additions gr04 (k-core peeling) and
ia03 (incremental LSH-index maintenance) beyond their oracle parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from youtube_data_lakehouse_and_analysis_spark.plans.dedup import (
    ia03_incremental_lsh_index,
)
from youtube_data_lakehouse_and_analysis_spark.plans.graph_q import (
    _KCORE_K,
    gr04_kcore_peel,
)

from .conftest import SF_DIR


def test_kcore_monotone_shrink(spark):
    """Peeling can only remove: node and edge counts are non-increasing
    round over round, and a fixpoint (equal consecutive rows) persists."""
    rows = sorted(gr04_kcore_peel(spark, SF_DIR).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
        if a["round"] > 0 and (a["n_nodes"], a["n_edges"]) == (
            rows[a["round"] - 1]["n_nodes"],
            rows[a["round"] - 1]["n_edges"],
        ):
            # fixpoint reached earlier -> later rounds must not change
            assert (b["n_nodes"], b["n_edges"]) == (a["n_nodes"], a["n_edges"])


def test_kcore_min_degree_after_fixpoint(spark):
    """If the last two rounds agree (fixpoint), every remaining vertex
    must have degree >= k in the remaining subgraph — the k-core
    definition itself."""
    rows = sorted(gr04_kcore_peel(spark, SF_DIR).collect(), key=lambda r: r["round"])
    if (rows[-1]["n_nodes"], rows[-1]["n_edges"]) != (
        rows[-2]["n_nodes"],
        rows[-2]["n_edges"],
    ):
        return  # not converged within the unroll at this sf; nothing to pin
    if rows[-1]["n_edges"] == 0:
        assert rows[-1]["n_nodes"] == 0
        return
    # recompute the peel directly to inspect the surviving subgraph
    from youtube_data_lakehouse_and_analysis_spark.catalog import load

    o = (
        load(spark, SF_DIR, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select("o_orderkey")
    )
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    lp = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    for _ in range(3):
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select("v"))
            .groupBy("x")
            .agg(F.count("*").alias("c"))
        )
        keep = deg.filter(F.col("c") >= _KCORE_K).select("x")
        e = (
            e.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
        )
    min_deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select("v"))
        .groupBy("x")
        .agg(F.count("*").alias("c"))
        .agg(F.min("c").alias("m"))
        .collect()[0]["m"]
    )
    assert min_deg >= _KCORE_K


def test_incremental_lsh_identity(spark):
    """The maintenance identity the query reports must actually hold:
    zero pairs missing vs the full recompute, zero extra, and the pair
    categories partition the new-pair count."""
    row = ia03_incremental_lsh_index(spark, SF_DIR).collect()[0]
    assert row["n_missing_vs_full"] == 0
    assert row["n_extra_vs_full"] == 0
    assert row["n_new_pairs"] == (
        row["n_delta_delta_pairs"] + row["n_delta_base_pairs"]
    )
    assert row["n_delta_docs"] > 0 and row["n_base_docs"] > 0
