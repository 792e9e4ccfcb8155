"""Interleaved A/B for the r16 fifth-pass experiments (both REJECTED —
the shipped forms stay; alt arms preserved here with the numbers):

  gr03_triangle_count — REJECTED: degree leg via explode(array(u, v))
                     (one pass over the checkpointed edge RDD) vs the
                     shipped unionAll of two projections.  Measured ×7
                     interleaved, steal ≤0.17%: alt 1.568 vs shipped
                     1.517 s median — flat-to-worse.  The RDD scan the
                     union duplicates is an in-memory localCheckpoint
                     read (cheap); the explode's Generate adds per-row
                     work on the hot path.  gr04 adopted the explode as
                     part of fusing WHOLE stats legs per iteration —
                     the win there was the fused aggregate, not the
                     explode per se; standalone it does not pay.
  a02_count_distinct — REJECTED: one distinct+count leg per distinct
                     column joined on the group key vs the shipped
                     two-countDistinct aggregate (whose
                     RewriteDistinctAggregates plan Expands every
                     lineitem row ×2 ahead of the partial aggregate).
                     Measured ×7 interleaved, steal ≤0.40%: alt 0.269
                     vs shipped 0.241 s median (+12%).  The Expand is
                     map-side CPU ahead of an effective partial
                     distinct; the two-leg form pays a second scan and
                     a join for no shuffle saving.

The shipped arm always comes from __spark_entry__.queries(); alt arms
are embedded here so the experiment stays reproducible whichever form
ships afterwards.  Row identity of every pair of arms is asserted
in-run (canonicalized multiset equality) before any timing is trusted.
Arms alternate WITHIN one session per rep, with the bench's per-rep
env/steal ledger.

Usage: python tools/ab_r16_pass5.py [sf_dir] [--reps N] [--only name]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import cpu_delta_pct, cpu_sample, load_snapshot  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.catalog import checkpoint, load  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402


# --- alt forms -------------------------------------------------------------


def gr03_alt(spark, sf_dir):
    """gr03 with the degree leg reading the edge RDD once (explode)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lp = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .transform(checkpoint)
    )
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    low_first = F.col("du") <= F.col("dv")
    oriented = (
        edges.join(deg.select(F.col("v").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select("v", F.col("d").alias("dv")), "v")
        .select(
            F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(low_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        )
        .transform(checkpoint)
    )
    o1 = oriented.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    o2 = oriented.select("src", F.col("dst").alias("z"), F.col("ddst").alias("dz"))
    wedges = o1.join(o2, "src").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    e3 = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z"), F.lit(1).alias("hit")
    )
    closed = wedges.join(e3, ["y", "z"], "left").agg(
        F.count("hit").alias("n_triangles"),
        F.count("*").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return closed.crossJoin(n_edges).select("n_triangles", "n_edges", "n_wedges")


def a02_alt(spark, sf_dir):
    """a02 with one distinct+count leg per column instead of Expand."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("l_partkey").alias("n_parts"))
    )
    s = (
        li.select("l_returnflag", "l_suppkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("l_suppkey").alias("n_supps"))
    )
    return p.join(s, "l_returnflag")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 7
    only = None
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    pairs = {
        "gr03_triangle_count": (gr03_alt, queries["gr03_triangle_count"]),
        "a02_count_distinct": (a02_alt, queries["a02_count_distinct"]),
    }
    if only:
        pairs = {only: pairs[only]}

    spark = get_spark("ab-r16-pass5")
    spark.sparkContext.setLogLevel("ERROR")

    from verify_local import rows_multiset  # same canonicalization as the gate

    for name, (alt_fn, shipped_fn) in pairs.items():
        df_alt, df_new = alt_fn(spark, sf_dir), shipped_fn(spark, sf_dir)
        ro = rows_multiset(df_alt.columns, df_alt.collect())
        rn = rows_multiset(df_new.columns, df_new.collect())
        assert ro == rn, f"{name}: arms differ ({len(ro)} vs {len(rn)} rows)"
        print(f"{name}: row-identity OK ({len(ro)} rows)", flush=True)

        for fn in (alt_fn, shipped_fn):
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t = {"alt": [], "shipped": []}
        env = {"alt": [], "shipped": []}
        for _ in range(reps):
            for arm, fn in (("shipped", shipped_fn), ("alt", alt_fn)):
                c0 = cpu_sample()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                t[arm].append(time.perf_counter() - t0)
                snap = load_snapshot()
                snap.update(cpu_delta_pct(c0, cpu_sample()))
                env[arm].append(snap)
        for arm in ("alt", "shipped"):
            med = statistics.median(t[arm])
            mx_steal = max(e.get("steal_pct", 0.0) for e in env[arm])
            print(
                f"  {name} {arm}: median {med:.3f}s  reps="
                + "/".join(f"{x:.3f}" for x in t[arm])
                + f"  max_steal={mx_steal:.2f}%",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
