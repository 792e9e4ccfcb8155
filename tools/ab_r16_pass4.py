"""Interleaved A/B for the r16 fourth-pass experiments (both ADOPTED;
the alt arms below are the PRE-r16 forms, embedded so the comparison
stays reproducible now that the winning forms ship in the catalog):

  sk02_kmv_set_ops — ADOPTED: union sketch MERGED from the two side
                     sketches (K smallest distinct of top-K(A) ∪
                     top-K(B) — the KMV merge property already pinned by
                     tests/test_sketch_merge.py) with ustats read
                     directly off the union sketch, replacing the
                     recomputation from uh = h.distinct() (alt — a
                     second full distinct shuffle over every user hash
                     + a global two-phase top-K window over it + a
                     semi-join; usk ⊆ uh makes the semi-join an
                     identity, so cnt/hk off usk are value-identical).
                     Measured 0.973 vs 1.141 s median (−15%); plan:
                     Exchange 40→32, windows 12→8, scans 12→6.
  dq04_column_profile — ADOPTED: two-level aggregate (groupBy (col, v)
                     counts, then per-col rollup) replacing the mixed
                     countDistinct aggregate (alt), which planned as a
                     SortAggregate chain sorting every stacked row on
                     (col_name, v) ahead of the exchange; the two-level
                     form hash-aggregates map-side and shuffles one row
                     per DISTINCT (col, v).  Measured 0.354 vs 0.505 s
                     median (−30%).

The shipped arm always comes from __spark_entry__.queries(); alt arms
are embedded here so the experiment stays reproducible whichever form
ships.  Row identity of every pair of arms is asserted
in-run (canonicalized multiset equality) before any timing is trusted.
Arms alternate WITHIN one session per rep, with the bench's per-rep
env/steal ledger.

Usage: python tools/ab_r16_pass4.py [sf_dir] [--reps N] [--only name]
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
from youtube_data_lakehouse_and_analysis_spark.functions.text import (  # noqa: E402
    md5_prefix_long,
)
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402


# --- alt forms -------------------------------------------------------------


def sk02_alt(spark, sf_dir):
    """Pre-r16 sk02: union sketch recomputed from uh = h.distinct()."""
    from youtube_data_lakehouse_and_analysis_spark.plans.corpus6 import (
        _KMV_A,
        _KMV_B,
        _KMV_K,
        _KMV_NUM,
        _topk_smallest,
    )

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KMV_A, _KMV_B)
    )
    h = ev.select(
        "event_type", md5_prefix_long(F.col("user_id").cast("string"), 15).alias("h")
    ).distinct()
    sk = _topk_smallest(h, ["event_type"], _KMV_K)
    est_expr = (
        f"CASE WHEN cnt < {_KMV_K} THEN CAST(cnt AS DOUBLE) "
        f"ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END"
    )
    stats = (
        sk.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.max("h").alias("hk"))
        .select("event_type", F.expr(est_expr).alias("est"), "cnt")
    )
    uh = h.select("h").distinct()
    usk = (
        _topk_smallest(uh, [], _KMV_K)
        .select("h")
        .transform(checkpoint)  # feeds ustats, common, and the cap
    )
    ustats = uh.join(usk, "h", "left_semi").agg(
        F.count("*").alias("cnt"), F.max("h").alias("hk")
    )
    ha = h.filter(F.col("event_type") == _KMV_A).select("h")
    hb = h.filter(F.col("event_type") == _KMV_B).select("h")
    common = (
        usk.join(ha, "h", "left_semi")
        .join(hb, "h", "left_semi")
        .agg(F.count("*").alias("c"))
    )
    exact = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == _KMV_A, F.col("user_id"))
        ).alias("n_a_exact"),
        F.countDistinct(
            F.when(F.col("event_type") == _KMV_B, F.col("user_id"))
        ).alias("n_b_exact"),
        F.countDistinct("user_id").alias("n_union_exact"),
    )
    est_a = stats.filter(F.col("event_type") == _KMV_A).select(
        F.col("est").alias("est_a")
    )
    est_b = stats.filter(F.col("event_type") == _KMV_B).select(
        F.col("est").alias("est_b")
    )
    est_u = ustats.select(
        F.expr(est_expr).alias("est_union"), F.col("cnt").alias("ucnt")
    )
    return (
        exact.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .crossJoin(F.broadcast(common))
        .select(
            "n_a_exact",
            "est_a",
            "n_b_exact",
            "est_b",
            "n_union_exact",
            "est_union",
            F.expr(f"(c * 1000) div least(ucnt, {_KMV_K})").alias(
                "jaccard_kmv_permille"
            ),
        )
    )


def dq04_alt(spark, sf_dir):
    """Pre-r16 dq04: single mixed countDistinct aggregate."""
    from youtube_data_lakehouse_and_analysis_spark.plans.lakehouse import _DQ04_COLS

    legs = ", ".join(f"'{c}', {e.format(S='STRING')}" for c, e in _DQ04_COLS)
    long = load(spark, sf_dir, "orders").select(
        F.expr(f"stack({len(_DQ04_COLS)}, {legs}) AS (col_name, v)")
    )
    return long.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").alias("min_str"),
        F.max("v").alias("max_str"),
    )


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
        "sk02_kmv_set_ops": (sk02_alt, queries["sk02_kmv_set_ops"]),
        "dq04_column_profile": (dq04_alt, queries["dq04_column_profile"]),
    }
    if only:
        pairs = {only: pairs[only]}

    spark = get_spark("ab-r16-pass4")
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
