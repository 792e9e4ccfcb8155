"""Interleaved A/B for the r16 third-pass experiments (all three ADOPTED;
the alt arms below are the PRE-r16 forms, embedded so the comparison
stays reproducible now that the winning forms ship in the catalog):

  sk04_theta_a_not_b — ADOPTED: exact legs fused into ONE side-flags
                       aggregate (groupBy custkey -> in_a/in_b max
                       flags -> 1-row count), replacing the
                       ua.distinct + ub.distinct + full_outer SMJ (alt).
                       Measured 0.609 vs 0.879 s median (−31%), every
                       fused rep faster than every full_outer rep;
                       plan: SortMergeJoin 2→0, orders scans 4→2
                       (sk02 already used the fused exact-leg style;
                       sk04's full_outer leg was the outlier).
  q05_groupwise_max_window — ADOPTED: unordered-window MAX + price == mx
                       filter replacing rank()==1 (alt).  Identical
                       tied-row semantics (rank 1 ⟺ price equals the
                       group max; no null prices in the money domain).
                       Both full-table sorts drop to the single
                       partition key; the rank form's WindowGroupLimit
                       map-side pre-filter removes only 6% of rows on
                       this table shape (561,713 of 600,000 survive at
                       sf0.1 — ~4 rows/group scattered over all scan
                       partitions).  Measured 0.371 vs 0.447 s (−17%).
  sim14_index_balance — ADOPTED: one scan emitting both bucket ids per
                       row then stack(2, ...) to long form, replacing
                       the unionAll of two projections of the same
                       table (alt), which plans as TWO parquet scans —
                       Spark does not dedupe identical scan subtrees.
                       Measured 0.594 vs 0.659 s (−10%); plan: scans
                       halved.

The shipped arm always comes from __spark_entry__.queries().  Row
identity of every pair of arms is asserted in-run (canonicalized
multiset equality) before any timing is trusted.  Arms alternate WITHIN
one session per rep, with the bench's per-rep env/steal ledger.

Usage: python tools/ab_r16_pass3.py [sf_dir] [--reps N] [--only name]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from bench import cpu_delta_pct, cpu_sample, load_snapshot  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.catalog import checkpoint, load  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.functions.text import (  # noqa: E402
    md5_prefix_long,
)
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402


# --- alt forms (the PRE-r16 implementations) --------------------------------


def sk04_alt(spark, sf_dir):
    """Pre-r16 sk04: exact legs as ua/ub distinct + full_outer SMJ."""
    from youtube_data_lakehouse_and_analysis_spark.plans.corpus6 import (
        _KMV_K,
        _SK04_YA,
        _SK04_YB,
        _topk_smallest,
    )

    o = (
        load(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("side"), "o_custkey")
        .filter(F.col("side").isin(_SK04_YA, _SK04_YB))
    )
    h = o.select(
        "side", md5_prefix_long(F.col("o_custkey").cast("string"), 15).alias("h")
    ).distinct()
    sk = (
        _topk_smallest(h, ["side"], _KMV_K)
        .select("side", "h")
        .transform(checkpoint)
    )
    theta = sk.groupBy("side").agg(F.max("h").alias("hk")).agg(
        F.min("hk").alias("th")
    )
    ska = sk.filter(F.col("side") == _SK04_YA).select("h")
    skb = sk.filter(F.col("side") == _SK04_YB).select("h")

    def retained(side_df, other):
        return (
            side_df.crossJoin(F.broadcast(theta))
            .filter(F.col("h") < F.col("th"))
            .join(other, "h", "left_anti")
            .agg(F.count("*").alias("retained"))
        )

    anb = retained(ska, skb)
    bna = retained(skb, ska)
    ua = o.filter(F.col("side") == _SK04_YA).select("o_custkey").distinct()
    ub = (
        o.filter(F.col("side") == _SK04_YB)
        .select(F.col("o_custkey").alias("custkey_b"))
        .distinct()
    )
    exact = ua.join(ub, ua["o_custkey"] == ub["custkey_b"], "full_outer").agg(
        F.countDistinct(
            F.when(
                F.col("o_custkey").isNotNull() & F.col("custkey_b").isNull(),
                F.col("o_custkey"),
            )
        ).alias("n_a_not_b"),
        F.countDistinct(
            F.when(
                F.col("custkey_b").isNotNull() & F.col("o_custkey").isNull(),
                F.col("custkey_b"),
            )
        ).alias("n_b_not_a"),
    )
    est = lambda r: (  # noqa: E731
        F.col(r).cast("double") * F.lit(float(1 << 60)) / F.col("th").cast("double")
    )
    return (
        exact.crossJoin(anb.withColumnRenamed("retained", "retained_a_not_b"))
        .crossJoin(bna.withColumnRenamed("retained", "retained_b_not_a"))
        .crossJoin(F.broadcast(theta))
        .select(
            F.col("n_a_not_b").alias("n_a_not_b_exact"),
            est("retained_a_not_b").alias("est_a_not_b"),
            "retained_a_not_b",
            F.col("n_b_not_a").alias("n_b_not_a_exact"),
            est("retained_b_not_a").alias("est_b_not_a"),
            "retained_b_not_a",
            F.col("th").alias("theta_int"),
        )
    )


def q05w_alt(spark, sf_dir):
    """Pre-r16 q05 window form: rank() over (key, price DESC), rk == 1."""
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"))
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
        .orderBy(F.desc("l_extendedprice"))
    )


def sim14_alt(spark, sf_dir):
    """Pre-r16 sim14: unionAll of two projections (two scans)."""
    from youtube_data_lakehouse_and_analysis_spark.operators import similarity as S
    from youtube_data_lakehouse_and_analysis_spark.plans.similarity import _SIGNS

    emb = load(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", "label", S.quantize("embedding").alias("qv"))
    ivf = q.select(
        F.lit("ivf_cell").alias("index_type"),
        F.col("label").cast("string").alias("bucket"),
    )
    lsh = q.select(
        F.lit("lsh_bucket").alias("index_type"),
        S.lsh_bucket(F.col("qv"), _SIGNS).cast("string").alias("bucket"),
    )
    w = (
        ivf.unionAll(lsh)
        .groupBy("index_type", "bucket")
        .agg(F.count("*").alias("width"))
    )
    agg = w.groupBy("index_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum("width").alias("n_vectors"),
        F.max("width").alias("max_width"),
        F.min("width").alias("min_width"),
    )
    return agg.select(
        "index_type",
        "n_buckets",
        "n_vectors",
        "max_width",
        "min_width",
        (F.col("n_vectors").cast("double") / F.col("n_buckets")).alias("mean_width"),
        (
            F.col("max_width").cast("double") * F.col("n_buckets")
            / F.col("n_vectors").cast("double")
        ).alias("imbalance_factor"),
        F.expr("(1000 * max_width) div n_vectors").alias("max_share_permille"),
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
        "sk04_theta_a_not_b": (sk04_alt, queries["sk04_theta_a_not_b"]),
        "q05_groupwise_max_window": (q05w_alt, queries["q05_groupwise_max_window"]),
        "sim14_index_balance": (sim14_alt, queries["sim14_index_balance"]),
    }
    if only:
        pairs = {only: pairs[only]}

    spark = get_spark("ab-r16-pass3")
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
