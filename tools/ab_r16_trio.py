"""Interleaved A/B for the r16 second-pass experiments (outcomes below):

  ev12_dau_wau   — ADOPTED: WAU leg as bounded explode(sequence(day,
                   day+6)) (shipped) vs the pre-r16 BroadcastNestedLoop
                   range join against the day grid (alt).  Measured
                   0.597 vs 0.666 s median (−10%), and the explode is
                   O(7·|user-days|) at any history length where the
                   BNLJ evaluates every grid day per user-day.
  gr03_triangle  — REJECTED: pre-partitioning the oriented edge table on
                   the wedge pivot src before its checkpoint (alt) vs
                   shipped.  Under AQE a localCheckpoint's LogicalRDD
                   reports UnknownPartitioning(0) (eager or lazy), so
                   both wedge-leg Exchanges survive and the repartition
                   is a pure extra shuffle: measured flat (1.865 vs
                   1.888 s median).
  dd17_bloom     — REJECTED: literal-bitmap map-side probe (alt — the
                   codegen-friendly 5×(project, filter) chain over an
                   array<bigint> literal) vs the shipped position
                   semi-join.  Measured 4.16 vs 1.53 s: element_at on
                   the 1024-long literal array costs ~0.5–1.0 s per
                   seed over ~10M grams (boxed GenericArrayData access)
                   and the widening project chain re-copies rows per
                   operator; a bind()-per-position variant was worse
                   still (3.03 s, interpreted eval).  The broadcast
                   hash relation IS the engine-native bitmap.

The shipped arm always comes from __spark_entry__.queries(), so the
comparison measures exactly what the catalog runs; the alt arms are
embedded here so the experiments stay reproducible after the rejected
code was reverted from the tree.  Row identity of every pair of arms is
asserted in-run (canonicalized multiset equality) before any timing is
trusted.  Arms alternate WITHIN one session per rep, with the bench's
per-rep env/steal ledger.

Usage: python tools/ab_r16_trio.py [sf_dir] [--reps N] [--only name]
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


def ev12_alt(spark, sf_dir):
    """Pre-r16 WAU leg: BroadcastNestedLoopJoin range join vs day grid."""
    ev = load(spark, sf_dir, "events")
    au = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = au.select("day").distinct()
    dau = au.groupBy("day").agg(F.count("*").alias("dau"))
    a = au.select(F.col("day").alias("aday"), "user_id")
    wau = (
        F.broadcast(days)
        .join(a, (F.col("aday") >= F.date_sub(F.col("day"), 6)) & (F.col("aday") <= F.col("day")))
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
        .orderBy("day")
    )


def gr03_alt(spark, sf_dir):
    """Shipped gr03 with the REJECTED pre-partitioned oriented checkpoint."""
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
        edges.select(F.col("u").alias("v"))
        .unionAll(edges.select("v"))
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
        .repartition(spark.sparkContext.defaultParallelism, "src")  # rejected
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


def dd17_alt(spark, sf_dir):
    """REJECTED literal-bitmap probe (codegen-friendly chain form)."""
    from youtube_data_lakehouse_and_analysis_spark.plans.corpus2 import (
        _BENCH_MOD,
        _N,
        _word_ngrams,
    )
    from youtube_data_lakehouse_and_analysis_spark.plans.corpus4 import (
        _BLOOM_K,
        _BLOOM_M,
    )

    docs = load(spark, sf_dir, "documents")
    seeds = F.array(*[F.lit(s) for s in range(_BLOOM_K)])

    def pos(seed_col, ngram_col):
        return md5_prefix_long(
            F.concat(seed_col.cast("string"), F.lit("|"), ngram_col)
        ) % _BLOOM_M

    grams = _word_ngrams(docs, _N)
    bench = grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select("ngram").distinct()
    bit_rows = (
        bench.select(F.explode(seeds).alias("s"), "ngram")
        .select(pos(F.col("s"), F.col("ngram")).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_M // 64)
    for r in bit_rows:
        words[r.pos >> 6] |= 1 << (r.pos & 63)
    bitmap = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long") for w in words]
    )
    train_g = grams.filter(F.col("doc_id") % _BENCH_MOD != 0).distinct()
    flagged = train_g
    for s in range(_BLOOM_K):
        pc = f"_p{s}"
        flagged = flagged.withColumn(pc, pos(F.lit(s), F.col("ngram"))).filter(
            F.getbit(
                F.element_at(bitmap, (F.floor(F.col(pc) / F.lit(64)) + 1).cast("int")),
                F.col(pc) % F.lit(64),
            )
            == F.lit(1)
        )
    bloom_docs = flagged.select("doc_id").distinct()
    exact_docs = (
        train_g.join(F.broadcast(bench), "ngram", "left_semi").select("doc_id").distinct()
    )
    return (
        docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bloom_docs.withColumn("b", F.lit(1))), "doc_id", "left")
        .join(F.broadcast(exact_docs.withColumn("e", F.lit(1))), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.when(F.col("b").isNotNull(), 1).otherwise(0)).alias("bloom_flagged"),
            F.sum(F.when(F.col("e").isNotNull(), 1).otherwise(0)).alias("exact_hits"),
            F.sum(
                F.when(F.col("b").isNotNull() & F.col("e").isNull(), 1).otherwise(0)
            ).alias("false_positives"),
        )
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
        "ev12_dau_wau": (ev12_alt, queries["ev12_dau_wau"]),
        "gr03_triangle_count": (gr03_alt, queries["gr03_triangle_count"]),
        "dd17_bloom_decontaminate": (dd17_alt, queries["dd17_bloom_decontaminate"]),
    }
    if only:
        pairs = {only: pairs[only]}

    spark = get_spark("ab-r16-trio")
    spark.sparkContext.setLogLevel("ERROR")

    from verify_local import rows_multiset  # same canonicalization as the gate

    for name, (alt_fn, shipped_fn) in pairs.items():
        # row identity first (plan-build cost excluded from timing below)
        df_alt, df_new = alt_fn(spark, sf_dir), shipped_fn(spark, sf_dir)
        ro = rows_multiset(df_alt.columns, df_alt.collect())
        rn = rows_multiset(df_new.columns, df_new.collect())
        assert ro == rn, f"{name}: arms differ ({len(ro)} vs {len(rn)} rows)"
        print(f"{name}: row-identity OK ({len(ro)} rows)")

        # warm both arms once
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
                + f"  max_steal={mx_steal:.2f}%"
            )
    spark.stop()


if __name__ == "__main__":
    main()
