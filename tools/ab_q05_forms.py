"""q05_groupwise_max plan-variant experiment (r15 verdict item 5).

The shipped form (the reference's agg + self equi-join, single join key)
plans two lineitem scans, an agg exchange, a BROADCAST of the whole
per-order max table (O(orders) rows collected to the driver every run —
fine at sf0.1, impossible at 100 TB), and the final range sort.  The
verdict asks for a measured semi-join / exchange-reuse variant that keeps
the declared output identical, adopted only if it beats 10% reproducibly.

Variants (all row-identical: same join semantics, same final sort):
  shipped   — as in plans/queries.py today.
  reuse     — repartition lineitem by l_orderkey ONCE, build the agg from
              the repartitioned child and join back to the SAME child:
              one scan + one exchange feeds both sides (ReusedExchange),
              no broadcast collect, co-partitioned join (guide §2.4).
  reuse_nb  — reuse + broadcast disabled for this join (isolates the
              exchange-reuse effect from AQE's broadcast upgrade).

Interleaved reps in one session, per-rep steal ledger.

Usage: python tools/ab_q05_forms.py [sf_dir] [--reps N]
"""

from __future__ import annotations

import statistics
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import cpu_delta_pct, cpu_sample, load_snapshot  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.catalog import load  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402


def shipped(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    m = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_extendedprice").alias("max_price"))
        .withColumnRenamed("l_orderkey", "m_orderkey")
    )
    return (
        li.join(m, on=li["l_orderkey"] == m["m_orderkey"])
        .filter(li["l_extendedprice"] == m["max_price"])
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"))
    )


def reuse(spark, sf_dir):
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .repartition("l_orderkey")
    )
    m = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_extendedprice").alias("max_price"))
        .withColumnRenamed("l_orderkey", "m_orderkey")
    )
    return (
        li.join(m, on=li["l_orderkey"] == m["m_orderkey"])
        .filter(li["l_extendedprice"] == m["max_price"])
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"))
    )


def reuse_nb(spark, sf_dir):
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .repartition("l_orderkey")
    )
    m = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_extendedprice").alias("max_price"))
        .withColumnRenamed("l_orderkey", "m_orderkey")
        .hint("merge")
    )
    return (
        li.join(m, on=li["l_orderkey"] == m["m_orderkey"])
        .filter(li["l_extendedprice"] == m["max_price"])
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"))
    )


def reuse_ge(spark, sf_dir):
    """reuse_nb, but the tie-keeping price equality is expressed as
    l_extendedprice >= max_price (equivalent: the group max bounds every
    member, so >= holds iff equality holds).  An equality ABOVE the join
    gets extracted as a composite join KEY by Catalyst, which re-shuffles
    BOTH sides on (normalized(price), orderkey) and destroys the
    exchange reuse — >= is not equi-extractable, so the join stays on
    l_orderkey alone and the repartition is genuinely reused."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .repartition("l_orderkey")
    )
    m = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_extendedprice").alias("max_price"))
        .withColumnRenamed("l_orderkey", "m_orderkey")
        .hint("merge")
    )
    return (
        li.join(
            m,
            on=(li["l_orderkey"] == m["m_orderkey"])
            & (li["l_extendedprice"] >= m["max_price"]),
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"))
    )


VARIANTS = {
    "shipped": shipped,
    "reuse": reuse,
    "reuse_nb": reuse_nb,
    "reuse_ge": reuse_ge,
}


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 7
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("ab-q05")
    spark.sparkContext.setLogLevel("ERROR")
    print("env:", load_snapshot())
    # row-identity check first (order-insensitive: sort both)
    base = sorted(map(tuple, shipped(spark, sf_dir).collect()))
    for name, fn in VARIANTS.items():
        got = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert got == base, f"{name} rows differ"
    print(f"row-identity: all {len(VARIANTS)} variants equal ({len(base)} rows)")
    samples = {n: [] for n in VARIANTS}
    steals = {n: [] for n in VARIANTS}
    for fn in VARIANTS.values():  # warm-up
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    for _ in range(reps):
        for name, fn in VARIANTS.items():
            c0 = cpu_sample()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            steals[name].append(cpu_delta_pct(c0, cpu_sample()).get("steal_pct"))
    for name in VARIANTS:
        print(
            f"{name:10s} median={statistics.median(samples[name]):.3f} "
            f"walls={[round(w, 3) for w in samples[name]]} steal%={steals[name]}"
        )
    print("env:", load_snapshot())
    spark.stop()


if __name__ == "__main__":
    main()
