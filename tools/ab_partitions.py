"""A/B the AQE initial-partition knob on the frozen headline set.

SCALE.md ("What the x64 doubling surfaced") measured the longdocs x64
heavy exploded stages ~2× faster under
``spark.sql.adaptive.coalescePartitions.initialPartitionNum = 256``,
and deferred session-wide adoption pending a bench-comparability
measurement (r13 verdict item 7).  This tool decides it: the full
frozen HEADLINE set at sf0.1, per-query interleaved A/B/A/B reps in ONE
process (the box shows ±15% cross-run noise; interleaving cancels
drift), where

* A = the PRE-ADOPTION baseline: initialPartitionNum pinned to the
  session core count (r14 made 8×cores the builder-level default, so
  merely unsetting the conf would fall back to the shipped value and
  arms A and B would silently measure the same config — the r14
  post-adoption trap flagged in round-14 ADVICE)
* B = shipped session since r14 (initialPartitionNum = 8×cores;
  parallelismFirst default true: AQE coalesces back toward core-count
  parallelism, so small stages keep their width while heavy exploded
  stages start 8× finer)
* C = B + parallelismFirst=false (coalesce purely by advisory size —
  the exact config the x64 measurement used; at sf0.1 this can
  UNDER-parallelize small stages, which is why it is measured, not
  assumed)

``initialPartitionNum`` / ``parallelismFirst`` are runtime SQL confs,
so flipping them per rep inside one session is legal and cheap.

Usage: python tools/ab_partitions.py [sf_dir] [--reps N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE, load_snapshot  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402

_INIT = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
_PFIRST = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def make_configs(cores: int) -> dict[str, dict[str, str]]:
    return {
        "A_init_cores": {_INIT: str(cores)},
        "B_shipped_8x": {_INIT: str(8 * cores)},
        "C_8x_sizeonly": {_INIT: str(8 * cores), _PFIRST: "false"},
    }


def apply(spark, conf: dict) -> None:
    spark.conf.unset(_PFIRST)
    for key, val in conf.items():
        spark.conf.set(key, val)


def timed(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("ab-partitions")
    spark.sparkContext.setLogLevel("ERROR")
    configs = make_configs(spark.sparkContext.defaultParallelism)
    queries = entrymod.queries()
    print("env:", load_snapshot())
    samples: dict[str, dict[str, list[float]]] = {n: {c: [] for c in configs} for n in HEADLINE}
    for name in HEADLINE:
        fn = queries[name]
        for conf in configs.values():  # one warm-up per config (JIT, caches)
            apply(spark, conf)
            timed(spark, fn, sf_dir)
        for _ in range(reps):  # interleaved: each rep cycles all configs
            for cname, conf in configs.items():
                apply(spark, conf)
                samples[name][cname].append(timed(spark, fn, sf_dir))
    totals = {c: 0.0 for c in configs}
    print(f"{'query':32s} " + "  ".join(f"{c:>20s}" for c in configs))
    for name in HEADLINE:
        meds = {c: statistics.median(samples[name][c]) for c in configs}
        for c, m in meds.items():
            totals[c] += m
        print(f"{name:32s} " + "  ".join(f"{meds[c]:20.3f}" for c in configs))
    print(f"{'TOTAL':32s} " + "  ".join(f"{totals[c]:20.3f}" for c in configs))
    print("env:", load_snapshot())
    spark.stop()


if __name__ == "__main__":
    main()
