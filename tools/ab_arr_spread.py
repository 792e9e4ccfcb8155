"""Adjudicate the r15 conditional array-table spread (VERDICT r15 item 1).

The r15 builder measured dd18 3.20 -> 2.14 s with the pre-checkpoint
repartition of the per-doc array table (dedup._maybe_spread_arr engaged
when the index-prefix fraction >= 0.6); the r15 driver's extended-tier
rerun read dd18 at 6.09 s — worse than r14 — but that tier recorded no
per-rep steal/env, so the reading could not be adjudicated.  This tool
re-measures with the evidence the dispute lacked: interleaved
spread-ON / spread-OFF reps in ONE session, per-rep wall + /proc/stat
steal ledger, on the queries the boundary separates (dd18 engages the
spread, dd22 by design does not — its OFF arm double-checks the boundary
costs nothing where it should not engage).

OFF is forced by raising the module boundary constant above 1 (idx_frac
is a fraction, so nothing qualifies); plans are rebuilt per rep, so the
flip is plan-effective.

Usage: python tools/ab_arr_spread.py [sf_dir] [--reps N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import cpu_delta_pct, cpu_sample, load_snapshot  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.operators import dedup as D  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402

QUERIES = ["dd18_containment_pairs", "dd22_jaccard_pairs_strict"]
_SHIPPED = D._ARR_SPREAD_MIN_IDX_FRAC


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("ab-arr-spread")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    arms = {"ON_shipped": _SHIPPED, "OFF": 2.0}
    print("env:", load_snapshot())
    samples: dict[str, dict[str, list[tuple[float, dict]]]] = {
        q: {a: [] for a in arms} for q in QUERIES
    }
    for name in QUERIES:
        fn = queries[name]
        for frac in arms.values():  # one warm-up per arm
            D._ARR_SPREAD_MIN_IDX_FRAC = frac
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        for _ in range(reps):
            for arm, frac in arms.items():
                D._ARR_SPREAD_MIN_IDX_FRAC = frac
                c0 = cpu_sample()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                wall = time.perf_counter() - t0
                samples[name][arm].append((wall, cpu_delta_pct(c0, cpu_sample())))
    D._ARR_SPREAD_MIN_IDX_FRAC = _SHIPPED
    for name in QUERIES:
        print(f"\n=== {name} ===")
        for arm in arms:
            walls = [w for w, _ in samples[name][arm]]
            steals = [e.get("steal_pct", -1.0) for _, e in samples[name][arm]]
            print(
                f"  {arm:10s} median={statistics.median(walls):.3f}  "
                f"walls={[round(w, 3) for w in walls]}  steal%={steals}"
            )
    print("env:", load_snapshot())
    spark.stop()


if __name__ == "__main__":
    main()
