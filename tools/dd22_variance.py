"""dd22 in-suite vs isolated variance experiment (r15 verdict item 3).

r15 observed dd22_jaccard_pairs_strict at ~2.35 s isolated but 2.8-3.1 s
inside a full bench session, and the codegen-cache hypothesis was
rejected on contaminated data.  This tool isolates the session-
accumulated component with the steal ledger the extended tier now has:

  phase A — fresh session: dd22 warm-up + N timed reps.
  phase B — same session: run a configurable "ballast" prefix (default:
            the extended-tier queries that precede dd22 in bench.py,
            which include the checkpoint-heavy dd18/gr04/ia03/sim15),
            then re-time dd22 N reps.
  Before each phase it records the JVM's cached-RDD block count and
  memory (localCheckpoint blocks accumulate until the driver GC drops
  their Python references), so a storage-pressure cause is readable
  from the artifact.

Usage: python tools/dd22_variance.py [sf_dir] [--reps N] [--ballast K]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import EXTENDED, cpu_delta_pct, cpu_sample, load_snapshot  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402

QUERY = "dd22_jaccard_pairs_strict"


def storage_info(spark) -> dict:
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        mem = 0
        for i in infos:
            # Spark 4 renamed RDDInfo.memUsed -> memSize
            for attr in ("memSize", "memUsed"):
                try:
                    mem += getattr(i, attr)()
                    break
                except Exception:
                    continue
        return {"cached_rdds": len(infos), "mem_used_mb": round(mem / 1e6, 1)}
    except Exception as exc:  # diagnostic only — never fail the run
        return {"err": str(exc)}


def timed_reps(spark, fn, sf_dir, reps):
    out = []
    for _ in range(reps):
        c0 = cpu_sample()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        out.append(
            (
                round(time.perf_counter() - t0, 4),
                cpu_delta_pct(c0, cpu_sample()).get("steal_pct"),
            )
        )
    return out


def main() -> None:
    argv = list(sys.argv[1:])
    reps, ballast_n = 5, None
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    if "--ballast" in argv:
        i = argv.index("--ballast")
        ballast_n = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("dd22-variance")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    fn = queries[QUERY]
    print("env:", load_snapshot())

    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm-up
    print("storage before A:", storage_info(spark))
    a = timed_reps(spark, fn, sf_dir, reps)
    print(f"A (isolated, fresh session): median={statistics.median(w for w, _ in a):.3f} reps={a}")

    prefix = [q for q in EXTENDED if q != QUERY]
    if ballast_n is not None:
        prefix = prefix[:ballast_n]
    t0 = time.perf_counter()
    for name in prefix:
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    print(f"ballast: {len(prefix)} extended queries in {time.perf_counter() - t0:.1f}s")
    print("storage before B:", storage_info(spark))
    b = timed_reps(spark, fn, sf_dir, reps)
    print(f"B (post-ballast, same session): median={statistics.median(w for w, _ in b):.3f} reps={b}")
    print("storage after B:", storage_info(spark))
    print("env:", load_snapshot())
    spark.stop()


if __name__ == "__main__":
    main()
