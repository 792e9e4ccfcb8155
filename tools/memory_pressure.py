"""Memory-pressure completion gate (r12, r11 verdict ask #7).

The bench box runs 128 GiB — roomy enough that a hidden O(data) driver-
or executor-side materialization (an uncapped collect_list, a broadcast
of a fact-sized side, a window frame that buffers a whole partition)
would never surface as a failure.  This gate runs the 16 frozen headline
queries plus the 10 scaling-audit suspects ONCE at sf0.1 in a JVM capped
at ``spark.driver.memory=2g`` on local[4] (in local mode that single JVM
is driver AND all executors), executing each plan through the noop sink
(full computation, no result-transfer skew; same methodology as
bench.py).  Completion is the assertion: at 2 GiB, anything that
materializes a data-sized structure in memory OOMs instead of quietly
fitting; honest shuffles and sorts spill to disk and finish.

The heap cap must exist BEFORE the JVM launches, so run this as its own
process — it refuses to reuse a live gateway.

Usage: python tools/memory_pressure.py [--json] [query ...]
Exit 0 = every gated query completed under the 2 GiB heap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["SPARK_DRIVER_MEMORY"] = "2g"

HEAP = "2g"
CPUS = 4
SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    emit_json = "--json" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    from pyspark import SparkContext

    if SparkContext._active_spark_context is not None:  # noqa: SLF001
        print("refusing to run inside a live Spark JVM: heap cap needs a fresh process", file=sys.stderr)
        return 2

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from tools.scaling_audit import AUDITED, LONGDOCS_AUDITED
    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    # Default set = headline + BOTH audit families (r13, ADVICE): the
    # longdocs-audited operators (dd04/dd22/ta04/ta08 beyond the sf set)
    # all run fine at sf0.1, and dd22 is the flagship discovery operator —
    # its heap profile must stay gated, not re-checked ad hoc.
    gated = list(HEADLINE) + list(AUDITED) + list(LONGDOCS_AUDITED)
    names = only or list(dict.fromkeys(gated))
    spark = get_spark("memory-pressure", cpus=CPUS)
    assert spark.conf.get("spark.driver.memory") == HEAP

    queries = entrymod.queries()
    results = {}
    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[name] = {"ok": True, "sec": round(time.perf_counter() - t0, 3)}
            print(f"ok   {name:32s} {results[name]['sec']:7.2f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — the gate reports, not masks
            results[name] = {"ok": False, "error": str(exc)[:500]}
            failures.append(name)
            print(f"FAIL {name:32s} {type(exc).__name__}: {str(exc)[:200]}", file=sys.stderr)

    if emit_json:
        print(json.dumps({"heap": HEAP, "cpus": CPUS, "sf_dir": SF_DIR, "results": results}, indent=2))
    if failures:
        print(f"MEMORY-PRESSURE FAILURES: {failures}", file=sys.stderr)
        return 1
    print(f"{len(results)} queries completed under a {HEAP} heap at sf0.1", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
