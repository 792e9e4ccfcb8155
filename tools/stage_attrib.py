"""Per-stage wall-clock attribution for catalog queries (guide §1 / §7.1):
with the UI disabled on the tuned session, the event log is the only
artifact that says WHICH stage a slow query spends its time in.

Usage:
  python tools/stage_attrib.py dd18_containment_pairs gr04_kcore_peel
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/stage_attrib.py ...

Method: one tuned session (session.get_spark + event logging), per query
one warm-up rep then one timed rep executed through the bench's noop sink
under a job-group label; the event log is parsed after spark.stop() and
each labeled job's stages are printed with duration, task count, and
shuffle/input sizes (from the driver-aggregated accumulables present in
SparkListenerStageCompleted).  Durations are per-stage wall (completion −
submission); concurrent stages overlap, so the sum can exceed the rep
wall — read it as attribution, not as a partition of the wall clock.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_ATTRIB_REPS", "1"))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        raise SystemExit("usage: stage_attrib.py <query> [<query> ...]")

    import __spark_entry__ as entrymod
    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        "stage-attrib",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    walls: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobGroup(f"warm:{name}", name)
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        walls[name] = []
        for rep in range(REPS):
            spark.sparkContext.setJobGroup(f"timed:{name}:{rep}", name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            walls[name].append(time.perf_counter() - t0)
    # Reset via the supported API: setJobGroup(None, None) relies on the
    # JVM tolerating null strings, which typed/connect builds reject
    # (r15 ADVICE).
    try:
        spark.sparkContext._jsc.clearJobGroup()
    except Exception:
        pass  # tool-only cleanup; the session stops next anyway
    spark.stop()

    # --- parse the event log -------------------------------------------
    evfiles = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            # Spark 4 rolling layout: eventlog_v2_<app>/events_1_<app> plus an
            # empty appstatus_<app> marker file — only the events_* files are
            # JSON-lines.  The single-file layout is just <app-id>.
            if f.startswith("appstatus_"):
                continue
            evfiles.append(os.path.join(root, f))
    stage_to_group: dict[int, str] = {}
    stages: list[dict] = []
    for path in evfiles:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue  # non-JSON artifacts (empty markers, partial tails)
                ev = json.loads(line)
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                    for si in ev.get("Stage Infos", []):
                        stage_to_group[si["Stage ID"]] = group
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    if sub is None or comp is None:
                        continue
                    acc = {
                        a["Name"]: a.get("Value")
                        for a in si.get("Accumulables", [])
                        if isinstance(a.get("Value"), (int, float))
                        or str(a.get("Value", "")).isdigit()
                    }

                    def num(key: str) -> int:
                        try:
                            return int(acc.get(key, 0))
                        except (TypeError, ValueError):
                            return 0

                    stages.append(
                        {
                            "id": si["Stage ID"],
                            "name": si.get("Stage Name", ""),
                            "sec": (comp - sub) / 1000.0,
                            "tasks": si.get("Number of Tasks", 0),
                            "shuffle_read": num("internal.metrics.shuffle.read.remoteBytesRead")
                            + num("internal.metrics.shuffle.read.localBytesRead"),
                            "shuffle_write": num("internal.metrics.shuffle.write.bytesWritten"),
                            "input": num("internal.metrics.input.bytesRead"),
                            "cpu_ms": num("internal.metrics.executorRunTime"),
                        }
                    )
    shutil.rmtree(evdir, ignore_errors=True)

    for name in names:
        wall = min(walls[name])
        print(f"\n=== {name}  wall(min of {REPS})={wall:.3f}s  sf={SF_DIR} ===")
        mine = [
            s
            for s in stages
            if stage_to_group.get(s["id"], "").startswith(f"timed:{name}:")
        ]
        mine.sort(key=lambda s: -s["sec"])
        tot = sum(s["sec"] for s in mine)
        print(f"  {len(mine)} stages, Σstage={tot:.3f}s (overlap possible)")
        for s in mine[:14]:
            print(
                f"  {s['sec']:7.3f}s  tasks={s['tasks']:4d} run={s['cpu_ms']/1000.0:7.2f}s "
                f"in={s['input']>>20}MB sr={s['shuffle_read']>>20}MB "
                f"sw={s['shuffle_write']>>20}MB  {s['name'][:90]}"
            )


if __name__ == "__main__":
    main()
