"""Write `.explain("formatted")` snapshots for named catalog queries to
plans/<tag>/<name>_<suffix>.txt — the before/after plan evidence an
optimization round commits alongside its numbers.

Usage:
  python tools/capture_plans.py --tag r15 --suffix after q01_project_filter dd18_containment_pairs
  python tools/capture_plans.py --tag r15 --suffix after --from-dir plans/r15  # every *_before.txt name

Runs on the SAME tuned session as the bench (get_spark) at
$SPARK_GRAFT_SF_DIR (default sf0.1, matching the bench scale the plans
describe)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]

    def flag(name: str, default: str) -> str:
        if name in args:
            i = args.index(name)
            val = args[i + 1]
            del args[i : i + 2]
            return val
        return default

    tag = flag("--tag", "r15")
    suffix = flag("--suffix", "after")
    from_dir = flag("--from-dir", "")
    names = list(args)
    if from_dir:
        names += sorted(
            f[: -len("_before.txt")]
            for f in os.listdir(from_dir)
            if f.endswith("_before.txt")
        )

    import __spark_entry__ as entrymod
    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        qe = df._jdf.queryExecution()
        text = spark.sparkContext._jvm.PythonSQLUtils.explainString(qe, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
