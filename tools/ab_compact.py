"""A/B the catalog layout-compaction in ONE process (the box shows ±15%
cross-run noise; in-process interleaved medians are stable).

Usage: python tools/ab_compact.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

HEADLINE = [
    "q01_project_filter",
    "q05_groupwise_max",
    "a01_pricing_summary",
    "j05_star_join",
    "dd02_minhash_signatures",
    "sim01_bruteforce_topk",
    "ta01_token_stats",
    "mm02_decode_features",
]


def timed(spark, fn) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("ab-compact")
    queries = entrymod.queries()
    for mode, env in (("raw", "1"), ("compacted", "")):
        if env:
            os.environ["SPARK_GRAFT_NO_COMPACT"] = env
        else:
            os.environ.pop("SPARK_GRAFT_NO_COMPACT", None)
        total = 0.0
        per = {}
        for name in HEADLINE:
            fn = queries[name]
            timed(spark, fn)  # warm-up (also triggers one-time compaction)
            per[name] = round(statistics.median(timed(spark, fn) for _ in range(3)), 3)
            total += per[name]
        print(f"{mode:10s} total={total:.2f}s  {per}")
    spark.stop()


if __name__ == "__main__":
    main()
