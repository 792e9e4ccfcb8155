"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Methodology: session startup excluded; per query one warm-up then the
median of 5 timed runs (the box shows ±15% run-to-run noise under driver
load — 5 samples keep the median stable); execution via the noop sink
(full plan runs, no driver-side row transfer skewing the number).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference workload's heavy hitters + one per extension
# family (dedup / similarity / text / multimodal) — the queries whose cost
# profile would dominate a real deployment.
HEADLINE = [
    "q01_project_filter",
    "q03_topk_orders",
    "q05_groupwise_max",
    "q05_groupwise_max_window",
    "q08_distinct_year",
    "q09_groupby_avg",
    "q10_topk_count",
    "j01_inner_join_agg",
    "j05_star_join",
    "a01_pricing_summary",
    "w01_topk_per_group",
    "dd01_exact_dedup",
    "dd02_minhash_signatures",
    "sim01_bruteforce_topk",
    "ta01_token_stats",
    "mm02_decode_features",
]


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench")
    queries = entrymod.queries()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        run_query(spark, fn, SF_DIR)  # warm-up (JIT, parquet footer cache)
        timings[name] = round(statistics.median(run_query(spark, fn, SF_DIR) for _ in range(5)), 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
