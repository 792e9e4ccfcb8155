"""PQ / IVF-PQ scaling audit (r14 verdict item 6): recall and
probe-candidate concentration at sf0.01 AND one tier up (sf0.1).

What is gated, and why these bounds:

* **Recall vs the random baseline** — sim13's recall@3 on isotropic
  synthetic vectors with M=4×K=8 codes measures low in absolute terms
  BY DESIGN (plans/similarity.py sim13 docstring: the eval exists to
  tell you to grow M/K before shipping).  The scale-meaningful
  invariant is that the codes carry signal that does not wash out as
  the corpus grows: recall@3 must stay ≥ ``RECALL_VS_RANDOM_MIN`` ×
  the random-ranking baseline 3/(n−1).  Measured r15: 0.0333 at
  sf0.01 (5.5× random) and 0.0250 at sf0.1 (16.6× random) — the ratio
  GROWS with corpus size, as it should for a distance-respecting code.
* **IVF cell skew** — sim12 probes exactly one cell per query, so the
  per-query candidate scan is the assigned cell's size.  If cells
  concentrate, the probe cost stops being |C|/n_cells and the IVF
  pruning claim dies at scale.  Gate: max_cell/mean_cell ≤
  ``CELL_SKEW_MAX`` (measured r15: 1.18 at sf0.01, 1.09 at sf0.1),
  which also bounds every query's probe fraction by
  CELL_SKEW_MAX / n_cells.
* **ADC output shape** — sim12 must return exactly top-3 per query
  (rows == 3 × n_queries): a silent under-fill would mean empty probe
  cells (assignment bug), an over-fill a window regression.

Usage: python tools/pqivf_audit.py [sf_dir ...]   (default sf0.01 sf0.1)
Exit 0 = all gates hold; prints one JSON line per sf_dir for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECALL_VS_RANDOM_MIN = 4.0
CELL_SKEW_MAX = 1.5


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from pyspark.sql import functions as F

    from youtube_data_lakehouse_and_analysis_spark.catalog import load
    from youtube_data_lakehouse_and_analysis_spark.plans.similarity import (
        sim12_ivfpq_topk,
        sim13_pq_recall,
    )
    from youtube_data_lakehouse_and_analysis_spark.session import get_spark

    spark = get_spark("pqivf-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures: list[str] = []
    for sf in sf_dirs:
        emb = load(spark, sf, "embeddings")
        cells = (
            emb.groupBy("label")
            .count()
            .agg(
                F.count("*").alias("n_cells"),
                F.sum("count").alias("n_rows"),
                F.max("count").alias("max_cell"),
                F.avg("count").alias("mean_cell"),
            )
            .collect()[0]
        )
        skew = cells["max_cell"] / cells["mean_cell"]
        t0 = time.perf_counter()
        rec = sim13_pq_recall(spark, sf).collect()[0]
        recall_wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n12 = sim12_ivfpq_topk(spark, sf).count()
        ivf_wall = round(time.perf_counter() - t0, 2)
        random_baseline = 3.0 / (cells["n_rows"] - 1)
        row = {
            "sf_dir": sf,
            "n_rows": cells["n_rows"],
            "n_cells": cells["n_cells"],
            "cell_skew": round(skew, 3),
            "max_probe_fraction": round(cells["max_cell"] / cells["n_rows"], 4),
            "recall_at_3": round(rec["recall_at_3"], 4),
            "recall_vs_random": round(rec["recall_at_3"] / random_baseline, 2),
            "n_queries": rec["n_queries"],
            "sim12_rows": n12,
            "sim13_wall_sec": recall_wall,
            "sim12_wall_sec": ivf_wall,
        }
        print(json.dumps(row))
        if skew > CELL_SKEW_MAX:
            failures.append(f"{sf}: cell skew {skew:.2f} > {CELL_SKEW_MAX}")
        if rec["recall_at_3"] < RECALL_VS_RANDOM_MIN * random_baseline:
            failures.append(
                f"{sf}: recall {rec['recall_at_3']:.4f} < "
                f"{RECALL_VS_RANDOM_MIN}x random ({random_baseline:.5f})"
            )
        if n12 != 3 * rec["n_queries"]:
            failures.append(f"{sf}: sim12 rows {n12} != 3x{rec['n_queries']} queries")
    spark.stop()
    for f in failures:
        print(f"GATE FAIL  {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
