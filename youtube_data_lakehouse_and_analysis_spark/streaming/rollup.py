"""Streaming incremental-rollup maintenance (the ia01 algebra, online).

A foreachBatch sink that folds each micro-batch's partial (count, sum)
states into a persistent per-key rollup table: aggregate ONLY the batch,
merge against the stored states, publish a new version atomically. This
is how a 100 TB rollup stays current against an event stream without ever
rescanning history — the batch twin is `plans/lakehouse.py::ia01`, whose
oracle gate proves the merge algebra equals a full recompute.

Exactly-once under replay: the per-batch commit marker IS the publication
pointer (one atomically-renamed file naming the version it committed), so
there is no window where a batch is half-published — a crash before the
marker leaves the previous version current and the replay rebuilds the
merge from it; a crash after leaves the batch fully committed and the
replay no-ops. (A transactional table format provides exactly this
commit-log protocol natively; this is the plain-parquet construction.)

Sums accumulate in DECIMAL(18,2): additive, order-independent, so the
maintained table is bit-identical to a recompute regardless of how the
stream was chopped into batches (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RollupMaintainer:
    """foreachBatch callable: maintain per-key (n_items, total) states.

    `key`: grouping column; `amount`: summed column (cast DECIMAL(18,2)).
    Read the current table with `current(spark)`.
    """

    def __init__(self, path: str, key: str, amount: str):
        self.path = path
        self.key = key
        self.amount = amount
        os.makedirs(os.path.join(path, "_commits"), exist_ok=True)

    # -- commit log ----------------------------------------------------------
    def _commits_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self._commits_dir(), f"batch-{batch_id}")

    def _latest_version(self) -> str | None:
        """The version named by the highest-batch-id commit marker."""
        best: tuple[int, str] | None = None
        for name in os.listdir(self._commits_dir()):
            if name.startswith("batch-"):
                bid = int(name.split("-", 1)[1])
                if best is None or bid > best[0]:
                    with open(os.path.join(self._commits_dir(), name)) as f:
                        best = (bid, f.read().strip())
        return best[1] if best else None

    def current(self, spark) -> DataFrame | None:
        v = self._latest_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.path, v))

    # -- the sink ------------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # crash-replay after full commit: no-op
        spark = batch_df.sparkSession
        partial = batch_df.groupBy(self.key).agg(
            F.count("*").alias("n_items"),
            F.sum(F.col(self.amount).cast("decimal(18,2)")).alias("total"),
        )
        cur = self.current(spark)  # never includes this batch (marker absent)
        if cur is not None:
            partial = (
                cur.unionByName(partial)
                .groupBy(self.key)
                .agg(F.sum("n_items").alias("n_items"), F.sum("total").alias("total"))
            )
        version = f"v{batch_id}"
        dest = os.path.join(self.path, version)
        shutil.rmtree(dest, ignore_errors=True)  # torn earlier attempt
        partial.write.parquet(dest)
        # single atomic commit+publish: rename a temp marker into place
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.rename(tmp, self._marker(batch_id))
