"""Exactly-once foreachBatch sink: idempotent parquet writes for a
streaming silver layer (SURVEY.md §2.10 extension; the reference's only
sink-side idempotency is swallowing duplicate-key errors, app.py:392-394 —
here it is a real transactional contract).

Structured Streaming's foreachBatch gives at-least-once delivery: after a
crash the last micro-batch may be replayed with the SAME batch_id. The two
standard exactly-once recipes, both implemented here:

* **Commit ledger** (`IdempotentBatchSink`): a tiny `_committed/<id>`
  marker dir per batch alongside the data. A replayed batch_id is a no-op.
  Works for append-only sinks at any scale — the ledger grows by one empty
  file per micro-batch and old markers can be pruned past the checkpoint
  retention horizon.
* **Dynamic partition overwrite** (`overwrite_date_partitions`): each
  batch rewrites exactly the date partitions it touches
  (`partitionOverwriteMode=dynamic`), so replay converges to the same
  bytes. This is the pattern for late-data upserts into a
  date-partitioned silver table when batches align with partitions.

At 100 TB/day rates both write paths stay fully distributed — the driver
only touches the marker file; data files are written by executors with the
normal parquet committer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentBatchSink:
    """foreachBatch callable with a batch-id commit ledger.

    Usage::

        sink = IdempotentBatchSink(path)
        stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", ckpt).start()
    """

    def __init__(self, path: str, partition_by: tuple[str, ...] = ()):
        self.path = path
        self.partition_by = tuple(partition_by)
        self.ledger = os.path.join(path, "_committed")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.ledger, str(batch_id))

    def already_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.already_committed(batch_id):
            return  # replay after recovery — the data is already down
        writer = batch_df.write.mode("append")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)
        # Marker last: if we crash between data write and marker, the batch
        # replays and appends twice — so the marker is written only after a
        # SUCCESSFUL write, and readers must either tolerate the rare
        # crash-window dup or use the partition-overwrite variant below,
        # which converges under replay with no ledger at all.
        os.makedirs(self.ledger, exist_ok=True)
        with open(self._marker(batch_id), "w", encoding="utf-8"):
            pass


def overwrite_date_partitions(batch_df: DataFrame, path: str, date_col: str = "event_date") -> None:
    """foreachBatch body: rewrite exactly the date partitions present in
    this batch (dynamic partition overwrite). Replaying the batch rewrites
    the same partitions with the same rows — idempotent without a ledger,
    provided the batch is deterministic (file-source batches are: the
    offset log pins the exact input files per batch_id)."""
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        batch_df.write.mode("overwrite")
        .partitionBy(date_col)
        .parquet(path)
    )
