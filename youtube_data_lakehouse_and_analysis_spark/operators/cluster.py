"""Connected components over a pair graph — the step that turns near-dup
candidate PAIRS into duplicate CLUSTERS (one canonical doc per component).

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round a node takes the min of its label and its
neighbors' labels; fixpoint = components labeled by their min member.
Each round is one shuffle-join + one partial-aggregatable min — pure
DataFrame ops, and the driver loop iterates O(graph diameter) times over
PLANS, never over rows. `localCheckpoint` truncates lineage each round
(mandatory for iterative Spark — otherwise plan depth grows linearly and
planning time explodes).

Scale: dedup graphs are huge in nodes but shallow in diameter (duplicate
clusters are near-cliques), so the simple propagation converges in a few
rounds. For adversarial long-chain graphs, the upgrade path is
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce"), which pointer-doubles to O(log n) rounds with the same
per-round join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import checkpoint


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iterations: int = 25
) -> DataFrame:
    """Label each node of the undirected pair graph with its component's
    minimum node id. Returns (id, component). Raises if the fixpoint is
    not reached within max_iterations."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = und.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    for _ in range(max_iterations):
        nbr = (
            und.join(
                labels.select(F.col("id").alias("b"), F.col("label").alias("nl")), on="b"
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_min"))
            .select(F.col("a").alias("id"), "nbr_min")
        )
        proposed = labels.join(nbr, on="id", how="left").select(
            "id", F.least("label", F.coalesce("nbr_min", F.col("label"))).alias("label")
        )
        proposed = checkpoint(proposed, eager=True)
        changed = (
            labels.select("id", F.col("label").alias("old"))
            .join(proposed, on="id")
            .filter(F.col("old") != F.col("label"))
            .count()
        )
        labels = proposed
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")
