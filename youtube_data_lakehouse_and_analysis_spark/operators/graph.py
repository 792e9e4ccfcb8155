"""Iterative graph propagation on DataFrames: fixed-point-arithmetic
PageRank. Complements operators/cluster.py (connected components) as the
second iterative-join pattern: per iteration one equi-join edges⋈ranks and
one combine-friendly groupBy on the destination key.

Determinism contract (the repo-wide rule that every oracle-checked value
must be engine-exact): ranks are scaled BIGINTs, per-edge contributions
use floor division by out-degree, and the damping step is integer
cross-multiplication ((85 · Σcontrib) div 100) — integer sums are
order-independent, so any partitioning, any engine, bit-identical ranks.
Float PageRank would differ per partitioning in the sum order alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import checkpoint

SCALE = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over directed (src, dst) edges, `iters` synchronous
    iterations from a uniform start of SCALE per node. Nodes are the
    distinct src values — callers wanting rank to flow back must
    symmetrize the edge list (every node then has out- and in-edges,
    which also removes the dangling-mass problem).

    rank_{i+1}(v) = (100-d)% · SCALE + d% · Σ_{u→v} (rank_i(u) div deg(u)),
    every operation in BIGINT.

    Scale: each iteration is one shuffle-join of the edge list with the
    |V|-sized rank table (ranks are the SMALL side — broadcastable up to
    hundreds of millions of nodes) plus one combine-friendly groupBy on
    dst. localCheckpoint per generation truncates lineage so iteration N
    does not replay iterations 1..N-1 — the same discipline as
    kmeans.lloyd and cluster.connected_components."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = deg.select("src", F.lit(SCALE).cast("long").alias("rank"))
    base = (100 - damping_pct) * SCALE // 100
    for _ in range(iters):
        contribs = (
            ranks.join(deg, on="src")
            .join(edges, on="src")
            .select(F.col("dst"), F.expr("rank div deg").alias("contrib"))
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(
                (F.lit(base) + F.expr(f"({damping_pct} * sum(contrib)) div 100"))
                .cast("long")
                .alias("rank")
            )
            .withColumnRenamed("dst", "src")
        )
        try:
            ranks = checkpoint(ranks)
        except Exception:
            pass  # checkpoint is lineage hygiene; semantics identical
    return ranks.select(F.col("src").alias("node"), "rank")
