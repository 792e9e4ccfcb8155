"""Full k-means (Lloyd) driver over the quantized embedding column —
the iterative-ML loop whose single step is plans/similarity.py::sim06.

Per iteration: broadcast the K current centroids, assign every vector by
exact integer squared-euclidean argmin (tie → lowest centroid id),
recompute each centroid as the element-wise integer mean of its members
(floor division — keeps every coordinate an exact int64, so iterations
are bit-reproducible across engines and runs), repeat until assignments
stop changing. Centroids live in a driver-side list (K×dim ints — a few
KB at ANY corpus size); the fact table is scanned once per iteration
with stateless per-row work and one K-key reduce.

Scale practice demonstrated here: per-iteration state broadcast not
joined, assignment DataFrames cached and released generation-by-
generation, and convergence checked with a 1-row aggregate (count of
changed assignments) instead of collecting assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def _assign(q: DataFrame, cent: DataFrame) -> DataFrame:
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c_vec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        q.crossJoin(F.broadcast(cent))
        .select("vec_id", "qv", "centroid_id", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("centroid_id", "d2", "qv"), F.struct("d2", "centroid_id")
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.centroid_id").alias("centroid_id"),
            F.col("best.d2").alias("d2"),
            F.col("best.qv").alias("qv"),
        )
    )


def lloyd(
    spark: SparkSession, vectors: DataFrame, k: int, max_iter: int = 20
) -> tuple[DataFrame, list[int], int]:
    """vectors: (vec_id long, qv array<long>). Seeds = the k lowest
    vec_ids (deterministic). Returns (final assignment DataFrame,
    per-iteration inertia history, iterations run)."""
    dim = len(vectors.select("qv").first()["qv"])
    cent = (
        vectors.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").cast("int").alias("centroid_id"), F.col("qv").alias("c_vec"))
    )
    assigned = _assign(vectors, cent).cache()
    history: list[int] = []
    iters = 0
    for iters in range(1, max_iter + 1):
        history.append(assigned.agg(F.sum("d2")).collect()[0][0])
        # element-wise integer-mean centroids (floor division: exact int64)
        sums = assigned.groupBy("centroid_id").agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new_rows = [
            Row(
                centroid_id=r["centroid_id"],
                c_vec=[int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)],
            )
            for r in sums.collect()
        ]
        new_cent = spark.createDataFrame(new_rows, "centroid_id int, c_vec array<bigint>")
        nxt = _assign(vectors, new_cent).cache()
        changed = (
            nxt.alias("n")
            .join(assigned.alias("o"), "vec_id")
            .filter(F.col("n.centroid_id") != F.col("o.centroid_id"))
            .count()
        )
        assigned.unpersist()
        assigned = nxt
        if changed == 0:
            break
    history.append(assigned.agg(F.sum("d2")).collect()[0][0])
    return assigned, history, iters
