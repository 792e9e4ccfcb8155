"""BPE-style merge training as an iterative Spark driver loop.

Each iteration is plans/corpus2.py::ta10's one-shuffle job — count every
adjacent symbol pair, pick the argmax under a (count DESC, pair ASC)
total order — followed by a pure map-side apply: rewrite the winning
pair "a b" into the merged symbol "a_b" across the corpus, left-to-right
non-overlapping (Java replaceAll semantics, the BPE convention). Here
symbols are words (the synthetic corpus' granularity); byte/char BPE is
the identical loop over a different initial split.

Scale: the per-iteration job is one power-law-absorbing partial-agg
shuffle; the merge table the trainer accumulates is tiny (vocab-sized)
and rides the driver. The corpus DataFrame is re-derived per iteration
from the previous, so the plan would deepen linearly — `train_merges`
caches each generation and drops the previous, keeping lineage bounded
(localCheckpoint would cut it entirely for 10k-merge runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_counts(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    ws = F.split(F.col(text_col), " ")
    return (
        corpus.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(F.explode(F.sequence(F.lit(0), F.size("ws") - 2)).alias("i"), "ws")
        .select(
            F.struct(
                F.element_at("ws", F.col("i") + 1).alias("a"),
                F.element_at("ws", F.col("i") + 2).alias("b"),
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n"))
    )


def apply_merge(corpus: DataFrame, a: str, b: str, text_col: str = "text") -> DataFrame:
    """Rewrite every non-overlapping "a b" into "a_b" (map-side only)."""
    pattern = rf"\b\Q{a}\E \Q{b}\E\b"
    return corpus.withColumn(
        text_col, F.regexp_replace(text_col, pattern, f"{a}_{b}")
    )


def train_merges(
    corpus: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run `n_merges` BPE iterations; returns (merge list with counts,
    final rewritten corpus). Deterministic: the argmax pair is taken
    under a (count DESC, a ASC, b ASC) total order."""
    merges: list[tuple[str, str, int]] = []
    cur = corpus.cache()
    try:
        for _ in range(n_merges):
            top = (
                pair_counts(cur, text_col)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break  # nothing left worth merging
            a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
            merges.append((a, b, n))
            nxt = apply_merge(cur, a, b, text_col).cache()
            nxt.count()  # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
        return merges, cur
    except Exception:
        cur.unpersist()
        raise
