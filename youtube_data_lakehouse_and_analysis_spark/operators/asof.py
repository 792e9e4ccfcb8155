"""As-of join — an operator Spark lacks natively (pyspark guide: bucketize
or merge_asof per group). This is the scalable composition form:

    union the two streams with a tag → one window pass per key carrying
    the last right-side ROW forward (last(struct, ignorenulls) over rows
    between unbounded preceding and current) → keep left rows.

One shuffle on the key, no join, no per-group pandas — survives arbitrary
key cardinality and 100 TB row counts. Skew on a hot key is the only
hazard, mitigated by AQE or key salting upstream. The right row is carried
as a single struct so all attached columns come from the SAME matched row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts for the same `on` key (backward as-of join —
    pd.merge_asof / DuckDB ASOF JOIN semantics; ties at equal timestamps
    match, per ASOF's <= contract).

    Returns all left columns + `asof_ts` (the matched right_ts) +
    right_cols. With `tolerance` (e.g. '30 minutes'), matches older than
    left_ts - tolerance are nulled."""
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rrow = F.struct(F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in right_cols])
    rt = (
        right.select(F.col(on), F.col(right_ts).alias("_ts"), rrow.alias("_rrow"))
        .withColumn("_side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal _ts (side 0 < 1) so an
    # exactly-simultaneous right row is visible to its left row.
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last(F.col("_rrow"), ignorenulls=True).over(w))
    out = (
        carried.filter(F.col("_side") == 1)
        .withColumn("asof_ts", F.col("_match.asof_ts"))
        .withColumns({c: F.col(f"_match.{c}") for c in right_cols})
        .drop("_side", "_ts", "_rrow", "_match")
    )
    if tolerance is not None:
        # materialize the predicate BEFORE nulling asof_ts, or later
        # columns would evaluate it against the already-nulled match
        out = out.withColumn(
            "_expired", F.col("asof_ts") < F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
        )
        for c in ["asof_ts", *right_cols]:
            out = out.withColumn(c, F.when(F.col("_expired"), None).otherwise(F.col(c)))
        out = out.drop("_expired")
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Forward as-of join: for each left row, attach the EARLIEST right
    row with right_ts >= left_ts for the same key (the "next reading
    after" lookup — next quote after a trade, next purchase after a
    click). Ties at equal timestamps match, mirroring asof_join's <=
    contract.

    Same one-shuffle union+window composition as the backward form, with
    the scan inverted: descending timestamp order, right rows first at
    equal _ts, last(ignorenulls) carries the nearest FOLLOWING right
    row."""
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rrow = F.struct(F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in right_cols])
    rt = (
        right.select(F.col(on), F.col(right_ts).alias("_ts"), rrow.alias("_rrow"))
        .withColumn("_side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.desc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last(F.col("_rrow"), ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .withColumn("asof_ts", F.col("_match.asof_ts"))
        .withColumns({c: F.col(f"_match.{c}") for c in right_cols})
        .drop("_side", "_ts", "_rrow", "_match")
    )
