"""Range (interval) join — points to containing intervals, without an
equi key. Spark's planner turns a bare inequality join into a nested-loop
join (fine only when one side broadcasts), so the scale path is the
standard bucketized rewrite:

    point  → one bucket      (floor(p / W))
    interval → covered buckets (sequence(floor(lo/W), floor(hi/W)))
    equi-join on bucket → re-check the exact predicate.

Each (point, interval) candidate pair meets in exactly one bucket (the
point's), so no post-join dedup is needed. Cost: |points| + Σ interval
spans / W shuffled rows instead of |points| × |intervals| comparisons.
Pick W near the median interval width so intervals explode to O(1)
buckets each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi.

    Returns all point columns + all interval columns. `how` supports
    'inner' and 'left_outer' (unmatched points kept with null interval
    columns)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r}")
    w = F.lit(bucket_width)
    p = points.withColumn("_bkt", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
        ),
    )
    cond = (
        (p["_bkt"] == iv["_bkt"])
        & (p[point_col] >= iv[lo_col])
        & (p[point_col] < iv[hi_col])
    )
    joined = p.join(iv, cond, how=how)
    return joined.drop("_bkt")
