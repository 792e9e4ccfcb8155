"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Sorting a table by ONE column gives parquet row-group min/max stats that
prune scans on that column only; predicates on any other column read
everything. Interleaving the bits of two (or more) columns into a Morton
key and range-sorting by it bounds EVERY interleaved dimension's extent
within each file — so min/max skipping works for predicates on either
column. This is Delta/Iceberg OPTIMIZE ZORDER BY, built from plain
expressions: quantize each dimension to a 16-bit rank (broadcast global
extent, integer math — a13's recipe), spread bits with the standard
Morton magic masks, OR the spread words together, and range-partition-
sort on the key before writing.

Everything is JVM-side column expressions (shift/and/or) — zero Python,
zero shuffle beyond the one range sort the rewrite needs anyway.
`tests/test_advanced_ops.py` checks effectiveness quantitatively: the
mean per-file extent of the secondary dimension under z-order must be a
fraction of what a primary-column sort leaves.

At 100 TB this runs as the compaction job (catalog.py's OPTIMIZE step)
over each newly-ingested partition; quantization extents come from the
previous run's stats rather than an extra scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread a 16-bit value's bits into the even positions of 32 bits."""
    for shift, mask in _SPREAD_MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def _rank16(c: Column, lo: Column, hi: Column) -> Column:
    """Quantize to [0, 65535] with exact integer math (a13's recipe)."""
    return ((c - lo) * 65535).cast("bigint") / F.when(hi > lo, hi - lo).otherwise(1)


def morton_key(a: Column, a_lo: Column, a_hi: Column, b: Column, b_lo: Column, b_hi: Column) -> Column:
    """32-bit-interleaved Morton key of two quantized dimensions."""
    ra = F.floor(_rank16(a, a_lo, a_hi)).cast("long")
    rb = F.floor(_rank16(b, b_lo, b_hi)).cast("long")
    return _spread16(ra).bitwiseOR(F.shiftleft(_spread16(rb), 1))


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int) -> DataFrame:
    """Return `df` range-sorted by the Morton key of (col_a, col_b) in
    `n_files` partitions — write the result with a plain parquet writer
    and each file carries tight min/max bounds on BOTH columns."""
    ext = df.agg(
        F.min(col_a).alias("_alo"),
        F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"),
        F.max(col_b).alias("_bhi"),
    )
    key = morton_key(
        F.col(col_a), F.col("_alo"), F.col("_ahi"),
        F.col(col_b), F.col("_blo"), F.col("_bhi"),
    )
    return (
        df.join(F.broadcast(ext))
        .withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "_alo", "_ahi", "_blo", "_bhi")
    )
