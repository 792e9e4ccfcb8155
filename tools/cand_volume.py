"""Candidate-volume diagnostic for the prefix-filtered pair machinery
(r16, VERDICT r15 item 1): counts, per pair query shape, the rows flowing
through each stage of `_overlap_candidates` — exploded probe/index rows,
combo-join matches BEFORE dedup, distinct candidate pairs, verified
output — and, alongside, what a PPJoin POSITIONAL filter would leave.

The positional filter (Xiao et al., WWW'08 §3.2 lifted to the 2-shingle
combo signatures): a matched combo whose second shingle sits at 1-based
position j in a doc of n distinct shingles leaves at most n - j shingles
after it, so the pair's true overlap c ≤ 2 + min(n_p - j_p, n_i - j_i).
If that upper bound is below the pair's required overlap (t of the min
side — and for symmetric metrics also ts of the max side), the match
cannot witness a qualifying pair.  The pair's CANONICAL combo (its two
globally-smallest common shingles) always passes: every common shingle
except s1 is ≥ s2, so j ≤ n - c + 2 in BOTH docs, i.e. the bound ≥ c.
Hence filtering matches positionally keeps every qualifying pair —
the candidate set shrinks, the output cannot (lossless).

Usage: python tools/cand_volume.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from youtube_data_lakehouse_and_analysis_spark.catalog import checkpoint, load  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.functions.text import bind  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.operators import dedup as D  # noqa: E402
from youtube_data_lakehouse_and_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def pos_combo_structs(upto):
    """combo_hashes with each combo's (hash, rem) where rem = n - j is the
    suffix length after the combo's SECOND shingle (1-based position
    j = i + jj + 2 for outer index i, inner slice index jj, both 0-based)."""
    head_h = F.transform(F.slice("shingles", 1, upto), lambda s: F.xxhash64(s))
    return bind(
        head_h,
        lambda hh: F.flatten(
            F.transform(
                hh,
                lambda x, i: F.transform(
                    F.slice(hh, i + F.lit(2), F.greatest(upto - i - 1, F.lit(0))),
                    lambda y, jj: F.struct(
                        F.xxhash64(x, y).alias("c"),
                        (F.col("n") - (i + jj + F.lit(2))).cast("int").alias("rem"),
                    ),
                ),
            )
        ),
    )


def legs(arr, symmetric: bool):
    if symmetric:
        idx_upto = F.least(F.col("n"), F.col("n") - F.col("ts") + 2)
    else:
        idx_upto = F.col("n")
    combo_ok = (F.col("t") >= 2) & (idx_upto <= D._COMBO_MAX_PREFIX)
    spill_ok = (F.col("t") >= 2) & (idx_upto > D._COMBO_MAX_PREFIX)
    big = arr.filter(combo_ok)
    spill = arr.filter(spill_ok)
    small = arr.filter(F.col("t") <= 1)
    probe = big.select(
        F.col("doc_id").alias("doc_p"),
        F.col("t").alias("t_p"),
        *([F.col("ts").alias("ts_p")] if symmetric else []),
        F.explode(pos_combo_structs(F.col("n") - F.col("t") + 2)).alias("k"),
    ).select("doc_p", "t_p", *(["ts_p"] if symmetric else []), F.col("k.c").alias("combo"), F.col("k.rem").alias("rem_p"))
    index = big.select(
        F.col("doc_id").alias("doc_i"),
        F.col("t").alias("t_i"),
        *([F.col("ts").alias("ts_i")] if symmetric else []),
        F.explode(pos_combo_structs(idx_upto)).alias("k"),
    ).select("doc_i", "t_i", *(["ts_i"] if symmetric else []), F.col("k.c").alias("combo"), F.col("k.rem").alias("rem_i"))
    return big, spill, small, probe, index


def report(tag: str, arr_df, symmetric: bool):
    arr = checkpoint(arr_df)
    big, spill, small, probe, index = legs(arr, symmetric)
    n_docs = arr.count()
    print(f"\n=== {tag} (sf={SF_DIR}) ===")
    print(f"docs={n_docs} combo-leg={big.count()} spill-leg={spill.count()} small-leg={small.count()}")
    t0 = time.time()
    np_, ni = probe.count(), index.count()
    print(f"probe rows={np_} index rows={ni}  (emit count {time.time()-t0:.1f}s)")
    joined = probe.hint("merge").join(index, "combo").filter(F.col("doc_p") != F.col("doc_i"))
    t0 = time.time()
    n_match = joined.count()
    print(f"combo-join matches (pre-dedup) = {n_match}  ({time.time()-t0:.1f}s)")
    posf = joined.filter(
        (F.lit(2) + F.least("rem_p", "rem_i")) >= F.least("t_p", "t_i")
    )
    t0 = time.time()
    n_pos = posf.count()
    print(f"  after positional filter (t-min bound) = {n_pos}  ({time.time()-t0:.1f}s)")
    if symmetric:
        posf2 = posf.filter(
            (F.lit(2) + F.least("rem_p", "rem_i")) >= F.greatest("ts_p", "ts_i")
        )
        print(f"  after + ts-max bound = {posf2.count()}")
    pairs = joined.select(
        F.least("doc_p", "doc_i").alias("doc_a"), F.greatest("doc_p", "doc_i").alias("doc_b")
    ).distinct()
    pos_pairs = posf.select(
        F.least("doc_p", "doc_i").alias("doc_a"), F.greatest("doc_p", "doc_i").alias("doc_b")
    ).distinct()
    print(f"distinct candidate pairs: unfiltered={pairs.count()} positional={pos_pairs.count()}")


def main() -> None:
    spark = get_spark("cand-volume")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, SF_DIR, "documents")

    # dd18 shape: containment τ=0.3 (asymmetric, full index prefixes)
    sh = D.shingle_rows(docs, "doc_id", "text", 3)
    arr18 = D._doc_arrays(sh, "doc_id").withColumn(
        "t", F.ceil(F.lit(0.3) * F.col("n") - F.lit(D._T_SLACK)).cast("int")
    )
    report("dd18 containment tau=0.3", D._maybe_spread_arr(arr18, "doc_id", None), symmetric=False)

    # dd22 shape: jaccard τ=0.5 (symmetric bounds)
    sh2 = D.shingle_rows(docs, "doc_id", "text", 3)
    arr22 = D.jaccard_overlap_bounds(D._doc_arrays(sh2, "doc_id"), 0.5)
    report("dd22 jaccard tau=0.5", D._maybe_spread_arr(arr22, "doc_id", 0.5), symmetric=True)

    # dd04 shape: jaccard τ=0.02
    sh3 = D.shingle_rows(docs, "doc_id", "text", 3)
    arr04 = D.jaccard_overlap_bounds(D._doc_arrays(sh3, "doc_id"), 0.02)
    report("dd04 jaccard tau=0.02", D._maybe_spread_arr(arr04, "doc_id", 0.02), symmetric=True)
    spark.stop()


if __name__ == "__main__":
    main()
