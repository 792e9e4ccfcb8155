"""Similarity search over embedding columns (array<float>).

Determinism design: embeddings are quantized to integers
(round(x*1000) as bigint), so dot products and norms are exact integer
sums — order-independent and identical on Spark and DuckDB; the final
cosine is one double division + sqrt (IEEE-exact), so rankings agree
bit-for-bit. At 100 TB the same shapes run un-quantized with float math
(ranking tolerance replaces exact equality).

Two paths:
  * brute force — broadcast the (small) query set, crossJoin, exact top-k:
    the correctness baseline; cost |Q|×|C|.
  * random-hyperplane LSH — deterministic ±1 hyperplanes derived from md5
    (computed driver-side, embedded as literals in both engines), bucket
    join then exact rerank: the scale path; cost ~|Q|×bucket_width.

All vector math is built-in (transform/zip_with/aggregate) — no UDFs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


QUANTIZE_CLAMP = 1000.0  # |x| saturates here before scaling (see quantize)


def quantize(col: Column | str, scale: int = 1000) -> Column:
    """array<float> → array<bigint> via round(clamp(x)*scale).

    The clamp to ±QUANTIZE_CLAMP is the quantizer's SATURATION bound: it
    never binds on real embedding corpora (values are unit-norm-ish,
    |x| ≪ 1000), but it makes the integer pipeline total — a corrupt or
    adversarial ±FLT_MAX component would otherwise overflow the BIGINT
    cast under ANSI mode (maxvals degenerate layout, r9), and with the
    clamp every downstream exact-integer form stays in range: |q| ≤ 10^6,
    so dot/norm ≤ 64·10^12 and PQ sqdist ≤ 64·(2·10^6)² ≈ 2.6·10^14,
    far under 2^63.  The identical least/greatest appears in every
    DuckDB twin (same saturation semantics on both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c,
        lambda x: F.round(
            F.least(
                F.greatest(x.cast("double"), F.lit(-QUANTIZE_CLAMP)), F.lit(QUANTIZE_CLAMP)
            )
            * scale
        ).cast("long"),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<bigint> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def int_norm_sq(a: Column) -> Column:
    return int_dot(a, a)


def cosine_from_ints(dot: Column, na: Column, nb: Column) -> Column:
    """cos = dot / (sqrt(na)*sqrt(nb)) — one double op chain, engine-exact."""
    return dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))


MAX_BRUTE_FORCE_QUERIES = 10_000


def brute_force_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_BRUTE_FORCE_QUERIES,
) -> DataFrame:
    """Exact top-k cosine neighbors for every row matching query_pred.

    Execution: the query matrix (small by contract, ENFORCED by
    max_queries) ships to executors in the task closure; candidates
    stream through mapInPandas where the |batch|×|Q| dot-product block is
    one int64 numpy matmul — exact, so results are bit-identical to the
    expression form and the SQL oracle (int dots < 2^53; sqrt/div are
    IEEE ops; fp multiply is commutative).  A per-query top-k window
    trims the |C|×|Q| pair stream.

    Scale: one pass over the corpus; vectorized compute; the pair stream —
    not the vectors — shuffles for the window.  The driver-side collect
    of the query set is guarded: a query_pred matching more than
    max_queries rows raises instead of pulling the corpus to the driver
    (the limit(max+1) probe costs one scan of the matching slice, never a
    full materialization).  For |Q| beyond closure size, switch to the
    LSH path (lsh_topk)."""
    import numpy as np
    import pandas as pd

    # NULL vectors carry no geometry — excluded from both the query and
    # candidate sides (a no-op on real corpora; keeps the numpy path
    # total on degenerate inputs, r8 sweep).
    base = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), quantize(vec_col).alias("qv"))
        .withColumn("nsq", int_norm_sq(F.col("qv")))
    )
    qrows = base.filter(query_pred).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"brute_force_topk: query_pred matches more than {max_queries} "
            "rows — the query matrix ships in the task closure and must "
            "stay small. Narrow the predicate or use lsh_topk for "
            "corpus-scale query sets."
        )
    if not qrows:  # empty query set → empty result, not a 0-d matmul
        return emb.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, cosine double"
        )
    Q = np.array([list(r["qv"]) for r in qrows], dtype=np.int64)
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_norm = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))

    def score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            cos = (C @ Q.T).astype(np.float64) / (c_norm[:, None] * q_norm[None, :])
            n, m = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], n, axis=0).ravel(),
                    "cand_id": np.repeat(c_ids, m),
                    "cosine": cos.ravel(),
                }
            )

    pairs = base.mapInPandas(score, schema="query_id long, cand_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine")
    )


def matmul_score_pairs(
    prepared: DataFrame,
    vec_col: str,
    qrows: list,
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, cand_id, cosine) for every collected query row × every
    ``prepared`` row — the vectorized scoring core shared by the exact
    top-k paths (r15): each Arrow batch's |batch|×|Q| block is ONE int64
    numpy matmul inside mapInPandas, replacing the per-pair
    zip_with/aggregate expression chain (guide §4.2 — measured 3.5×
    on sim07's shape, where the whole corpus scan is a single task and
    the JVM HOF evaluation serialized on it).

    Exactness: integer dots are exact in int64 (|v| ≤ 10⁶ per component
    after quantize, so |dot| < 2⁶³); the cast to double and the
    sqrt/multiply/divide chain are the same IEEE ops the expression form
    runs, in the same order — results are bit-identical (sim01's kernel
    proved this against the DuckDB oracle since r7).  A NULL vector — or
    a vector with any NULL *component* (a null-component embedding flows
    through quantize/project as per-component nulls) — pairs with null
    cosine in the expression form via null propagation (int_dot's
    zip_with product and aggregate sum are both null-absorbing); the
    kernel classifies such rows on BOTH sides and emits those pairings
    explicitly with REAL nulls (pandas nullable Float64 → Arrow null, not
    NaN — NaN would sort above every cosine where null sorts last).  On
    real corpora the null legs are dead code inside the batch loop."""
    import numpy as np
    import pandas as pd

    def _clean(v) -> bool:
        # Driver-side rows (collect) carry null components as Python None
        # inside a list; executor-side Arrow→pandas batches render a
        # null-component list<long> as a FLOAT ndarray with NaN (an
        # all-integral list stays an int-dtype ndarray).  Both spellings
        # must land in the null-cosine leg — an int64 cast of NaN is
        # silent garbage, not an error.
        if v is None:
            return False
        if isinstance(v, np.ndarray):
            if v.dtype.kind in "iu":
                return True
            if v.dtype.kind == "f":
                return not np.isnan(v).any()
            return not pd.isna(v).any()
        return None not in v

    nn = [r for r in qrows if _clean(r[vec_col])]
    null_q_ids = np.array(
        [r[id_col] for r in qrows if not _clean(r[vec_col])], dtype=np.int64
    )
    q_ids = np.array([r[id_col] for r in nn], dtype=np.int64)
    Q = (
        np.array([list(r[vec_col]) for r in nn], dtype=np.int64)
        if nn
        else np.zeros((0, 1), dtype=np.int64)
    )
    q_norm = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    # Zero-norm vectors are out of contract (quantize of real embeddings
    # never yields all-zeros), but the expression form this kernel
    # replaces fails LOUDLY on them (DIVIDE_BY_ZERO under ANSI) where a
    # silent 0/0 here would mint NaN cosines that sort ABOVE every real
    # cosine in the descending top-k window — corrupting results instead
    # of crashing.  Preserve the fail-loud contract (r15 ADVICE).
    if (q_norm == 0).any():
        raise ValueError(
            "matmul_score_pairs: zero-norm query vector (ids "
            f"{q_ids[q_norm == 0][:5].tolist()}) — cosine is undefined; "
            "the expression form raises DIVIDE_BY_ZERO here"
        )
    n_q = len(qrows)

    def score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            vecs = pdf[vec_col]
            mask = np.fromiter((_clean(v) for v in vecs), dtype=bool, count=len(vecs))
            c_ids_all = pdf[id_col].to_numpy(dtype=np.int64)
            if mask.any() and len(q_ids):
                C = np.stack([np.asarray(v, dtype=np.int64) for v in vecs[mask]])
                c_ids = c_ids_all[mask]
                c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
                if (c_norm == 0).any():  # same fail-loud contract as q_norm
                    raise ValueError(
                        "matmul_score_pairs: zero-norm candidate vector (ids "
                        f"{c_ids[c_norm == 0][:5].tolist()}) — cosine is "
                        "undefined; the expression form raises DIVIDE_BY_ZERO"
                    )
                cos = (C @ Q.T).astype(np.float64) / (c_norm[:, None] * q_norm[None, :])
                n, m = cos.shape
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_ids[None, :], n, axis=0).ravel(),
                        "cand_id": np.repeat(c_ids, m),
                        "cosine": cos.ravel(),
                    }
                )
            n_null_c = int((~mask).sum())
            if n_null_c and n_q:
                # every query × null-vec candidates → null cosine
                all_q = np.concatenate([q_ids, null_q_ids])
                nc_ids = c_ids_all[~mask]
                yield pd.DataFrame(
                    {
                        "query_id": np.tile(all_q, n_null_c),
                        "cand_id": np.repeat(nc_ids, n_q),
                        "cosine": pd.array([pd.NA] * (n_null_c * n_q), dtype="Float64"),
                    }
                )
            if len(null_q_ids) and mask.any():
                # null-vec queries × non-null candidates → null cosine
                c_ids = c_ids_all[mask]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(null_q_ids, len(c_ids)),
                        "cand_id": np.tile(c_ids, len(null_q_ids)),
                        "cosine": pd.array(
                            [pd.NA] * (len(null_q_ids) * len(c_ids)), dtype="Float64"
                        ),
                    }
                )

    return prepared.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, cand_id long, cosine double"
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (SemDeDup-style): pairs within
    the same cell with cosine >= threshold, plus the keep/drop verdict
    (canonical = lowest id in the pair).

    The cell column is the blocking key — here a precomputed cluster label
    (in production: k-means/IVF cell id). Pairwise comparison runs only
    inside a cell, turning the O(n²) all-pairs scan into Σ|cell|²; cells
    shuffle-partition independently, so 100 TB of vectors dedups as long
    as single cells fit a partition (else: re-cluster finer or sub-block
    with LSH inside the cell).

    Sub-blocking, measured (r15, tools/semdedup_audit.py + SCALE.md
    "SemDeDup blocking"): fixed cells are exactly quadratic in
    candidates (exponent 1.998 over the vector tiers); sub-blocking by
    LSH of the RAW vector is measured-rejected (origin-anchored planes
    barely split a dense cell — exponent 1.67); sub-blocking by LSH of
    the RESIDUAL v − cell_mean (integer means, the sim12 recipe) with
    the plane count growing log2(n/cells/target) measures exponent
    1.001 over x4→x64 at planted-pair recall 0.95.  Callers needing
    bounded cells pass that composite key as `cell_col` —
    plans/advanced.py::dd23_residual_blocked_near_dup is the
    oracle-checked reference composition."""
    base = emb.select(
        F.col(cell_col).alias("_cell"), F.col(id_col), quantize(vec_col).alias("qv")
    ).withColumn("nsq", int_norm_sq(F.col("qv")))
    a = base.select(
        "_cell",
        F.col(id_col).alias("doc_a"),
        F.col("qv").alias("a_vec"),
        F.col("nsq").alias("a_nsq"),
    )
    b = base.select(
        "_cell",
        F.col(id_col).alias("doc_b"),
        F.col("qv").alias("b_vec"),
        F.col("nsq").alias("b_nsq"),
    )
    return (
        a.join(b, on="_cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "cosine",
            cosine_from_ints(int_dot(F.col("a_vec"), F.col("b_vec")), F.col("a_nsq"), F.col("b_nsq")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("_cell").alias("cell"),
            "doc_a",
            "doc_b",
            "cosine",
            F.least("doc_a", "doc_b").alias("keep_id"),
            F.greatest("doc_a", "doc_b").alias("drop_id"),
        )
    )


def hyperplane_signs(num_planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from md5 parity — identical
    constants are embedded in the Spark plan and the SQL oracle."""
    return [
        [1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1 for d in range(dims)]
        for p in range(num_planes)
    ]


def lsh_bucket(vec_q: Column, signs: list[list[int]]) -> Column:
    """Bucket id: bit p = (vec · hyperplane_p >= 0), packed little-endian.

    The input vector is bound once per row (r15): the per-plane sum
    referenced ``vec_q`` len(signs) times, re-evaluating the caller's
    inlined quantize() chain per plane."""
    from ..functions.text import bind

    def pack(vq):
        bucket = F.lit(0).cast("long")
        for p, row in enumerate(signs):
            plane = F.array(*[F.lit(s) for s in row])
            proj = int_dot(vq, plane.cast("array<long>"))
            bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        return bucket

    return bind(vec_q, pack)


def lsh_topk(
    emb: DataFrame,
    query_pred: Column,
    signs: list[list[int]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: bucket by random hyperplanes, exact-rerank within the bucket.

    Scale: the bucket equi-join replaces the crossJoin — each query only
    scores candidates in its own bucket (expected |C|/2^planes). Recall is
    tunable via multi-probe/bands; this is the single-table variant."""
    base = emb.select(F.col(id_col), quantize(vec_col).alias("qv")).withColumn(
        "nsq", int_norm_sq(F.col("qv"))
    ).withColumn("bucket", lsh_bucket(F.col("qv"), signs))
    q = base.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("q_vec"),
        F.col("nsq").alias("q_nsq"),
        F.col("bucket").alias("q_bucket"),
    )
    c = base.select(
        F.col(id_col).alias("cand_id"),
        F.col("qv").alias("c_vec"),
        F.col("nsq").alias("c_nsq"),
        F.col("bucket").alias("c_bucket"),
    )
    pairs = (
        F.broadcast(q)
        .join(c, on=q["q_bucket"] == c["c_bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    scored = pairs.withColumn(
        "cosine",
        cosine_from_ints(int_dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nsq"), F.col("c_nsq")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine")
    )


def int8_requantize(qv: Column) -> Column:
    """Symmetric int8 re-quantization of an integer-grid vector: each
    component maps to round(v / amax * 127) ∈ [-127, 127], amax = max|v|.

    The scale-compression step of quantized vector search (FAISS SQ8 /
    Milvus-style): 8 bits per dimension is 4× less vector IO and memory
    than float32 at ~1% cosine-ranking error, which is what makes a
    100 TB embedding corpus scannable.

    Rounding runs entirely on integers — round(a/b) for a,b > 0 is
    (2a + b) div (2b), applied to |v| with the sign re-attached — so the
    result is bit-identical on Spark and DuckDB with no float-tie
    hazard (round-half-away-from-zero semantics on both by
    construction). A zero vector (amax = 0) stays all-zero. The double
    division inside floor() is safe: operands are < 2^35, so the
    quotient is within 2^-25 of the rational value, far beyond the
    half-ulp it would take to cross an integer boundary.

    Evaluation shape (r15): the input vector and its amax are BOUND once
    per row (functions.text.bind).  The r14 form referenced ``amax``
    inside the per-component lambda, which re-evaluates
    array_max(transform(...)) — with the caller's quantize() chain
    inlined by CollapseProject — for EVERY component: 64× the work per
    row, the exact hazard word_shingles documents.  Same math, same
    bits, one evaluation."""
    from ..functions.text import bind

    def with_qv(qv_b):
        def with_amax(amax):
            def req(v):
                mag = F.floor(
                    (F.lit(2) * F.abs(v) * 127 + amax) / (F.lit(2) * amax)
                ).cast("long")
                return F.when(amax == 0, F.lit(0).cast("long")).otherwise(
                    F.when(v >= 0, mag).otherwise(-mag)
                )

            return F.transform(qv_b, req)

        return bind(F.array_max(F.transform(qv_b, lambda v: F.abs(v))), with_amax)

    return bind(qv, with_qv)


def project_signs(qv: Column, signs: list[list[int]]) -> Column:
    """Johnson-Lindenstrauss-style random projection: the input vector's
    exact integer dot product with each ±1 hyperplane, as array<long> of
    len(signs) components.

    Where `lsh_bucket` keeps only the projection SIGNS (1 bit/plane),
    this keeps the projected VALUES — a 64→P dimensionality reduction
    whose pairwise cosines approximate the originals (JL lemma), so the
    per-pair scoring cost in a rerank drops by dims/P while staying
    deterministic (integer projections, exact on both engines).

    The input vector is bound once per row (r15): each plane's dot
    referenced ``qv`` separately, re-evaluating the caller's inlined
    quantize() chain len(signs) times per row."""
    from ..functions.text import bind

    return bind(
        qv,
        lambda qv_b: F.array(
            *[
                int_dot(qv_b, F.array(*[F.lit(s) for s in row]).cast("array<long>"))
                for row in signs
            ]
        ),
    )


def lsh_multiprobe_topk(
    emb: DataFrame,
    query_pred: Column,
    signs: list[list[int]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe ANN: each query probes its own bucket PLUS the
    len(signs) buckets at Hamming distance 1 (one sign bit flipped) —
    the standard recall lever for sign-LSH (Lv et al., multi-probe LSH):
    near neighbors that landed just across one hyperplane become
    reachable without adding tables.

    Cost model: candidates per query grow from |C|/2^P to
    (P+1)·|C|/2^P — still a vanishing fraction of the corpus at scale;
    the probe list is a P+1-element explode on the QUERY side only
    (queries are the small side), and the join stays a bucket equi-join.
    A (query, candidate) pair matches at most one probe (probe values
    are distinct, candidates hold one bucket), so no dedup shuffle is
    needed before scoring."""
    base = emb.select(F.col(id_col), quantize(vec_col).alias("qv")).withColumn(
        "nsq", int_norm_sq(F.col("qv"))
    ).withColumn("bucket", lsh_bucket(F.col("qv"), signs))
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(len(signs))]
    )
    q = base.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("q_vec"),
        F.col("nsq").alias("q_nsq"),
        F.explode(probes).alias("probe_bucket"),
    )
    c = base.select(
        F.col(id_col).alias("cand_id"),
        F.col("qv").alias("c_vec"),
        F.col("nsq").alias("c_nsq"),
        F.col("bucket").alias("c_bucket"),
    )
    pairs = (
        F.broadcast(q)
        .join(c, on=q["probe_bucket"] == c["c_bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    scored = pairs.withColumn(
        "cosine",
        cosine_from_ints(int_dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nsq"), F.col("c_nsq")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine")
    )
