"""Similarity-search queries (sim-series) over the `embeddings` table
(vec_id, embedding array<float> 64-dim, label), with DuckDB oracles.

Query set: vec_id % 50 == 0. Quantized-integer vector math makes cosine
values bit-identical across engines (operators/similarity.py docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import checkpoint, load
from ..operators import similarity as S
from .queries import query

_DIMS = 64
_PLANES = 8
_SIGNS = S.hyperplane_signs(_PLANES, _DIMS)

# DuckDB fragments -----------------------------------------------------------

_QUANT = """
base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
withnorm AS (
  SELECT vec_id, qv,
         list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
  FROM base
)"""


def _sql_signs_list(p: int) -> str:
    return "[" + ", ".join(str(s) for s in _SIGNS[p]) + "]"


def _sql_bucket_expr() -> str:
    terms = [
        f"(CASE WHEN list_sum(list_transform(range(1, 65), "
        f"i -> qv[i] * ({_sql_signs_list(p)})[i])) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "sim01_bruteforce_topk",
    f"""WITH {_QUANT},
        q AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq
              FROM withnorm WHERE vec_id % 50 = 0),
        c AS (SELECT vec_id AS cand_id, qv AS c_vec, nsq AS c_nsq FROM withnorm),
        scored AS (
          SELECT query_id, cand_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * c_vec[i])) AS DOUBLE)
                 / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) AS cosine
          FROM q CROSS JOIN c WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, cand_id) AS rn
          FROM scored) t
        WHERE rn <= 5""",
)
def sim01_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors per query vector — the correctness
    baseline for ANN (broadcast crossJoin; |Q|×|C| cost)."""
    emb = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, F.col("vec_id") % 50 == 0, k=5)


@query(
    "sim02_lsh_ann_topk",
    f"""WITH {_QUANT},
        bucketed AS (SELECT vec_id, qv, nsq, {_sql_bucket_expr()} AS bucket FROM withnorm),
        q AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq, bucket
              FROM bucketed WHERE vec_id % 50 = 0),
        c AS (SELECT vec_id AS cand_id, qv AS c_vec, nsq AS c_nsq, bucket FROM bucketed),
        scored AS (
          SELECT query_id, cand_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * c_vec[i])) AS DOUBLE)
                 / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) AS cosine
          FROM q JOIN c USING (bucket) WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, cand_id) AS rn
          FROM scored) t
        WHERE rn <= 3""",
)
def sim02_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 via 8 deterministic random hyperplanes (256 buckets) +
    exact rerank — the 100 TB scale path (bucket join, no crossJoin)."""
    emb = load(spark, sf_dir, "embeddings")
    return S.lsh_topk(emb, F.col("vec_id") % 50 == 0, _SIGNS, k=3)


@query(
    "sim03_pairwise_label_stats",
    f"""WITH {_QUANT},
        lab AS (SELECT vec_id, label FROM embeddings),
        bucketed AS (
          SELECT vec_id, qv, nsq, {_sql_bucket_expr()} AS bucket
          FROM withnorm
        ),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 la.label AS label_a, lb.label AS label_b,
                 CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
                 / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
          FROM bucketed a
          JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          JOIN lab la ON la.vec_id = a.vec_id
          JOIN lab lb ON lb.vec_id = b.vec_id
        )
        SELECT CASE WHEN label_a = label_b THEN 1 ELSE 0 END AS same_label,
               COUNT(*) AS n_pairs,
               MAX(cosine) AS max_cos, MIN(cosine) AS min_cos
        FROM pairs GROUP BY same_label""",
)
def sim03_pairwise_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space sanity: cosine range within vs across labels over
    the LSH-blocked pair set — pairs drawn from the same 8-hyperplane
    bucket (the near-neighbor region, where label separation is the
    interesting signal).  MIN/MAX/COUNT are order-independent →
    oracle-safe.

    Scale: blocking by bucket makes pair generation an equi-join
    (Σ|bucket|² work, shuffled on the bucket key) instead of the all-pairs
    `id_a < id_b` non-equi join, which Spark can only execute as a
    BroadcastNestedLoopJoin — the plan-level scale killer this query
    previously shipped.  tests/test_plans.py asserts no BNLJ survives.
    Note the honest bound: with a FIXED 8-plane / 256-bucket code the
    blocked pair set is still ~N²/256 — quadratic in corpus size.  The
    real wins are (a) the shuffled equi-join replaces a broadcast loop,
    and (b) at scale the plane count must grow with N (≈log₂(N/target
    bucket width) planes) to keep Σ|bucket|² bounded; 8 planes is sized
    to this table, not a constant of the design."""
    emb = load(spark, sf_dir, "embeddings")
    base = (
        emb.select("vec_id", "label", S.quantize("embedding").alias("qv"))
        .withColumn("nsq", S.int_norm_sq(F.col("qv")))
        .withColumn("bucket", S.lsh_bucket(F.col("qv"), _SIGNS))
    )
    a = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"),
        F.col("qv").alias("qv_a"), F.col("nsq").alias("nsq_a"),
    )
    b = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"),
        F.col("qv").alias("qv_b"), F.col("nsq").alias("nsq_b"),
    )
    pairs = (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            S.cosine_from_ints(S.int_dot(F.col("qv_a"), F.col("qv_b")), F.col("nsq_a"), F.col("nsq_b")),
        )
    )
    return (
        pairs.withColumn("same_label", F.when(F.col("label_a") == F.col("label_b"), 1).otherwise(0))
        .groupBy("same_label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.max("cosine").alias("max_cos"),
            F.min("cosine").alias("min_cos"),
        )
    )


@query(
    "sim05_hybrid_filtered_ann",
    """WITH docs AS (
         SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars >= 200
       ),
       base AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
         FROM embeddings
       ),
       withnorm AS (
         SELECT vec_id, qv,
                list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
         FROM base
       ),
       cand AS (SELECT w.* FROM withnorm w JOIN docs d ON w.vec_id = d.doc_id),
       q AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq
             FROM withnorm WHERE vec_id % 100 = 0),
       scored AS (
         SELECT q.query_id, c.vec_id AS cand_id,
                CAST(list_sum(list_transform(range(1, 65), i -> q.q_vec[i] * c.qv[i])) AS DOUBLE)
                / (sqrt(CAST(q.q_nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS cosine
         FROM q CROSS JOIN cand c WHERE c.vec_id <> q.query_id
       )
       SELECT query_id, cand_id, cosine FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
         FROM scored) t WHERE rn <= 3""",
)
def sim05_hybrid_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: metadata pre-filter (documents.lang/n_chars — the
    pushed-down scan) joined to the vector side, then exact top-k cosine.
    The RAG-pipeline shape: filter first, THEN rank — the filter join
    shrinks the candidate set before any vector math. Queries broadcast;
    at 100 TB the exact rank stage swaps for the LSH/IVF path (sim02/04)
    over the same filtered candidates."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id")
    )
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", S.quantize("embedding").alias("qv")).withColumn(
        "nsq", S.int_norm_sq(F.col("qv"))
    )
    cand = base.join(docs, base["vec_id"] == docs["doc_id"]).select(
        F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_vec"), F.col("nsq").alias("c_nsq")
    )
    q = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_vec"), F.col("nsq").alias("q_nsq")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            S.cosine_from_ints(S.int_dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nsq"), F.col("c_nsq")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "cand_id", "cosine")
    )


# ---------------------------------------------------------------------------
# sim06 — one k-means (Lloyd) iteration as pure dataflow
# ---------------------------------------------------------------------------

_K = 8  # seed centroids = the embeddings of vec_id 0.._K-1


@query(
    "sim06_kmeans_step",
    f"""WITH {_QUANT},
        cent AS (SELECT vec_id AS centroid_id, qv AS c_vec
                 FROM base WHERE vec_id < {_K}),
        dist AS (
          SELECT vec_id, centroid_id,
                 list_sum(list_transform(range(1, 65),
                          i -> (qv[i] - c_vec[i]) * (qv[i] - c_vec[i]))) AS d2
          FROM withnorm CROSS JOIN cent),
        assigned AS (
          SELECT vec_id, centroid_id, d2 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY d2, centroid_id) AS rn
            FROM dist) t
          WHERE rn = 1)
        SELECT centroid_id AS cluster_id,
               COUNT(*) AS n_members,
               CAST(SUM(d2) AS BIGINT) AS inertia
        FROM assigned GROUP BY centroid_id""",
)
def sim06_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding column, expressed
    as dataflow: assign every vector to its nearest of K=8 seed centroids
    (the embeddings of vec_id 0..7) by exact integer squared-euclidean
    distance, then report per-cluster membership and inertia. Distances,
    the argmin (tie → lowest centroid_id), and inertia are all exact
    integer arithmetic — bit-identical across engines. The driver loop of
    a full k-means repeats this step with recomputed centroid literals;
    each iteration is this same one-shuffle job.

    Scale: the K×64 centroid matrix broadcasts (a few KB at any corpus
    size); distance + argmin are map-side per-vector work (zip_with /
    aggregate built-ins, no Python); the only shuffle is the K-key
    aggregate, collapsed almost entirely by map-side combine. This is the
    canonical pattern for iterative ML on Spark: per-iteration state small
    enough to broadcast, per-row work stateless, one tiny reduce."""
    from ..operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", S.quantize("embedding").alias("qv"))
    cent = (
        q.filter(F.col("vec_id") < _K)
        .select(F.col("vec_id").alias("centroid_id"), F.col("qv").alias("c_vec"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c_vec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    assigned = (
        q.crossJoin(F.broadcast(cent))
        .select("vec_id", "centroid_id", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min_by(F.struct("centroid_id", "d2"), F.struct("d2", "centroid_id")).alias("best"))
        .select("vec_id", F.col("best.centroid_id").alias("centroid_id"), F.col("best.d2").alias("d2"))
    )
    return (
        assigned.groupBy(F.col("centroid_id").alias("cluster_id"))
        .agg(F.count("*").alias("n_members"), F.sum("d2").alias("inertia"))
    )


# ---------------------------------------------------------------------------
# sim07 — int8 scalar-quantized search; sim08 — random-projection reduction
# ---------------------------------------------------------------------------

_INT8_SQL = """
base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
m AS (
  SELECT vec_id, qv, list_max(list_transform(qv, v -> abs(v))) AS amax FROM base
),
q8 AS (
  SELECT vec_id,
         list_transform(qv, v -> CASE
             WHEN amax = 0 THEN 0
             WHEN v >= 0 THEN CAST(floor((2 * v * 127 + amax) / (2.0 * amax)) AS BIGINT)
             ELSE -CAST(floor((2 * (-v) * 127 + amax) / (2.0 * amax)) AS BIGINT)
           END) AS v8
  FROM m
),
withnorm8 AS (
  SELECT vec_id, v8,
         list_sum(list_transform(range(1, 65), i -> v8[i] * v8[i])) AS nsq
  FROM q8
)"""


def _sql_crossjoin_topk(prep_ctes: str, table: str, vec: str, mod: int, k: int, dims: int) -> str:
    """Exact cosine top-k over a prepared (vec_id, <vec>, nsq) CTE —
    the shared scaffold of sim07/sim08 (and structurally of sim01)."""
    return f"""WITH {prep_ctes},
        q AS (SELECT vec_id AS query_id, {vec} AS q_vec, nsq AS q_nsq
              FROM {table} WHERE vec_id % {mod} = 0),
        c AS (SELECT vec_id AS cand_id, {vec} AS c_vec, nsq AS c_nsq FROM {table}),
        scored AS (
          SELECT query_id, cand_id,
                 CAST(list_sum(list_transform(range(1, {dims + 1}), i -> q_vec[i] * c_vec[i])) AS DOUBLE)
                 / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) AS cosine
          FROM q CROSS JOIN c WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, cand_id) AS rn
          FROM scored) t
        WHERE rn <= {k}"""


def _crossjoin_topk(prepared: DataFrame, vec: str, mod: int, k: int) -> DataFrame:
    """Spark twin of _sql_crossjoin_topk: prepared carries
    (vec_id, <vec> array<long>, nsq); queries are vec_id % mod == 0,
    exact top-k per query.

    Scoring (r15): the query rows ship in the task closure and each
    Arrow batch scores against them with one int64 numpy matmul
    (S.matmul_score_pairs — bit-identical to the expression form, see
    its docstring), replacing the broadcast crossJoin whose per-pair
    zip_with/aggregate dot serialized on the single-task embeddings
    scan (sim07 2.23 s → the kernel's sim01, same |Q|×|C| shape, runs
    0.61 s).  When the query set outgrows the closure-size contract the
    broadcast-crossJoin expression form still runs — same output, no
    raise: these queries' semantics are unconditional, and a corpus
    big enough to trip the bound should be on the LSH path anyway.

    SIDE EFFECT (r15 verdict item 3): building this DataFrame runs ONE
    bounded Spark job — the limit(MAX_BRUTE_FORCE_QUERIES+1).collect()
    of the query rows below — before any action on the result.  Callers
    that construct plans without executing them (plan capture, explain
    sweeps) pay that job too.  This mirrors sim01's long-standing
    brute_force_topk contract; the bound keeps it driver-safe."""
    if "nsq" not in prepared.columns:  # defensive: both callers attach it
        prepared = prepared.withColumn("nsq", S.int_norm_sq(F.col(vec)))
    qrows = (
        prepared.filter(F.col("vec_id") % mod == 0)
        .select("vec_id", vec)
        .limit(S.MAX_BRUTE_FORCE_QUERIES + 1)
        .collect()
    )
    if len(qrows) <= S.MAX_BRUTE_FORCE_QUERIES:
        scored = S.matmul_score_pairs(prepared, vec, qrows).filter(
            F.col("query_id") != F.col("cand_id")
        )
    else:
        q = prepared.filter(F.col("vec_id") % mod == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col(vec).alias("q_vec"),
            F.col("nsq").alias("q_nsq"),
        )
        c = prepared.select(
            F.col("vec_id").alias("cand_id"),
            F.col(vec).alias("c_vec"),
            F.col("nsq").alias("c_nsq"),
        )
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("cand_id"))
            .withColumn(
                "cosine",
                S.cosine_from_ints(
                    S.int_dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nsq"), F.col("c_nsq")
                ),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cosine")
    )


@query(
    "sim07_int8_quantized_topk",
    _sql_crossjoin_topk(_INT8_SQL, table="withnorm8", vec="v8", mod=40, k=5, dims=64),
)
def sim07_int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine search over int8 scalar-quantized vectors (FAISS-SQ8
    shape): each vector is re-quantized to [-127, 127] by its own max
    magnitude, then scored exactly in the quantized space. The per-vector
    scale cancels in cosine, so no dequantization happens at query time.

    Scale: int8 storage is 4× smaller than float32 — at 100 TB of
    embeddings this is the difference between a scannable corpus and not;
    the quantized scan also SIMD-vectorizes 4× wider. Quantization is
    map-side (array_max + transform, integer-only rounding — see
    operators/similarity.py::int8_requantize for the no-float-tie
    construction); search cost/shape is identical to sim01's baseline and
    composes with the LSH/IVF candidate cuts (sim02/sim04)."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", S.quantize("embedding").alias("qv"))
    q8 = base.select(
        "vec_id", S.int8_requantize(F.col("qv")).alias("v8")
    ).withColumn("nsq", S.int_norm_sq(F.col("v8")))
    return _crossjoin_topk(q8, vec="v8", mod=40, k=5)


_RP_PLANES = 16
_SIGNS16 = S.hyperplane_signs(_RP_PLANES, _DIMS)


def _sql_signs16_list(p: int) -> str:
    return "[" + ", ".join(str(s) for s in _SIGNS16[p]) + "]"


def _sql_projection_list() -> str:
    terms = [
        f"list_sum(list_transform(range(1, 65), i -> qv[i] * ({_sql_signs16_list(p)})[i]))"
        for p in range(_RP_PLANES)
    ]
    return "[" + ", ".join(terms) + "]"


_RP_SQL = f"""base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
red AS (
  SELECT vec_id, {_sql_projection_list()} AS rv FROM base
),
rednorm AS (
  SELECT vec_id, rv,
         list_sum(list_transform(range(1, {_RP_PLANES + 1}), i -> rv[i] * rv[i])) AS nsq
  FROM red
)"""


@query(
    "sim08_random_projection_topk",
    _sql_crossjoin_topk(_RP_SQL, table="rednorm", vec="rv", mod=45, k=5, dims=_RP_PLANES),
)
def sim08_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine search in a 16-dim random projection of the 64-dim
    embeddings (Johnson-Lindenstrauss reduction with deterministic ±1
    hyperplanes — the value-preserving cousin of sim02's sign-only LSH).
    Projections are exact integer dot products, so both engines rank
    identically.

    Scale: candidate scoring in the reduced space costs dims/P = 4× less
    FLOPs and memory bandwidth per pair, which is the standard
    coarse-rank trick before an exact rerank on the surviving few (here
    the reduced-space ranking IS the query, making the JL approximation
    itself the object under test). Projection is one map-side pass;
    storage of the reduced corpus is P/dims of the original."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", S.quantize("embedding").alias("qv"))
    red = base.select(
        "vec_id", S.project_signs(F.col("qv"), _SIGNS16).alias("rv")
    ).withColumn("nsq", S.int_norm_sq(F.col("rv")))
    return _crossjoin_topk(red, vec="rv", mod=45, k=5)


# ---------------------------------------------------------------------------
# sim09/sim10 — ANN quality evaluation: recall@k vs the exact baseline
# ---------------------------------------------------------------------------

_EXACT_TOP3_CTES = f"""q AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq
              FROM withnorm WHERE vec_id % 50 = 0),
        c AS (SELECT vec_id AS cand_id, qv AS c_vec, nsq AS c_nsq FROM withnorm),
        exact AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                     CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * c_vec[i])) AS DOUBLE)
                     / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) DESC,
                     cand_id) AS rn
            FROM q CROSS JOIN c WHERE query_id <> cand_id) t
          WHERE rn <= 3)"""

_RECALL_ROLLUP_SQL = """hits AS (SELECT e.query_id, COUNT(*) AS n_hit
                 FROM exact e JOIN approx a
                   ON e.query_id = a.query_id AND e.cand_id = a.cand_id
                 GROUP BY e.query_id),
        per_q AS (SELECT qq.query_id, COALESCE(h.n_hit, 0) AS n_hit
                  FROM (SELECT DISTINCT query_id FROM exact) qq
                  LEFT JOIN hits h ON qq.query_id = h.query_id)
        SELECT COUNT(*) AS n_queries,
               CAST(SUM(n_hit) AS BIGINT) AS n_hits,
               3 * COUNT(*) AS n_possible,
               CAST(SUM(n_hit) AS DOUBLE) / (3 * COUNT(*)) AS recall_at_3,
               CAST(SUM(CASE WHEN n_hit = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect_queries
        FROM per_q"""


def _sql_recall_eval(approx_ctes: str) -> str:
    """Full recall@3 oracle: the exact baseline, the caller's approx CTE
    chain (must define `approx(query_id, cand_id)`), and the shared
    per-query hit rollup — ONE definition of the eval arithmetic for
    sim09 and sim10."""
    return f"""WITH {_QUANT},
        {_EXACT_TOP3_CTES},
        {approx_ctes},
        {_RECALL_ROLLUP_SQL}"""


def _recall_rollup(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Shared per-query hit rollup (Spark twin of _RECALL_ROLLUP_SQL):
    one definition of the eval arithmetic for sim09/sim10/sim13."""
    hits = (
        exact.join(F.broadcast(approx), ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(F.broadcast(hits), "query_id", "left")  # |Q| rows — never SMJ
        .select(F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"))
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.sum("n_hit").alias("n_hits"),
        (F.lit(3) * F.count("*")).alias("n_possible"),
        (F.sum("n_hit").cast("double") / (F.lit(3) * F.count("*"))).alias("recall_at_3"),
        F.sum(F.when(F.col("n_hit") == 3, 1).otherwise(0)).alias("n_perfect_queries"),
    )


def _recall_eval(spark: SparkSession, sf_dir: str, approx_fn) -> DataFrame:
    """Spark twin of _sql_recall_eval: exact top-3 via the brute-force
    baseline, approx top-3 from approx_fn(emb, pred), shared rollup."""
    emb = load(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 50 == 0
    exact = S.brute_force_topk(emb, pred, k=3).select("query_id", "cand_id")
    approx = approx_fn(emb, pred).select("query_id", "cand_id")
    return _recall_rollup(exact, approx)


_SINGLE_PROBE_APPROX = f"""bucketed AS (SELECT vec_id, qv, nsq, {_sql_bucket_expr()} AS bucket FROM withnorm),
        bq AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq, bucket
               FROM bucketed WHERE vec_id % 50 = 0),
        bc AS (SELECT vec_id AS cand_id, qv AS c_vec, nsq AS c_nsq, bucket FROM bucketed),
        approx AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                     CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * c_vec[i])) AS DOUBLE)
                     / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) DESC,
                     cand_id) AS rn
            FROM bq JOIN bc USING (bucket) WHERE query_id <> cand_id) t
          WHERE rn <= 3)"""


@query("sim09_ann_recall", _sql_recall_eval(_SINGLE_PROBE_APPROX))
def sim09_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@3 of the hyperplane-LSH path (sim02)
    against the exact brute-force baseline (sim01) over the same query
    set — the metric a production vector pipeline tracks to size its
    plane count / multi-probe budget before trusting the approximate
    path. Both rankings share the identical (cosine DESC, cand_id)
    tiebreak, so the compared top-3 SETS are deterministic and the
    recall is bit-stable (integer hit counts, one IEEE division).

    Measured on THIS corpus: recall@3 ≈ 0.03 — the synthetic embeddings
    are isotropic (near-uniform pairwise cosines), so single-probe
    sign-LSH carries almost no neighbor signal, and the eval op reports
    exactly that instead of letting the approximate path silently ship.
    On real embedding corpora (clusterable structure) this number is
    what multi-probe / band count get tuned against.

    Scale: the eval runs on a SAMPLED query set by construction (here
    vec_id % 50) — the exact side is |Q|×|C| and priced like sim01's
    baseline, which is exactly why recall is estimated on a sample and
    never corpus×corpus; the approx side is the production bucket join.
    The overlap join and per-query rollup are k-row-per-query
    trivia."""
    return _recall_eval(
        spark, sf_dir, lambda emb, pred: S.lsh_topk(emb, pred, _SIGNS, k=3)
    )


_PROBE_LIST_SQL = "[bucket" + "".join(
    f", xor(bucket, {1 << p})" for p in range(_PLANES)
) + "]"

_MULTI_PROBE_APPROX = f"""bucketed AS (SELECT vec_id, qv, nsq, {_sql_bucket_expr()} AS bucket FROM withnorm),
        bq AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq, bucket
               FROM bucketed WHERE vec_id % 50 = 0),
        probes AS (SELECT query_id, q_vec, q_nsq,
                          unnest({_PROBE_LIST_SQL}) AS probe_bucket FROM bq),
        bc AS (SELECT vec_id AS cand_id, qv AS c_vec, nsq AS c_nsq, bucket FROM bucketed),
        approx AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                     CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * c_vec[i])) AS DOUBLE)
                     / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) DESC,
                     cand_id) AS rn
            FROM probes JOIN bc ON probe_bucket = bc.bucket
            WHERE query_id <> cand_id) t
          WHERE rn <= 3)"""


@query("sim10_multiprobe_recall", _sql_recall_eval(_MULTI_PROBE_APPROX))
def sim10_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim09's recall@3 evaluation re-run with MULTI-PROBE LSH
    (operators/similarity.py::lsh_multiprobe_topk): each query probes its
    own bucket plus the 8 buckets one sign-flip away, growing candidates
    9× (from |C|/256 to 9·|C|/256) in exchange for recall. Output columns
    match sim09 exactly so the two rows read as a before/after — both
    share _recall_eval / _sql_recall_eval, so the eval arithmetic cannot
    fork between them.

    Scale: the probe fan-out explodes only the QUERY side (the small
    side); the join stays a bucket equi-join; candidate cost is
    (P+1)/2^P of the corpus per query — the tunable knob this eval
    exists to set. Measured on this corpus: recall@3 = 0.10 vs sim09's
    0.03 — a 3× lift for 9× candidates, the expected shape on isotropic
    synthetic embeddings (clusterable real corpora lift far more per
    probe)."""
    return _recall_eval(
        spark, sf_dir, lambda emb, pred: S.lsh_multiprobe_topk(emb, pred, _SIGNS, k=3)
    )


# ---------------------------------------------------------------------------
# sim11 — product quantization (PQ) with asymmetric-distance search
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces (16 dims each over the 64-dim vectors)
_PQ_K = 8  # centroids per subspace codebook
_PQ_SUBDIM = _DIMS // _PQ_M


# Shared PQ machinery — sim11 (flat PQ) and sim12 (IVF-PQ on residuals)
# use the SAME subspace slicing and squared-distance forms on both the
# Spark side and the SQL twin, so PQ semantics (slice bounds, integer
# distance, argmin tie-break) cannot fork between the two indexes.

def _sql_pq_slice(col: str) -> str:
    """DuckDB: subvector of `col` for subspace `m` (1-based inclusive)."""
    return f"list_slice({col}, m * {_PQ_SUBDIM} + 1, m * {_PQ_SUBDIM} + {_PQ_SUBDIM})"


def _sql_pq_sqdist(a: str, b: str) -> str:
    """DuckDB: exact integer squared L2 over one subspace."""
    return (
        f"CAST(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


def _pq_slice(col: str, mcol: str = "m"):
    """Spark twin of _sql_pq_slice."""
    return F.expr(f"slice({col}, {mcol} * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})")


def _pq_sqdist(a: str, b: str):
    """Spark twin of _sql_pq_sqdist: exact integer squared L2."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

_PQ_CTES = f"""base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
      FROM embeddings),
    cents AS (
      SELECT qv, rn - 1 AS cid FROM (
        SELECT qv, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM base) t
      WHERE rn <= {_PQ_K}),
    subq AS (
      SELECT vec_id, m, {_sql_pq_slice('qv')} AS sub
      FROM base, UNNEST(range(0, {_PQ_M})) AS t(m)),
    csub AS (
      SELECT cid, m, {_sql_pq_slice('qv')} AS sub
      FROM cents, UNNEST(range(0, {_PQ_M})) AS t(m)),
    edist AS (
      SELECT s.vec_id, s.m, c.cid,
             {_sql_pq_sqdist('s.sub', 'c.sub')} AS d
      FROM subq s JOIN csub c ON s.m = c.m),
    enc AS (
      SELECT vec_id, m, cid AS code FROM (
        SELECT vec_id, m, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
        FROM edist) t
      WHERE rn = 1),
    dt AS (SELECT vec_id AS query_id, m, cid, d FROM edist WHERE vec_id % 50 = 0),
    adc AS (
      SELECT dt.query_id, en.vec_id AS cand_id, CAST(SUM(dt.d) AS BIGINT) AS adc_dist
      FROM enc en JOIN dt ON en.m = dt.m AND en.code = dt.cid
      GROUP BY dt.query_id, en.vec_id)"""

_PQ_SQL = f"""WITH {_PQ_CTES}
    SELECT query_id, cand_id, adc_dist, rn FROM (
      SELECT query_id, cand_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rn
      FROM adc WHERE query_id <> cand_id) t
    WHERE rn <= 5"""


@query("sim11_pq_topk", _PQ_SQL)
def sim11_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): vectors are split
    into M=4 subspaces, each encoded as its nearest of K=8 codebook
    centroids (codebook = the 8 md5-first vectors — a deterministic
    stand-in for per-subspace k-means; sim06 holds the Lloyd machinery
    that production would run here), and queries score candidates by
    ASYMMETRIC distance: the exact query-to-centroid distance table,
    summed over each candidate's 4 stored codes. All distances are exact
    integers over the quantized grid, so ranks are engine-identical
    (ties broken by cand_id).

    Scale: THE memory-bound ANN design — candidates shrink from 64
    floats to M log2 K = 12 BITS each, so a 100 TB float corpus becomes
    ~0.05 TB of codes scannable from memory; the per-query work is a
    K×M lookup-table build (32 tiny integer distances) plus one
    SUM-over-codes scan, here the broadcast-joined dt table. Encoding is
    a map-side argmin against the broadcast codebook (8 rows). The
    row_number per (vec, m) and per query are partitioned windows — no
    global sort anywhere."""
    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize("embedding").alias("qv")
    )
    # TakeOrderedAndProject picks the K codebook rows without a global
    # sort of the corpus; the row_number window then runs on K rows only.
    cents = (
        base.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(_PQ_K)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.asc("h"), F.asc("vec_id")))
        )
        .select((F.col("rn") - 1).alias("cid"), F.col("qv").alias("cqv"))
    )
    sub = base.select(
        "vec_id",
        "qv",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m"),
    ).select(
        "vec_id", "m", _pq_slice("qv").alias("sub")
    )
    csub = cents.select(
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m"),
        F.col("cqv"),
    ).select(
        "cid", "m", _pq_slice("cqv").alias("csub")
    )
    edist = (
        sub.join(F.broadcast(csub), "m")
        .select(
            "vec_id",
            "m",
            "cid",
            _pq_sqdist("sub", "csub").alias("d"),
        )
    )
    enc = (
        edist.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "cid")).alias("mn"))
        .select("vec_id", "m", F.col("mn.cid").alias("code"))
    )
    # Renamed join keys: enc and dt share the edist lineage, and same-id
    # column references would collapse to a trivially-true predicate.
    dt = edist.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("m").alias("qm"),
        F.col("cid").alias("qcid"),
        "d",
    )
    adc = (
        enc.join(
            F.broadcast(dt),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qcid")),
        )
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "cand_id", "adc_dist", "rn")
    )


# ---------------------------------------------------------------------------
# sim12 — IVF-PQ: coarse cells + residual product quantization
# ---------------------------------------------------------------------------

_IVFPQ_SQL = f"""WITH base AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
      FROM embeddings),
    cpos AS (
      SELECT label, i, CAST(SUM(qv[i]) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM base, UNNEST(range(1, 65)) AS t(i) GROUP BY label, i),
    cmean AS (
      SELECT label, list(s // n ORDER BY i) AS mv, list(s ORDER BY i) AS cv
      FROM cpos GROUP BY label),
    resid AS (
      SELECT vec_id, b.label,
             list_transform(range(1, 65), i -> qv[i] - mv[i]) AS rv
      FROM base b JOIN cmean ON b.label = cmean.label),
    cb AS (
      SELECT rv, rn - 1 AS cid FROM (
        SELECT rv, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM resid) t
      WHERE rn <= {_PQ_K}),
    csub AS (
      SELECT cid, m, {_sql_pq_slice('rv')} AS sub
      FROM cb, UNNEST(range(0, {_PQ_M})) AS t(m)),
    rsub AS (
      SELECT vec_id, label, m,
             {_sql_pq_slice('rv')} AS sub
      FROM resid, UNNEST(range(0, {_PQ_M})) AS t(m)),
    edist AS (
      SELECT r.vec_id, r.label, r.m, c.cid,
             {_sql_pq_sqdist('r.sub', 'c.sub')} AS d
      FROM rsub r JOIN csub c ON r.m = c.m),
    enc AS (
      SELECT vec_id, label, m, cid AS code FROM (
        SELECT vec_id, label, m, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
        FROM edist) t
      WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, qv FROM base WHERE vec_id % 50 = 0),
    probe AS (
      SELECT query_id, qv, cmean.label, mv,
             CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS DOUBLE))) AS ccos
      FROM q CROSS JOIN cmean),
    assigned AS (
      SELECT query_id, label, qv, mv FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, label) AS rn
        FROM probe) t WHERE rn = 1),
    qrsub AS (
      SELECT query_id, label AS qlabel, m AS qm,
             {_sql_pq_slice('list_transform(range(1, 65), i -> qv[i] - mv[i])')} AS sub
      FROM assigned, UNNEST(range(0, {_PQ_M})) AS t(m)),
    qdist AS (
      SELECT r.query_id, r.qlabel, r.qm, c.cid AS qcid,
             {_sql_pq_sqdist('r.sub', 'c.sub')} AS d
      FROM qrsub r JOIN csub c ON r.qm = c.m),
    adc AS (
      SELECT qd.query_id, en.vec_id AS cand_id, CAST(SUM(qd.d) AS BIGINT) AS adc_dist
      FROM enc en JOIN qdist qd
        ON en.label = qd.qlabel AND en.m = qd.qm AND en.code = qd.qcid
      GROUP BY qd.query_id, en.vec_id)
    SELECT query_id, cand_id, adc_dist, rn FROM (
      SELECT query_id, cand_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rn
      FROM adc WHERE query_id <> cand_id) t
    WHERE rn <= 3"""


@query("sim12_ivfpq_topk", _IVFPQ_SQL)
def sim12_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the FAISS production index shape, composed from the
    catalog's two ANN halves: sim04's coarse inverted-file cells (label
    centroids; cosine assignment is scale-invariant, so the integer SUM
    centroid works unchanged) plus sim11's product quantization applied
    to the RESIDUAL (vector minus its cell mean) — residual PQ is what
    makes the 12-bit codes accurate enough to rank within a cell. A
    query probes its nearest cell only and ranks that cell's members by
    asymmetric distance over their stored codes.

    Integer exactness: cell means use truncating integer division —
    verified identical in Spark (`div`) and DuckDB (`//`) including
    negatives (both truncate toward zero) — residuals, codebook
    distances, and ADC sums are all BIGINT, ties break by cand_id.

    Scale: the candidate scan touches ONE cell's codes (|C|/cells rows ×
    12 bits each — both the IVF pruning and the PQ compression
    multiply); the codebook, cell means, and per-query lookup tables are
    all broadcast-sized. This is the index layout a 100 TB vector store
    actually ships: coarse cells for pruning, residual codes for memory,
    exact rerank (sim04's inner loop) as the optional final stage."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "label", S.quantize("embedding").alias("qv"))
    cpos = (
        base.select("label", F.posexplode("qv").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .withColumn("m", F.expr("s div n"))
    )
    cmean = cpos.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda t: t["m"]
        ).alias("mv"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "s"))), lambda t: t["s"]
        ).alias("cv"),
    )
    resid = (
        base.join(F.broadcast(cmean.select("label", "mv")), "label")
        .select(
            "vec_id",
            "label",
            F.zip_with("qv", "mv", lambda x, y: x - y).alias("rv"),
        )
    )
    cb = (
        resid.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(_PQ_K)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.asc("h"), F.asc("vec_id")))
        )
        .select((F.col("rn") - 1).alias("cid"), F.col("rv").alias("crv"))
    )
    csub = cb.select(
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m"),
        "crv",
    ).select(
        "cid", "m", _pq_slice("crv").alias("csub")
    )
    rsub = resid.select(
        "vec_id",
        "label",
        "rv",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m"),
    ).select(
        "vec_id",
        "label",
        "m",
        _pq_slice("rv").alias("sub"),
    )
    edist = rsub.join(F.broadcast(csub), "m").select(
        "vec_id",
        "label",
        "m",
        "cid",
        _pq_sqdist("sub", "csub").alias("d"),
    )
    enc = (
        edist.groupBy("vec_id", "label", "m")
        .agg(F.min(F.struct("d", "cid")).alias("mn"))
        .select("vec_id", "label", "m", F.col("mn.cid").alias("code"))
    )
    q = base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    probe = q.crossJoin(F.broadcast(cmean)).withColumn(
        "ccos",
        S.cosine_from_ints(
            S.int_dot(F.col("q_qv"), F.col("cv")),
            S.int_norm_sq(F.col("q_qv")),
            S.int_norm_sq(F.col("cv")),
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    assigned = (
        probe.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("label").alias("qlabel"),
            F.zip_with("q_qv", "mv", lambda x, y: x - y).alias("q_rv"),
        )
    )
    qrsub = assigned.select(
        "query_id",
        "qlabel",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("qm"),
        "q_rv",
    ).select(
        "query_id",
        "qlabel",
        "qm",
        _pq_slice("q_rv", "qm").alias("qsub"),
    )
    qdist = qrsub.join(F.broadcast(csub), qrsub["qm"] == csub["m"]).select(
        "query_id",
        "qlabel",
        "qm",
        F.col("cid").alias("qcid"),
        _pq_sqdist("qsub", "csub").alias("d"),
    )
    adc = (
        enc.join(
            F.broadcast(qdist),
            (F.col("label") == F.col("qlabel"))
            & (F.col("m") == F.col("qm"))
            & (F.col("code") == F.col("qcid")),
        )
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "cand_id", "adc_dist", "rn")
    )


# ---------------------------------------------------------------------------
# sim13 — PQ quantization-loss recall eval
# ---------------------------------------------------------------------------

_PQ_RECALL_SQL = f"""WITH {_PQ_CTES},
    q2 AS (SELECT vec_id AS query_id, qv AS q_vec FROM base WHERE vec_id % 50 = 0),
    c2 AS (SELECT vec_id AS cand_id, qv AS c_vec FROM base),
    exact AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 CAST(list_sum(list_transform(range(1, 65),
                      i -> (q_vec[i] - c_vec[i]) * (q_vec[i] - c_vec[i]))) AS BIGINT),
                 cand_id) AS rn
        FROM q2 CROSS JOIN c2 WHERE query_id <> cand_id) t
      WHERE rn <= 3),
    approx AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rn
        FROM adc WHERE query_id <> cand_id) t
      WHERE rn <= 3),
    {_RECALL_ROLLUP_SQL}"""


@query("sim13_pq_recall", _PQ_RECALL_SQL)
def sim13_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of sim11's PQ/ADC ranking against EXACT integer L2 over
    the same quantized vectors — deliberately evaluated in the SAME
    metric space, so the number isolates pure QUANTIZATION loss (codes
    vs full vectors) instead of conflating it with the cosine-vs-L2
    metric choice the way a sim01 comparison would. Completes the
    measured-not-assumed eval family: sim09/sim10 price the LSH paths,
    dd21 prices the dedup banding, this prices the PQ codes.

    Shares the per-query rollup with sim09/sim10 (_recall_rollup /
    _RECALL_ROLLUP_SQL) and the whole PQ chain with sim11 (_PQ_CTES) —
    neither the index nor the eval arithmetic can fork from the
    operators they measure.

    Scale: exact-L2 truth is |Q|×|C| and runs on the sampled query set
    only (the sim01 discipline); the approx leg is the production PQ
    scan. M=4×K=8 codes on isotropic synthetic vectors measure low —
    that is the eval's point: it tells you to grow M/K (or train real
    k-means codebooks, sim06) BEFORE shipping the index."""
    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize("embedding").alias("qv")
    )
    q = base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_vec")
    )
    c = base.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_vec"))
    dist = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cand_id"))
    exact = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("d", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "cand_id")
    )
    approx = (
        sim11_pq_topk(spark, sf_dir)
        .filter(F.col("rn") <= 3)
        .select("query_id", "cand_id")
    )
    return _recall_rollup(exact, approx)


# ---------------------------------------------------------------------------
# sim14 — index-health eval: bucket balance of both ANN layouts
# ---------------------------------------------------------------------------


@query(
    "sim14_index_balance",
    f"""WITH q AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        assign AS (
          SELECT 'ivf_cell' AS index_type, CAST(label AS VARCHAR) AS bucket FROM q
          UNION ALL
          SELECT 'lsh_bucket' AS index_type,
                 CAST({_sql_bucket_expr()} AS VARCHAR) AS bucket FROM q),
        w AS (
          SELECT index_type, bucket, CAST(COUNT(*) AS BIGINT) AS width
          FROM assign GROUP BY index_type, bucket)
        SELECT index_type,
               COUNT(*) AS n_buckets,
               CAST(SUM(width) AS BIGINT) AS n_vectors,
               CAST(MAX(width) AS BIGINT) AS max_width,
               CAST(MIN(width) AS BIGINT) AS min_width,
               CAST(SUM(width) AS DOUBLE) / COUNT(*) AS mean_width,
               CAST(MAX(width) AS DOUBLE) * COUNT(*) / CAST(SUM(width) AS DOUBLE)
                 AS imbalance_factor,
               CAST((1000 * MAX(width)) // SUM(width) AS BIGINT) AS max_share_permille
        FROM w GROUP BY index_type""",
)
def sim14_index_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health eval for BOTH ANN layouts the catalog ships: bucket-
    width distribution of the IVF coarse cells (sim04/sim12's label
    cells) and of the 8-hyperplane LSH buckets (sim02/sim08/sim10),
    side by side — n_buckets, max/min/mean width, the imbalance factor
    (max/mean: probe-cost variance — the number FAISS's imbalance_factor
    reports), and the largest bucket's integer permille share of the
    corpus.  This is the statistic an index team reads BEFORE trusting
    probe-cost estimates: a 10× imbalance means the hot cell dominates
    tail latency and the cell count lies about pruning power.  Completes
    the eval shelf: sim09/sim10 measure recall, sim13 quantization loss,
    dd21 banding quality, sim14 layout balance.

    Scale: one combine-friendly (index_type, bucket) count over a single
    pass of the embeddings, then a ≤(cells+2^planes)-row rollup.  No
    joins, no windows.  r16: both bucket ids are computed per row on ONE
    scan and unpivoted with stack(2, ...) — the previous unionAll of two
    projections of the same table planned as TWO parquet scans (Spark
    does not dedupe identical scan subtrees).  Row-identical: each
    embedding contributes exactly one ivf_cell row and one lsh_bucket
    row in both forms.  Measured interleaved ×7 at sf0.1, steal ≤0.05%
    (tools/ab_r16_pass3.py): 0.659 → 0.594 s median (−10%)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        F.col("label").cast("string").alias("ivf_b"),
        S.lsh_bucket(S.quantize("embedding"), _SIGNS).cast("string").alias("lsh_b"),
    )
    w = (
        q.selectExpr(
            "stack(2, 'ivf_cell', ivf_b, 'lsh_bucket', lsh_b) AS (index_type, bucket)"
        )
        .groupBy("index_type", "bucket")
        .agg(F.count("*").alias("width"))
    )
    agg = w.groupBy("index_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum("width").alias("n_vectors"),
        F.max("width").alias("max_width"),
        F.min("width").alias("min_width"),
    )
    return agg.select(
        "index_type",
        "n_buckets",
        "n_vectors",
        "max_width",
        "min_width",
        (F.col("n_vectors").cast("double") / F.col("n_buckets")).alias("mean_width"),
        (
            F.col("max_width").cast("double") * F.col("n_buckets")
            / F.col("n_vectors").cast("double")
        ).alias("imbalance_factor"),
        F.expr("(1000 * max_width) div n_vectors").alias("max_share_permille"),
    )


# ---------------------------------------------------------------------------
# sim15 — margin-based kNN scoring (bitext-mining primitive)
# ---------------------------------------------------------------------------

_MARGIN_K = 4

_SIM15_COS = (
    "CAST(list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i])) AS DOUBLE)"
    " / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
)

_SIM15_SQL = f"""WITH q0 AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        q1 AS (
          SELECT vec_id, label, qv,
                 list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
          FROM q0),
        sa AS (SELECT * FROM q1 WHERE label % 2 = 0),
        sb AS (SELECT * FROM q1 WHERE label % 2 = 1),
        qa AS (SELECT * FROM sa WHERE vec_id % 50 = 0),
        s1 AS (
          SELECT qa.vec_id AS query_id, sb.vec_id AS cand_id,
                 {_SIM15_COS.format(a="qa.qv", b="sb.qv", na="qa.nsq", nb="sb.nsq")} AS cosine
          FROM qa CROSS JOIN sb),
        r1 AS (
          SELECT query_id, cand_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, cand_id) AS rn
          FROM s1),
        k1 AS (SELECT * FROM r1 WHERE rn <= {_MARGIN_K}),
        mq AS (
          SELECT query_id,
                 list_reduce(list(cosine ORDER BY cosine, cand_id), (a, b) -> a + b) AS sum_q
          FROM k1 GROUP BY query_id),
        cset AS (SELECT DISTINCT cand_id FROM k1),
        s2 AS (
          SELECT c.cand_id, sa.vec_id AS back_id,
                 {_SIM15_COS.format(a="cb.qv", b="sa.qv", na="cb.nsq", nb="sa.nsq")} AS cosine
          FROM cset c JOIN sb cb ON cb.vec_id = c.cand_id CROSS JOIN sa),
        r2 AS (
          SELECT cand_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY cand_id
                                    ORDER BY cosine DESC, back_id) AS rn
          FROM s2),
        mc AS (
          SELECT cand_id,
                 list_reduce(list(cosine ORDER BY cosine, rn), (a, b) -> a + b) AS sum_c
          FROM r2 WHERE rn <= {_MARGIN_K} GROUP BY cand_id)
        SELECT k1.query_id, k1.cand_id, k1.cosine,
               ({2.0 * _MARGIN_K} * k1.cosine) / (mq.sum_q + mc.sum_c) AS margin
        FROM k1
        JOIN mq ON mq.query_id = k1.query_id
        JOIN mc ON mc.cand_id = k1.cand_id
        WHERE k1.rn = 1"""


@query("sim15_margin_knn", _SIM15_SQL)
def sim15_margin_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based kNN scoring — the bitext/parallel-pair mining
    primitive (Artetxe & Schwenk 2019; the CCMatrix recipe): a raw
    cosine threshold can't separate true cross-side matches from hubs
    (vectors near EVERYTHING), so each sampled query x on side A (even
    labels) is paired with its best match y on side B (odd labels) and
    scored by the RATIO margin — cos(x,y) normalized by the mean of
    both endpoints' k-NN cosines (k=4): margin = 2k·cos(x,y) /
    (Σ kNN-cos(x→B) + Σ kNN-cos(y→A)).  Hubs get high denominators and
    drop; isolated true pairs stand out.  Float determinism: each kNN
    denominator is a LEFT FOLD over the rank-ordered cosine list
    (array_sort + aggregate on Spark, list(ORDER BY) + list_reduce on
    DuckDB — identical addition order, identical doubles), and cosine
    itself is the catalog's single double chain.

    Scale: side-B scoring for the sampled queries is the documented
    brute-force truth shape (sim01 contract) — production swaps the
    sim12 IVF-PQ index for both directions; the back-direction only
    scores the ≤|Q|·k DISTINCT candidates, never all of B.  Folds are
    per-key over k=4 values; joins are broadcast-sized."""
    emb = load(spark, sf_dir, "embeddings")
    q1 = emb.select(
        "vec_id", "label", S.quantize("embedding").alias("qv")
    ).withColumn("nsq", S.int_norm_sq(F.col("qv")))
    sa = q1.filter(F.col("label") % 2 == 0)
    sb = q1.filter(F.col("label") % 2 == 1)
    qa = sa.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("nsq").alias("q_nsq"),
    )
    s1 = (
        F.broadcast(qa)
        .crossJoin(sb.select(F.col("vec_id").alias("cand_id"), "qv", "nsq"))
        .select(
            "query_id",
            "cand_id",
            S.cosine_from_ints(
                S.int_dot(F.col("q_qv"), F.col("qv")), F.col("q_nsq"), F.col("nsq")
            ).alias("cosine"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    k1 = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _MARGIN_K)
        .transform(checkpoint)  # feeds mq, cset, and the final rn=1 pick
    )
    fold = lambda arr: F.aggregate(  # noqa: E731 — left fold in ascending order
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    mq = k1.groupBy("query_id").agg(
        fold(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cosine", "cand_id"))),
                lambda t: t["cosine"],
            )
        ).alias("sum_q")
    )
    cset = k1.select("cand_id").distinct()
    cb = F.broadcast(cset).join(
        sb.select(F.col("vec_id").alias("cand_id"), "qv", "nsq"), "cand_id"
    ).select("cand_id", F.col("qv").alias("c_qv"), F.col("nsq").alias("c_nsq"))
    s2 = (
        F.broadcast(cb)
        .crossJoin(sa.select(F.col("vec_id").alias("back_id"), "qv", "nsq"))
        .select(
            "cand_id",
            "back_id",
            S.cosine_from_ints(
                S.int_dot(F.col("c_qv"), F.col("qv")), F.col("c_nsq"), F.col("nsq")
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("cand_id").orderBy(F.desc("cosine"), F.asc("back_id"))
    r2 = s2.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= _MARGIN_K)
    mc = r2.groupBy("cand_id").agg(
        fold(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cosine", "rn"))),
                lambda t: t["cosine"],
            )
        ).alias("sum_c")
    )
    return (
        k1.filter(F.col("rn") == 1)
        .join(F.broadcast(mq), "query_id")
        .join(F.broadcast(mc), "cand_id")
        .select(
            "query_id",
            "cand_id",
            "cosine",
            (F.lit(2.0 * _MARGIN_K) * F.col("cosine") / (F.col("sum_q") + F.col("sum_c"))).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# sim16 — hard-negative mining (contrastive training-pair construction)
# ---------------------------------------------------------------------------

_HN_K = 8  # candidate pool per anchor: hardest negative must rank in top-K

_SIM16_SQL = f"""WITH q0 AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        q1 AS (
          SELECT vec_id, label, qv,
                 list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
          FROM q0),
        anchors AS (SELECT * FROM q1 WHERE vec_id % 50 = 0),
        scored AS (
          SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
                 c.vec_id AS cand_id, c.label AS cand_label,
                 {_SIM15_COS.format(a="a.qv", b="c.qv", na="a.nsq", nb="c.nsq")} AS cosine
          FROM anchors a CROSS JOIN q1 c
          WHERE c.vec_id <> a.vec_id),
        pos AS (
          SELECT anchor_id, cand_id AS positive_id, cosine AS positive_cos
          FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY cosine DESC, cand_id) AS rn
            FROM scored WHERE cand_label = anchor_label) t
          WHERE rn = 1),
        topk AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY cosine DESC, cand_id) AS rn
            FROM scored) t
          WHERE rn <= {_HN_K}),
        neg AS (
          SELECT anchor_id, cand_id AS negative_id, cosine AS negative_cos,
                 rn AS negative_rank
          FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY cosine DESC, cand_id) AS nrn
            FROM topk WHERE cand_label <> anchor_label) t
          WHERE nrn = 1)
        SELECT p.anchor_id, p.positive_id, p.positive_cos,
               n.negative_id, n.negative_cos, CAST(n.negative_rank AS INT) AS negative_rank,
               p.positive_cos - n.negative_cos AS margin_gap
        FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id"""


@query("sim16_hard_negatives", _SIM16_SQL)
def sim16_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training (the
    SBERT / DPR / SimCSE data recipe): per sampled anchor, the strongest
    SAME-label neighbor becomes the positive and the highest-ranked
    DIFFERENT-label vector inside the global top-K (K=8) becomes the
    hard negative — the near-miss that actually moves a contrastive
    loss, where random negatives are trivially separated.  Reports the
    triplet with both cosines, the negative's global rank (1 = the
    negative OUTSCORES every same-label neighbor — a label-noise signal)
    and the positive-negative margin gap.  Anchors whose top-K is all
    same-label (no hard negative) drop out, as in production mining.

    Float exactness: cosines are the catalog's single double chain, the
    gap is one subtraction of two such doubles; ranks break ties on
    cand_id.

    Scale: the scoring leg is the sampled brute-force truth shape (the
    sim01 contract — production swaps the sim12 IVF-PQ index); the
    windows are per-anchor over the |Q|×K candidate pool.  The mined
    triplet table is exactly what a 100 TB embedding-training pipeline
    materializes per epoch."""
    emb = load(spark, sf_dir, "embeddings")
    q1 = emb.select(
        "vec_id", "label", S.quantize("embedding").alias("qv")
    ).withColumn("nsq", S.int_norm_sq(F.col("qv")))
    anchors = q1.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("qv").alias("a_qv"),
        F.col("nsq").alias("a_nsq"),
    )
    scored = (
        F.broadcast(anchors)
        .crossJoin(
            q1.select(
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("cand_label"),
                "qv",
                "nsq",
            )
        )
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            S.cosine_from_ints(
                S.int_dot(F.col("a_qv"), F.col("qv")), F.col("a_nsq"), F.col("nsq")
            ).alias("cosine"),
        )
        .transform(checkpoint)  # feeds the positive and top-K legs
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    pos = (
        scored.filter(F.col("cand_label") == F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("positive_id"),
            F.col("cosine").alias("positive_cos"),
        )
    )
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _HN_K
    )
    wn = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    neg = (
        topk.filter(F.col("cand_label") != F.col("anchor_label"))
        .withColumn("nrn", F.row_number().over(wn))
        .filter(F.col("nrn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("negative_id"),
            F.col("cosine").alias("negative_cos"),
            F.col("rn").cast("int").alias("negative_rank"),
        )
    )
    return pos.join(F.broadcast(neg), "anchor_id").select(
        "anchor_id",
        "positive_id",
        "positive_cos",
        "negative_id",
        "negative_cos",
        "negative_rank",
        (F.col("positive_cos") - F.col("negative_cos")).alias("margin_gap"),
    )
