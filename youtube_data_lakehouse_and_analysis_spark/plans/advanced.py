"""Advanced operator coverage: the remaining SURVEY.md §2 items (U1
heterogeneous union, F6 fill-with-first) plus the custom operators a Spark
OLAP engine is expected to provide beyond the reference — as-of join,
percentiles, ordered array aggregation, LIKE-pushdown dim joins, and an
IVF-style partitioned similarity search."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..operators.asof import asof_join
from ..operators.rangejoin import range_join
from ..operators.similarity import (
    hyperplane_signs,
    int_dot,
    int_norm_sq,
    lsh_bucket,
    near_dup_pairs,
    quantize,
)
from .queries import query


@query(
    "u01_union_by_name",
    """SELECT id, name, acctbal FROM (
         SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal FROM customer
         UNION ALL BY NAME
         SELECT s_suppkey AS id, s_name AS name FROM supplier)""",
)
def u01_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the reference's pd.concat of heterogeneous frames
    (app.py:217): name-aligned union, missing columns null-filled."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "f10_fill_with_first",
    """SELECT event_id, user_id,
              COALESCE(v, first_value(v IGNORE NULLS)
                          OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS value_filled
       FROM (SELECT event_id, user_id, ts,
                    CASE WHEN value < 1.0 THEN NULL ELSE value END AS v
             FROM events) t""",
)
def f10_fill_with_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — the reference's fillna(first-row value) (app.py:219-222), done
    right: per-key first non-null under a total order, not a driver-side
    scalar. (Default window frame includes rows up to current; nulls
    before the first value stay null — both engines agree.)"""
    ev = load(spark, sf_dir, "events")
    v = F.when(F.col("value") < 1.0, None).otherwise(F.col("value"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(v, F.first(v, ignorenulls=True).over(w)).alias("value_filled"),
    )


@query(
    "f11_percentiles",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS p25,
              quantile_cont(l_quantity, 0.5)  AS p50,
              quantile_cont(l_quantity, 0.75) AS p75
       FROM lineitem GROUP BY l_returnflag""",
)
def f11_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (l_quantity is integral and the
    quartile fractions are exact binary, so interpolation is engine-exact).
    The approx scale path is percentile_approx (see a03 for the
    bound-checked-estimate precedent)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("p25"),
            F.percentile("l_quantity", 0.5).alias("p50"),
            F.percentile("l_quantity", 0.75).alias("p75"),
        )
    )


@query(
    "f12_array_agg_sorted",
    """SELECT l_orderkey,
              string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
                AS line_numbers,
              string_agg(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag)
                AS flags_by_line
       FROM lineitem GROUP BY l_orderkey""",
)
def f12_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: collect_list is unordered in Spark, so
    determinism comes from collecting (sort-key, value) structs and
    sorting — the portable ordered-array-agg recipe. The sort key must be
    TOTAL (l_linenumber repeats within an order in this data, so the value
    joins the key on both sides). Output serialized to comma-joined
    strings: the driver's result hasher can't digest LIST columns, so the
    array is the internal representation and VARCHAR the contract."""
    li = load(spark, sf_dir, "lineitem")
    by_line = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_returnflag")))
    nums = F.array_sort(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.transform(nums, lambda x: x.cast("string")), ",").alias(
            "line_numbers"
        ),
        F.array_join(F.transform(by_line, lambda s: s["l_returnflag"]), ",").alias(
            "flags_by_line"
        ),
    )


@query(
    "j07_like_dim_join",
    """SELECT p_brand, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_name LIKE '%gear%' AND p_type IN ('ECONOMY', 'SMALL')
       GROUP BY p_brand""",
)
def j07_like_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim join under LIKE + IN predicates: the filters reach the part
    scan (StringContains/In pushdown) and shrink the broadcast side before
    the fact join — the standard selective-dim pattern."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%") & F.col("p_type").isin("ECONOMY", "SMALL"))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("gross"),
        )
    )


@query(
    "as01_asof_join",
    """SELECT l.event_id, l.user_id, l.ts,
              r.ts AS asof_ts, r.value AS purchase_value
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
def as01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event gets the user's most recent
    purchase at-or-before it (operators/asof.py — union + one window pass,
    no join; DuckDB's native ASOF JOIN is the oracle)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["purchase_value"],
    )


def _sql_centroid_cte() -> str:
    """DuckDB: per-label elementwise integer sums of quantized vectors +
    counts (the exact-arithmetic centroid: sum vector, not mean — cosine
    against the sum equals cosine against the mean)."""
    return """
base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
cpos AS (
  SELECT label, i, SUM(qv[i]) AS s
  FROM base CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dims
  GROUP BY label, i
),
centroid AS (
  SELECT label, list(s ORDER BY i) AS cv FROM cpos GROUP BY label
)"""


@query(
    "sim04_ivf_topk",
    f"""WITH {_sql_centroid_cte()},
        withnorm AS (
          SELECT vec_id, label, qv,
                 list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
          FROM base
        ),
        q AS (SELECT vec_id AS query_id, qv AS q_vec, nsq AS q_nsq
              FROM withnorm WHERE vec_id % 50 = 0),
        probe AS (
          SELECT query_id, q_vec, q_nsq, label,
                 CAST(list_sum(list_transform(range(1, 65), i -> q_vec[i] * cv[i])) AS DOUBLE)
                 / (sqrt(CAST(q_nsq AS DOUBLE))
                    * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS DOUBLE))) AS ccos
          FROM q CROSS JOIN centroid
        ),
        assigned AS (
          SELECT query_id, q_vec, q_nsq, label FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY ccos DESC, label) AS rn
            FROM probe) t WHERE rn = 1
        ),
        scored AS (
          SELECT a.query_id, c.vec_id AS cand_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> a.q_vec[i] * c.qv[i])) AS DOUBLE)
                 / (sqrt(CAST(a.q_nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS cosine
          FROM assigned a JOIN withnorm c ON a.label = c.label
          WHERE c.vec_id <> a.query_id
        )
        SELECT query_id, cand_id, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, cand_id) AS rn
          FROM scored) t WHERE rn <= 3""",
)
def sim04_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label integer-sum centroids
    (stand-in for k-means cells — same search shape), probe the nearest
    cell only, exact rerank within it. The inverted-list scan replaces the
    full crossJoin — at 100 TB the cell assignment prunes the candidate
    set by ~|cells|×.

    All arithmetic is exact-int + one double chain, so values hash-match
    the SQL oracle."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "label", quantize("embedding").alias("qv")).withColumn(
        "nsq", int_norm_sq(F.col("qv"))
    )
    # centroids: elementwise sums via posexplode + rebuild ordered
    cpos = (
        base.select("label", F.posexplode("qv").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"))
    )
    centroid = cpos.groupBy("label").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("i", "s"))), lambda t: t["s"]).alias("cv")
    )
    q = base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_vec"), F.col("nsq").alias("q_nsq")
    )
    probe = F.broadcast(q).crossJoin(F.broadcast(centroid)).withColumn(
        "ccos",
        int_dot(F.col("q_vec"), F.col("cv")).cast("double")
        / (
            F.sqrt(F.col("q_nsq").cast("double"))
            * F.sqrt(int_norm_sq(F.col("cv")).cast("double"))
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    assigned = (
        probe.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("query_id", "q_vec", "q_nsq", "label")
    )
    cands = base.select(
        F.col("vec_id").alias("cand_id"), F.col("label"), F.col("qv").alias("c_vec"),
        F.col("nsq").alias("c_nsq"),
    )
    scored = (
        F.broadcast(assigned)
        .join(cands, on="label")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            int_dot(F.col("q_vec"), F.col("c_vec")).cast("double")
            / (F.sqrt(F.col("q_nsq").cast("double")) * F.sqrt(F.col("c_nsq").cast("double"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "cand_id", "cosine")
    )


@query(
    "dd06_embedding_near_dup",
    """WITH base AS (
         SELECT label AS cell, vec_id,
                list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
         FROM embeddings
       ),
       withnorm AS (
         SELECT cell, vec_id, qv,
                list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
         FROM base
       )
       SELECT a.cell, a.vec_id AS doc_a, b.vec_id AS doc_b,
              CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
              / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine,
              least(a.vec_id, b.vec_id) AS keep_id,
              greatest(a.vec_id, b.vec_id) AS drop_id
       FROM withnorm a JOIN withnorm b ON a.cell = b.cell AND a.vec_id < b.vec_id
       WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
             / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.35""",
)
def dd06_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (SemDeDup shape): exact pairwise cosine
    inside each cluster cell only — the blocking that makes vector dedup
    tractable at 100 TB (operators/similarity.py::near_dup_pairs)."""
    return near_dup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.35)


# dd23 — the residual-LSH sub-blocked production variant of dd06.
_DD23_PLANES = 2
_DD23_SIGNS = hyperplane_signs(_DD23_PLANES, 64)


def _dd23_sql_bucket(col: str) -> str:
    terms = []
    for pl in range(_DD23_PLANES):
        signs = "[" + ", ".join(str(x) for x in _DD23_SIGNS[pl]) + "]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> {col}[i] * ({signs})[i])) >= 0 THEN {1 << pl} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "dd23_residual_blocked_near_dup",
    f"""WITH base AS (
         SELECT label, vec_id,
                list_transform(embedding, x -> CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT)) AS qv
         FROM embeddings
       ),
       cpos AS (
         SELECT label, i, CAST(SUM(qv[i]) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM base, UNNEST(range(1, 65)) AS t(i) GROUP BY label, i
       ),
       cmean AS (SELECT label, list(s // cnt ORDER BY i) AS mv FROM cpos GROUP BY label),
       resid AS (
         SELECT b.label, vec_id, qv,
                list_transform(range(1, 65), i -> qv[i] - mv[i]) AS rv
         FROM base b JOIN cmean USING (label)
       ),
       withnorm AS (
         SELECT CAST(label AS VARCHAR) || '_' || CAST({_dd23_sql_bucket('rv')} AS VARCHAR) AS cell,
                vec_id, qv,
                list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS nsq
         FROM resid
       )
       SELECT a.cell, a.vec_id AS doc_a, b.vec_id AS doc_b,
              CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
              / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine,
              least(a.vec_id, b.vec_id) AS keep_id,
              greatest(a.vec_id, b.vec_id) AS drop_id
       FROM withnorm a JOIN withnorm b ON a.cell = b.cell AND a.vec_id < b.vec_id
       WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
             / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) >= 0.35""",
)
def dd23_residual_blocked_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd06's production-scale variant, adopted from the r15 blocking
    measurement (tools/semdedup_audit.py, SCALE.md "SemDeDup blocking"):
    the blocking cell is (label, LSH bucket of the RESIDUAL v − integer
    cell mean).  Fixed cells measured candidate exponent 1.999 on the
    vector tiers; raw-vector LSH sub-blocking 1.686 (origin-anchored
    planes cannot split a dense cell — measured-rejected); residual LSH
    1.001 at planted recall 0.95.  Cosine is still computed on the
    ORIGINAL quantized vectors — blocking only gates candidates — and
    the integer cell mean uses truncating division (Spark `div` ≡
    DuckDB `//`, the sim12-verified identity), so the oracle is exact.
    Two planes here (the sf tables' cells are small); production grows
    planes as log2(n/cells/target)."""
    base = load(spark, sf_dir, "embeddings").select(
        "label", "vec_id", "embedding", quantize("embedding").alias("qv")
    )
    cmean = (
        base.select("label", F.posexplode("qv").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
        .withColumn("m", F.expr("s div cnt"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda t: t["m"]
            ).alias("mv")
        )
    )
    blocked = (
        base.join(F.broadcast(cmean), "label")
        .withColumn("rv", F.zip_with("qv", "mv", lambda x, y: x - y))
        .withColumn(
            "cell",
            F.concat_ws(
                "_",
                F.col("label").cast("string"),
                lsh_bucket(F.col("rv"), _DD23_SIGNS).cast("string"),
            ),
        )
        .select("cell", "vec_id", "embedding")
    )
    return near_dup_pairs(blocked, threshold=0.35, cell_col="cell")


@query(
    "rj01_range_join_agg",
    """SELECT n_nationkey AS band, n_name AS band_name,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
       FROM events
       JOIN nation ON value >= n_nationkey * 15.0 AND value < n_nationkey * 15.0 + 40.0
       GROUP BY n_nationkey, n_name""",
)
def rj01_range_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): events fall into overlapping value
    bands derived from nation. Bucketized rewrite (operators/rangejoin.py)
    — point→1 bucket, interval→covered buckets, equi-join + exact
    re-check — instead of the nested-loop plan a bare inequality join
    gets. Decimal sum keeps the double aggregation order-independent for
    the oracle."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    bands = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("band"),
        F.col("n_name").alias("band_name"),
        (F.col("n_nationkey") * 15.0).alias("lo"),
        (F.col("n_nationkey") * 15.0 + 40.0).alias("hi"),
    )
    return (
        range_join(ev, bands, point_col="value", lo_col="lo", hi_col="hi", bucket_width=20.0)
        .groupBy("band", "band_name")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_total"),
        )
    )


@query(
    "sj01_salted_join_agg",
    """SELECT c_mktsegment, COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY c_mktsegment""",
)
def sj01_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join (operators/skew.py): the hot-key fix when
    the dim can't broadcast — fact rows salt S ways, dim replicates S×,
    result is row-identical to the plain join (the oracle's form)."""
    from ..operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(ev, cust, on="user_id", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_total"),
        )
    )


# ---------------------------------------------------------------------------
# as02 — as-of join with staleness tolerance
# ---------------------------------------------------------------------------


@query(
    "as02_asof_tolerance",
    """WITH j AS (
         SELECT l.event_id, l.user_id, l.ts,
                r.ts AS asof_ts, r.value AS purchase_value
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.ts)
       SELECT event_id, user_id, ts,
              CASE WHEN asof_ts >= ts - INTERVAL '30 minutes'
                   THEN asof_ts END AS asof_ts,
              CASE WHEN asof_ts >= ts - INTERVAL '30 minutes'
                   THEN purchase_value END AS purchase_value
       FROM j""",
)
def as02_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 30-minute staleness bound: a match older
    than the tolerance is nulled out — the point-in-time feature-store
    contract ("use the latest signal, unless it has gone stale"). DuckDB
    has no ASOF tolerance, so the oracle post-filters its native ASOF;
    our operator nulls in the same single window pass it already makes
    (operators/asof.py — union + carry, no join, no extra shuffle).

    Scale: identical to as01 — one key exchange, one sorted carry;
    the tolerance is a row-local comparison after the carry. Interval
    math is exact in microseconds on both engines."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_value"],
        tolerance="30 minutes",
    )


@query(
    "as03_asof_forward",
    """SELECT l.event_id, l.user_id, l.ts,
              r.ts AS asof_ts, r.value AS purchase_value
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts <= r.ts""",
)
def as03_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click gets the user's next purchase
    at-or-after it — the row-grain "time to next conversion" lookup
    (ev07 aggregates the same question to one latency per user; this
    keeps every click row). operators/asof.py::asof_join_forward is the
    backward operator's mirror: same union + single key-partitioned
    window pass, scanned in descending time so last(ignorenulls) carries
    the nearest FOLLOWING purchase. DuckDB's native ASOF JOIN with a
    <= condition is the oracle.

    Scale: identical to as01 — one shuffle on the key, no join, O(1)
    window state; hot-key skew is the only hazard (AQE/salting)."""
    from ..operators.asof import asof_join_forward

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join_forward(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["purchase_value"],
    )
