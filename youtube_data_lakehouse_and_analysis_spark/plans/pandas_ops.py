"""Grouped-map Pandas UDF surface (applyInPandas) with an EXACT oracle —
the escape hatch for per-group algorithms Spark expressions can't state,
done without giving up engine-identical results.

The determinism recipe: every float-sensitive input is encoded JVM-side as
an exact integer (days via datediff, money via decimal→cents), the UDF
accumulates with arbitrary-precision Python ints (no float, no int64
overflow), and exactly ONE float operation — a single IEEE-754 division of
two exactly-representable integers — produces each double output. DuckDB's
int→double cast + division performs the identical two roundings, so the
hash gate passes bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .queries import dec2, query


def _slope_udf(pdf):
    import pandas as pd

    xs = [int(v) for v in pdf["x"]]
    ys = [int(v) for v in pdf["y"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    slope = float(num) / float(den) if den else None
    return pd.DataFrame(
        {"event_type": [pdf["event_type"].iloc[0]], "n": [n], "slope_cents_per_day": [slope]}
    )


@query(
    "pd01_group_regression",
    """WITH b AS (
         SELECT event_type,
                date_diff('day',
                          CAST(MIN(ts) OVER (PARTITION BY event_type) AS DATE),
                          CAST(ts AS DATE)) AS x,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
         FROM events),
       bf AS (SELECT * FROM b WHERE x IS NOT NULL AND y IS NOT NULL),
       s AS (SELECT event_type, COUNT(*) AS n,
                    SUM(x) AS sx, SUM(y) AS sy,
                    SUM(x * x) AS sxx, SUM(x * y) AS sxy
             FROM bf GROUP BY event_type)
       SELECT event_type, n,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day
       FROM s""",
)
def pd01_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value trend: least-squares slope (cents/day) of event
    value over days-since-first-event, computed in a grouped-map
    applyInPandas UDF. The regression itself is the pretext; the point is
    the pattern — exact integer encoding in, big-int accumulation inside,
    one float division out (module docstring).

    Scale: one shuffle on the grouping key; each group streams through the
    UDF as Arrow batches. Groups here are 5 event types — for high-
    cardinality keys this stays balanced (state per group is six numbers);
    for SKEWED keys pre-aggregate the six moment sums relationally (a09
    pattern) and keep Python out entirely — which is also the fallback
    whenever the per-group logic happens to be expressible as sums."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    base = ev.select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.min("ts").over(w).cast("date")).alias("x"),
        (dec2("value") * 100).cast("bigint").alias("y"),
    )
    # NULL ts/value rows carry no (x, y) point — excluded BEFORE the
    # worker on both engines, so the UDF only ever sees clean integers
    # (degenerate-input sweep, r8; a group of only-NULL rows vanishes
    # identically on both sides).
    return (
        base.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("event_type")
        .applyInPandas(
            _slope_udf, schema="event_type string, n bigint, slope_cents_per_day double"
        )
    )


# ---------------------------------------------------------------------------
# pd02 — Python UDTF (Spark 4 user-defined table function)
# ---------------------------------------------------------------------------


@query(
    "pd02_udtf_bigrams",
    """SELECT doc_id, CAST(i AS BIGINT) AS pos,
              array_to_string(list_slice(ws, i + 1, i + 2), ' ') AS bigram
       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
            UNNEST(range(0, len(ws) - 1)) AS u(i)
       WHERE len(ws) >= 2""",
)
def pd02_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): a table function emitting one row per word
    bigram, applied per document via LATERAL — the API-surface
    demonstration for row-expanding Python logic that can't be expressed
    with built-ins. (These bigrams CAN be — see dd09's built-in shingle
    path; a real use is a tokenizer or parser library call. The point
    here is exercising the UDTF execution path under the oracle gate.)

    Scale: UDTFs run Arrow-batched Python workers — the slow path
    (~10-100× vs codegen). Use only when the expansion logic needs a
    Python library; keep the UDTF stateless so Spark can pipeline it
    map-side (no shuffle here), and project only the columns the UDTF
    consumes (the lateral join carries doc_id + text)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, bigram string")
    class Bigrams:
        def eval(self, text: str):
            if text is None:
                return
            w = text.split(" ")
            for i in range(len(w) - 1):
                yield i, w[i] + " " + w[i + 1]

    spark.udtf.register("bigrams", Bigrams)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """SELECT d.doc_id, b.pos, b.bigram
           FROM documents_v d, LATERAL bigrams(d.text) b"""
    )


# ---------------------------------------------------------------------------
# pd03 — grouped-AGGREGATE pandas UDF (Series -> scalar), exact oracle
# ---------------------------------------------------------------------------


def _wavg_udf():
    @F.pandas_udf("double")
    def wavg(cents: pd.Series, qty: pd.Series) -> float:
        # arbitrary-precision int accumulation; ONE float division out.
        # NaN guards mirror SQL SUM null-skipping exactly: the numerator
        # drops a pair when EITHER side is NULL (the product is NULL),
        # the denominator only when qty is (degenerate-input sweep, r8).
        num = sum(
            int(c) * int(q)
            for c, q in zip(cents, qty)
            if pd.notna(c) and pd.notna(q)
        )
        den = sum(int(q) for q in qty if pd.notna(q))
        return float(num) / float(den) if den else None

    return wavg


@query(
    "pd03_grouped_agg_udf",
    """SELECT l_suppkey,
              CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)
                             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)
                / CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                AS wavg_price_cents
       FROM lineitem GROUP BY l_suppkey""",
)
def pd03_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per supplier via a grouped-AGGREGATE
    pandas UDF (Series→scalar — the UDAF surface; pd01 covers grouped-MAP).
    Same determinism recipe as pd01: money becomes exact integer cents
    JVM-side, the UDF accumulates in Python big-ints, and one IEEE
    division produces the double (DuckDB's BIGINT sum + divide performs
    the identical roundings; the sum is narrowed from int128 to BIGINT
    before the double cast to dodge DuckDB's int128→double misround).

    Scale: grouped-agg pandas UDFs hash-shuffle whole groups to Python
    workers over Arrow — no partial aggregation, so the shuffle carries
    every row (vs built-ins' map-side combine). That's the real cost of
    leaving the JVM: this exact statistic IS expressible as built-ins
    (the oracle shows it) and would then combine map-side; the UDF form
    is for algorithms that genuinely need per-group code."""
    li = load(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    wavg = _wavg_udf()
    return (
        li.select(
            "l_suppkey",
            cents.alias("cents"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy("l_suppkey")
        .agg(wavg("cents", "qty").alias("wavg_price_cents"))
    )


def _norm_batches(batches):
    """mapInArrow worker: per-batch vectorized L1 norm + argmax dim of the
    quantized vector. Quantization matches the engines' round() (half away
    from zero): numpy's rint would bankers-round, and the naive
    floor(x + 0.5) drifts one step high when x sits within half an ulp
    below a .5 boundary (the + 0.5 addition rounds up before floor) — so
    the half test compares the EXACT fractional part instead, which for
    x < 2^52 is computed without rounding error."""
    import numpy as np
    import pyarrow as pa

    def _one(v):
        # slow path for a single list value (possibly NULL): mirrors the
        # vectorized math below; NULL vector -> NULL features, matching
        # the oracle's list_sum(NULL)/list_indexof(NULL) (r8 sweep)
        if not v.is_valid:
            return None, None
        x = np.asarray(v.as_py(), dtype=np.float64)
        if x.size == 0:
            return 0, None
        mag = np.minimum(np.abs(x), 1000.0) * 1000.0  # saturating quantizer (see S.quantize)
        fl = np.floor(mag)
        a = (fl + (mag - fl >= 0.5)).astype(np.int64)
        return int(a.sum()), int(a.argmax()) + 1

    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        col = tbl.column("embedding").combine_chunks()
        if len(col) == 0:
            continue
        if col.null_count:
            feats = [_one(v) for v in col]
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": tbl.column("vec_id").combine_chunks(),
                    "l1_scaled": pa.array([f[0] for f in feats], type=pa.int64()),
                    "argmax_dim": pa.array([f[1] for f in feats], type=pa.int32()),
                }
            )
            continue
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        vecs = flat.reshape(len(col), -1)  # no per-element Python boxing
        mag = np.minimum(np.abs(vecs), 1000.0) * 1000.0  # saturating quantizer (see S.quantize)
        fl = np.floor(mag)
        q = fl + (mag - fl >= 0.5)  # exact half-away-from-zero on |x|
        a = q.astype(np.int64)
        yield pa.RecordBatch.from_pydict(
            {
                "vec_id": tbl.column("vec_id").combine_chunks(),
                "l1_scaled": pa.array(a.sum(axis=1), type=pa.int64()),
                "argmax_dim": pa.array(a.argmax(axis=1) + 1, type=pa.int32()),
            }
        )


@query(
    "pd04_map_in_arrow",
    """WITH q AS (
         SELECT vec_id,
                list_transform(embedding,
                  x -> abs(CAST(round(least(greatest(CAST(x AS DOUBLE), -1000.0), 1000.0) * 1000) AS BIGINT))) AS a
         FROM embeddings)
       SELECT vec_id,
              CAST(list_sum(a) AS BIGINT) AS l1_scaled,
              CAST(list_indexof(a, list_max(a)) AS INTEGER) AS argmax_dim
       FROM q""",
)
def pd04_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-Arrow batch transform (mapInArrow — the fourth Python-eval
    surface next to pd01 applyInPandas / pd02 UDTF / pd03 grouped-agg):
    per-vector L1 norm and 1-based argmax dimension of the quantized
    embedding, computed with numpy over zero-conversion Arrow batches.
    Integer-exact: quantization reproduces the engines' half-away-from-
    zero round() explicitly (np.rint would bankers-round), so the oracle
    hash is bit-stable; ties in argmax resolve to the FIRST max in both
    numpy and DuckDB's list_indexof.

    Scale: mapInArrow is the lowest-overhead Python path — no pandas
    materialization, one Arrow batch in flight per task, vectorized
    numpy over the whole batch. Still off-JVM (the oracle shows the same
    statistic as built-ins, which would additionally combine map-side);
    the op exists for kernels that genuinely need numpy, and the plumbing
    (schema contract, batch iteration, chunk handling) is the part a
    100 TB embedding scorer reuses."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(
        _norm_batches, "vec_id long, l1_scaled long, argmax_dim int"
    )
