"""Coverage extras: scalar subqueries, analytic value windows, higher-order
array functions, and deterministic (hash-based) sampling — the remaining
OLAP surface a Spark engine is expected to expose, each oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .queries import query


@query(
    "q11_scalar_subquery",
    """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
       FROM orders
       WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
             (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) * 1.5 FROM orders)""",
)
def q11_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate: orders 50% above the mean price. Catalyst
    plans the subquery as an independent stage whose single-row result
    broadcasts into the filter — one extra scan, zero shuffles of the
    probe side. Exact-decimal AVG keeps the threshold engine-identical."""
    o = load(spark, sf_dir, "orders")
    spark_o = o.select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"),
                       F.col("o_totalprice").cast("decimal(18,2)").alias("_p"))
    thr = o.agg((F.avg(F.col("o_totalprice").cast("decimal(18,2)")) * 1.5).alias("t"))
    return (
        spark_o.join(F.broadcast(thr))
        .filter(F.col("_p") > F.col("t"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "w06_value_windows",
    """SELECT l_orderkey, l_linenumber,
              first_value(l_extendedprice) OVER w AS first_price,
              last_value(l_extendedprice)  OVER w AS last_price,
              nth_value(l_extendedprice, 2) OVER w AS second_price,
              CAST(percent_rank() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_extendedprice) AS DOUBLE) AS prk
       FROM lineitem
       WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def w06_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + percent_rank under a total per-partition
    order (l_linenumber repeats, so price joins the sort key). The frame is
    the full partition — one shuffle on l_orderkey, no second sort."""
    li = load(spark, sf_dir, "lineitem")
    order = [F.asc("l_linenumber"), F.asc("l_extendedprice")]
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wr = Window.partitionBy("l_orderkey").orderBy(*order)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
        F.percent_rank().over(wr).cast("double").alias("prk"),
    )


@query(
    "f13_higher_order",
    """WITH t AS (
         SELECT l_orderkey, list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber, l_quantity) AS qs
         FROM lineitem GROUP BY l_orderkey
       )
       SELECT l_orderkey,
              array_to_string(list_transform(qs, x -> CAST(x * 2 AS VARCHAR)), ',')
                AS doubled,
              COALESCE(array_to_string(list_transform(list_filter(qs, x -> x >= 25),
                                                      x -> CAST(x AS VARCHAR)), ','),
                       '') AS big,
              CAST(list_sum(qs) AS BIGINT) AS total,
              len(qs) AS n
       FROM t""",
)
def f13_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) over a
    deterministically-ordered collected array — all JVM-side expression
    evaluation, no UDFs, fully codegen'd. Array-valued results are
    serialized to comma-joined VARCHAR at the output boundary (the
    driver's hasher can't digest LIST columns); the higher-order coverage
    is unchanged — only the representation of the result."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("l_linenumber"), q.alias("q")))),
        lambda s: s["q"],
    )
    t = li.groupBy("l_orderkey").agg(ordered.alias("qs"))
    return t.select(
        "l_orderkey",
        F.array_join(
            F.transform("qs", lambda x: (x * 2).cast("string")), ","
        ).alias("doubled"),
        F.array_join(
            F.transform(
                F.filter("qs", lambda x: x >= 25), lambda x: x.cast("string")
            ),
            ",",
        ).alias("big"),
        F.aggregate("qs", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("total"),
        F.size("qs").cast("long").alias("n"),
    )


@query(
    "sm01_deterministic_sample",
    """SELECT doc_id, lang FROM documents
       WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 = 0""",
)
def sm01_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample via content hash (md5(id) mod 20) — unlike
    rand()/TABLESAMPLE it is reproducible across engines, retries, and
    re-runs, which is what a training-data pipeline needs for held-out
    splits. Scales as a stateless filter: no shuffle, prunes at the scan
    when the hash is precomputed as a column."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
    return d.filter(h % 20 == 0).select("doc_id", "lang")
