"""Second OLAP coverage batch: the join/subquery/window/statistics surface
still missing after plans/olap.py — full outer join, NOT IN, correlated
scalar subqueries, UNION DISTINCT, RANGE window frames, exact correlation
statistics, and map / array set operations. Each query is oracle-checked.

Determinism strategy follows plans/queries.py: all money math in
DECIMAL(18,2) (order-independent partial aggregation), comparisons
restated as integer-exact cross-multiplications instead of divisions, and
identical double-expression trees on both engines wherever a float is
unavoidable (same IEEE ops on same inputs → same bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .queries import dec2, query

# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "j08_full_outer_join",
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
              c.n_customers, s.n_suppliers
       FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
             FROM customer GROUP BY 1) c
       FULL OUTER JOIN
            (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
             FROM supplier GROUP BY 1) s
       ON c.nationkey = s.nationkey""",
)
def j08_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides: per-nation customer vs
    supplier counts, keeping nations present on either side only.

    Scale: aggregating BEFORE the outer join shrinks both sides to |keys|
    rows, so the full-outer shuffle is trivial; outer-joining the raw
    tables and then aggregating would shuffle the full fact data and
    null-extend row-by-row."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, c["c_nk"] == s["s_nk"], "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"), "n_customers", "n_suppliers"
    )


@query(
    "j09_shipping_priority",
    """SELECT l_orderkey,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              o_orderdate
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
         AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def j09_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter → two-hop
    join → revenue agg → top-10.

    Scale: the mktsegment filter keeps ~1/5 of customers; that side
    broadcasts into orders, the filtered orders⋈lineitem edge shuffles on
    orderkey; both date filters push to the parquet scans. Top-10 is
    TakeOrderedAndProject — no global sort."""
    cutoff = F.lit("1997-06-30 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "j10_not_in_subquery",
    """SELECT p_partkey, p_name FROM part
       WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)""",
)
def j10_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable subquery column — parts never shipped in
    bulk. With a provably non-null subquery side this is a plain left-anti
    join; Catalyst plans exactly that (the null-aware anti-join machinery
    only kicks in when the column is nullable).

    Scale: the subquery side is aggregated to distinct keys before the
    anti-join shuffle; a selective quantity filter shrinks it further at
    the scan."""
    p = load(spark, sf_dir, "part")
    bulk = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_partkey")
        .distinct()
    )
    return p.join(bulk, p["p_partkey"] == bulk["l_partkey"], "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "q12_correlated_subquery",
    """SELECT o_orderkey, o_custkey FROM orders o
       WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2
             * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""",
)
def q12_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: orders priced 50% above their own
    customer's average. The predicate is cross-multiplied (price*2*n >
    3*sum) so every comparison stays in exact integer/decimal arithmetic —
    no division, no float threshold, engine-identical row set.

    Run through the SQL API on purpose: Catalyst de-correlates both
    subqueries into one aggregate + join (RewriteCorrelatedScalarSubquery),
    i.e. the same physical plan as the hand-written groupBy+join form —
    one extra scan of orders, one shuffle on o_custkey."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """SELECT o_orderkey, o_custkey FROM orders o
           WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2
                 * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
                 > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"""
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "s04_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
       UNION
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def s04_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct semantics) — completes the set-op family next to
    s01 UNION ALL / s02 INTERSECT / s03 EXCEPT. Spark has no union-distinct
    primitive; union + dropDuplicates is the idiom and Catalyst collapses
    it to a single hash-distinct over the concatenated scans."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).dropDuplicates()


# ---------------------------------------------------------------------------
# RANGE window frame + cume_dist
# ---------------------------------------------------------------------------


@query(
    "w07_range_frame",
    """SELECT o_orderkey, o_custkey,
              COUNT(*) OVER (PARTITION BY o_custkey ORDER BY cents
                             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_within_500,
              CAST(cume_dist() OVER (PARTITION BY o_custkey ORDER BY cents) AS DOUBLE) AS cd
       FROM (SELECT o_orderkey, o_custkey,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             FROM orders) t""",
)
def w07_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: for each order, how many of the same
    customer's orders are within $500 below it — plus cume_dist. The order
    key is exact integer cents (double→decimal→bigint, identical on both
    engines; a raw double*100 cast would truncate on Spark but round on
    DuckDB). Both window functions depend only on the key value, so ties
    don't break determinism.

    Scale: one shuffle on o_custkey + one sort; the RANGE frame is
    evaluated with a sliding two-pointer pass, no per-row rescans."""
    cents = (dec2("o_totalprice") * 100).cast("bigint")
    base = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", cents.alias("cents"))
    wf = Window.partitionBy("o_custkey").orderBy("cents").rangeBetween(-50000, 0)
    wo = Window.partitionBy("o_custkey").orderBy("cents")
    return base.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(wf).alias("n_within_500"),
        F.cume_dist().over(wo).cast("double").alias("cd"),
    )


# ---------------------------------------------------------------------------
# Exact correlation / covariance statistics
# ---------------------------------------------------------------------------

_STATS_CTE = """WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)"""


@query(
    "a11_corr_stats",
    _STATS_CTE
    + """
       SELECT l_returnflag, n,
              CAST(CAST((n * sxy - sx * sy)
                   / NULLIF(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0)
                   AS DECIMAL(20,6)) AS DOUBLE) AS corr_qty_price,
              CAST(CAST((sxy - sx * sy / n) / NULLIF(n - 1, 0) AS DECIMAL(20,6))
                   AS DOUBLE) AS covar_samp,
              CAST(CAST(sqrt((sxx - sx * sx / n) / NULLIF(n - 1, 0)) AS DECIMAL(20,6))
                   AS DOUBLE) AS stddev_qty
       FROM s""",
)
def a11_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / sample covariance / sample stddev per return flag,
    computed from exact-decimal moment sums (n, Σx, Σy, Σx², Σy², Σxy)
    with the float formula applied AFTER aggregation — order-independent,
    unlike the built-in corr()/covar_samp() whose accumulation order is
    engine- and partitioning-dependent. The wide Σy² decimal→double cast
    can still differ by 1 ULP between engines (observed on this very
    data), so the outputs are quantized to DECIMAL(20,6), which absorbs
    last-bit input noise while keeping 10 exact fractional digits. The
    final DOUBLE cast is the driver-hashable output contract (no DECIMAL
    columns leave a query); it is exact here because the quantized
    unscaled values fit in 2^53, so decimal→double is one correctly-
    rounded IEEE division on both engines.

    Scale: a single scan with map-side partial sums; the moment trick is
    exactly how a distributed engine should compute second-order stats
    (one pass, order-independent, no broadcast of means)."""
    li = load(spark, sf_dir, "lineitem")
    x, y = dec2("l_quantity"), dec2("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    q6 = "decimal(20,6)"
    # try_divide: corr/covar_samp/stddev_samp are undefined for n=1 /
    # zero variance — NULL, matching the built-ins, not an ANSI
    # divide-by-zero crash (degenerate-input sweep, r8).
    return s.select(
        "l_returnflag",
        "n",
        F.try_divide(
            n * sxy - sx * sy, F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        )
        .cast(q6)
        .cast("double")
        .alias("corr_qty_price"),
        F.try_divide(sxy - sx * sy / n, n - 1).cast(q6).cast("double").alias("covar_samp"),
        F.sqrt(F.try_divide(sxx - sx * sx / n, n - 1))
        .cast(q6)
        .cast("double")
        .alias("stddev_qty"),
    )


# ---------------------------------------------------------------------------
# Map & array set operations
# ---------------------------------------------------------------------------


@query(
    "f14_map_ops",
    """SELECT user_id,
              COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
       FROM events GROUP BY user_id""",
)
def f14_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup: per-user event-type counts rolled into a
    MapType column (map_from_entries over collect_list(struct)), then
    element_at extraction back to scalars. The oracle states the same
    result as conditional counts — the map is the Spark-side data shape
    under test, the values are what's compared.

    Scale: the map stays bounded by |event_type| (5), so per-user state is
    tiny; one shuffle on (user_id, event_type), one on user_id."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    # NULL event_type would be an illegal map key (NULL_MAP_KEY). Dropping
    # those entries AFTER the user-level collect (array filter, not a row
    # filter) keeps a user whose only events are NULL-typed alive with an
    # empty map — matching the oracle's GROUP BY user_id + conditional
    # counts — and, unlike the r8 sentinel fold, cannot collide with a
    # literal '<null>' string in the data (DUPLICATE_MAP_KEY; ADVICE r8).
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.filter(
                F.collect_list(F.struct("event_type", "cnt")),
                lambda s: s["event_type"].isNotNull(),
            )
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchase"),
    )


@query(
    "f15_array_set_ops",
    """WITH f AS (
         SELECT l_orderkey, l_partkey,
                MAX(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS hi,
                MAX(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS lo
         FROM lineitem GROUP BY 1, 2)
       SELECT l_orderkey,
              CAST(SUM(hi * lo) AS BIGINT) AS n_both,
              CAST(COUNT(*) AS BIGINT) AS n_any,
              CAST(SUM(hi * (1 - lo)) AS BIGINT) AS n_only_high
       FROM f GROUP BY l_orderkey""",
)
def f15_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: per order, the part sets shipped in high vs low
    quantities, combined with array_intersect / array_union / array_except
    and reduced to sizes. The oracle restates the set algebra relationally
    (per-key flags), which is also the formulation that scales — the array
    form is bounded by parts-per-order (~7) so it's safe here, but at
    100 TB per-key sets of unbounded cardinality should stay relational."""
    li = load(spark, sf_dir, "lineitem")
    hi = F.collect_set(F.when(F.col("l_quantity") > 25, F.col("l_partkey"))).alias("hi")
    lo = F.collect_set(F.when(F.col("l_quantity") <= 25, F.col("l_partkey"))).alias("lo")
    sets = li.groupBy("l_orderkey").agg(hi, lo)
    return sets.select(
        "l_orderkey",
        F.size(F.array_intersect("hi", "lo")).cast("bigint").alias("n_both"),
        F.size(F.array_union("hi", "lo")).cast("bigint").alias("n_any"),
        F.size(F.array_except("hi", "lo")).cast("bigint").alias("n_only_high"),
    )


# ---------------------------------------------------------------------------
# s05 — bag-semantics set operations (EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------


@query(
    "s05_bag_set_ops",
    """WITH a AS (SELECT o_custkey FROM orders
                  WHERE o_orderdate <= DATE '1997-12-31'),
        b AS (SELECT o_custkey FROM orders
              WHERE o_orderdate >= DATE '1997-01-01'),
        x AS (SELECT o_custkey, 'except_all' AS op FROM
                (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)),
        i AS (SELECT o_custkey, 'intersect_all' AS op FROM
                (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b))
        SELECT op, o_custkey, COUNT(*) AS n
        FROM (SELECT * FROM x UNION ALL SELECT * FROM i)
        GROUP BY op, o_custkey""",
)
def s05_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — multiset semantics: a customer with 5
    orders in window A and 2 in window B survives EXCEPT ALL 3 times and
    INTERSECT ALL twice (the DISTINCT forms in s03 lose multiplicity).
    Output is (op, key, multiplicity) so the bag contents hash stably.

    Scale: Catalyst implements both as a single hash aggregation carrying
    two counts per key and re-expanding (generate) to the surviving
    multiplicity — one shuffle on the key, never a join; the window
    predicates push to both scans."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(
        F.col("o_orderdate") <= F.lit("1997-12-31").cast("date")
    ).select("o_custkey")
    b = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")
    ).select("o_custkey")
    x = a.exceptAll(b).select("o_custkey", F.lit("except_all").alias("op"))
    i = a.intersectAll(b).select("o_custkey", F.lit("intersect_all").alias("op"))
    return x.unionByName(i).groupBy("op", "o_custkey").agg(F.count("*").alias("n"))
