"""Extended OLAP surface: the full Spark join/aggregate/window/set-op/pivot
capability the north star requires ("Spark OLAP capabilities" beyond the
reference's single join, SURVEY.md §2.4 note), each with a DuckDB oracle.

Determinism strategy (see plans/queries.py docstring): exact DECIMAL money
math cast back to DOUBLE, explicit tiebreaks under every LIMIT, and window
frames ordered by a total order so running aggregates are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .queries import dec2, query

# exact revenue term: extendedprice * (1 - discount) in DECIMAL — identical
# bit-for-bit on Spark and DuckDB regardless of aggregation order.
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev_col():
    return dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec2("l_discount"))


# ---------------------------------------------------------------------------
# Joins — inner / left / semi / anti / multiway star / cross
# ---------------------------------------------------------------------------


@query(
    "j01_inner_join_agg",
    f"""SELECT o_orderstatus, CAST(SUM({_REV}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus""",
)
def j01_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact-to-fact + aggregate.

    Scale: both sides shuffle on the join key (sort-merge at 100 TB); the
    revenue term stays in whole-stage codegen; partial agg before the final
    group-by shuffle keeps the second exchange tiny."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.sum(_rev_col()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "j02_left_join_count",
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name""",
)
def j02_left_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders; COUNT(col)
    skips the null-extended rows — both engines agree on that semantic."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "j03_semi_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997)""",
)
def j03_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with ≥1 order in 1997.

    Scale: the filter on the build side shrinks it before the shuffle;
    semi-join never duplicates probe rows, so no post-join distinct."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select("c_custkey", "c_name")


@query(
    "j04_anti_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def j04_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers that never ordered."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey", "c_name")


@query(
    "j05_star_join",
    f"""SELECT r_name, n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""",
)
def j05_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (TPC-H Q5 shape): fact ⋈ fact ⋈ three dims.

    Scale: nation/region carry explicit broadcast hints — they are
    bounded-size dims (25/5 rows at any scale) and an explicit
    F.broadcast() hint is BINDING: Spark honors it regardless of size and
    AQE never demotes it. That is exactly why customer carries NO hint —
    customer grows with the fact table, and a forced broadcast of a
    100 TB-scale customer dim would OOM the executors. Customer's join
    strategy is left to size-based planning + AQE, which picks broadcast
    at small SF and falls back to shuffle join when customer outgrows
    spark.sql.autoBroadcastJoinThreshold. Lineitem is partially
    aggregated to per-order revenue BEFORE the join (exact decimal sums
    commute through the regrouping), so the one real shuffle — the
    lineitem⋈orders edge — carries |orders| rows instead of |lineitem|
    rows, a ~4× payload cut that grows with lines-per-order."""
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_rev_col()).alias("order_rev"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.sum("order_rev").cast("double").alias("revenue"))
    )


@query(
    "j06_cross_join",
    """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n""",
)
def j06_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims (125 rows). Scale: only ever valid
    for dim×dim; Spark requires crossJoin to be explicit — by design."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


# ---------------------------------------------------------------------------
# Aggregations — TPC-H Q1 shape, distinct, rollup/cube, having
# ---------------------------------------------------------------------------


@query(
    "a01_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
)
def a01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical wide-agg scan.

    Scale: 6 aggregates over one pass; filter pushes to parquet; partial
    (map-side) agg reduces the shuffle to |groups| rows per task. AVG is
    expressed as exact-decimal SUM / COUNT so both engines emit the same
    double."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    sum_qty = F.sum(dec2("l_quantity")).cast("double")
    sum_price = F.sum(dec2("l_extendedprice")).cast("double")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_base_price"),
        F.sum(_rev_col()).cast("double").alias("sum_disc_price"),
        (sum_qty / F.count("*")).alias("avg_qty"),
        (sum_price / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "a02_count_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
              COUNT(DISTINCT l_suppkey) AS n_supps
       FROM lineitem GROUP BY l_returnflag""",
)
def a02_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct. Scale: Catalyst expands to a partial-distinct
    expand + two-phase agg; exact (the approx_ variant is a03)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query(
    "a03_approx_distinct",
    """SELECT l_returnflag,
              COUNT(DISTINCT l_partkey) AS n_parts_exact,
              TRUE AS within_5pct
       FROM lineitem GROUP BY l_returnflag""",
)
def a03_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-scale form of a02.

    The raw HLL estimate is engine-specific (Spark's HLL++ and DuckDB's HLL
    hash differently), so the estimate itself cannot be hash-compared.  The
    driver-visible contract is the estimate's documented ±5% accuracy bound,
    checked against the EXACT distinct count the oracle computes
    independently: ``within_5pct`` is Spark's HLL vs Spark's exact, the
    oracle's TRUE is the claim, and ``n_parts_exact`` pins both engines to
    the same ground truth.  Spark's HLL is deterministic for a given input
    (hash-based, no RNG), so the boolean is stable across runs.
    test_olap.py additionally asserts the raw estimate values.

    Scale: one pass, two sketches per group (HLL registers + the exact
    distinct expand); at 100 TB you'd drop the exact leg and ship only the
    HLL — it exists here to make the accuracy contract checkable."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("_approx"),
            F.countDistinct("l_partkey").alias("n_parts_exact"),
        )
        .select(
            "l_returnflag",
            "n_parts_exact",
            (
                F.abs(F.col("_approx") - F.col("n_parts_exact"))
                <= F.lit(0.05) * F.col("n_parts_exact")
            ).alias("within_5pct"),
        )
    )


@query(
    "a04_rollup",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              COUNT(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def a04_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag, flag+status, grand total)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "a05_cube",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def a05_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return load(spark, sf_dir, "lineitem").cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "a06_having",
    """SELECT o_custkey, COUNT(*) AS n_orders
       FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12""",
)
def a06_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by + HAVING (post-aggregation filter)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "a07_minmax_stats",
    """SELECT o_orderstatus,
              MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
              MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
              COUNT(*) AS n
       FROM orders GROUP BY o_orderstatus""",
)
def a07_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over numerics and timestamps (order-independent, so raw
    doubles are safe here)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("n"),
        )
    )


@query(
    "a08_grouping_sets",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
)
def a08_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (Catalyst produces the same
    Expand plan as the DataFrame rollup/cube forms)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "w01_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t WHERE rn <= 3""",
)
def w01_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number with a total order (tiebreak
    o_orderkey) so the selected rows are engine-deterministic.

    Scale: single shuffle on the partition key; no join. At extreme group
    counts this is the canonical 'top-k per key' pattern."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "w02_running_sum",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS running_spend
       FROM orders""",
)
def w02_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order time (decimal-exact prefix
    sums → identical doubles on both engines)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
    )


@query(
    "w03_lag_lead",
    """SELECT o_custkey, o_orderkey,
              CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   - LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1)
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS DOUBLE) AS delta_prev,
              LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS next_order
       FROM orders""",
)
def w03_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD navigation within a customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    p = dec2("o_totalprice")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (p - F.lag(p, 1).over(w)).cast("double").alias("delta_prev"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
    )


@query(
    "w04_rank_flavors",
    """SELECT o_orderkey,
              RANK()       OVER (ORDER BY o_orderpriority)        AS rk,
              DENSE_RANK() OVER (ORDER BY o_orderpriority)        AS drk,
              NTILE(4)     OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
       FROM orders""",
)
def w04_rank_flavors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank on a low-cardinality key (deterministic despite
    ties — rank depends only on the key), ntile under a total order.

    Scale note: unpartitioned windows serialize onto one task — fine for
    reporting outputs, never for fact-sized inputs (use w01's partitioned
    form there)."""
    w_prio = Window.orderBy(F.asc("o_orderpriority"))
    w_price = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rank().over(w_prio).alias("rk"),
        F.dense_rank().over(w_prio).alias("drk"),
        F.ntile(4).over(w_price).alias("quartile"),
    )


@query(
    "w05_sliding_avg",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              AS moving_avg
       FROM orders""",
)
def w05_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per customer (exact decimal sum / count)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec2("o_totalprice")).over(w).cast("double") / F.count("*").over(w)).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "s01_union_all",
    """SELECT nationkey, COUNT(*) AS n FROM (
         SELECT c_nationkey AS nationkey FROM customer
         UNION ALL
         SELECT s_nationkey AS nationkey FROM supplier) u
       GROUP BY nationkey""",
)
def s01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + aggregate (unionByName in DataFrame form)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count("*").alias("n"))


@query(
    "s02_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def s02_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations with both customers and
    suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "s03_except",
    """SELECT c_nationkey AS nationkey FROM customer
       EXCEPT
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def s03_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — nations with customers but no
    suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # subtract == EXCEPT DISTINCT


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]


@query(
    "p01_pivot",
    """SELECT user_id % 10 AS user_bucket,
              COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
              COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
              COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
              COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
       FROM events GROUP BY user_id % 10""",
)
def p01_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns (explicit value list — required at
    scale so Spark skips the extra distinct-values job). Missing cells are
    coalesced to 0 to match SQL conditional-count semantics."""
    df = (
        load(spark, sf_dir, "events")
        .withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside Pivot
    )
    return df.select(
        "user_bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@query(
    "p02_unpivot",
    """SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
       UNION ALL
       SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS value
       FROM customer""",
)
def p02_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) via stack() — wide measures to long form."""
    return load(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (measure, value)",
    )


@query(
    "p03_pivot_multi_agg",
    """SELECT user_id % 10 AS user_bucket,
              COUNT(*) FILTER (WHERE event_type = 'click') AS click_n,
              CAST(COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                            FILTER (WHERE event_type = 'click'), 0)
                   AS BIGINT) AS click_cents,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
              CAST(COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                            FILTER (WHERE event_type = 'purchase'), 0)
                   AS BIGINT) AS purchase_cents
       FROM events GROUP BY user_id % 10""",
)
def p03_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (count + exact cents sum
    for each pivoted event type) — Spark names the output columns
    `<value>_<alias>`, so both sides alias to the same
    `{type}_{n,cents}` scheme. Explicit value list as in p01.

    Scale: still one hash aggregation — each extra aggregate adds a
    column of state per group cell, not a pass; integer cents keep the
    sums engine-exact."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    pivoted = (
        ev.select((F.col("user_id") % 10).alias("user_bucket"), "event_type", cents.alias("cents"))
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "purchase"])
        .agg(F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"))
    )
    return pivoted.select(
        "user_bucket",
        F.coalesce("click_n", F.lit(0)).alias("click_n"),
        F.coalesce("click_cents", F.lit(0)).alias("click_cents"),
        F.coalesce("purchase_n", F.lit(0)).alias("purchase_n"),
        F.coalesce("purchase_cents", F.lit(0)).alias("purchase_cents"),
    )
