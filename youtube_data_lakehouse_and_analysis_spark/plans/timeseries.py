"""Time-series & exact-statistics queries (ts/a-series extensions).

Determinism design for the FP-sensitive aggregates: variance / stddev /
correlation are NOT computed with the engines' native one-pass aggregates
(whose summation order differs between Spark and DuckDB, perturbing the
last ulps). Instead both sides reduce to EXACT integer sums (n, Σx, Σx²,
Σxy over integral columns) and apply the identical closed-form double
expression — one IEEE op chain, bit-identical results. At 100 TB the
integer sums stay exact in 64 bits as long as Σx² < 2^63 (for l_quantity
≤ 50: ~3.7e15 rows/group); past that, widen to decimal(38,0) sums.

OHLC picks raw values (no arithmetic), so doubles compare exactly; the
open/close tie-break is the total order (ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from .queries import query


@query(
    "ts01_hourly_gap_fill",
    """WITH hourly AS (
         SELECT event_type, date_trunc('hour', ts) AS hour_start, COUNT(*) AS n
         FROM events GROUP BY event_type, date_trunc('hour', ts)
       ),
       spans AS (
         SELECT event_type, MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly
         GROUP BY event_type
       ),
       grid AS (
         SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
         FROM spans
       )
       SELECT g.event_type, g.hour_start, COALESCE(h.n, 0) AS n
       FROM grid g LEFT JOIN hourly h
         ON g.event_type = h.event_type AND g.hour_start = h.hour_start""",
)
def ts01_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly counts per event_type: build the dense hour grid
    with sequence+explode (both ends inclusive, matching generate_series),
    left-join the sparse counts, zero-fill. The grid is |types| × |hours|
    — generated, never shuffled at data scale; the counts aggregate
    map-side before their one shuffle."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count("*").alias("n"))
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start"),
        )
    )
    return grid.join(hourly, on=["event_type", "hour_start"], how="left").select(
        "event_type", "hour_start", F.coalesce("n", F.lit(0)).alias("n")
    )


@query(
    "ts02_daily_ohlc",
    """WITH based AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts, event_id, value,
                ROW_NUMBER() OVER (PARTITION BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                                   ORDER BY ts ASC, event_id ASC) AS rn_a,
                ROW_NUMBER() OVER (PARTITION BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                                   ORDER BY ts DESC, event_id DESC) AS rn_d
         FROM events
       )
       SELECT event_type, day,
              MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
              MAX(value) AS high, MIN(value) AS low,
              MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
              COUNT(*) AS n_events
       FROM based GROUP BY event_type, day""",
)
def ts02_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC resample per event_type: open/close via min_by/max_by on
    the total order (ts, event_id) — one hash aggregation, no window, no
    second shuffle (the window form the oracle uses is the naive plan; the
    min_by form is the scalable one)."""
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "a09_exact_moments",
    """WITH sums AS (
         SELECT l_returnflag,
                COUNT(*) AS n,
                SUM(CAST(l_quantity AS HUGEINT)) AS sx,
                SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx,
                SUM(CAST(l_linenumber AS HUGEINT)) AS sy,
                SUM(CAST(l_linenumber AS HUGEINT) * CAST(l_linenumber AS HUGEINT)) AS syy,
                SUM(CAST(l_quantity AS HUGEINT) * CAST(l_linenumber AS HUGEINT)) AS sxy
         FROM lineitem GROUP BY l_returnflag
       )
       SELECT l_returnflag, n,
              (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / NULLIF(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE), 0) AS var_qty,
              sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / NULLIF(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE), 0)) AS stddev_qty,
              (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0) AS corr_qty_line
       FROM sums""",
)
def a09_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / correlation from exact integer sums (see
    module docstring): the shuffle moves 6 longs per group, not raw rows —
    the same partial-aggregation shape as any sum, at any scale."""
    li = load(spark, sf_dir, "lineitem")
    # DECIMAL(19,0) operands so the squared/cross products carry 38
    # digits (twin: HUGEINT): BIGINT products overflow under ANSI at
    # magnitude extremes (maxvals layout, r10) — and a silent
    # try_multiply NULL would be a wrong statistic, not a guard
    x = F.col("l_quantity").cast("decimal(19,0)")
    y = F.col("l_linenumber").cast("decimal(19,0)")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c).cast("double") for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    nm1 = (F.col("n") - 1).cast("double")
    # try_divide: sample variance/corr are undefined for n=1 / zero
    # variance — NULL (matching stddev_samp/corr built-ins), not an
    # ANSI divide-by-zero crash (degenerate-input sweep, r8).
    var = F.try_divide(n * sxx - sx * sx, n * nm1)
    corr = F.try_divide(
        n * sxy - sx * sy, F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return sums.select(
        "l_returnflag",
        "n",
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        corr.alias("corr_qty_line"),
    )


@query(
    "a10_mode_per_user",
    """SELECT user_id, event_type AS mode_event_type, n FROM (
         SELECT user_id, event_type, COUNT(*) AS n,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY COUNT(*) DESC, event_type ASC) AS rn
         FROM events GROUP BY user_id, event_type) t
       WHERE rn = 1""",
)
def a10_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent event_type per user, ties broken
    lexicographically (engines' native mode() tie-breaks are unspecified —
    the count+rank form is the portable, scalable one: two stages, both
    partial-aggregatable)."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "n")
    )


# ---------------------------------------------------------------------------
# ts03 — rolling z-score anomaly flag, integer-exact (no sqrt, no division)
# ---------------------------------------------------------------------------

_ZS_WIN = 9  # current row + 9 preceding = 10-event rolling frame


@query(
    "ts03_rolling_zscore",
    f"""WITH c AS (SELECT user_id, event_id, ts,
                          CAST(FLOOR(value * 100) AS BIGINT) AS cents,
                          CAST(FLOOR(value * 100) AS HUGEINT) AS centsh
                   FROM events),
        rolled AS (SELECT user_id, event_id, ts, cents,
                          COUNT(*) OVER w AS n,
                          SUM(centsh) OVER w AS s,
                          SUM(centsh * centsh) OVER w AS q
                   FROM c
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN {_ZS_WIN} PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, cents, n,
               (n >= 5 AND
                (n * CAST(cents AS HUGEINT) - s) * (n * CAST(cents AS HUGEINT) - s)
                  > 4 * (n * q - s * s))
                 AS is_anomaly
        FROM rolled""",
)
def ts03_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag over each user's last 10 events:
    |x - mean| > 2*stddev, evaluated WITHOUT sqrt or division — cross-
    multiplied to (n*x - S)^2 > 4(nQ - S^2) on integer cents (S=Σx, Q=Σx²),
    so the decision is bit-identical on any engine (float sqrt/divide
    would make boundary rows engine-dependent — a09's moment-sum recipe
    applied to sliding frames). Values quantize via floor(value*100):
    the double product is IEEE-identical on both engines, and floor —
    unlike each engine's double→int cast — rounds the same way on both.
    Frames shorter than 5 events abstain (cold start).

    Scale: one user_id exchange + one sorted pass; ROWS frames evaluate
    incrementally (running add/evict, O(1) per row). This is the batch
    twin of a streaming detector over applyInPandasWithState with a
    10-event deque per key."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ZS_WIN, 0)
    )
    c = ev.select("user_id", "event_id", "ts", cents.alias("cents"))
    # moment sums AND the decision polynomial in DECIMAL operands /
    # 38-digit products (twin: HUGEINT): BIGINT cents² overflows at
    # magnitude extremes (maxvals layout, r10 — same widening as a09),
    # and so does the BIGINT product n*cents in dev once a frame holds
    # several ~1e18-magnitude cents rows (r12, closing the r10/r11
    # ADVICE item — ANSI mode turns that overflow into a crash).
    # Documented bound: every intermediate fits 38 digits for |cents| ≤
    # ~2.5e17 per frame row (value ≤ $2.5e15), far past any real dollar
    # domain: |dev| ≤ n·|x|+|S| ≤ 5e18, dev² ≤ 2.5e37, 4·n·Q ≤ 2.5e37 —
    # all under DECIMAL(38,0)'s ~1e38 and HUGEINT's ~1.7e38.
    centsd = F.col("cents").cast("decimal(19,0)")
    rolled = c.select(
        "user_id",
        "event_id",
        "cents",
        F.count("*").over(w).alias("n"),
        F.sum(centsd).over(w).alias("s"),
        F.sum(centsd * centsd).over(w).alias("q"),
    )
    nd = F.col("n").cast("decimal(2,0)")  # frame holds ≤ 10 rows
    dev = nd * F.col("cents").cast("decimal(19,0)") - F.col("s")
    var_n2 = nd * F.col("q") - F.col("s") * F.col("s")
    return rolled.select(
        "user_id",
        "event_id",
        "cents",
        "n",
        ((F.col("n") >= 5) & (dev * dev > 4 * var_n2)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# w09 — sliding exact median (aggregate-as-window Spark lacks natively)
# ---------------------------------------------------------------------------


@query(
    "w09_sliding_median",
    """WITH c AS (SELECT user_id, event_id, ts,
                         CAST(FLOOR(value * 100) AS BIGINT) AS cents
                  FROM events)
       SELECT user_id, event_id,
              median(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
                AS med
       FROM c""",
)
def w09_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding median of each user's last 9 event values. DuckDB
    runs any aggregate as a window function (`median(...) OVER`); Spark
    has no windowed percentile, so the frame is materialized with
    collect_list, sorted, and indexed — semantics identical, including
    the even-count mean-of-middle-two (computed as (a+b)/2.0 from exact
    integer cents, so the double agrees bit-for-bit).

    Scale: collect_list per frame is O(k) state per row with k=9 — fine
    for small frames; for large k the scale form is a two-heap/indexable-
    skiplist in applyInPandasWithState (streaming) or an approximate
    KLL/t-digest sketch column. The window itself is the usual one
    exchange + one sort."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-8, 0)
    )
    frame = F.array_sort(
        F.collect_list(F.floor(F.col("value") * 100).cast("bigint")).over(w)
    )
    n = F.size(frame)
    lo = F.element_at(frame, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(frame, F.floor(n / 2 + 1).cast("int"))
    # collect_list drops NULLs, so an all-NULL frame is EMPTY and the
    # middle index would be 0 (an ANSI error); median of no values is
    # NULL, exactly what DuckDB's median() returns (degenerate sweep, r8).
    return ev.select(
        "user_id",
        "event_id",
        F.when(n > 0, (lo + hi) / 2.0).alias("med"),
    )


# ---------------------------------------------------------------------------
# po01 — period-over-period growth (month revenue + MoM ratio)
# ---------------------------------------------------------------------------


@query(
    "po01_mom_growth",
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                           AS revenue
                  FROM orders GROUP BY 1)
       SELECT CAST(month AS DATE) AS month, revenue,
              (revenue - LAG(revenue) OVER (ORDER BY month))
                / LAG(revenue) OVER (ORDER BY month) AS mom_growth
       FROM m""",
)
def po01_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month growth — the period-over-
    period BI staple. Revenue sums are exact DECIMAL cast to double;
    growth is one IEEE division of those identical doubles, so ratios
    match bit-for-bit; the first month's growth is NULL. (Spark's `trunc`
    returns DATE, matching DuckDB's date_trunc-cast — their raw
    date_trunc types differ.)

    Scale: the aggregation collapses the fact table to one row per month
    BEFORE the window, so the single-partition lag window is a few
    hundred rows at any fact volume — the only safe use of an
    unpartitioned window (see SCALE.md on w-series)."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(F.trunc("o_orderdate", "month").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month", "revenue", ((F.col("revenue") - prev) / prev).alias("mom_growth")
    )


# ---------------------------------------------------------------------------
# w10 — time-interval RANGE frame (rolling 1-hour activity)
# ---------------------------------------------------------------------------

_W10_SQL = """
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""


@query("w10_time_range_frame", _W10_SQL)
def w10_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour activity per user via a time-interval RANGE frame —
    the frame is bounded by the ORDER-BY VALUE (ts minus one hour), not a
    row count, so dense bursts widen it and quiet periods shrink it; w09's
    ROWS frame is the fixed-count sibling. RANGE includes timestamp peers
    by definition, so equal timestamps need no tiebreak for the frame to
    be deterministic (the aggregates are count/sum — order-free).

    Scale: same one-exchange-one-sort profile as every window; the
    two-pointer frame evaluation keeps running aggregates with O(1)
    amortized work per row (eviction as the lower bound advances). This
    is the batch twin of a sliding stream window (st02) evaluated at
    event granularity instead of slide granularity."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_W10_SQL)


@query(
    "w11_running_distinct",
    """WITH flagged AS (
         SELECT event_type, ts, event_id,
                CASE WHEN ROW_NUMBER() OVER (
                       PARTITION BY event_type, user_id
                       ORDER BY ts, event_id) = 1
                     THEN 1 ELSE 0 END AS first_seen
         FROM events)
       SELECT event_type, ts, event_id,
              CAST(SUM(first_seen) OVER (
                     PARTITION BY event_type ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_users
       FROM flagged""",
)
def w11_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT user count per event type — the audience-growth
    curve. Spark (like most engines) has no COUNT(DISTINCT) window, so
    the standard rewrite: flag each user's FIRST occurrence within the
    type (row_number over (type, user) = 1), then a running SUM of flags
    over the (ts, event_id)-totally-ordered stream. Exact, and the flag
    trick is the scalable idiom — windowed distinct-count via sets would
    hold O(users) state per row.

    Scale: two window passes with different partition keys = two
    shuffles ((type, user) then (type)); the second carries one extra
    int per row. Few event types ⇒ hot partitions in pass 2 — the known
    global-running-total hazard; chunked two-level running sums (po01's
    note) are the remedy when a single type outgrows one task."""
    ev = load(spark, sf_dir, "events")
    first_w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    run_w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_type", "ts", "event_id", "user_id")
        .withColumn(
            "first_seen", F.when(F.row_number().over(first_w) == 1, 1).otherwise(0)
        )
        .select(
            "event_type",
            "ts",
            "event_id",
            F.sum("first_seen").over(run_w).cast("long").alias("distinct_users"),
        )
    )


@query(
    "a14_median_abs_deviation",
    """WITH med AS (SELECT l_returnflag, median(l_extendedprice) AS m
                    FROM lineitem GROUP BY l_returnflag)
       SELECT l.l_returnflag, m.m AS med_price,
              median(abs(l.l_extendedprice - m.m)) AS mad,
              COUNT(*) AS n
       FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
       GROUP BY l.l_returnflag, m.m""",
)
def a14_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per group: the median absolute deviation around
    the per-group median price — the outlier-resistant alternative to
    stddev (a11) that a price-anomaly monitor actually wants. Exact
    two-phase: group medians first, then the median of absolute
    deviations; both engines interpolate even-count medians as the mean
    of the two middle values (the w09 convention), so values match
    bit-for-bit.

    Scale: phase 1 collapses to |groups| rows — broadcast back over the
    fact for the deviation pass, so the fact shuffles only for the two
    per-group exact-percentile aggregations. Exact medians sort within
    each group's partition; at extreme group sizes approx_percentile is
    the documented fallback (a03's accuracy-for-scale trade)."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price")
    )
    return (
        li.join(F.broadcast(med), on="l_returnflag")
        .select(
            "l_returnflag",
            "med_price",
            F.abs(F.col("l_extendedprice") - F.col("med_price")).alias("absdev"),
        )
        .groupBy("l_returnflag", "med_price")
        .agg(
            F.expr("percentile(absdev, 0.5)").alias("mad"),
            F.count("*").alias("n"),
        )
    )


@query(
    "w12_pareto_curve",
    """WITH per_user AS (
         SELECT event_type, user_id, COUNT(*) AS n_events
         FROM events GROUP BY event_type, user_id),
       tot AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS total
               FROM per_user GROUP BY event_type),
       ranked AS (
         SELECT event_type, user_id, n_events,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n_events DESC, user_id) AS rank,
                CAST(SUM(n_events) OVER (PARTITION BY event_type
                                         ORDER BY n_events DESC, user_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS cum_events
         FROM per_user)
       SELECT r.event_type, r.rank, r.user_id, r.n_events, r.cum_events,
              CAST(r.cum_events AS DOUBLE) / t.total AS cum_share
       FROM ranked r JOIN tot t ON r.event_type = t.event_type
       WHERE r.rank <= 10""",
)
def w12_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration (Pareto) curve: for each event type, the
    top-10 users by event count with their running share of all events —
    the "does 20% of the audience drive 80% of the traffic" table. The
    running sum is INTEGER arithmetic under a (count DESC, user_id)
    total order — exact at every prefix — and only the reported share
    divides (one IEEE op per row), so ranks, cumulative counts, and
    shares are bit-deterministic.

    Scale: one combine-friendly (type, user) count, then a per-type
    window whose running sum Spark evaluates in a single sorted pass
    (top-10 via WindowGroupLimit keeps the sort bounded); the totals
    join broadcasts (one row per event type)."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n_events"))
    tot = per_user.groupBy("event_type").agg(F.sum("n_events").alias("total"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"), F.asc("user_id"))
    ranked = per_user.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum_events",
        F.sum("n_events").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        ranked.filter(F.col("rank") <= 10)
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "rank",
            "user_id",
            "n_events",
            "cum_events",
            (F.col("cum_events").cast("double") / F.col("total")).alias("cum_share"),
        )
    )
