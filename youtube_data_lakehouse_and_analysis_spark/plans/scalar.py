"""Scalar-function queries (f-series): every transform class of the
reference (SURVEY.md §2.8 F1-F9) exercised end-to-end over the synthetic
tables, each with a DuckDB oracle.

Scalar expressions are fully deterministic (same IEEE ops in both engines),
so unlike aggregates no decimal detour is needed — except where noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.transforms import iso8601_duration_seconds
from .queries import query


@query(
    "f01_duration_parse",
    """SELECT l_orderkey, l_linenumber, dur,
              COALESCE(TRY_CAST(regexp_extract(dur, '(\\d+)H', 1) AS BIGINT), 0) * 3600
            + COALESCE(TRY_CAST(regexp_extract(dur, '(\\d+)M', 1) AS BIGINT), 0) * 60
            + COALESCE(TRY_CAST(regexp_extract(dur, '(\\d+)S', 1) AS BIGINT), 0) AS duration_s
       FROM (SELECT l_orderkey, l_linenumber,
                    CASE
                      WHEN l_linenumber % 3 = 0 THEN 'PT' || CAST(l_linenumber AS VARCHAR) || 'H'
                           || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || 'M'
                           || CAST(l_orderkey % 60 AS VARCHAR) || 'S'
                      WHEN l_linenumber % 3 = 1 THEN 'PT'
                           || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || 'M'
                           || CAST(l_orderkey % 60 AS VARCHAR) || 'S'
                      ELSE 'PT' || CAST(l_orderkey % 60 AS VARCHAR) || 'S'
                    END AS dur
             FROM lineitem) t""",
)
def f01_duration_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — the reference's ISO-8601 duration parser (app.py:110-126) over
    durations synthesized with every missing-component shape (PT#H#M#S,
    PT#M#S, PT#S)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long").cast("string")
    sec = (F.col("l_orderkey") % 60).cast("string")
    ln = F.col("l_linenumber").cast("string")
    dur = (
        F.when(F.col("l_linenumber") % 3 == 0, F.concat(F.lit("PT"), ln, F.lit("H"), qty, F.lit("M"), sec, F.lit("S")))
        .when(F.col("l_linenumber") % 3 == 1, F.concat(F.lit("PT"), qty, F.lit("M"), sec, F.lit("S")))
        .otherwise(F.concat(F.lit("PT"), sec, F.lit("S")))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dur.alias("dur"),
        iso8601_duration_seconds(dur).alias("duration_s"),
    )


@query(
    "f02_timestamp_roundtrip",
    """SELECT event_id,
              strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_str,
              strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS ts_parsed,
              year(ts) AS y, month(ts) AS mo, day(ts) AS d,
              hour(ts) AS h, minute(ts) AS mi, CAST(second(ts) AS BIGINT) AS s
       FROM events""",
)
def f02_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3/F4 — strict-format render + parse round-trip (the reference's
    `%Y-%m-%dT%H:%M:%S%z` contract, app.py:335,383, sans zone since the
    synthetic ts is naive-UTC) + field extraction."""
    ev = load(spark, sf_dir, "events")
    ts_str = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    return ev.select(
        "event_id",
        ts_str.alias("ts_str"),
        F.to_timestamp(ts_str, "yyyy-MM-dd'T'HH:mm:ss").alias("ts_parsed"),
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.floor(F.second("ts")).cast("long").alias("s"),
    )


@query(
    "f03_null_handling",
    """SELECT event_id,
              COALESCE(NULLIF(event_type, 'error'), 'n/a') AS etype_clean,
              COALESCE(CASE WHEN value < 1.0 THEN NULL ELSE value END, 0.0) AS value_filled,
              CASE WHEN props IS NULL THEN 1 ELSE 0 END AS props_missing
       FROM events""",
)
def f03_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7/F9 — nullif / coalesce / constant fill (app.py:219-224,
    307-314): the reference's `.get(k, default)` null discipline."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("n/a")).alias("etype_clean"),
        F.coalesce(F.when(F.col("value") < 1.0, None).otherwise(F.col("value")), F.lit(0.0)).alias(
            "value_filled"
        ),
        F.when(F.col("props").isNull(), 1).otherwise(0).alias("props_missing"),
    )


@query(
    "f04_string_funcs",
    """SELECT doc_id,
              upper(lang) AS lang_up,
              substr(text, 1, 12) AS head,
              length(text) AS text_len,
              replace(source, 'src', 'source_') AS source_renamed,
              concat(lang, ':', source) AS lang_source,
              trim(' ' || lang || ' ', ' ') AS lang_trim,
              contains(text, 'spark') AS mentions_spark,
              starts_with(source, 'src1') AS is_src1
       FROM documents""",
)
def f04_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: upper/substr/length/replace/concat/trim/contains."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 12).alias("head"),
        F.length("text").alias("text_len"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source_")).alias("source_renamed"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.col("text").contains("spark").alias("mentions_spark"),
        F.startswith(F.col("source"), F.lit("src1")).alias("is_src1"),
    )


@query(
    "f05_math",
    """SELECT o_orderkey,
              abs(o_totalprice - 100000.0) AS dist_from_100k,
              CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
              CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
              o_orderkey % 7 AS key_mod,
              sqrt(o_totalprice) AS price_sqrt,
              CAST(o_custkey AS DOUBLE) * 2.5 + 1.0 AS linear
       FROM orders""",
)
def f05_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: abs/floor/ceil/mod/sqrt/arithmetic. sqrt is
    IEEE-correctly-rounded, so cross-engine doubles are bit-identical;
    transcendentals (ln/exp) are libm-dependent and excluded from oracle
    checks by design."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_custkey").cast("double") * 2.5 + 1.0).alias("linear"),
    )


@query(
    "f06_case_when",
    """SELECT tier, COUNT(*) AS n FROM (
         SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                     WHEN o_totalprice >= 150000 THEN 'mid'
                     ELSE 'low' END AS tier
         FROM orders) t GROUP BY tier""",
)
def f06_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + count."""
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 150000, "mid")
        .otherwise("low")
    )
    return o.select(tier.alias("tier")).groupBy("tier").agg(F.count("*").alias("n"))


@query(
    "f07_json_extract",
    """SELECT event_id,
              TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json,
              TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_regex
       FROM events""",
)
def f07_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (events.props is a JSON object string): the
    built-in get_json_object path and the regexp fallback both stay
    JVM-side."""
    ev = load(spark, sf_dir, "events")
    # try_cast: a malformed or non-numeric payload value is NULL, not an
    # ANSI cast crash (maxvals layout plants a 64 KB string under $.k, r10)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_json"),
        F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("long").alias("k_regex"),
    )


@query(
    "f08_word_explode",
    """SELECT word, COUNT(*) AS n
       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
       WHERE word <> ''
       GROUP BY word ORDER BY n DESC, word LIMIT 20""",
)
def f08_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode: top-20 global word frequencies over documents.text.

    Scale: explode multiplies rows ~wordcount×; the partial agg right after
    keeps the shuffle at |vocab| not |tokens|."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "f09_date_arith",
    """SELECT l_orderkey, l_linenumber,
              CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
              date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS days_since_95,
              CAST(l_shipdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
              dayofweek(CAST(l_shipdate AS DATE)) AS dow
       FROM lineitem""",
)
def f09_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: truncation, day diff, interval add, day-of-week.

    DuckDB's date_trunc returns DATE and dayofweek is 0-based Sunday;
    Spark's date_trunc returns TIMESTAMP and dayofweek is 1-based Sunday —
    both reconciled explicitly (cast / -1)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        (F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        (F.dayofweek(F.col("l_shipdate").cast("date")) - 1).alias("dow"),
    )


@query(
    "f16_variant_extract",
    """SELECT event_id,
              TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_variant,
              TRY_CAST(json_extract_string(props, '$.nope') AS BIGINT) AS k_missing
       FROM events""",
)
def f16_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VariantType:
    parse_json shreds the props string into the binary variant encoding
    once, then variant_get / try_variant_get navigate it — at scale this
    beats get_json_object (f07), which re-parses the JSON text on every
    path extraction; variant decodes to a typed tree a single time and
    path access is O(depth) over the binary form. try_variant_get returns
    NULL for missing paths (matching json_extract_string → CAST NULL on
    the oracle side).

    Scale: stateless map-side codegen, no shuffle; in a real lakehouse the
    variant column is materialized at ingest so every downstream query
    skips the text parse entirely."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        # try_variant_get on BOTH paths: a present-but-non-numeric value
        # must be NULL like a missing one, not an INVALID_VARIANT_CAST
        # crash (maxvals layout, r10)
        F.try_variant_get(v, "$.k", "bigint").alias("k_variant"),
        F.try_variant_get(v, "$.nope", "bigint").alias("k_missing"),
    )


# ---------------------------------------------------------------------------
# f17 — date arithmetic breadth (calendar functions for warehousing)
# ---------------------------------------------------------------------------


@query(
    "f17_date_breadth",
    """SELECT o_orderkey,
              last_day(o_orderdate) AS month_end,
              CAST(o_orderdate + INTERVAL '3 months' AS DATE) AS plus3m,
              CAST(quarter(o_orderdate) AS INT) AS q,
              CAST(CASE WHEN dayofweek(o_orderdate) = 0 THEN 7
                        ELSE dayofweek(o_orderdate) END AS INT) AS iso_dow
       FROM orders""",
)
def f17_date_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar functions a warehouse leans on daily: month-end,
    month-offset arithmetic, quarter, and day-of-week. DOW numbering is a
    classic cross-engine trap — DuckDB counts Sunday=0, Spark's dayofweek
    Sunday=1 — so both sides normalize to ISO (Mon=1..Sun=7) explicitly;
    never ship an unaligned dow to a consumer.

    Scale: stateless map-side expressions in whole-stage codegen, cost
    invisible next to the scan."""
    orders = load(spark, sf_dir, "orders")
    # Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
    spark_dow = F.dayofweek("o_orderdate")
    iso = F.when(spark_dow == 1, 7).otherwise(spark_dow - 1)
    return orders.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        iso.cast("int").alias("iso_dow"),
    )
