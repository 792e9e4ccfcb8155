"""Structured Streaming slice (SURVEY.md §2.10 — an extension; the
reference is purely batch): tumbling / sliding / session windows with
watermarks, and streaming dedup, over the `events` schema.

Every transformation is defined once and works on BOTH a batch DataFrame
and a readStream DataFrame (the Structured Streaming model: one API, two
execution modes). Batch mode powers the DuckDB oracle checks; stream mode
is exercised in tests via the file source → memory sink with
processAllAvailable().

Scale notes: watermark + windowed agg is incremental state in the state
store — state size is |open windows × keys|, bounded by the watermark
horizon; session windows merge state per key; dropDuplicates state is
bounded by the watermark when a ts column is included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def tumbling_counts(events: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling windows: count + exact-decimal value sum per (window,
    event_type). Late rows beyond the watermark are dropped in stream
    mode; batch mode sees all rows (same code path)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # DECIMAL(24,6): 18 integer digits — the (18,6) form crashed on
            # 16-digit magnitude extremes (maxvals layout, r10); twin matches
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_counts(events: DataFrame, width: str = "5 minutes", slide: str = "1 minute") -> DataFrame:
    """Sliding windows (width 5, slide 1): each event lands in 5 windows."""
    src = events.withWatermark("ts", "10 minutes") if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events closer than `gap` merge; session
    end = last event + gap (Spark session_window semantics)."""
    src = events.withWatermark("ts", "10 minutes") if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event_id: with the ts column included, state is
    purged past the watermark (bounded memory at 100 TB/day rates)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates(["event_id", "ts"])


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup on event_id ALONE via dropDuplicatesWithinWatermark
    (Spark 3.5+): redeliveries whose timestamps DIFFER (producer retries
    re-stamping the event — the case dedup_stream's exact-(event_id, ts)
    key structurally misses) still collapse, while state is evicted once
    the watermark passes an event's ts.  This is the at-least-once
    ingestion contract most event buses actually need: dedup key =
    business id, watermark = the redelivery horizon.

    Scale: state holds one entry per distinct event_id seen within the
    watermark horizon — bounded by arrival rate × horizon, independent of
    total stream length.  Batch twin: plain dropDuplicates on event_id
    (batch has no watermark; the whole input is the horizon)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. The testdata has shipped
    ts in two vintages (INT64 TIMESTAMP(NANOS); plain TIMESTAMP micros), and
    a file-source stream needs its schema up front — so sniff the parquet
    footer and build the matching schema, mirroring catalog.load's
    normalization to a TimestampType ts either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_arrow = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    # Type predicates, not string equality: pyarrow prints tz-annotated
    # nanos as "timestamp[ns, tz=UTC]", which a string match would miss.
    legacy_nanos = (
        pa.types.is_timestamp(ts_arrow) and ts_arrow.unit == "ns"
    ) or pa.types.is_int64(ts_arrow)
    if legacy_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENTS_SCHEMA.fields
            ]
        )
    else:
        schema = EVENTS_SCHEMA
    stream = (
        spark.readStream.schema(schema)
        # the file source needs a directory; glob down to the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if legacy_nanos:
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion synchronously (test harness):
    memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
