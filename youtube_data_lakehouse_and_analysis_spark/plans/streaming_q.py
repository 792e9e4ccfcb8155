"""Streaming-semantics queries (st-series): the same window transforms the
streaming slice uses (streaming/windows.py), run in batch mode against
`events` and oracle-checked — tumbling via time_bucket, sliding via
explicit window enumeration, sessions via the SQL islands pattern.

(Spark's 5-minute windows are epoch-aligned; DuckDB's time_bucket origin
2000-01-01 is also midnight-aligned, so sub-day buckets agree.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..streaming.windows import session_windows, sliding_counts, tumbling_counts
from .queries import query


@query(
    "st01_tumbling_counts",
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
              time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
              event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS value_sum
       FROM events GROUP BY 1, 2, 3""",
)
def st01_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows — the core streaming aggregate, batch-run."""
    return tumbling_counts(load(spark, sf_dir, "events"))


@query(
    "st02_sliding_counts",
    """SELECT time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute' AS window_start,
              event_type, COUNT(*) AS n
       FROM events CROSS JOIN (SELECT unnest(range(5)) AS k) offsets
       GROUP BY 1, 2""",
)
def st02_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (5 min / 1 min): every event contributes to the 5
    slide-aligned windows that contain it — the oracle enumerates them."""
    return sliding_counts(load(spark, sf_dir, "events"))


@query(
    "st03_session_windows",
    """WITH flagged AS (
         SELECT user_id, ts,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL '10 minutes'
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS new_session
         FROM events),
       numbered AS (
         SELECT user_id, ts,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged)
       SELECT MIN(ts) AS session_start,
              MAX(ts) + INTERVAL '10 minutes' AS session_end,
              user_id, COUNT(*) AS n_events
       FROM numbered GROUP BY user_id, session_id""",
)
def st03_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user — Spark's session_window
    vs the classic SQL gaps-and-islands formulation."""
    return session_windows(load(spark, sf_dir, "events"))


@query(
    "evj01_interval_join",
    """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
              p.ts AS purchase_ts, p.value AS purchase_value
       FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
       JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id
        AND p.ts > c.ts - INTERVAL 2 HOUR AND p.ts <= c.ts""",
)
def evj01_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (equi + time-range) join, batch twin of the stream-stream
    join (streaming/joins.py::clicks_with_recent_purchases — the SAME
    function; on streams it adds watermarks and bounded state)."""
    from pyspark.sql import functions as F

    from ..streaming.joins import clicks_with_recent_purchases

    ev = load(spark, sf_dir, "events")
    return clicks_with_recent_purchases(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@query(
    "st04_stream_dedup",
    """SELECT DISTINCT event_id, ts, user_id, event_type, value, props
       FROM (SELECT * FROM events UNION ALL SELECT * FROM events) u""",
)
def st04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup, batch twin: a doubled event feed (every row
    delivered twice — the at-least-once redelivery case) collapsed by
    dropDuplicates on (event_id, ts), the same transform dedup_stream
    applies on a stream (streaming/windows.py:80), where the ts column
    in the key lets the watermark purge state.

    KEY ASSUMPTION: (event_id, ts) is a unique key of events — the
    oracle is DISTINCT over all six columns, so the gate only holds
    while no two events share the key with different payloads (with
    collisions, dropDuplicates keeps an arbitrary survivor).  A canary
    in tests/test_catalog_layout.py asserts uniqueness so a testdata
    vintage that breaks it fails loudly there, not here.

    Scale: one shuffle on the (event_id, ts) key; with the watermark the
    streaming state store holds only the in-horizon keys — bounded by
    rate x watermark, not stream length."""
    from ..streaming.windows import dedup_stream

    ev = load(spark, sf_dir, "events")
    return dedup_stream(ev.unionByName(ev))


@query(
    "st05_stream_static_enrich",
    """SELECT event_id, user_id, event_type, n_name
       FROM events JOIN nation ON user_id % 25 = n_nationkey""",
)
def st05_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, batch twin: events joined to the bounded
    nation dim on user_id % 25 (streaming/joins.py::enrich_with_nation —
    the SAME function; on a stream the static side broadcasts into every
    micro-batch with zero join state)."""
    from ..streaming.joins import enrich_with_nation

    return enrich_with_nation(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "nation")
    )
