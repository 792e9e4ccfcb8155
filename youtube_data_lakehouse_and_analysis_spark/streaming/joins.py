"""Stream-stream interval join (Structured Streaming) — clicks enriched
with the same user's recent purchases.

One definition, two execution modes (the windows.py pattern): on batch
DataFrames it's a plain equi+range join (the DuckDB-oracle form); on
streaming DataFrames Spark requires BOTH watermarks plus the time-bound
join condition, which let each side's state store evict rows older than
the bound — state stays O(rate × window), not O(stream length).

Scale notes: the join shuffles both streams on user_id once; the range
condition prunes within the co-partitioned state. Skewed hot users are
the same hazard as any keyed stream — salt upstream if one key dominates
a state-store partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_with_recent_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "2 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join each click to purchases of the same user with
    purchase.ts in (click.ts - lookback, click.ts]. Column contract:
    clicks(event_id, user_id, ts), purchases(user_id, ts, value)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (p["purchase_ts"] > c["click_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (p["purchase_ts"] <= c["click_ts"])
    )
    return c.join(p, cond).select(
        "click_id", "user_id", "click_ts", "purchase_ts", "purchase_value"
    )


def enrich_with_nation(events: DataFrame, nation: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each event picks up the nation row
    keyed by user_id % 25 (the synthetic user→nation mapping). On a
    streaming `events` this is Spark's stream-static join — the static
    side is planned as a broadcast against every micro-batch, needs no
    watermark, and keeps NO state (the stream side never waits). The
    explicit broadcast hint matches the 100 TB posture: the dim is
    bounded (25 rows here; a real user dim would be a side-input table
    refreshed per batch), the stream is not."""
    n = nation.select(
        F.col("n_nationkey").cast("long").alias("nk"), F.col("n_name")
    )
    return events.join(F.broadcast(n), events["user_id"] % 25 == F.col("nk")).select(
        "event_id", "user_id", "event_type", "n_name"
    )
