"""The reference's 10 analytics queries in their ORIGINAL domain shapes
(app.py:443-591) over the silver warehouse tables — SQL-observed semantics,
not the selectbox English (SURVEY.md §2.13 footnotes: Q1 selects only
channel_name; Q6 selects only likes; Q7 reads the channel-level counter).

Each takes the four silver DataFrames and returns the reference's result
shape. The synthetic-table retargets in plans/queries.py carry the oracle
burden; these carry domain parity (exercised in tests/test_domain.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Tables = dict[str, DataFrame]


def q1_channel_names(t: Tables) -> DataFrame:
    """app.py:443-448 — SELECT channel_name FROM channel WHERE ... IS NOT NULL."""
    return t["channel"].filter(F.col("channel_name").isNotNull()).select("channel_name")


def q2_channels_most_videos(t: Tables) -> DataFrame:
    """app.py:460-466 — channel_uploads (the API's pre-aggregated counter),
    sorted desc."""
    return t["channel"].select("channel_name", "channel_uploads").orderBy(F.desc("channel_uploads"))


def q3_top10_viewed(t: Tables) -> DataFrame:
    """app.py:480-488 — top-10 videos by views."""
    return (
        t["video"]
        .select("channel_name", "video_title", "views")
        .orderBy(F.desc("views"))
        .limit(10)
    )


def q4_comments_per_video(t: Tables) -> DataFrame:
    """app.py:505-507 — comment_count (pre-aggregated), sorted desc."""
    return t["video"].select("video_title", "comment_count").orderBy(F.desc("comment_count"))


def q5_most_liked_per_channel(t: Tables, use_window: bool = True) -> DataFrame:
    """app.py:517-526 — highest-liked video per channel, ALL ties kept.

    use_window=True is the idiomatic Spark form (rank() == 1, one shuffle);
    False reproduces the reference's agg + self-join literally."""
    v = t["video"]
    if use_window:
        w = Window.partitionBy("channel_id").orderBy(F.desc("likes"))
        out = (
            v.withColumn("rk", F.rank().over(w))
            .filter(F.col("rk") == 1)
            .select("channel_name", "video_title", "likes")
        )
    else:
        m = (
            v.groupBy("channel_id")
            .agg(F.max("likes").alias("max_likes"))
            .withColumnRenamed("channel_id", "m_channel_id")
        )
        out = (
            v.join(m, (v["channel_id"] == m["m_channel_id"]) & (v["likes"] == m["max_likes"]))
            .select("channel_name", "video_title", "likes")
        )
    return out.orderBy(F.desc("likes"))


def q6_likes_per_video(t: Tables) -> DataFrame:
    """app.py:536-539 — top-10 by likes (prompt says 'and dislikes'; the
    SQL selects only likes — observed semantics)."""
    return t["video"].select("video_title", "likes").orderBy(F.desc("likes")).limit(10)


def q7_views_per_channel(t: Tables) -> DataFrame:
    """app.py:549-551 — channel_views counter (NOT a sum over videos)."""
    return t["channel"].select("channel_name", "channel_views").orderBy(F.desc("channel_views"))


def q8_channels_published_2022(t: Tables) -> DataFrame:
    """app.py:562-564 — DISTINCT channels with a 2022 release."""
    return (
        t["video"].filter(F.year("release_date") == 2022).select("channel_name").distinct()
    )


def q9_avg_duration_per_channel(t: Tables) -> DataFrame:
    """app.py:575-578 — AVG(duration) AS avg_time per channel, sorted."""
    return (
        t["video"]
        .groupBy("channel_name")
        .agg(F.avg("duration").alias("avg_time"))
        .orderBy(F.desc("avg_time"))
    )


def q10_top10_commented(t: Tables) -> DataFrame:
    """app.py:588-591 — top-10 by comment_count."""
    return (
        t["video"].select("video_title", "comment_count").orderBy(F.desc("comment_count")).limit(10)
    )


ALL = {
    "q1": q1_channel_names,
    "q2": q2_channels_most_videos,
    "q3": q3_top10_viewed,
    "q4": q4_comments_per_video,
    "q5": q5_most_liked_per_channel,
    "q6": q6_likes_per_video,
    "q7": q7_views_per_channel,
    "q8": q8_channels_published_2022,
    "q9": q9_avg_duration_per_channel,
    "q10": q10_top10_commented,
}
