"""Explicit StructTypes for the domain warehouse — the reference keeps its
schemas only as dict keys and INSERT column lists (SURVEY.md §1.3); here
they are declared once, enforced everywhere.

Warehouse entities (reference citations):
  channel  — /root/reference/app.py:32-41 (extract) / 300-315 (load)
  playlist — app.py:60-63 / 354-365
  video    — app.py:128-144 / 322-346
  comment  — app.py:184-189 / 372-386

Type decisions (SURVEY.md §1.4): counters are LongType (100 TB ⇒ never
32-bit), zoned timestamps are TimestampType pinned UTC, duration is seconds
as LongType, tags is nullable ArrayType(String) (bronze-only — dropped at
the warehouse, app.py:322-344, like channel_age at app.py:300-315).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- bronze (extract-shaped: everything the API yields, nulls preserved)

CHANNEL_BRONZE = T.StructType(
    [
        T.StructField("channel_name", T.StringType(), False),
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("channel_playlist_id", T.StringType(), True),
        T.StructField("country", T.StringType(), True),  # .get — app.py:35
        T.StructField("channel_views", T.LongType(), True),
        T.StructField("subscription", T.LongType(), True),
        T.StructField("channel_uploads", T.LongType(), True),
        T.StructField("channel_age", T.TimestampType(), True),  # bronze-only
        T.StructField("channel_status", T.StringType(), True),
    ]
)

PLAYLIST_BRONZE = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("playlist_id", T.StringType(), False),
        T.StructField("playlist_name", T.StringType(), True),
    ]
)

VIDEO_BRONZE = T.StructType(
    [
        T.StructField("channel_name", T.StringType(), True),
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("video_id", T.StringType(), False),
        T.StructField("video_title", T.StringType(), True),
        T.StructField("duration", T.LongType(), True),  # seconds (F1 parse)
        T.StructField("release_date", T.TimestampType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),  # bronze-only
        T.StructField("thumbnail", T.StringType(), True),
        T.StructField("video_quality", T.StringType(), True),
        T.StructField("views", T.LongType(), True),
        T.StructField("likes", T.LongType(), True),  # nullable at extract
        T.StructField("favorite", T.LongType(), True),
        T.StructField("comment_count", T.LongType(), True),  # nullable
        T.StructField("description", T.StringType(), True),
        T.StructField("caption_status", T.StringType(), True),
    ]
)

COMMENT_BRONZE = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("comment_id", T.StringType(), False),
        T.StructField("author_name", T.StringType(), True),
        T.StructField("comments", T.StringType(), True),
        T.StructField("commented_date", T.TimestampType(), True),
    ]
)

# ---- silver (warehouse-shaped: migrate-path columns + defaults,
#      app.py:300-386 — channel_age and tags dropped, numeric nulls → 0)

CHANNEL_SILVER = T.StructType(
    [f for f in CHANNEL_BRONZE.fields if f.name != "channel_age"]
)

PLAYLIST_SILVER = PLAYLIST_BRONZE

VIDEO_SILVER = T.StructType([f for f in VIDEO_BRONZE.fields if f.name != "tags"])

COMMENT_SILVER = COMMENT_BRONZE

ENTITIES = ("channel", "playlist", "video", "comment")

BRONZE = {
    "channel": CHANNEL_BRONZE,
    "playlist": PLAYLIST_BRONZE,
    "video": VIDEO_BRONZE,
    "comment": COMMENT_BRONZE,
}

SILVER = {
    "channel": CHANNEL_SILVER,
    "playlist": PLAYLIST_SILVER,
    "video": VIDEO_SILVER,
    "comment": COMMENT_SILVER,
}
