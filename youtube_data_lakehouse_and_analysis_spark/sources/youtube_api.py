"""Ingestion adapters S1-S5 (SURVEY.md §2.1): flatten YouTube-Data-API-v3
shaped JSON into the typed bronze DataFrames — network-free (recorded
responses on disk; quota, keys, and retries are deployment concerns, the
engine's contract starts at the response JSON).

Reference parity (citations into /root/reference/app.py):
  S1 channels.list       → app.py:23-43   (snippet/contentDetails/statistics/status)
  S2 playlists.list      → app.py:46-70   (nextPageToken pagination loop)
  S3 playlistItems.list  → app.py:73-100  (uploads playlist → video ids)
  S4 videos.list         → app.py:102-146 (per-id stats; ISO-8601 duration F1)
  S5 commentThreads.list → app.py:149-191 (top-level comments)

Spark-first shape: the reference's pagination/N+1 loops (C1) disappear —
every recorded page of every channel is read in ONE spark.read.json pass
and flattened declaratively; at 100 TB the same code reads a bucket of
millions of response files with parallelism = input splits.

All flattening is getField/explode + built-ins (F1 duration regex, F2
strict zoned timestamp parse) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.transforms import iso8601_duration_seconds, parse_zoned_timestamp

# Strict response schemas — no inference (SURVEY.md §1.3).

_CHANNELS_RESPONSE = T.StructType(
    [
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField(
                            "snippet",
                            T.StructType(
                                [
                                    T.StructField("title", T.StringType()),
                                    T.StructField("country", T.StringType()),
                                    T.StructField("publishedAt", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "contentDetails",
                            T.StructType(
                                [
                                    T.StructField(
                                        "relatedPlaylists",
                                        T.StructType([T.StructField("uploads", T.StringType())]),
                                    )
                                ]
                            ),
                        ),
                        T.StructField(
                            "statistics",
                            T.StructType(
                                [
                                    T.StructField("viewCount", T.StringType()),
                                    T.StructField("subscriberCount", T.StringType()),
                                    T.StructField("videoCount", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "status",
                            T.StructType([T.StructField("privacyStatus", T.StringType())]),
                        ),
                    ]
                )
            ),
        )
    ]
)

_PLAYLISTS_RESPONSE = T.StructType(
    [
        T.StructField("nextPageToken", T.StringType()),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField(
                            "snippet",
                            T.StructType(
                                [
                                    T.StructField("title", T.StringType()),
                                    T.StructField("channelId", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

_VIDEOS_RESPONSE = T.StructType(
    [
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField(
                            "snippet",
                            T.StructType(
                                [
                                    T.StructField("channelTitle", T.StringType()),
                                    T.StructField("channelId", T.StringType()),
                                    T.StructField("title", T.StringType()),
                                    T.StructField("publishedAt", T.StringType()),
                                    T.StructField("tags", T.ArrayType(T.StringType())),
                                    T.StructField(
                                        "thumbnails",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "default",
                                                    T.StructType(
                                                        [T.StructField("url", T.StringType())]
                                                    ),
                                                )
                                            ]
                                        ),
                                    ),
                                    T.StructField("description", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "contentDetails",
                            T.StructType(
                                [
                                    T.StructField("duration", T.StringType()),
                                    T.StructField("definition", T.StringType()),
                                    T.StructField("caption", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "statistics",
                            T.StructType(
                                [
                                    T.StructField("viewCount", T.StringType()),
                                    T.StructField("likeCount", T.StringType()),
                                    T.StructField("favoriteCount", T.StringType()),
                                    T.StructField("commentCount", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

_COMMENTS_RESPONSE = T.StructType(
    [
        T.StructField("nextPageToken", T.StringType()),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "snippet",
                            T.StructType(
                                [
                                    T.StructField("videoId", T.StringType()),
                                    T.StructField(
                                        "topLevelComment",
                                        T.StructType(
                                            [
                                                T.StructField("id", T.StringType()),
                                                T.StructField(
                                                    "snippet",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "authorDisplayName", T.StringType()
                                                            ),
                                                            T.StructField(
                                                                "textDisplay", T.StringType()
                                                            ),
                                                            T.StructField(
                                                                "publishedAt", T.StringType()
                                                            ),
                                                        ]
                                                    ),
                                                ),
                                            ]
                                        ),
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)


def _items(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read every recorded response page under `path` and explode items —
    pagination (the reference's `while nextPageToken` loop, app.py:50-68)
    collapses into one distributed read."""
    return (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .json(path)
        .select(F.explode("items").alias("item"))
    )


def read_channels(spark: SparkSession, path: str) -> DataFrame:
    """S1 — channel snippet/stats flattening (app.py:31-41)."""
    it = _items(spark, path, _CHANNELS_RESPONSE)
    return it.select(
        F.col("item.snippet.title").alias("channel_name"),
        F.col("item.id").alias("channel_id"),
        F.col("item.contentDetails.relatedPlaylists.uploads").alias("channel_playlist_id"),
        F.col("item.snippet.country").alias("country"),  # nullable (app.py:35)
        F.col("item.statistics.viewCount").cast("long").alias("channel_views"),
        F.col("item.statistics.subscriberCount").cast("long").alias("subscription"),
        F.col("item.statistics.videoCount").cast("long").alias("channel_uploads"),
        parse_zoned_timestamp(F.col("item.snippet.publishedAt")).alias("channel_age"),
        F.col("item.status.privacyStatus").alias("channel_status"),
    )


def read_playlists(spark: SparkSession, path: str) -> DataFrame:
    """S2 — playlists across all recorded pages (app.py:55-63)."""
    it = _items(spark, path, _PLAYLISTS_RESPONSE)
    return it.select(
        F.col("item.snippet.channelId").alias("channel_id"),
        F.col("item.id").alias("playlist_id"),
        F.col("item.snippet.title").alias("playlist_name"),
    )


def read_upload_video_ids(spark: SparkSession, path: str) -> DataFrame:
    """S3 — video ids of the uploads playlist (app.py:86-99); used to
    drive S4 batching in a live deployment."""
    schema = T.StructType(
        [
            T.StructField("nextPageToken", T.StringType()),
            T.StructField(
                "items",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "contentDetails",
                                T.StructType([T.StructField("videoId", T.StringType())]),
                            )
                        ]
                    )
                ),
            ),
        ]
    )
    return _items(spark, path, schema).select(F.col("item.contentDetails.videoId").alias("video_id"))


def read_videos(spark: SparkSession, path: str) -> DataFrame:
    """S4 — video stats + F1 ISO-8601 duration parse (app.py:104-146).
    The reference's N+1 per-video calls become one read of all recorded
    responses."""
    it = _items(spark, path, _VIDEOS_RESPONSE)
    return it.select(
        F.col("item.snippet.channelTitle").alias("channel_name"),
        F.col("item.snippet.channelId").alias("channel_id"),
        F.col("item.id").alias("video_id"),
        F.col("item.snippet.title").alias("video_title"),
        iso8601_duration_seconds(F.col("item.contentDetails.duration")).alias("duration"),
        parse_zoned_timestamp(F.col("item.snippet.publishedAt")).alias("release_date"),
        F.col("item.snippet.tags").alias("tags"),  # nullable list (app.py:135)
        F.col("item.snippet.thumbnails.default.url").alias("thumbnail"),
        F.col("item.contentDetails.definition").alias("video_quality"),
        F.col("item.statistics.viewCount").cast("long").alias("views"),
        F.col("item.statistics.likeCount").cast("long").alias("likes"),  # nullable
        F.col("item.statistics.favoriteCount").cast("long").alias("favorite"),
        F.col("item.statistics.commentCount").cast("long").alias("comment_count"),
        F.col("item.snippet.description").alias("description"),
        F.col("item.contentDetails.caption").alias("caption_status"),
    )


def read_comments(spark: SparkSession, path: str) -> DataFrame:
    """S5 — top-level comment threads (app.py:173-189). The reference only
    fetches the first page per video (a documented truncation bug,
    app.py:159-164); reading every recorded page removes it."""
    it = _items(spark, path, _COMMENTS_RESPONSE)
    tlc = F.col("item.snippet.topLevelComment")
    return it.select(
        F.col("item.snippet.videoId").alias("video_id"),
        tlc.getField("id").alias("comment_id"),
        tlc.getField("snippet").getField("authorDisplayName").alias("author_name"),
        tlc.getField("snippet").getField("textDisplay").alias("comments"),
        parse_zoned_timestamp(tlc.getField("snippet").getField("publishedAt")).alias(
            "commented_date"
        ),
    )
