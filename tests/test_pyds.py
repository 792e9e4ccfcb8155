"""Custom Python DataSource (youtube_pages): the recorded response corpus
as a partitioned first-class scan — enumeration/pagination at the source,
schema semantics downstream via from_json (the existing flatteners)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_data_lakehouse_and_analysis_spark.sources import youtube_api as yt
from youtube_data_lakehouse_and_analysis_spark.sources.pyds import YouTubeResponsePages

FIX = "/root/repo/tests/fixtures/youtube"


def _pages(spark, **options):
    spark.dataSource.register(YouTubeResponsePages)
    r = spark.read.format("youtube_pages").option("path", FIX)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_one_row_per_item_pagination_dissolved(spark):
    raw = _pages(spark)
    per_ep = {r["endpoint"]: r["n"] for r in raw.groupBy("endpoint").agg(F.count("*").alias("n")).collect()}
    # channels: 2 files x 1 item; playlists: 2 pages collapsing to 2 items;
    # comments: 3 items across 3 files (one video paginated)
    assert per_ep["channels"] == 2
    assert per_ep["playlists"] == 2
    assert per_ep["comments"] == 3
    # one partition per response file
    assert raw.rdd.getNumPartitions() == raw.select("endpoint", "page_file").distinct().count()


def test_endpoint_option_narrows(spark):
    only = _pages(spark, endpoint="channels")
    assert {r["endpoint"] for r in only.select("endpoint").distinct().collect()} == {"channels"}


def test_items_parse_to_the_flattened_schema(spark):
    """from_json over the source's item strings must agree with the
    established reader on the flattened values."""
    item_schema = "struct<id:string, snippet:struct<title:string,country:string>>"
    got = {
        (r["cid"], r["name"])
        for r in _pages(spark, endpoint="channels")
        .select(F.from_json("item", item_schema).alias("it"))
        .select(F.col("it.id").alias("cid"), F.col("it.snippet.title").alias("name"))
        .collect()
    }
    want = {
        (r["channel_id"], r["channel_name"])
        for r in yt.read_channels(spark, f"{FIX}/channels").collect()
    }
    assert got == want and len(got) == 2
