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


def test_stream_picks_up_new_pages(spark, tmp_path):
    """readStream over the custom source: batch 1 sees the initial pages,
    a page landing afterwards arrives in a later micro-batch."""
    import json
    import os
    import shutil
    import time

    root = str(tmp_path / "feed")
    os.makedirs(f"{root}/channels")
    shutil.copy(f"{FIX}/channels/ch_A.json", f"{root}/channels/ch_A.json")

    spark.dataSource.register(YouTubeResponsePages)
    stream = spark.readStream.format("youtube_pages").option("path", root).load()
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("pages_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    def settle(want_rows: int, deadline_sec: float = 120.0) -> list:
        # processAllAvailable() drains what the source HAS ANNOUNCED, but
        # under machine load (e.g. a co-running local[32] JVM) the
        # trigger thread may not have polled latestOffset for the newest
        # file yet when it returns — so await the expected row count
        # with a bounded retry instead of asserting after one drain
        # (r13 verdict item 5: one-shot form flaked under contention,
        # passed isolated).  No-load case settles on the first pass.
        deadline = time.monotonic() + deadline_sec
        while True:
            q.processAllAvailable()
            rows = spark.sql("SELECT endpoint, page_file FROM pages_out").collect()
            if len(rows) >= want_rows or time.monotonic() > deadline:
                return rows
            time.sleep(0.5)

    try:
        rows1 = settle(1)
        assert len(rows1) == 1  # ch_A has one item

        with open(f"{root}/channels/ch_Z.json", "w") as fh:
            json.dump({"items": [{"id": "UC_Z1"}, {"id": "UC_Z2"}]}, fh)
        rows = settle(3)
        assert len(rows) == 3  # 1 + the 2 new items, no re-delivery of ch_A
        assert {r["page_file"] for r in rows} == {"ch_A.json", "ch_Z.json"}
    finally:
        q.stop()


def test_stream_offsets_are_watermark_not_positional(tmp_path):
    """Drive the reader directly: a new file whose name sorts BEFORE the
    already-consumed one must be detected and refused (positional-count
    offsets would silently re-deliver old pages and skip the new file —
    'append-only' does not imply lexicographically increasing names)."""
    import json
    import os

    import pytest

    from youtube_data_lakehouse_and_analysis_spark.sources.pyds import (
        _PagesStreamReader,
    )

    root = str(tmp_path / "feed")
    os.makedirs(f"{root}/channels")
    with open(f"{root}/channels/ch_M.json", "w") as fh:
        json.dump({"items": [{"id": "UC_M"}]}, fh)

    reader = _PagesStreamReader({"path": root})
    rows1, off1 = reader.read(reader.initialOffset())
    assert len(list(rows1)) == 1
    assert off1["ep"]["channels"] == {"hw": "ch_M.json", "n": 1}

    # a monotonically-later file is picked up cleanly
    with open(f"{root}/channels/ch_Z.json", "w") as fh:
        json.dump({"items": [{"id": "UC_Z"}]}, fh)
    rows2, off2 = reader.read(off1)
    assert len(list(rows2)) == 1
    assert off2["ep"]["channels"] == {"hw": "ch_Z.json", "n": 2}

    # replay between offsets re-derives exactly the second batch
    replay = list(reader.readBetweenOffsets(off1, off2))
    assert [r[1] for r in replay] == ["ch_Z.json"]

    # a file sorting BELOW the watermark is a contract violation → loud
    with open(f"{root}/channels/ch_A.json", "w") as fh:
        json.dump({"items": [{"id": "UC_A"}]}, fh)
    with pytest.raises(RuntimeError, match="lexicographically increasing"):
        reader.read(off2)
