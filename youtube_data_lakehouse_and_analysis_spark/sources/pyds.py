"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) over
the recorded YouTube API response pages — the ingest edge as a
first-class `spark.read.format(...)` source instead of ad-hoc file
globbing:

    spark.dataSource.register(YouTubeResponsePages)
    raw = (spark.read.format("youtube_pages")
                .option("path", fixtures_root)        # dir of endpoint dirs
                .load())
    # raw: endpoint STRING, page_file STRING, item STRING (one JSON item
    # per row — pagination dissolved at the source)

Layering: this source owns file ENUMERATION, PAGINATION-dissolving, and
PARALLELISM (one InputPartition per response file, so a crawl of 10k
pages scans 10k-wide); the existing youtube_api flatteners own the
schema semantics, applied downstream with from_json. That split keeps
Python-side work at the cold ingest edge — every query-side operator
stays JVM/codegen.

The reference walks these responses with a per-page Python loop
(/root/reference/app.py:55-78); here each page is a partition of a
declarative scan, so the same recorded corpus ingests at cluster width.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

PAGES_SCHEMA = StructType(
    [
        StructField("endpoint", StringType(), False),
        StructField("page_file", StringType(), False),
        StructField("item", StringType(), False),
    ]
)


class _PageFile(InputPartition):
    def __init__(self, endpoint: str, path: str):
        self.endpoint = endpoint
        self.path = path


class _PagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("youtube_pages: option 'path' (fixtures root) is required")
        self.endpoint = options.get("endpoint")  # optional narrowing

    def partitions(self) -> list[InputPartition]:
        """One partition per recorded response file: a 10k-page crawl
        plans a 10k-task scan — parallelism falls out of the layout, the
        same property parquet splits give the query side."""
        parts: list[InputPartition] = []
        for endpoint in sorted(os.listdir(self.root)):
            if self.endpoint and endpoint != self.endpoint:
                continue
            epdir = os.path.join(self.root, endpoint)
            if not os.path.isdir(epdir):
                continue
            parts.extend(
                _PageFile(endpoint, os.path.join(epdir, f))
                for f in sorted(os.listdir(epdir))
                if f.endswith(".json")
            )
        if not parts:
            raise ValueError(f"youtube_pages: no response files under {self.root!r}")
        return parts

    def read(self, partition: _PageFile) -> Iterator[tuple]:
        with open(partition.path) as fh:
            page = json.load(fh)
        for item in page.get("items", []):
            yield (
                partition.endpoint,
                os.path.basename(partition.path),
                json.dumps(item, separators=(",", ":")),
            )


class YouTubeResponsePages(DataSource):
    """`youtube_pages` — recorded API responses as a partitioned scan."""

    @classmethod
    def name(cls) -> str:
        return "youtube_pages"

    def schema(self) -> StructType:
        return PAGES_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PagesReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SimpleDataSourceStreamReader":
        return _PagesStreamReader(self.options)


class _PagesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same corpus: each batch picks up
    response files that appeared since the last committed offset.

    Offset format: ``{"ep": {endpoint: {"hw": last_basename, "n": count}}}``
    — a per-endpoint high-watermark filename plus the number of files at
    or below it.  New files must sort lexicographically AFTER the
    watermark ("append-only" alone is not enough: a positional count
    over a re-sorted listing would silently re-deliver old pages and
    skip the new one if a late file's name sorted early).  The ``n``
    field makes that contract enforceable: read() recounts files at or
    below the watermark and raises if a file was inserted beneath it.
    Replayable: readBetweenOffsets re-derives a batch purely from the
    two watermarks over the immutable page directory — the property
    exactly-once sinks need."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("youtube_pages: option 'path' is required")
        self.endpoint = options.get("endpoint")

    def _files(self) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        for endpoint in sorted(os.listdir(self.root)):
            if self.endpoint and endpoint != self.endpoint:
                continue
            epdir = os.path.join(self.root, endpoint)
            if not os.path.isdir(epdir):
                continue
            out.extend(
                (endpoint, os.path.join(epdir, f))
                for f in sorted(os.listdir(epdir))
                if f.endswith(".json")
            )
        return out

    def initialOffset(self) -> dict:
        return {"ep": {}}

    @staticmethod
    def _by_endpoint(files: list[tuple[str, str]]) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for endpoint, path in files:
            out.setdefault(endpoint, []).append(path)
        return out

    def read(self, start: dict):
        grouped = self._by_endpoint(self._files())
        start_ep = start.get("ep", {})
        batch: list[tuple[str, str]] = []
        end_ep: dict[str, dict] = {}
        for endpoint, paths in grouped.items():
            st = start_ep.get(endpoint, {"hw": "", "n": 0})
            below = [p for p in paths if os.path.basename(p) <= st["hw"]]
            if len(below) != st["n"]:
                raise RuntimeError(
                    f"youtube_pages stream: endpoint {endpoint!r} has "
                    f"{len(below)} files at or below watermark {st['hw']!r} "
                    f"but {st['n']} were consumed — page filenames must be "
                    "lexicographically increasing (append-only is not enough)"
                )
            new = [p for p in paths if os.path.basename(p) > st["hw"]]
            batch.extend((endpoint, p) for p in new)
            hw = os.path.basename(new[-1]) if new else st["hw"]
            end_ep[endpoint] = {"hw": hw, "n": st["n"] + len(new)}
        # endpoints that vanished from the listing keep their watermark
        for endpoint, st in start_ep.items():
            end_ep.setdefault(endpoint, st)
        return iter(self._rows(batch)), {"ep": end_ep}

    def readBetweenOffsets(self, start: dict, end: dict):
        grouped = self._by_endpoint(self._files())
        start_ep = start.get("ep", {})
        batch: list[tuple[str, str]] = []
        for endpoint, st_end in end.get("ep", {}).items():
            lo = start_ep.get(endpoint, {"hw": ""})["hw"]
            hi = st_end["hw"]
            batch.extend(
                (endpoint, p)
                for p in grouped.get(endpoint, [])
                if lo < os.path.basename(p) <= hi
            )
        return iter(self._rows(batch))

    @staticmethod
    def _rows(files: list[tuple[str, str]]) -> list[tuple]:
        # Materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator between micro-batches, and
        # generators are neither copyable nor picklable. Batches are
        # new-files-only, so the list is delta-sized.
        rows: list[tuple] = []
        for endpoint, path in files:
            with open(path) as fh:
                page = json.load(fh)
            rows.extend(
                (endpoint, os.path.basename(path), json.dumps(item, separators=(",", ":")))
                for item in page.get("items", [])
            )
        return rows
