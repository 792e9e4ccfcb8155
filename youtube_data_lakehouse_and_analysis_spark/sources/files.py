"""File-format source/sink breadth beyond parquet: CSV, JSON-lines, ORC.

The reference's only storage formats are MongoDB documents and MySQL rows
(SURVEY §2.1-2.2); parquet replaces both in this engine. These adapters
cover the interchange formats a lakehouse ingests from and exports to,
with the engine's rules applied uniformly:

  * schemas are EXPLICIT on read (never inferSchema — a schema inference
    pass is a full extra scan at 100 TB, and silently drifts types);
  * timestamps are written/parsed as ISO-8601 UTC;
  * CSV/JSON are treated as ingest/export formats only — analytics run on
    columnar parquet/ORC (row formats can't push down projections, so
    every query would pay a full-row parse).

ORC is the one alternative columnar format Spark ships a vectorized
reader for; `read_orc` is a drop-in for `read_parquet` with the same
pushdown behavior (asserted in tests/test_sources_formats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_CSV_OPTS = {
    "header": "true",
    "timestampFormat": _TS_FMT,
    "escape": '"',
    "nullValue": "\\N",  # distinguish NULL from empty string, mysqldump-style
}
_JSON_OPTS = {"timestampFormat": _TS_FMT}


def write_csv(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """Export to CSV. `coalesce` caps output files for hand-off-sized
    results; leave None for pipeline-scale exports (one file per task)."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Ingest CSV with an explicit schema. Malformed rows fail loudly
    (FAILFAST): a silent PERMISSIVE null-out corrupts aggregates
    downstream where it's far harder to trace."""
    return (
        spark.read.schema(schema).options(**_CSV_OPTS, mode="FAILFAST").csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """Export to JSON-lines (one object per line — the splittable JSON
    layout; a single big JSON array is unsplittable and caps parallelism
    at 1)."""
    df.write.mode("overwrite").options(**_JSON_OPTS).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).options(**_JSON_OPTS, mode="FAILFAST").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Columnar alternative to parquet: vectorized scan, predicate
    pushdown, column pruning all apply (plan-asserted in tests). Schema
    optional — ORC embeds it; passing one pins the contract."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_text(df: DataFrame, path: str) -> None:
    """Write a single string column as newline-delimited text — the raw-
    corpus export format (one document per line; the synthetic corpus has
    no embedded newlines, so no escaping layer is needed here)."""
    df.write.mode("overwrite").text(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Read newline-delimited text as a single `value` string column.
    Line-splitting parallelizes within files (unlike multiline JSON), so
    raw-crawl text shards scan at full width."""
    return spark.read.text(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest opaque files (images/audio/video payloads) as rows of
    (path, modificationTime, length, content) via the binaryFile source —
    the entry point of the multimodal pipeline (multimodal/ takes the
    `content` bytes from here into mapInPandas decoders).

    Scale: one task per file (binary payloads can't split); at 100 TB the
    ingest job's parallelism is the FILE COUNT, so upstream deposits
    should shard large media. `pathGlobFilter` prunes by extension
    without listing-then-filtering; pair with
    `spark.sql.files.maxPartitionBytes` to pack small files per task."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Write rows as XML elements (Spark 4 native XML source) — the
    interchange format legacy feeds and sitemap-style exports still use."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, schema: StructType | None = None, row_tag: str = "row"
) -> DataFrame:
    """Read XML with an explicit rowTag (Spark 4 built-in — no external
    package). Schema optional but recommended: inference re-scans the
    files, and XML carries no types of its own. XML parse is row-wise
    (no columnar pushdown) — ingest-then-convert to parquet is the scale
    posture, same as CSV/JSON."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_evolved_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet batches whose schemas EVOLVED between writes (columns
    added over time — the normal drift of a long-lived bronze feed) as
    one unified DataFrame: mergeSchema unions the per-file footers and
    back-fills missing columns with NULL.

    Scale note: schema merging reads every file footer up front — cheap
    relative to data, but at millions of files it is a driver-side
    listing cost; a production lakehouse records the evolved schema in a
    transaction log (Delta/Iceberg) instead of re-deriving it per read.
    Silver contracts stay pinned: migrate() selects/casts the documented
    columns, so upstream drift cannot leak types downstream."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
