"""Multimodal queries (mm-series): binary-column pipeline over `documents`
standing in for a media table (multimodal/codec.py).

mm02 runs the REAL mapInPandas decode path and is still oracle-checked —
the deterministic fake's arithmetic is reproduced in SQL. mm03 exposes the
payload bytes themselves (rows-only: engines agree, but binary hashing is
driver-dependent, so it is asserted in tests instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..multimodal.codec import attach_payload, decode_media, sample_frames
from .queries import query

_KIND = "(['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1]"


@query(
    "mm01_binary_meta",
    f"""SELECT doc_id, {_KIND} AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_hash
        FROM documents""",
)
def mm01_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-table construction: opaque payload + typed metadata columns."""
    media = attach_payload(load(spark, sf_dir, "documents"))
    return media.select("doc_id", "kind", "n_bytes", "content_hash")


@query(
    "mm02_decode_features",
    f"""WITH media AS (
          SELECT doc_id, {_KIND} AS kind,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents)
        SELECT doc_id, kind, n_bytes,
               CAST(1 + n_bytes % 64 AS INT) AS width,
               CAST(1 + n_bytes % 37 AS INT) AS height,
               CAST(CASE WHEN kind = 'video' THEN 1 + n_bytes % 24 ELSE 1 END AS INT) AS n_frames
        FROM media""",
)
def mm02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path end-to-end (Arrow batches through a
    pandas stub codec), oracle-checked on the deterministic dimensions."""
    media = attach_payload(load(spark, sf_dir, "documents"))
    return decode_media(media).select("doc_id", "kind", "n_bytes", "width", "height", "n_frames")


@query("mm03_frame_sample")  # rows-only: exercises explode-over-sequence on UDF output
def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over decoded video rows (every 4th frame)."""
    media = attach_payload(load(spark, sf_dir, "documents"))
    return sample_frames(decode_media(media), every_nth=4)


@query(
    "mm04_modality_budget",
    f"""WITH media AS (
          SELECT doc_id, {_KIND} AS kind,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents)
        SELECT kind, COUNT(*) AS n_items,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(SUM(CASE WHEN kind = 'video' THEN 1 + n_bytes % 24 ELSE 1 END)
                    AS BIGINT) AS total_frames
        FROM media GROUP BY kind""",
)
def mm04_modality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality budget: items / bytes / frames per media kind, aggregated
    DOWNSTREAM of the Arrow-batched decode — the storage-and-compute
    planning number for a multimodal training run (how many GPU-decode
    hours of video, how many image items), and the proof that mapInPandas
    output composes with exact JVM aggregation (UDF → groupBy stays
    oracle-checkable; the stub codec's deterministic dims make it exact).

    Scale: the decode is the expensive map stage; the rollup adds one
    combine-friendly K-row shuffle on kind — free relative to decode."""
    media = attach_payload(load(spark, sf_dir, "documents"))
    return (
        decode_media(media)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_frames").alias("total_frames"),
        )
    )
