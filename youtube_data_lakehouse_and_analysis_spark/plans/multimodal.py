"""Multimodal queries (mm-series): binary-column pipeline over `documents`
standing in for a media table (multimodal/codec.py).

mm02 runs the REAL mapInPandas decode path and is still oracle-checked —
the deterministic fake's arithmetic is reproduced in SQL; mm03's frame
explosion gets the same treatment (oracled since r8)."""

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


@query(
    "mm03_frame_sample",
    f"""WITH media AS (
          SELECT doc_id, {_KIND} AS kind,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents),
        v AS (SELECT doc_id, 1 + n_bytes % 24 AS n_frames
              FROM media WHERE kind = 'video')
        SELECT doc_id, CAST(i AS INT) AS frame_idx
        FROM v, UNNEST(range(0, n_frames)) AS t(i)
        WHERE i % 4 = 0""",
)
def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over decoded video rows (every 4th frame): the
    explode-over-sequence on mapInPandas output.  Oracled since r8 — the
    fake codec's n_frames arithmetic (1 + n_bytes % 24 for video) is
    deterministic, so the frame explosion is SQL-expressible like mm02's
    dimensions.  Since r13 every catalog query has an oracle (a03's HLL
    estimate is checked via its ±5% bound against the exact count)."""
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


@query(
    "mm05_phash_groups",
    """WITH base AS (
         SELECT doc_id, hex(encode(text)) AS hx,
                octet_length(encode(text)) AS n,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END AS kind
         FROM documents),
       bytes AS (
         SELECT doc_id, kind, n,
                list_transform(range(1, n + 1),
                               i -> CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT)) AS bs
         FROM base),
       sums AS (SELECT doc_id, kind, n, bs, list_sum(bs) AS total FROM bytes),
       ph AS (
         SELECT doc_id, kind,
                CAST(list_sum(list_transform(range(0, 16), j ->
                  CASE WHEN ((j + 1) * n) // 16 > (j * n) // 16
                        AND list_sum(list_slice(bs, (j * n) // 16 + 1, ((j + 1) * n) // 16)) * n
                            > total * (((j + 1) * n) // 16 - (j * n) // 16)
                       THEN 1 << j ELSE 0 END)) AS BIGINT) AS phash
         FROM sums)
       SELECT phash, COUNT(*) AS n_items, COUNT(DISTINCT kind) AS n_kinds,
              MIN(doc_id) AS canonical_doc_id
       FROM ph GROUP BY phash""",
)
def mm05_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup blocking by block-mean perceptual hash
    (multimodal/codec.py::perceptual_hash): 16-bit signature per payload,
    grouped into candidate buckets with a canonical (min-id) member —
    dd01's exact-dedup shape applied to binary media, and the media-side
    sibling of the LSH/SimHash blocking families. The byte-level hash is
    integer-exact (cross-multiplied block-mean comparisons), and the
    DuckDB oracle works on hex(encode(text)) — the PAYLOAD BYTES, not
    character code points — so parity survives a non-ASCII testdata
    vintage (the mm01/mm02 octet_length convention).

    Scale: one Arrow-batched decode pass, an 8-byte-key shuffle; at
    100 TB the Hamming-ball widening (pair buckets within distance d via
    bit-flip probes) reuses sim10's multi-probe shape."""
    docs = load(spark, sf_dir, "documents")
    from ..multimodal.codec import perceptual_hash

    hashed = perceptual_hash(attach_payload(docs))
    return hashed.groupBy("phash").agg(
        F.count("*").alias("n_items"),
        F.count_distinct("kind").alias("n_kinds"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


_PACK_CTX = 256  # context-window token budget

# Token cost per media item from the decoded metadata: image = 8x8-pixel
# patches, audio = one token per 128 payload bytes, video = per-frame
# 16x16 patches. All integer ceilings.
_COST_SQL = f"""CASE kind
           WHEN 'image' THEN (width * height + 63) // 64
           WHEN 'audio' THEN (n_bytes + 127) // 128
           ELSE n_frames * ((width * height + 255) // 256) END"""


@query(
    "mm06_modality_packing",
    f"""WITH media AS (
          SELECT doc_id, source, {_KIND} AS kind,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents),
        dec AS (
          SELECT doc_id, source, kind, n_bytes,
                 CAST(1 + n_bytes % 64 AS BIGINT) AS width,
                 CAST(1 + n_bytes % 37 AS BIGINT) AS height,
                 CAST(CASE WHEN kind = 'video' THEN 1 + n_bytes % 24 ELSE 1 END AS BIGINT) AS n_frames
          FROM media),
        cost AS (SELECT doc_id, source, kind, {_COST_SQL} AS n_tok FROM dec),
        placed AS (
          SELECT source, kind, n_tok,
                 CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - n_tok)
                   // {_PACK_CTX} AS BIGINT) AS pack_id
          FROM cost)
        SELECT source, pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
               CAST(SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
               CAST(SUM(CASE WHEN kind = 'video' THEN 1 ELSE 0 END) AS BIGINT) AS n_video,
               CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
        FROM placed GROUP BY source, pack_id""",
)
def mm06_modality_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-aware sequence packing: every media item gets a token
    cost from its decoded metadata (image → 8×8 patches, audio → 1 token
    per 128 bytes, video → per-frame 16×16 patches — the accounting a
    multimodal trainer does before batching), then items are packed
    GREEDILY in doc_id order into 256-token context windows per source
    (assignment by running-sum start position — the concatenate-and-
    slice discipline; the straddling item's tokens stay with its start
    pack, so pack_tokens > 256 reads as spill). Complements ta13, which
    only *prices* padding waste: this produces the actual pack layout
    with per-modality composition.

    Scale: the running sum is a window PARTITIONED by source (each
    source packs independently — exactly how shard-local packing runs on
    a cluster, no global order), costs are map-side integer arithmetic
    from metadata (no payload decode needed), and the rollup is a
    combine-friendly groupBy of |sources|×|packs| rows."""
    media = attach_payload(load(spark, sf_dir, "documents"))
    dec = decode_media(media).join(
        load(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id"
    )
    cost = dec.select(
        "doc_id",
        "source",
        "kind",
        F.expr(
            f"""CASE kind
               WHEN 'image' THEN (width * CAST(height AS BIGINT) + 63) div 64
               WHEN 'audio' THEN (n_bytes + 127) div 128
               ELSE n_frames * ((width * CAST(height AS BIGINT) + 255) div 256) END"""
        ).alias("n_tok"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = cost.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "pack_id", F.expr(f"(cum - n_tok) div {_PACK_CTX}")
    )
    return placed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_items"),
        F.sum((F.col("kind") == "image").cast("long")).alias("n_images"),
        F.sum((F.col("kind") == "audio").cast("long")).alias("n_audio"),
        F.sum((F.col("kind") == "video").cast("long")).alias("n_video"),
        F.sum("n_tok").alias("pack_tokens"),
    )
