"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, and decode / feature-extraction operators implemented
as Arrow-batched pandas functions over mapInPandas.

The container has no image/audio libraries, so the actual byte decoding is
STUBBED (`real_decode=True` raises NotImplementedError); the deterministic
fake derives features from payload length and bytes. Everything Spark-side
— schema, partitioning, batch shape, UDF signature — is real and tested.

Scale notes: payloads ride the same parquet row groups as their metadata;
mapInPandas streams Arrow batches so a 100 TB media table never
materializes per-executor; decode cost scales per-byte and is the natural
place for GPU/codec offload behind the same iterator interface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

# (doc_id, payload, kind, n_bytes, content_hash) — the bronze media layout
MEDIA_SCHEMA = "doc_id bigint, payload binary, kind string, n_bytes bigint, content_hash string"

DECODED_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, width int, height int, "
    "n_frames int, mean_byte double"
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from documents: the utf-8 bytes of `text` stand
    in as the opaque payload; kind is assigned round-robin by id."""
    kind = F.element_at(F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col(id_col) % 3 + 1).cast("int"))
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        kind.alias("kind"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real codec: dimensions derived from
    payload length, mean over raw bytes. Pure arithmetic → reproducible in
    the SQL oracle."""
    n = len(payload)
    width = 1 + n % 64
    height = 1 + n % 37
    n_frames = 1 + n % 24 if kind == "video" else 1
    mean_byte = (sum(payload) / n) if n else 0.0
    return width, height, n_frames, mean_byte


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow batches).

    real_decode=True is the integration point for PIL/ffmpeg/librosa —
    unavailable in this container, so it raises; the deterministic fake
    keeps the full distributed plumbing testable."""
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present in "
            "this environment; wire PIL/ffmpeg here and keep the same "
            "iterator contract"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _fake_decode(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(
                decoded, columns=["width", "height", "n_frames", "mean_byte"], index=pdf.index
            )
            yield pd.concat(
                [pdf[["doc_id", "kind", "n_bytes"]], out], axis=1
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize metadata transform (the byte-level resample is part of the
    stubbed codec): scale factors computed relationally."""
    return decoded.withColumn("scale_x", F.lit(target_w) / F.col("width")).withColumn(
        "scale_y", F.lit(target_h) / F.col("height")
    )


def sample_frames(decoded: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per kept frame
    index (explode over the frame range) — the shape a real frame extractor
    would follow, minus the pixel work."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    kept = F.filter(frames, lambda i: i % every_nth == 0)
    return (
        decoded.filter(F.col("kind") == "video")
        .select("doc_id", F.explode(kept).alias("frame_idx"))
    )


def perceptual_hash(media: DataFrame, blocks: int = 16) -> DataFrame:
    """Block-mean perceptual hash over the raw payload (the dHash/aHash
    shape, minus the pixel decode the container lacks): the payload
    splits into `blocks` contiguous byte ranges, and bit j is set when
    block j's mean exceeds the whole-payload mean. The comparison is the
    integer cross-multiply block_sum·n > total_sum·block_len — no
    division, so the hash is bit-identical in the SQL oracle.

    Perceptually-similar payloads (same bytes re-chunked, small local
    edits) agree on most bits; identical payloads hash identically —
    which is what makes groupBy(phash) a blocking key for media dedup.
    A real image pipeline computes the same hash over resized-grayscale
    pixel blocks behind this exact iterator interface.

    Scale: one Arrow-batched pass, integer state per row; the downstream
    groupBy shuffles an 8-byte key — dd01's exact-dedup shape applied to
    media."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                n = int(b.size)
                total = int(b.sum())
                h = 0
                for j in range(blocks):
                    lo, hi = (j * n) // blocks, ((j + 1) * n) // blocks
                    blk_len = hi - lo
                    if blk_len and int(b[lo:hi].sum()) * n > total * blk_len:
                        h |= 1 << j
                hashes.append(h)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": pdf["kind"], "phash": hashes}
            )

    return media.mapInPandas(batches, schema="doc_id bigint, kind string, phash bigint")
