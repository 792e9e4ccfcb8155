"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, and decode / feature-extraction operators implemented
as Arrow-batched pandas functions over mapInPandas.

Two decode paths behind one iterator interface:

* ``real_decode=True`` runs a REAL in-container decoder for the two
  uncompressed formats a pure-Python/numpy codec can handle exactly —
  BMP (24-bit BI_RGB, the Windows bottom-up padded-row layout) and PPM
  (P6 binary) — dispatched by MAGIC BYTES, with pixel-exact encoders
  alongside for fixtures.  Formats that genuinely need external codecs
  (JPEG/PNG/MP3/H.264 …) still raise NotImplementedError naming the
  integration point (PIL/ffmpeg/librosa, absent from this container).
* the deterministic fake (default) derives features from payload length
  and bytes, keeping every plan testable on arbitrary payloads.

Everything Spark-side — schema, partitioning, batch shape, UDF
signature — is identical between the two paths.

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


# ---------------------------------------------------------------------------
# Real in-container codec: BMP (24-bit BI_RGB) and PPM (P6) — the two
# classic uncompressed formats a dependency-free decoder can handle
# pixel-exactly.  Encoders ship alongside so fixtures can round-trip.
# ---------------------------------------------------------------------------

import struct


def encode_ppm(pixels) -> bytes:
    """P6 binary PPM from an (H, W, 3) uint8 array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_ppm expects (H, W, 3) RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(data: bytes):
    """(H, W, 3) uint8 array from a P6 binary PPM (comments supported)."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments running to end-of-line, then ONE whitespace byte
    # before the raster
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (expected 255)")
    raster = data[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_bmp(pixels) -> bytes:
    """24-bit BI_RGB BMP from an (H, W, 3) uint8 RGB array — the classic
    layout: BGR byte order, rows bottom-up, each padded to 4 bytes."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_len = (w * 3 + 3) & ~3
    pad = row_len - w * 3
    bgr = px[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    pixel_offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + body


def decode_bmp(data: bytes):
    """(H, W, 3) uint8 RGB array from a 24-bit uncompressed (BI_RGB) BMP
    with the standard 40-byte BITMAPINFOHEADER; top-down (negative
    height) variants are handled."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"BMP header size {header_size} unsupported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP variant unsupported (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row_len = (w * 3 + 3) & ~3
    raster = data[pixel_offset : pixel_offset + row_len * h]
    if len(raster) != row_len * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_len)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up storage -> top-down array
    return img.copy()


def _real_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Decode by magic bytes; (width, height, n_frames, mean_byte) where
    mean_byte is the mean over decoded RGB pixel values — the same
    feature contract as the fake path.  Stills decode to n_frames=1;
    compressed formats raise toward the external-codec integration
    point."""
    if payload[:2] == b"BM":
        img = decode_bmp(payload)
    elif payload[:2] == b"P6":
        img = decode_ppm(payload)
    else:
        raise NotImplementedError(
            "real decode for this format requires external codecs "
            "(PIL/ffmpeg/librosa) not present in this environment; only "
            "uncompressed BMP/PPM decode in-container. Wire the library "
            "here and keep the same iterator contract."
        )
    h, w = img.shape[0], img.shape[1]
    return w, h, 1, float(img.mean()) if img.size else 0.0


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow batches).

    real_decode=True decodes actual image bytes (BMP/PPM in-container
    via the pure-numpy codec above, dispatched on magic bytes; other
    formats raise toward the PIL/ffmpeg integration point).  The default
    deterministic fake accepts ANY payload, keeping every plan testable
    without fixture images."""
    decode_one = (lambda p, k: _real_decode(bytes(p))) if real_decode else (
        lambda p, k: _fake_decode(bytes(p), k)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload (failed fetch / missing object) → NULL features,
            # row kept: decode must be total over a dirty media lake
            decoded = [
                decode_one(p, k) if p is not None else (None, None, None, None)
                for p, k in zip(pdf["payload"], pdf["kind"])
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
                if p is None:  # no payload → no hash (NULL groups drop later)
                    hashes.append(None)
                    continue
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
