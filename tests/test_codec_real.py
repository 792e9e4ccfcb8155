"""Real in-container decode path (r7 verdict ask #4): pure-numpy BMP/PPM
codec, pixel-exact both directions, and the Spark mapInPandas pipeline
running a REAL decode end-to-end — ``real_decode=True`` no longer raises
for formats the container can handle without external libraries.
"""

from __future__ import annotations

import numpy as np
import pytest

from youtube_data_lakehouse_and_analysis_spark.multimodal.codec import (
    _real_decode,
    decode_bmp,
    decode_media,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


def _gradient(h: int, w: int) -> np.ndarray:
    """Deterministic test image: distinct value per (row, col, channel)."""
    idx = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3)
    return ((idx * 37 + 11) % 256).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (7, 4), (16, 16), (5, 3)])
def test_ppm_roundtrip_pixel_exact(h, w):
    img = _gradient(h, w)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (7, 4), (16, 16), (5, 3)])
def test_bmp_roundtrip_pixel_exact(h, w):
    """Widths 5/4/16/3/1 exercise every row-padding residue (w*3 mod 4)."""
    img = _gradient(h, w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_comments_and_whitespace():
    img = _gradient(2, 2)
    raw = encode_ppm(img)
    body = raw[raw.index(b"255\n") + 4 :]
    commented = b"P6\n# a comment\n2 2\n# another\n255\n" + body
    assert np.array_equal(decode_ppm(commented), img)


def test_bmp_topdown_variant():
    """Negative height = top-down row order; decoder must not flip."""
    img = _gradient(4, 3)
    raw = bytearray(encode_bmp(img))
    import struct

    h = struct.unpack_from("<i", raw, 22)[0]
    struct.pack_into("<i", raw, 22, -h)
    # stored rows are bottom-up; reinterpreting them as top-down yields
    # the vertically flipped image
    assert np.array_equal(decode_bmp(bytes(raw)), img[::-1])


def test_real_decode_features_exact():
    img = _gradient(6, 9)
    for payload in (encode_bmp(img), encode_ppm(img)):
        w, h, nf, mean = _real_decode(payload)
        assert (w, h, nf) == (9, 6, 1)
        assert mean == float(img.mean())  # exact: integer sum / count


def test_real_decode_unsupported_raises():
    with pytest.raises(NotImplementedError):
        _real_decode(b"\x89PNG\r\n\x1a\nrest")


def test_decode_media_real_end_to_end(spark):
    """The full Spark path: binary payload column → mapInPandas decode
    with real_decode=True → exact per-image features, NULL payload kept
    as a NULL-feature row."""
    imgs = {1: _gradient(3, 5), 2: _gradient(8, 2), 3: _gradient(4, 4)}
    rows = [
        (1, bytearray(encode_bmp(imgs[1])), "image", None, None),
        (2, bytearray(encode_ppm(imgs[2])), "image", None, None),
        (3, bytearray(encode_bmp(imgs[3])), "image", None, None),
        (4, None, "image", None, None),
    ]
    media = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, kind string, n_bytes bigint, content_hash string"
    )
    got = {r["doc_id"]: r for r in decode_media(media, real_decode=True).collect()}
    assert (got[1]["width"], got[1]["height"]) == (5, 3)
    assert (got[2]["width"], got[2]["height"]) == (2, 8)
    assert (got[3]["width"], got[3]["height"]) == (4, 4)
    for i, img in imgs.items():
        assert got[i]["mean_byte"] == float(img.mean())
        assert got[i]["n_frames"] == 1
    assert got[4]["width"] is None and got[4]["mean_byte"] is None


# ---------------------------------------------------------------------------
# Property-based roundtrips: ANY (H, W) shape and pixel content must
# survive encode→decode bit-exactly, including every BMP padding residue
# and PPM dimension-token width.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    h = draw(st.integers(min_value=1, max_value=24))
    w = draw(st.integers(min_value=1, max_value=24))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=60, deadline=None)
@given(img=_images())
def test_property_bmp_roundtrip(img):
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=60, deadline=None)
@given(img=_images())
def test_property_ppm_roundtrip(img):
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=40, deadline=None)
@given(img=_images())
def test_property_real_decode_feature_contract(img):
    """Both containers of the same pixels yield identical features."""
    fb = _real_decode(encode_bmp(img))
    fp = _real_decode(encode_ppm(img))
    assert fb == fp == (img.shape[1], img.shape[0], 1, float(img.mean()))
