"""Pure-Python baseline JPEG codec (functions/jpeg.py) — round-5 wiring of
the round-4 dead code (VERDICT r4 item 1): encode→decode round-trips over
quality levels and both colour modes, marker/format rejection, and the
dispatch integration in functions/multimodal.decode_image.

The reference engine has no media handling (SURVEY §3); the codec is
implemented from the public ITU-T T.81 spec (Annex K tables).
"""

from __future__ import annotations

import numpy as np
import pytest

from rtcdb_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    make_jpeg,
    synth_pixels,
)


@pytest.mark.parametrize("quality", [50, 75, 85, 90, 95])
@pytest.mark.parametrize("gray", [False, True])
def test_roundtrip_error_bounded(quality, gray):
    """Synthetic per-block-planar images round-trip within a small error
    bound at every quality level; dims/ncomp are exact."""
    for seed in (0, 3, 7):
        w, h = 1 + seed * 5 % 21, 1 + seed * 3 % 13
        payload = make_jpeg(w, h, seed, gray=gray, quality=quality)
        got_w, got_h, ncomp, px = decode_jpeg(payload)
        assert (got_w, got_h) == (w, h)
        assert ncomp == (1 if gray else 3)
        src = synth_pixels(w, h, seed, gray=gray)
        assert px.shape == src.shape
        err = np.abs(px.astype(np.int64) - src.astype(np.int64))
        # quality>=85 is near-lossless on planar blocks; lower quality
        # coarsens the quantizer but stays bounded on this content
        bound = 4 if quality >= 85 else 16
        assert err.max() <= bound, (quality, gray, seed, int(err.max()))


def test_roundtrip_natural_content_color():
    """Non-planar content (pseudo-random pixels — worst case for the DCT)
    still decodes to something close at quality 95: every stage after
    quantization is exact, so the error is bounded by the quantizer step."""
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, size=(24, 17, 3)).astype(np.uint8)
    w, h, nc, back = decode_jpeg(encode_jpeg(px, quality=95))
    assert (w, h, nc) == (17, 24, 3)
    err = np.abs(back.astype(np.int64) - px.astype(np.int64))
    # random noise is the DCT's worst case; q95 luma/chroma steps still
    # bound the per-pixel error well under half the dynamic range
    assert err.mean() < 16 and err.max() < 128


def test_non_multiple_of_8_dims_cropped_exactly():
    for w, h in [(1, 1), (7, 9), (8, 8), (9, 16), (23, 5)]:
        got_w, got_h, _, px = decode_jpeg(make_jpeg(w, h, 5, gray=True))
        assert (got_w, got_h) == (w, h)
        assert px.shape == (h, w)


def test_encode_is_deterministic():
    a = make_jpeg(19, 11, 9, gray=False, quality=90)
    b = make_jpeg(19, 11, 9, gray=False, quality=90)
    assert a == b
    assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"PNG not a jpeg")
    payload = make_jpeg(16, 16, 1)
    with pytest.raises((ValueError, IndexError, Exception)):
        decode_jpeg(payload[: len(payload) // 3])  # truncated mid-markers


def test_rejects_progressive_marker():
    """A SOF2 (progressive) frame header is an honest NotImplementedError,
    not a wrong answer."""
    payload = bytearray(make_jpeg(8, 8, 2, gray=True))
    idx = payload.find(b"\xff\xc0")
    assert idx > 0
    payload[idx + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_decode_image_dispatch_routes_jpeg():
    from rtcdb_spark.functions.multimodal import decode_image

    meta = decode_image(make_jpeg(12, 7, 4, gray=False))
    assert meta["width"] == 12 and meta["height"] == 7 and meta["bpp"] == 24
    meta = decode_image(make_jpeg(5, 5, 4, gray=True))
    assert meta["bpp"] == 8
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01unknown-format")


def test_quality_monotonic_size():
    """Higher quality → finer quantizer → larger entropy-coded payload on
    non-trivial content (sanity that the IJG scaling is wired in)."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    sizes = [len(encode_jpeg(px, quality=q)) for q in (50, 75, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
