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


def test_rejects_arithmetic_marker():
    """A SOF9 (arithmetic-coded) frame header is an honest
    NotImplementedError, not a wrong answer. (SOF2 progressive is
    SUPPORTED as of round 5 — see TestProgressive.)"""
    payload = bytearray(make_jpeg(8, 8, 2, gray=True))
    idx = payload.find(b"\xff\xc0")
    assert idx > 0
    payload[idx + 1] = 0xC9  # SOF0 -> SOF9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


class TestProgressive:
    """Progressive JPEG (T.81 Annex G): the progressive serializer shares
    the baseline path's quantized coefficients, so its decode must equal
    the baseline decode BIT-EXACTLY — pinning the whole DC/AC first +
    refinement scan machinery, EOB handling, and successive-approximation
    reassembly."""

    def test_progressive_equals_baseline_decode(self):
        from rtcdb_spark.functions.jpeg import encode_jpeg_progressive

        rng = np.random.RandomState(7)
        for trial in range(12):
            gray = trial % 2 == 1
            w, h = 1 + int(rng.randint(33)), 1 + int(rng.randint(33))
            q = [50, 75, 90, 95][trial % 4]
            shape = (h, w) if gray else (h, w, 3)
            px = rng.randint(0, 256, size=shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(px, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(px, quality=q))
            assert base[0:3] == prog[0:3]
            assert np.array_equal(base[3], prog[3]), (trial, shape, q)

    def test_progressive_uses_sof2_and_multiple_scans(self):
        from rtcdb_spark.functions.jpeg import encode_jpeg_progressive

        p = encode_jpeg_progressive(synth_pixels(16, 16, 3), quality=90)
        assert b"\xff\xc2" in p and b"\xff\xc0" not in p
        assert p.count(b"\xff\xda") == 8  # DC first + 3 AC first + DC ref + 3 AC ref

    def test_decoder_handles_eob_runs(self):
        """EOBn (n>0) symbols need custom Huffman tables our encoder does
        not emit — craft two streams by hand, one coding 4 empty-tail
        blocks as a single EOB4, one as 4x EOB0, and assert identical
        decodes."""
        import struct

        from rtcdb_spark.functions.jpeg import (
            _BitWriter,
            _build_codes,
            _DC_LUMA_BITS,
            _DC_LUMA_VALS,
        )

        # flat 9-bit AC table: symbols 0x00..0xFE present, code == symbol
        # (DHT BITS entries are bytes, so one length holds at most 255)
        flat_bits = [0] * 8 + [255] + [0] * 7
        flat_vals = list(range(255))
        flat = _build_codes(flat_bits, flat_vals)
        assert flat[0x20] == (0x20, 9)
        dc_codes = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)

        def craft(use_eobrun: bool) -> bytes:
            out = bytearray(b"\xff\xd8")
            out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
            out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 32, 1)
            out += struct.pack("BBB", 1, 0x11, 0)
            out += b"\xff\xc4" + struct.pack(">HB", 19 + 12, 0x00)
            out += bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
            out += b"\xff\xc4" + struct.pack(">HB", 19 + 255, 0x10)
            out += bytes(flat_bits) + bytes(flat_vals)
            # scan 1: DC first, Al=1 — four zero diffs
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x01])
            bw = _BitWriter()
            for _ in range(4):
                code, length = dc_codes[0]
                bw.write(code, length)
            bw.flush()
            out += bw.buf
            # scan 2: AC first, band 1..63, Al=1
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x01])
            bw = _BitWriter()
            bw.write(0x02, 9)  # (run 0, ssss 2) at k=1
            bw.write(0b10, 2)  # value +2
            if use_eobrun:
                bw.write(0x20, 9)  # EOB4: r=2 ...
                bw.write(0, 2)  # ... extra bits 0 -> run of 4 blocks
            else:
                for _ in range(4):  # block 0 tail + blocks 1..3
                    bw.write(0x00, 9)
            bw.flush()
            out += bw.buf
            out += b"\xff\xd9"
            return bytes(out)

        a = craft(use_eobrun=True)
        b = craft(use_eobrun=False)
        assert a != b
        wa, ha, na, pa = decode_jpeg(a)
        wb, hb, nb, pb = decode_jpeg(b)
        assert (wa, ha, na) == (32, 8, 1) == (wb, hb, nb)
        assert np.array_equal(pa, pb)
        # the single AC coefficient (2 << Al=1) actually landed: the image
        # is not flat
        assert pa.min() != pa.max()


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
