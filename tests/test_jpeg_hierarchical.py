"""Hierarchical JPEG (functions/jpeg_hierarchical.py): the J.1.1.2
expansion filter is pinned BY HAND from the spec formula, the marker
structure (DHP / EXP / SOF0+SOF5 sequence) is asserted byte-level, and
the reconstruction error of the full closed-loop pyramid is gated at
every level — libjpeg never implemented Annex J, so the spec text is
the arbiter."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rtcdb_spark.functions.jpeg_hierarchical import (
    decode_jpeg_hierarchical,
    encode_jpeg_hierarchical,
    expand_ref,
)


def _markers(data: bytes) -> list[int]:
    """Top-level marker sequence (skips entropy data by honoring segment
    lengths; entropy-coded bytes never contain FF D8..DF unstuffed)."""
    out, pos = [], 0
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m in (0x00, 0xFF) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        out.append(m)
        if m in (0xD8, 0xD9):
            pos += 2
        else:
            pos += 2 + struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            if m == 0xDA:  # skip entropy data to the next marker
                while pos < len(data) - 1 and not (
                    data[pos] == 0xFF
                    and data[pos + 1] not in (0x00,)
                    and not (0xD0 <= data[pos + 1] <= 0xD7)
                ):
                    pos += 1
    return out


class TestExpandFilterByHand:
    def test_j112_both_directions(self):
        # J.1.1.2: even samples copy, odd = (a + b + 1) >> 1, edge
        # replicates. Hand-computed for a 2x2 input:
        p = [[10, 20], [30, 40]]
        e = expand_ref(p, 1, 1, 4, 4)
        assert e.tolist() == [
            [10, 15, 20, 20],
            [20, 25, 30, 30],
            [30, 35, 40, 40],
            [30, 35, 40, 40],
        ]

    def test_horizontal_only_and_trim(self):
        p = [[1, 4, 9]]
        e = expand_ref(p, 1, 0, 5, 1)  # trim 6 -> 5 (odd target)
        # full: [1, (1+4+1)>>1=3, 4, (4+9+1)>>1=7, 9, 9] -> first 5
        assert e.tolist() == [[1, 3, 4, 7, 9]]

    def test_vertical_only(self):
        p = [[5], [11]]
        e = expand_ref(p, 0, 1, 1, 4)
        assert e.tolist() == [[5], [8], [11], [11]]

    def test_rounding_is_plus_one_shift(self):
        # (a + b + 1) >> 1, NOT truncation: (10 + 13 + 1) >> 1 == 12
        e = expand_ref([[10, 13]], 1, 0, 4, 1)
        assert e.tolist() == [[10, 12, 13, 13]]


class TestStructure:
    def test_marker_sequence(self):
        px = np.full((32, 32), 128, dtype=np.uint8)
        data = encode_jpeg_hierarchical(px, levels=3, quality=90)
        ms = _markers(data)
        # SOI, APP0, DQT, DHT x2, DHP, SOF0, SOS, (EXP, SOF5, SOS) x2, EOI
        assert ms[0] == 0xD8 and ms[-1] == 0xD9
        assert ms.count(0xDE) == 1  # one DHP
        assert ms.count(0xC0) == 1  # one non-differential frame
        assert ms.count(0xC5) == 2  # two differential frames
        assert ms.count(0xDF) == 2  # one EXP before each
        # DHP carries the FULL dims
        i = data.index(b"\xff\xde")
        p, h, w = data[i + 4], *struct.unpack(">HH", data[i + 5 : i + 9])
        assert (p, h, w) == (8, 32, 32)
        # the first SOF0 is the coarsest level (32 / 2^2 = 8)
        j = data.index(b"\xff\xc0")
        h0, w0 = struct.unpack(">HH", data[j + 5 : j + 9])
        assert (h0, w0) == (8, 8)

    def test_exp_payload(self):
        px = np.full((16, 16), 77, dtype=np.uint8)
        data = encode_jpeg_hierarchical(px, levels=2)
        i = data.index(b"\xff\xdf")
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        assert seglen == 3 and data[i + 4] == 0x11  # expand both dims


class TestRoundtrip:
    @pytest.mark.parametrize("levels", [1, 2, 3, 4])
    def test_smooth_gray_close(self, levels):
        yy, xx = np.mgrid[0:48, 0:40]
        px = (
            128 + 80 * np.sin(yy / 9) + 60 * np.cos(xx / 11)
        ).clip(0, 255).astype(np.uint8)
        data = encode_jpeg_hierarchical(px, levels=levels, quality=92)
        w, h, nc, back = decode_jpeg_hierarchical(data)
        assert (w, h, nc) == (40, 48, 1)
        err = np.abs(back.astype(int) - px.astype(int)).max()
        assert err <= 12, (levels, err)

    def test_odd_dims(self):
        yy, xx = np.mgrid[0:23, 0:17]
        px = ((yy * 11 + xx * 7) % 251).astype(np.uint8)
        data = encode_jpeg_hierarchical(px, levels=3, quality=95)
        w, h, nc, back = decode_jpeg_hierarchical(data)
        assert (w, h) == (17, 23)
        assert back.shape == (23, 17)

    def test_color(self):
        yy, xx = np.mgrid[0:24, 0:20]
        px = (
            np.stack([yy * 5, xx * 6, (yy + xx) * 3], axis=-1) % 200 + 20
        ).astype(np.uint8)
        data = encode_jpeg_hierarchical(px, levels=2, quality=92)
        w, h, nc, back = decode_jpeg_hierarchical(data)
        assert (w, h, nc) == (20, 24, 3)
        err = np.abs(back.astype(int) - px.astype(int)).max()
        assert err <= 20, err  # YCbCr roundtrip + 2 lossy stages

    def test_flat_image_exact(self):
        # a constant plane survives DCT quantization exactly at any depth
        px = np.full((32, 24), 200, dtype=np.uint8)
        for levels in (1, 2, 3):
            w, h, nc, back = decode_jpeg_hierarchical(
                encode_jpeg_hierarchical(px, levels=levels, quality=90)
            )
            assert np.array_equal(back, px), levels

    def test_refinement_improves_over_base(self):
        # decoding only the base frame (truncated pyramid) must be worse
        # than the full pyramid: refinement actually carries information
        rng = np.random.default_rng(7)
        yy, xx = np.mgrid[0:64, 0:64]
        px = (
            128 + 70 * np.sin(yy / 5) * np.cos(xx / 6)
            + rng.normal(0, 6, (64, 64))
        ).clip(0, 255).astype(np.uint8)
        full = encode_jpeg_hierarchical(px, levels=3, quality=90)
        w, h, nc, back = decode_jpeg_hierarchical(full)
        full_mse = float(((back.astype(float) - px.astype(float)) ** 2).mean())
        base = encode_jpeg_hierarchical(px[::4, ::4], levels=1, quality=90)
        wb, hb, _, backb = decode_jpeg_hierarchical(base)
        up = expand_ref(expand_ref(backb, 1, 1, 32, 32), 1, 1, 64, 64)
        base_mse = float(((up.astype(float) - px.astype(float)) ** 2).mean())
        assert full_mse < base_mse / 2, (full_mse, base_mse)


class TestGates:
    def test_plain_decoder_rejects_hierarchical(self):
        from rtcdb_spark.functions.jpeg import decode_jpeg

        px = np.full((16, 16), 90, dtype=np.uint8)
        data = encode_jpeg_hierarchical(px, levels=2)
        with pytest.raises(NotImplementedError, match="hierarchical"):
            decode_jpeg(data)

    def test_hierarchical_decoder_needs_dhp(self):
        from rtcdb_spark.functions.jpeg import make_jpeg

        with pytest.raises(ValueError, match="DHP"):
            decode_jpeg_hierarchical(make_jpeg(8, 8, 1, gray=True))

    def test_differential_without_reference_rejected(self):
        px = np.full((16, 16), 90, dtype=np.uint8)
        data = bytearray(encode_jpeg_hierarchical(px, levels=2))
        # excise the SOF0 frame: DHP ... [SOF0 .. first SOS entropy] EXP
        i0 = bytes(data).index(b"\xff\xc0")
        i1 = bytes(data).index(b"\xff\xdf")
        del data[i0:i1]
        with pytest.raises(ValueError, match="reference"):
            decode_jpeg_hierarchical(bytes(data))
