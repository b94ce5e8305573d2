"""Lossless JPEG (functions/jpeg_lossless.py): predictor arithmetic is
pinned BY HAND from the Annex-H formulas, and roundtrips must be
bit-EXACT over random 16-bit data for every predictor — the property the
mode exists to provide, and one no encoder/decoder boundary-rule
disagreement can survive."""

from __future__ import annotations

import numpy as np
import pytest

from rtcdb_spark.functions.jpeg_lossless import (
    _predict,
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)


class TestPredictorsByHand:
    def test_all_seven_formulas_on_a_pinned_grid(self):
        # decoded-so-far grid (row 1, col 1 is being predicted):
        #   10  40
        #   22   ?      Ra=22, Rb=40, Rc=10
        px = [[10, 40], [22, 0]]
        a, b, c = 22, 40, 10
        assert _predict(px, 1, 1, 1, 8, 0) == a
        assert _predict(px, 1, 1, 2, 8, 0) == b
        assert _predict(px, 1, 1, 3, 8, 0) == c
        assert _predict(px, 1, 1, 4, 8, 0) == a + b - c  # 52
        assert _predict(px, 1, 1, 5, 8, 0) == a + ((b - c) >> 1)  # 22+15=37
        assert _predict(px, 1, 1, 6, 8, 0) == b + ((a - c) >> 1)  # 40+6=46
        assert _predict(px, 1, 1, 7, 8, 0) == (a + b) >> 1  # 31

    def test_boundary_rules(self):
        px = [[7, 9], [5, 0]]
        # image start: 1 << (P - Pt - 1)
        assert _predict(px, 0, 0, 4, 8, 0) == 128
        assert _predict(px, 0, 0, 4, 16, 0) == 32768
        assert _predict(px, 0, 0, 4, 8, 2) == 32  # point transform shifts
        # rest of first line: Ra regardless of predictor
        assert _predict(px, 0, 1, 4, 8, 0) == 7
        # first column of later lines: Rb
        assert _predict(px, 1, 0, 4, 8, 0) == 7

    def test_negative_halves_truncate_like_the_spec(self):
        # (b - c) >> 1 must be an arithmetic shift (floor), not C-style
        # truncation toward zero: b=10, c=13 -> (10-13)>>1 == -2
        px = [[13, 10], [20, 0]]
        assert _predict(px, 1, 1, 5, 8, 0) == 20 + ((10 - 13) >> 1) == 18

    def test_restart_reenters_scan_start_state(self):
        # H.1.2.2: a restart interval beginning at (rrow, rcol) behaves
        # exactly like the start of the scan — default prediction for its
        # first sample, Ra for the REST of that sample line (whatever the
        # selected predictor), Rb at the start of later lines, selected
        # predictor elsewhere. Values pinned by hand from the spec text.
        px = [[3, 5, 8], [11, 13, 17], [19, 23, 29]]
        # interval starts mid-image at (1, 1), selected predictor = 2 (Rb)
        assert _predict(px, 1, 1, 2, 8, 0, rrow=1, rcol=1) == 128
        # (1, 2) is on the interval's first line -> Ra = 13, NOT Rb = 8
        assert _predict(px, 1, 2, 2, 8, 0, rrow=1, rcol=1) == 13
        # (2, 0) is a later line's start -> Rb = 11
        assert _predict(px, 2, 0, 2, 8, 0, rrow=1, rcol=1) == 11
        # (2, 1) is interior -> the selected predictor resumes (Rb = 13)
        assert _predict(px, 2, 1, 2, 8, 0, rrow=1, rcol=1) == 13
        # and with predictor 7: (a + b) >> 1 = (19 + 13) >> 1 = 16
        assert _predict(px, 2, 1, 7, 8, 0, rrow=1, rcol=1) == 16


class TestRoundtrip:
    @pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
    def test_exact_roundtrip_random_16bit(self, predictor):
        rng = np.random.default_rng(predictor)
        px = rng.integers(0, 1 << 16, (13, 17), dtype=np.uint16)
        data = encode_jpeg_lossless(px.astype(np.int64), predictor=predictor)
        assert data[2:4] == b"\xff\xc3"
        w, h, nc, back = decode_jpeg_lossless(data)
        assert (w, h, nc) == (17, 13, 1)
        assert np.array_equal(back, px.astype(np.int64)), predictor

    def test_exact_roundtrip_8bit_color(self):
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
        w, h, nc, back = decode_jpeg_lossless(
            encode_jpeg_lossless(px, predictor=4)
        )
        assert (w, h, nc) == (7, 9, 3)
        assert np.array_equal(back, px.astype(np.int64))

    def test_point_transform(self):
        # Pt=2: the decoder reconstructs sample & ~0b11 (<< after >>)
        px = (np.arange(48, dtype=np.int64).reshape(6, 8) * 5) % 256
        w, h, nc, back = decode_jpeg_lossless(
            encode_jpeg_lossless(px, predictor=1, point_transform=2)
        )
        assert np.array_equal(back, (px >> 2) << 2)

    def test_restart_intervals(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 1 << 16, (11, 9), dtype=np.uint16)
        data = encode_jpeg_lossless(
            px.astype(np.int64), predictor=6, restart_interval=7
        )
        assert data.count(b"\xff\xd0") >= 1
        w, h, nc, back = decode_jpeg_lossless(data)
        assert np.array_equal(back, px.astype(np.int64))

    def test_worst_case_differences(self):
        # alternating extremes force the SSSS=16 / 32768-difference path
        px = np.zeros((4, 6), dtype=np.int64)
        px[:, 1::2] = 0x8000
        for pred in (1, 2, 7):
            w, h, nc, back = decode_jpeg_lossless(
                encode_jpeg_lossless(px, predictor=pred)
            )
            assert np.array_equal(back, px), pred

    def test_rejects_lossy_frames(self):
        from rtcdb_spark.functions.jpeg import make_jpeg

        with pytest.raises(ValueError, match="not a lossless"):
            decode_jpeg_lossless(make_jpeg(8, 8, 1, gray=True))


class TestRoundtripProperties:
    def test_random_dims_predictors_precisions(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            st.integers(min_value=1, max_value=24),
            st.integers(min_value=1, max_value=24),
            st.integers(min_value=1, max_value=7),
            st.sampled_from([8, 16]),
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=13),
            st.integers(min_value=0, max_value=2**32 - 1),
        )
        def _prop(w, h, pred, bits, pt, dri, seed):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 1 << bits, (h, w)).astype(np.int64)
            data = encode_jpeg_lossless(
                px, predictor=pred, point_transform=pt, restart_interval=dri
            )
            dw, dh, nc, back = decode_jpeg_lossless(data)
            assert (dw, dh, nc) == (w, h, 1)
            assert np.array_equal(back, (px >> pt) << pt)

        _prop()
