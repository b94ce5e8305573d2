"""Full-spec-surface PNG decode (round 5): grayscale at depths 1/2/4/8/16,
gray+alpha, 16-bit truecolor, paletted (PLTE + tRNS) at depths 1/2/4/8, and
Adam7 interlacing — every layout round-tripped bit-exact through
`make_png_ext` (filter-0 layout encoder) and `decode_png`. Filter-type
variety is covered separately by the `make_png` rotating-filter tests.
PNG spec (W3C/ISO 15948) is public; the reference engine has no media
handling (SURVEY §3)."""

from __future__ import annotations

import numpy as np
import pytest

from rtcdb_spark.functions.multimodal import decode_png, make_png, make_png_ext


def _roundtrip(px, expect=None, **kw):
    payload = make_png_ext(px, **kw)
    meta, back = decode_png(payload)
    target = px if expect is None else expect
    back = back.reshape(np.asarray(target).shape)
    assert np.array_equal(back.astype(np.int64), np.asarray(target, dtype=np.int64))
    return meta


@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
def test_gray_depths(depth):
    rng = np.random.RandomState(depth)
    px = rng.randint(0, (1 << depth), size=(11, 7))
    meta = _roundtrip(px, color_type=0, depth=depth)
    assert meta["bpp"] == depth


@pytest.mark.parametrize("depth", [8, 16])
def test_gray_alpha(depth):
    rng = np.random.RandomState(depth)
    px = rng.randint(0, (1 << depth), size=(5, 9, 2))
    meta = _roundtrip(px, color_type=4, depth=depth)
    assert meta["bpp"] == 2 * depth


@pytest.mark.parametrize("color_type,channels", [(2, 3), (6, 4)])
def test_truecolor_16bit(color_type, channels):
    rng = np.random.RandomState(channels)
    px = rng.randint(0, 65536, size=(6, 5, channels))
    meta = _roundtrip(px, color_type=color_type, depth=16)
    assert meta["bpp"] == 16 * channels


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_depths(depth):
    rng = np.random.RandomState(depth + 20)
    n = min(1 << depth, 16)
    pal = rng.randint(0, 256, size=(n, 3))
    idx = rng.randint(0, n, size=(9, 13))
    meta = _roundtrip(idx, expect=pal[idx], color_type=3, depth=depth, palette=pal)
    assert meta["bpp"] == 24  # expanded RGB


def test_palette_trns_expands_to_rgba():
    rng = np.random.RandomState(42)
    pal = rng.randint(0, 256, size=(8, 3))
    trns = [200, 10, 255, 0]  # entries beyond -> opaque 255
    alpha = np.array([200, 10, 255, 0, 255, 255, 255, 255])
    idx = rng.randint(0, 8, size=(6, 6))
    expect = np.concatenate([pal[idx], alpha[idx][:, :, None]], axis=2)
    meta = _roundtrip(
        idx, expect=expect, color_type=3, depth=4, palette=pal, trns=trns
    )
    assert meta["bpp"] == 32


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((13, 17, 3), dict(color_type=2, depth=8)),
        ((10, 10), dict(color_type=0, depth=1)),
        ((8, 9, 4), dict(color_type=6, depth=16)),
        ((1, 1), dict(color_type=0, depth=8)),
        ((16, 3, 2), dict(color_type=4, depth=8)),
    ],
)
def test_adam7_interlace(shape, kw):
    rng = np.random.RandomState(sum(shape))
    mx = 1 << kw["depth"]
    px = rng.randint(0, mx, size=shape)
    _roundtrip(px, interlace=True, **kw)


def test_adam7_palette():
    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, size=(8, 3))
    idx = rng.randint(0, 8, size=(9, 11))
    _roundtrip(
        idx, expect=pal[idx], color_type=3, depth=4, palette=pal, interlace=True
    )


def test_rotating_filter_encoder_still_roundtrips():
    for ch in (3, 4):
        meta, px = decode_png(make_png(10, 4, 7, channels=ch))
        assert meta["bpp"] == 8 * ch and px.shape == (4, 10, ch)


def test_malformed_rejection():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all....")
    # corrupt a CRC
    p = bytearray(make_png(6, 6, 1))
    p[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError):
        decode_png(bytes(p))
    # palette file without PLTE
    rng = np.random.RandomState(0)
    good = make_png_ext(
        rng.randint(0, 4, size=(4, 4)), color_type=3, depth=2,
        palette=rng.randint(0, 256, size=(4, 3)),
    )
    stripped = bytearray()
    pos = 8
    stripped += good[:8]
    import struct as st
    import zlib as zl

    while pos + 8 <= len(good):
        (clen,) = st.unpack_from(">I", good, pos)
        ctype = good[pos + 4 : pos + 8]
        if ctype != b"PLTE":
            stripped += good[pos : pos + 12 + clen]
        pos += 12 + clen
    with pytest.raises(ValueError):
        decode_png(bytes(stripped))
    del zl


class TestApng:
    """APNG animation (round 6): composition model + container validation."""

    def _frames(self, W=13, H=9, seed=3):
        rng = np.random.RandomState(seed)
        base = rng.randint(0, 256, size=(H, W, 4)).astype(np.uint8)
        f1 = rng.randint(0, 256, size=(4, 5, 4)).astype(np.uint8)
        f2 = rng.randint(0, 256, size=(3, 3, 4)).astype(np.uint8)
        return [
            {"px": base},
            {"px": f1, "x": 2, "y": 1, "dispose": 2, "blend": 0},
            {"px": f2, "x": 6, "y": 4, "dispose": 1, "blend": 1},
        ]

    def test_compose_matches_reference(self):
        from rtcdb_spark.functions.multimodal import decode_apng, make_apng

        frames = self._frames()
        meta, out = decode_apng(make_apng(13, 9, 1, frames))
        assert meta["n_frames"] == 3 and len(out) == 3
        # frame 1 SOURCE-replaces its rect
        assert np.array_equal(out[1][1:5, 2:7], frames[1]["px"])
        # PREVIOUS dispose: frame 2 composes against the pre-frame-1
        # canvas (compare rows 1..3 — row 4 col 6 is inside frame 2's own
        # OVER-blended rect)
        assert np.array_equal(out[2][1:4, 2:7], out[0][1:4, 2:7])
        # untouched canvas pixels are identical across frames 0 and 1
        assert np.array_equal(out[0][0, :], out[1][0, :])

    def test_sequence_number_validation(self):
        import struct as st
        import zlib as zl

        from rtcdb_spark.functions.multimodal import decode_apng, make_apng

        p = bytearray(make_apng(13, 9, 1, self._frames()))
        # corrupt the first fdAT's sequence number
        pos = 8
        while pos + 8 <= len(p):
            (clen,) = st.unpack_from(">I", p, pos)
            if p[pos + 4 : pos + 8] == b"fdAT":
                body = bytearray(p[pos + 8 : pos + 8 + clen])
                st.pack_into(">I", body, 0, 99)
                crc = zl.crc32(b"fdAT" + bytes(body)) & 0xFFFFFFFF
                p[pos + 8 : pos + 8 + clen] = body
                st.pack_into(">I", p, pos + 8 + clen, crc)
                break
            pos += 12 + clen
        with pytest.raises(ValueError, match="sequence"):
            decode_apng(bytes(p))

    def test_frame_count_must_match_actl(self):
        import struct as st
        import zlib as zl

        from rtcdb_spark.functions.multimodal import decode_apng, make_apng

        p = bytearray(make_apng(13, 9, 1, self._frames()))
        pos = 8
        while pos + 8 <= len(p):
            (clen,) = st.unpack_from(">I", p, pos)
            if p[pos + 4 : pos + 8] == b"acTL":
                body = st.pack(">II", 7, 0)  # lie about the frame count
                crc = zl.crc32(b"acTL" + body) & 0xFFFFFFFF
                p[pos + 8 : pos + 8 + clen] = body
                st.pack_into(">I", p, pos + 8 + clen, crc)
                break
            pos += 12 + clen
        with pytest.raises(ValueError, match="frames"):
            decode_apng(bytes(p))

    def test_default_image_excluded_when_fctl_absent(self):
        """fcTL AFTER IDAT: the IDAT image is a non-animated default image
        and the animation is only the fdAT frames (spec's other form)."""
        import struct as st
        import zlib as zl

        from rtcdb_spark.functions.multimodal import decode_apng, make_apng

        full = make_apng(13, 9, 1, self._frames())
        # rebuild: drop frame 0's fcTL (the one before IDAT), patch acTL,
        # and renumber the remaining fcTL/fdAT sequence fields from 0
        chunks = []
        pos = 8
        while pos + 8 <= len(full):
            (clen,) = st.unpack_from(">I", full, pos)
            chunks.append((full[pos + 4 : pos + 8], full[pos + 8 : pos + 8 + clen]))
            pos += 12 + clen
        out = bytearray(full[:8])
        seq = 0
        first_fctl_dropped = False
        for ctype, body in chunks:
            if ctype == b"acTL":
                body = st.pack(">II", 2, 0)
            elif ctype == b"fcTL":
                if not first_fctl_dropped:
                    first_fctl_dropped = True
                    continue
                body = st.pack(">I", seq) + body[4:]
                seq += 1
            elif ctype == b"fdAT":
                body = st.pack(">I", seq) + body[4:]
                seq += 1
            crc = zl.crc32(ctype + body) & 0xFFFFFFFF
            out += st.pack(">I", len(body)) + ctype + body + st.pack(">I", crc)
        meta, frames = decode_apng(bytes(out))
        assert meta["n_frames"] == 2 and len(frames) == 2
        # first animation frame is the 4x5 sub-rect composed on a
        # TRANSPARENT canvas, not on the default image
        assert (frames[0][0, 0] == 0).all()

    def test_non_rgba8_gated(self):
        from rtcdb_spark.functions.multimodal import decode_apng

        with pytest.raises(ValueError):
            decode_apng(b"nope")
        # a plain (non-animated) PNG has no acTL
        with pytest.raises(ValueError, match="acTL"):
            decode_apng(make_png(4, 4, 1))
