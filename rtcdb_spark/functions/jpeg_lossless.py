"""Lossless JPEG (T.81 Annex H, SOF3) — round 7.

The original DPCM lossless mode (still the normal coding of DICOM
medical images): no DCT, no quantization — each sample is predicted
from its decoded neighbors (the seven Annex-H predictors over Ra=left,
Rb=above, Rc=above-left) and the DIFFERENCE is Huffman-coded exactly
like a baseline DC coefficient (SSSS category + magnitude bits, with
the SSSS=16 special case coding a difference of 32768 with no extra
bits). Reconstruction is modulo 2^16, per H.1.2.1.

Supported: 1- or 3-component scans, 1x1 sampling (the layout DICOM and
every common lossless producer uses), sample precision 2..16, point
transform Pt (the decoder reconstructs ``sample << Pt``, H.1.2.3), and
DRI/RSTm restart intervals. Subsampled lossless scans remain honestly
gated.

Boundary rules (H.1.2.2): the very first sample of the scan AND the
first sample after each RSTm is predicted by ``1 << (P - Pt - 1)``; the
rest of that sample line uses the one-dimensional Ra predictor
regardless of the scan's selected predictor ('the horizontal predictor
is used for the first line of samples at the start of the scan and at
the beginning of each restart interval'); the selected predictor
resumes on later lines, with Rb at the start of each line. I.e. a
restart re-enters full scan-start state — fixed per ADVICE r7 (the
earlier code default-predicted only the single restart sample, which
roundtripped internally but was non-conformant for
``restart_interval > 0 and predictor != 1``).

There is no external arbiter in this container (the system
libjpeg-turbo predates its 3.x lossless support), so the tests pin the
predictor arithmetic BY HAND on small grids (each of the seven
predictors verified against spec-formula values computed in the test)
and require bit-EXACT roundtrips over random 16-bit data for every
predictor — exactness over random inputs is the property lossless mode
exists to provide, and any predictor/boundary disagreement between
encoder and decoder breaks it immediately.
"""

from __future__ import annotations

import struct

from rtcdb_spark.functions.jpeg import (
    _BitReader,
    _BitWriter,
    _build_codes,
    _decode_huffman,
    _extend,
    _magnitude,
    _next_marker,
)

# a DC-style Huffman table covering SSSS 0..16 (lossless needs 16)
_LL_BITS = [0, 0, 1, 4, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
_LL_VALS = [4, 0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _predict(
    px, row: int, col: int, pred: int, p: int, pt: int,
    rrow: int = 0, rcol: int = 0,
) -> int:
    """Annex-H prediction with restart-aware boundaries: ``(rrow, rcol)``
    is where the current restart interval began (scan start = (0, 0)).
    H.1.2.2: the interval's first sample is predicted by
    ``1 << (P - Pt - 1)``; the REST of that sample line uses the
    one-dimensional Ra predictor ('the horizontal predictor is used for
    the first line of samples at the start of the scan and at the
    beginning of each restart interval'); the selected predictor resumes
    on later lines, with Rb at each line start."""
    if row == rrow and col == rcol:
        return 1 << (p - pt - 1)
    if row == rrow:
        return int(px[row][col - 1])  # interval's first line: Ra
    if col == 0:
        return int(px[row - 1][col])  # first column: Rb
    a = int(px[row][col - 1])
    b = int(px[row - 1][col])
    c = int(px[row - 1][col - 1])
    if pred == 1:
        return a
    if pred == 2:
        return b
    if pred == 3:
        return c
    if pred == 4:
        return a + b - c
    if pred == 5:
        return a + ((b - c) >> 1)
    if pred == 6:
        return b + ((a - c) >> 1)
    if pred == 7:
        return (a + b) >> 1
    raise ValueError(f"bad lossless predictor {pred}")


def encode_jpeg_lossless(
    pixels,
    predictor: int = 1,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W) or (H, W, ncomp) integer array as SOF3 lossless
    JFIF. Precision is inferred from the dtype/max (8 for uint8, else
    16); the roundtrip through :func:`decode_jpeg_lossless` is bit-exact
    by construction (that is the mode's contract). Components are coded
    non-interleaved scan-per-component, 1x1 sampling."""
    import numpy as np

    arr = np.asarray(pixels)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    p = 8 if arr.dtype == np.uint8 and point_transform == 0 else 16
    if int(arr.max(initial=0)) >= (1 << p):
        p = 16
    pt = point_transform
    codes = _build_codes(_LL_BITS, _LL_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, p, h, w, nc)
    for ci in range(nc):
        out += struct.pack("BBB", ci + 1, 0x11, 0)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_LL_VALS), 0x00)
    out += bytes(_LL_BITS) + bytes(_LL_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for ci in range(nc):
        # non-interleaved scan: Ss = predictor, Se = 0, Al = Pt (H.1)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += struct.pack("BB", ci + 1, 0x00)
        out += bytes([predictor, 0, pt & 0x0F])
        plane = (arr[:, :, ci].astype(np.int64) >> pt).tolist()
        bw = _BitWriter()
        rst = 0
        n = 0
        rrow = rcol = 0  # where the current restart interval began
        for row in range(h):
            for col in range(w):
                if restart_interval and n and n % restart_interval == 0:
                    bw.flush()
                    bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    # the coder re-enters scan-start state (H.1.2.2)
                    rrow, rcol = row, col
                pred_val = _predict(plane, row, col, predictor, p, pt, rrow, rcol)
                diff = (plane[row][col] - pred_val) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # modulo-2^16 difference, H.1.2.1
                if diff == -32768:
                    code, length = codes[16]
                    bw.write(code, length)  # SSSS=16: no extra bits
                else:
                    ssss, bits = _magnitude(diff)
                    code, length = codes[ssss]
                    bw.write(code, length)
                    if ssss:
                        bw.write(bits, ssss)
                n += 1
        bw.flush()
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_lossless(payload: bytes):
    """Decode a SOF3 lossless JFIF produced by any spec writer (1x1
    sampling). Returns (width, height, ncomp, pixels) with pixels an
    int64 (H, W) or (H, W, ncomp) array of ``sample << Pt`` values."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    huff: dict[int, dict] = {}
    frame = None
    dri = 0
    planes: list = []
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xC3:
            p, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            for i in range(nc):
                if seg[7 + 3 * i] != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless scans not supported"
                    )
            frame = (p, h, w, nc)
            planes = [None] * nc
        elif marker == 0xC4:
            q = 0
            while q < len(seg):
                tc, th = seg[q] >> 4, seg[q] & 0x0F
                bits = list(seg[q + 1 : q + 17])
                nvals = sum(bits)
                vals = list(seg[q + 17 : q + 17 + nvals])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                q += 17 + nvals
        elif marker == 0xDD:
            dri = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF3")
            p, h, w, nc = frame
            ns = seg[0]
            if ns != 1:
                raise NotImplementedError(
                    "interleaved lossless scans not supported"
                )
            comp = seg[1] - 1
            tbl = huff[(0, seg[2] >> 4)]
            predictor, pt = seg[3], seg[5] & 0x0F
            reader = _BitReader(payload, pos + seglen)
            plane = [[0] * w for _ in range(h)]
            n = 0
            rrow = rcol = 0  # where the current restart interval began
            for row in range(h):
                for col in range(w):
                    if dri and n and n % dri == 0:
                        reader.sync_restart(n // dri - 1)
                        rrow, rcol = row, col  # scan-start state (H.1.2.2)
                    ssss = _decode_huffman(reader, tbl)
                    if ssss == 16:
                        diff = 32768
                    else:
                        diff = _extend(reader.receive(ssss), ssss)
                    pred_val = _predict(plane, row, col, predictor, p, pt, rrow, rcol)
                    plane[row][col] = (pred_val + diff) & 0xFFFF
                    n += 1
            planes[comp] = np.array(plane, dtype=np.int64) << pt
            pos = _next_marker(payload, reader.pos)
            continue
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            raise ValueError("not a lossless JPEG (use decode_jpeg)")
        pos += seglen
    if frame is None or any(pl is None for pl in planes):
        raise ValueError("missing SOF3/SOS")
    p, h, w, nc = frame
    import numpy as np

    px = np.stack(planes, axis=-1)
    if nc == 1:
        px = px[:, :, 0]
    return w, h, nc, px


