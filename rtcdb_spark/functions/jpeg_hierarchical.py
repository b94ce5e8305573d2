"""Hierarchical JPEG (T.81 Annex J) — round 8.

The pyramid coding mode: a DHP segment declares the FULL image
dimensions, then a sequence of FRAMES refines the image from a small
base upward — the first frame is an ordinary non-differential DCT frame
(SOF0) at the coarsest resolution; each later frame is preceded by an
EXP segment (expand the reference by 2 horizontally and/or vertically,
J.1.1.2 interpolation) and codes a DIFFERENTIAL DCT frame (SOF5): the
DCT of (source - upsampled reference), with NO level shift and NO DC
prediction (the predictor is zero for every block of a differential
frame). The decoder accumulates: reference = clamp(expanded reference +
decoded difference). Hierarchical mode is how T.81 ships progressive
*resolution* (thumbnail-first transmission, multi-resolution archives)
rather than progressive *precision* (Annex G, `encode_jpeg_progressive`).

Encoder choices (the spec leaves both to the encoder): the downsampling
filter building the pyramid is a 2x2 mean, and the reference used for
each difference is the DECODER-VISIBLE reconstruction (closed loop —
the encoder dequantizes/IDCTs its own output), so quantization error
does not accumulate across levels.

Upsampling is the NORMATIVE J.1.1.2 filter: output even samples copy
the input; odd samples are the rounded average of the two neighbors
(`(a + b + 1) >> 1`), the last odd column/row replicating the edge;
the doubled plane is then trimmed to the target frame dimensions (odd
target sizes trim one sample, per the ceil-halving pyramid).

Intermediate sums are clamped to [0, 255] at every stage on BOTH sides
(encoder reconstruction and decoder), so the closed loop cannot
diverge. Grayscale and 3-component 4:4:4 colour are supported; the
final frame's dimensions must equal the DHP dimensions.

There is no external arbiter for this mode in the container (libjpeg
never implemented hierarchical coding), so the tests pin the EXP
upsampling filter BY HAND from the J.1.1.2 formulas, assert the marker
structure (DHP, EXP, SOF0 + SOF5 sequence) byte-level, and gate the
reconstruction error of the full pipeline at every level.

Markers: DHP = FFDE (SOF syntax, full dims), EXP = FFDF (payload one
byte, (Eh << 4) | Ev), SOF5 = FFC5 (differential sequential DCT,
huffman).
"""

from __future__ import annotations

import struct

from rtcdb_spark.functions.jpeg import (
    _zz64,
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _BitReader,
    _BitWriter,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _QUANT_CHROMA,
    _QUANT_LUMA,
    _ZIGZAG,
    _build_codes,
    _dct_matrix,
    _decode_huffman,
    _extend,
    _from_blocks,
    _magnitude,
    _next_marker,
    _pad_replicate,
    _rgb_to_ycbcr,
    _scaled_quant,
    _to_blocks,
    _ycbcr_to_rgb,
)


def expand_ref(plane, eh: int, ev: int, out_w: int, out_h: int):
    """J.1.1.2 reference expansion: double horizontally (eh) and/or
    vertically (ev) with the normative interpolation filter, then trim
    to (out_h, out_w). Even output samples copy the input; odd samples
    are the rounded average of the straddling inputs, the last odd
    position replicating the edge."""
    import numpy as np

    p = np.asarray(plane, dtype=np.int64)
    if eh:
        h, w = p.shape
        out = np.empty((h, 2 * w), dtype=np.int64)
        out[:, 0::2] = p
        out[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        out[:, -1] = p[:, -1]  # last odd column replicates the edge
        p = out
    if ev:
        h, w = p.shape
        out = np.empty((2 * h, w), dtype=np.int64)
        out[0::2, :] = p
        out[1:-1:2, :] = (p[:-1, :] + p[1:, :] + 1) >> 1
        out[-1, :] = p[-1, :]
        p = out
    return p[:out_h, :out_w]


def _downsample2(plane):
    """Encoder-side pyramid construction: 2x2 mean with edge replication
    for odd dims (the downsampling filter is the encoder's choice,
    J.1.1.1)."""
    import numpy as np

    p = np.asarray(plane, dtype=np.float64)
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:, :]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _frame_coefficients(planes, quants, plane_tbl, differential: bool):
    """Quantized zigzag coefficients for one frame: pad, (level shift
    only for NON-differential frames), DCT, quantize — plus the
    decoder-visible reconstruction of every plane (closed loop)."""
    import numpy as np

    cmat = _dct_matrix()
    zz = _zz64()
    inv = np.argsort(zz)
    comp_coeffs, recons = [], []
    for plane, tbl in zip(planes, plane_tbl):
        h, w = plane.shape
        h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        padded = _pad_replicate(np.asarray(plane, dtype=np.float64), h8, w8)
        if not differential:
            padded = padded - 128.0
        blocks = _to_blocks(padded)
        coeffs = np.einsum("ij,njk,lk->nil", cmat, blocks, cmat)
        q = np.round(coeffs / quants[tbl][None, :, :]).astype(np.int64)
        comp_coeffs.append(q.reshape(-1, 64)[:, zz])
        # decoder-visible reconstruction
        deq = (q * quants[tbl][None, :, :]).astype(np.float64)
        rec = np.einsum("ji,njk,kl->nil", cmat, deq, cmat)
        rec_plane = _from_blocks(rec, h8, w8)[:h, :w]
        if not differential:
            rec_plane = rec_plane + 128.0
        recons.append(np.round(rec_plane).astype(np.int64))
    return comp_coeffs, recons


def _entropy_encode_frame(comp_coeffs, comp_huff, differential: bool) -> bytes:
    """Interleaved 1x1-sampling MCU entropy coding (one block per
    component per MCU). Differential frames use NO DC prediction: the
    predictor is zero for every block (Annex J)."""
    import numpy as np

    dc_codes = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if max(comp_huff) > 0:
        dc_codes.append(_build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_codes.append(_build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))
    bw = _BitWriter()
    n_comp = len(comp_coeffs)
    pred = [0] * n_comp
    n_blocks = comp_coeffs[0].shape[0]
    for b in range(n_blocks):
        for ci in range(n_comp):
            blk = comp_coeffs[ci][b]
            hi = comp_huff[ci]
            if differential:
                diff = int(blk[0])  # PRED = 0 in differential frames
            else:
                diff = int(blk[0]) - pred[ci]
                pred[ci] = int(blk[0])
            ssss, bits = _magnitude(diff)
            code, length = dc_codes[hi][ssss]
            bw.write(code, length)
            if ssss:
                bw.write(bits, ssss)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[hi][0xF0]
                    bw.write(code, length)
                    run -= 16
                ssss, bits = _magnitude(v)
                code, length = ac_codes[hi][(run << 4) | ssss]
                bw.write(code, length)
                bw.write(bits, ssss)
                run = 0
            if last < 63:
                code, length = ac_codes[hi][0x00]
                bw.write(code, length)
    bw.flush()
    return bytes(bw.buf)


def _frame_bytes(marker: bytes, h: int, w: int, ncomp: int, plane_tbl) -> bytes:
    out = bytearray(marker)
    out += struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, plane_tbl[ci])
    return bytes(out)


def _sos_bytes(ncomp: int, comp_huff) -> bytes:
    out = bytearray(b"\xff\xda") + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, comp_huff[ci] * 0x11)
    out += b"\x00\x3f\x00"
    return bytes(out)


def encode_jpeg_hierarchical(pixels, levels: int = 3, quality: int = 90) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    hierarchical JFIF with ``levels`` resolution stages (coarsest first).
    Returns the full byte stream: SOI, DQT, DHT, DHP, SOF0 frame,
    (EXP + SOF5 frame) per refinement level, EOI."""
    import numpy as np

    pixels = np.asarray(pixels)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if gray:
        full_planes = [pixels.astype(np.float64)]
        quants = [_scaled_quant(_QUANT_LUMA, quality)]
        plane_tbl = [0]
        comp_huff = [0]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        full_planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        quants = [
            _scaled_quant(_QUANT_LUMA, quality),
            _scaled_quant(_QUANT_CHROMA, quality),
        ]
        plane_tbl = [0, 1, 1]
        comp_huff = [0, 1, 1]
    ncomp = len(full_planes)

    # pyramid, coarsest last; level dims halve by ceil
    pyramid = [full_planes]
    for _ in range(levels - 1):
        pyramid.append([_downsample2(p) for p in pyramid[-1]])
    pyramid.reverse()  # coarsest first

    zz = _zz64()
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, q in enumerate(quants):
        qz = q.reshape(-1)[zz]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in qz
        )
    huff_specs = [
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if ncomp > 1:
        huff_specs += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    # DHP: SOF syntax, the FULL image dimensions
    out += _frame_bytes(b"\xff\xde", h, w, ncomp, plane_tbl)

    refs: list | None = None
    for li, planes in enumerate(pyramid):
        lh, lw = planes[0].shape
        if li == 0:
            coeffs, refs = _frame_coefficients(
                planes, quants, plane_tbl, differential=False
            )
            refs = [np.clip(r, 0, 255) for r in refs]
            out += _frame_bytes(b"\xff\xc0", lh, lw, ncomp, plane_tbl)
            out += _sos_bytes(ncomp, comp_huff)
            out += _entropy_encode_frame(coeffs, comp_huff, differential=False)
        else:
            out += b"\xff\xdf" + struct.pack(">HB", 3, 0x11)  # EXP both
            refs = [expand_ref(r, 1, 1, lw, lh) for r in refs]
            diffs = [
                np.asarray(p, dtype=np.float64) - r.astype(np.float64)
                for p, r in zip(planes, refs)
            ]
            coeffs, drecs = _frame_coefficients(
                diffs, quants, plane_tbl, differential=True
            )
            refs = [
                np.clip(r + d, 0, 255) for r, d in zip(refs, drecs)
            ]
            out += _frame_bytes(b"\xff\xc5", lh, lw, ncomp, plane_tbl)
            out += _sos_bytes(ncomp, comp_huff)
            out += _entropy_encode_frame(coeffs, comp_huff, differential=True)
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_hierarchical(payload: bytes):
    """Decode a hierarchical JFIF: returns (width, height, ncomp, pixels)
    with pixels a uint8 (H, W) or (H, W, 3) array at the DHP's full
    dimensions. SOF0 (non-differential) and SOF5 (differential
    sequential DCT) frames are supported, 1x1 sampling, with EXP
    reference expansion between frames."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    dhp = None
    frame = None
    frame_diff = False
    pending_exp = (0, 0)
    refs: list | None = None
    cmat = _dct_matrix()
    inv_zz = np.argsort(_zz64())
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
        if marker == 0xDB:
            q = 0
            while q < len(seg):
                tid = seg[q] & 0x0F
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_zz64()] = np.frombuffer(
                    seg[q + 1 : q + 65], dtype=np.uint8
                )
                quant[tid] = tbl.reshape(8, 8)
                q += 65
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
        elif marker == 0xDE:  # DHP
            p_, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if p_ != 8:
                raise NotImplementedError("hierarchical precision != 8")
            dhp = (fh, fw, nc)
        elif marker == 0xDF:  # EXP
            pending_exp = (seg[0] >> 4, seg[0] & 0x0F)
        elif marker in (0xC0, 0xC1, 0xC5):
            if dhp is None:
                raise ValueError("hierarchical frame before DHP")
            p_, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            comp_q = [seg[8 + 3 * i] for i in range(nc)]
            for i in range(nc):
                if seg[7 + 3 * i] != 0x11:
                    raise NotImplementedError(
                        "subsampled hierarchical frames not supported"
                    )
            frame = (fh, fw, nc, comp_q)
            frame_diff = marker == 0xC5
        elif marker in (0xC2, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only SOF0/SOF1/SOF5 hierarchical frames are supported"
            )
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            fh, fw, nc, comp_q = frame
            ns = seg[0]
            if ns != nc:
                raise NotImplementedError("non-interleaved hierarchical scan")
            tbl_ids = [(seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            h8, w8 = (fh + 7) // 8 * 8, (fw + 7) // 8 * 8
            nb = (h8 // 8) * (w8 // 8)
            coeffs = [np.zeros((nb, 64), dtype=np.int64) for _ in range(nc)]
            reader = _BitReader(payload, pos + seglen)
            pred = [0] * nc
            for b in range(nb):
                for ci in range(nc):
                    blk = coeffs[ci][b]
                    ssss = _decode_huffman(reader, huff[(0, tbl_ids[ci][0])])
                    diff = _extend(reader.receive(ssss), ssss)
                    if frame_diff:
                        blk[0] = diff  # PRED = 0 in differential frames
                    else:
                        pred[ci] += diff
                        blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        sym = _decode_huffman(reader, huff[(1, tbl_ids[ci][1])])
                        if sym == 0x00:
                            break
                        run, s2 = sym >> 4, sym & 0x0F
                        if s2 == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC index overflow")
                        blk[k] = _extend(reader.receive(s2), s2)
                        k += 1
            # dequantize + IDCT per component
            planes = []
            for ci in range(nc):
                nat = coeffs[ci][:, inv_zz].reshape(nb, 8, 8)
                deq = nat * quant[comp_q[ci]][None, :, :]
                rec = np.einsum("ji,njk,kl->nil", cmat, deq.astype(np.float64), cmat)
                plane = _from_blocks(rec, h8, w8)[:fh, :fw]
                if not frame_diff:
                    plane = plane + 128.0
                planes.append(np.round(plane).astype(np.int64))
            if frame_diff:
                if refs is None:
                    raise ValueError("differential frame without a reference")
                eh, ev = pending_exp
                refs = [
                    np.clip(
                        expand_ref(r, eh, ev, fw, fh) + d, 0, 255
                    )
                    for r, d in zip(refs, planes)
                ]
            else:
                refs = [np.clip(p, 0, 255) for p in planes]
            pending_exp = (0, 0)
            pos = _next_marker(payload, reader.pos)
            continue
        pos += seglen
    if dhp is None or refs is None:
        raise ValueError("missing DHP/frames")
    fh, fw, nc = dhp
    if refs[0].shape != (fh, fw):
        raise ValueError(
            f"final frame {refs[0].shape} does not reach DHP dims {(fh, fw)}"
        )
    if nc == 1:
        return fw, fh, 1, refs[0].astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(refs, axis=-1).astype(np.float64))
    return fw, fh, nc, rgb
