"""Minimal ISO BMFF (MP4) container codec — real video-frame SAMPLING
without a codec library (SURVEY §2 C-IX multimodal; round 5).

"Frame sampling" on a 100 TB video corpus is container arithmetic, not
pixel decoding: the MP4 sample tables (stsz/stsc/stco/stts, ISO/IEC
14496-12 — a public spec) give every frame's byte offset, size, and
timestamp, so selecting every-nth frame and slicing its ENCODED payload
out of `mdat` is pure byte work. That is exactly what production pipelines
ship to a GPU decode stage; the pipeline side (schema, Arrow-batched
`mapInPandas`, offset resolution) is what belongs in the engine. Actual
codec decode (H.264 etc.) genuinely needs ffmpeg and stays honestly gated
in `functions.multimodal.decode_image`-style dispatch.

Implemented from the spec, same policy as the BMP/WAV/PNG/JPEG codecs:

- ``make_mp4``   — a valid minimal ISO BMFF file: `ftyp`, `mdat` holding
  deterministic synthetic frame payloads, and a full `moov` tree (mvhd,
  trak/tkhd, mdia/mdhd/hdlr, minf/stbl with stsd/stts/stsc/stsz/stco).
  Frame sizes and bytes are seed-derived so tests/oracles can recompute
  every sampled byte analytically.
- ``parse_mp4``  — box walk (any box order, 32-bit sizes), sample-table
  resolution to per-frame absolute offsets/sizes, duration/timescale,
  track dimensions.
- ``frame_offsets`` / ``sample_frames`` — the every-nth selection plan and
  the sliced encoded payloads.

The reference engine has no media handling at all (SURVEY §3).
"""

from __future__ import annotations

import struct

_U32 = struct.Struct(">I")


def _box(btype: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + btype + payload


def frame_size(seed: int, i: int) -> int:
    """Deterministic synthetic frame size (analytically recomputable)."""
    return 50 + (seed * 31 + i * 17) % 100


def frame_byte(seed: int, i: int, j: int) -> int:
    """Byte ``j`` of frame ``i`` (analytically recomputable)."""
    return (seed + i * 7 + j * 3) % 256


def make_mp4(
    n_frames: int,
    seed: int,
    fps: int = 30,
    width: int = 64,
    height: int = 48,
) -> bytes:
    """A valid minimal single-track ISO BMFF file with ``n_frames``
    deterministic synthetic samples (one chunk, fixed frame duration)."""
    if n_frames <= 0:
        raise ValueError("n_frames must be positive")
    frames = [
        bytes(frame_byte(seed, i, j) for j in range(frame_size(seed, i)))
        for i in range(n_frames)
    ]
    mdat_payload = b"".join(frames)

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(512) + b"isomiso2mp41")
    # mdat follows ftyp; sample data starts at its payload (header is 8B)
    mdat_off = len(ftyp)
    first_sample_off = mdat_off + 8
    mdat = _box(b"mdat", mdat_payload)

    timescale = 1000
    sample_delta = timescale // fps
    duration = n_frames * sample_delta

    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version/flags
        + _U32.pack(0) + _U32.pack(0)  # creation/modification
        + _U32.pack(timescale) + _U32.pack(duration)
        + _U32.pack(0x00010000) + struct.pack(">H", 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + _U32.pack(2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + _U32.pack(0) + _U32.pack(0)
        + _U32.pack(1)  # track id
        + _U32.pack(0) + _U32.pack(duration)
        + b"\x00" * 8 + struct.pack(">hh", 0, 0) + struct.pack(">hh", 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _U32.pack(width << 16) + _U32.pack(height << 16),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00"
        + _U32.pack(0) + _U32.pack(0)
        + _U32.pack(timescale) + _U32.pack(duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        b"hdlr",
        b"\x00\x00\x00\x00" + _U32.pack(0) + b"vide"
        + b"\x00" * 12 + b"SynthVideo\x00",
    )
    # stsd with a single opaque sample entry ('synt' — synthetic codec tag;
    # a real file would carry avc1+avcC, which only matters to the decoder)
    sample_entry = _box(
        b"synt",
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + _U32.pack(0x00480000) + _U32.pack(0x00480000)
        + _U32.pack(0) + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">H", 0x18) + struct.pack(">h", -1),
    )
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + _U32.pack(1) + sample_entry)
    stts = _box(
        b"stts",
        b"\x00\x00\x00\x00" + _U32.pack(1)
        + _U32.pack(n_frames) + _U32.pack(sample_delta),
    )
    stsc = _box(
        b"stsc",
        b"\x00\x00\x00\x00" + _U32.pack(1)
        + _U32.pack(1) + _U32.pack(n_frames) + _U32.pack(1),
    )
    stsz = _box(
        b"stsz",
        b"\x00\x00\x00\x00" + _U32.pack(0) + _U32.pack(n_frames)
        + b"".join(_U32.pack(len(f)) for f in frames),
    )
    stco = _box(b"stco", b"\x00\x00\x00\x00" + _U32.pack(1) + _U32.pack(first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    dref = _box(
        b"dref",
        b"\x00\x00\x00\x00" + _U32.pack(1) + _box(b"url ", b"\x00\x00\x00\x01"),
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(payload: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for top-level boxes in
    [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = _U32.unpack(payload[pos : pos + 4])[0]
        btype = payload[pos + 4 : pos + 8]
        if size == 1:
            raise NotImplementedError("64-bit box sizes not supported")
        if size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}")
        yield btype, pos + 8, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, *path: bytes):
    """Resolve a nested box path; returns (payload_start, payload_end)."""
    for depth, want in enumerate(path):
        found = None
        for btype, ps, pe in _walk(payload, start, end):
            if btype == want:
                found = (ps, pe)
                break
        if found is None:
            raise ValueError(f"missing box {b'/'.join(path[: depth + 1])!r}")
        start, end = found
    return start, end


def parse_mp4(payload: bytes) -> dict:
    """Parse container metadata + the resolved per-sample offset table.

    Returns: n_samples, timescale, duration_ms, fps (rounded), width,
    height, sizes (list), offsets (list of absolute byte offsets)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (missing ftyp)")
    end = len(payload)
    moov_s, moov_e = _find(payload, 0, end, b"moov")
    stbl_s, stbl_e = _find(
        payload, moov_s, moov_e, b"trak", b"mdia", b"minf", b"stbl"
    )
    mdhd_s, _ = _find(payload, moov_s, moov_e, b"trak", b"mdia", b"mdhd")
    version = payload[mdhd_s]
    if version != 0:
        raise NotImplementedError("mdhd version 1 (64-bit times) not supported")
    timescale = _U32.unpack(payload[mdhd_s + 12 : mdhd_s + 16])[0]
    duration = _U32.unpack(payload[mdhd_s + 16 : mdhd_s + 20])[0]
    tkhd_s, _ = _find(payload, moov_s, moov_e, b"trak", b"tkhd")
    width = _U32.unpack(payload[tkhd_s + 76 : tkhd_s + 80])[0] >> 16
    height = _U32.unpack(payload[tkhd_s + 80 : tkhd_s + 84])[0] >> 16

    def box(name: bytes) -> tuple[int, int]:
        return _find(payload, stbl_s, stbl_e, name)

    # stsz: per-sample sizes (or one fixed size)
    s, _e = box(b"stsz")
    fixed = _U32.unpack(payload[s + 4 : s + 8])[0]
    n = _U32.unpack(payload[s + 8 : s + 12])[0]
    if fixed:
        sizes = [fixed] * n
    else:
        sizes = [
            _U32.unpack(payload[s + 12 + 4 * i : s + 16 + 4 * i])[0]
            for i in range(n)
        ]
    # stco: chunk offsets
    s, _e = box(b"stco")
    n_chunks = _U32.unpack(payload[s + 4 : s + 8])[0]
    chunk_offs = [
        _U32.unpack(payload[s + 8 + 4 * i : s + 12 + 4 * i])[0]
        for i in range(n_chunks)
    ]
    # stsc: samples-per-chunk runs -> expand to per-chunk counts
    s, _e = box(b"stsc")
    n_runs = _U32.unpack(payload[s + 4 : s + 8])[0]
    runs = [
        struct.unpack(">III", payload[s + 8 + 12 * i : s + 20 + 12 * i])
        for i in range(n_runs)
    ]  # (first_chunk, samples_per_chunk, desc_index)
    per_chunk = []
    for ri, (first, spc, _d) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    # resolve absolute per-sample offsets
    offsets = []
    si = 0
    for ci, coff in enumerate(chunk_offs):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if si != n:
        raise ValueError(f"sample tables inconsistent: resolved {si} of {n}")
    # stts: fps from the first delta run
    s, _e = box(b"stts")
    delta = _U32.unpack(payload[s + 12 : s + 16])[0]
    fps = round(timescale / delta) if delta else 0
    return {
        "n_samples": n,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale if timescale else 0,
        "fps": fps,
        "width": width,
        "height": height,
        "sizes": sizes,
        "offsets": offsets,
    }


def frame_offsets(payload: bytes, every_n: int = 1) -> list[tuple[int, int, int]]:
    """The frame-sampling PLAN: (sample_index, absolute_offset, size) for
    every ``every_n``-th sample — computable from the ~KB moov alone, the
    property that lets a scheduler fan sampled-frame reads across
    executors without touching mdat."""
    meta = parse_mp4(payload)
    return [
        (i, meta["offsets"][i], meta["sizes"][i])
        for i in range(0, meta["n_samples"], every_n)
    ]


def sample_frames(payload: bytes, every_n: int = 1) -> list[bytes]:
    """Slice the ENCODED payload of every nth frame out of mdat (what a
    downstream GPU decode stage consumes). Codec decode of these bytes is
    honestly env-gated (needs ffmpeg/pyav)."""
    return [payload[o : o + s] for _i, o, s in frame_offsets(payload, every_n)]
