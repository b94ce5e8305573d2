"""ISO BMFF (MP4) container codec (functions/mp4.py, round 5): box walk,
sample-table resolution, every-nth frame sampling, and format rejection.
Implemented from the public ISO/IEC 14496-12 spec; the reference engine has
no media handling (SURVEY §3)."""

from __future__ import annotations

import struct

import pytest

from rtcdb_spark.functions.mp4 import (
    frame_byte,
    frame_offsets,
    frame_size,
    make_mp4,
    parse_mp4,
    sample_frames,
)


@pytest.mark.parametrize("n_frames", [1, 5, 24, 100])
def test_roundtrip_sample_tables(n_frames):
    p = make_mp4(n_frames, seed=n_frames * 3 + 1)
    m = parse_mp4(p)
    assert m["n_samples"] == n_frames
    assert m["fps"] == 30
    assert m["width"] == 64 and m["height"] == 48
    assert m["sizes"] == [frame_size(n_frames * 3 + 1, i) for i in range(n_frames)]
    # offsets are contiguous from the first sample
    for i in range(1, n_frames):
        assert m["offsets"][i] == m["offsets"][i - 1] + m["sizes"][i - 1]


@pytest.mark.parametrize("every_n", [1, 2, 3, 7])
def test_sampled_frames_are_exact_payloads(every_n):
    seed = 9
    p = make_mp4(20, seed=seed)
    frames = sample_frames(p, every_n=every_n)
    idxs = list(range(0, 20, every_n))
    assert len(frames) == len(idxs)
    for f, i in zip(frames, idxs):
        expect = bytes(frame_byte(seed, i, j) for j in range(frame_size(seed, i)))
        assert f == expect


def test_frame_offsets_plan_matches_slices():
    p = make_mp4(11, seed=2)
    for i, off, sz in frame_offsets(p, every_n=2):
        assert p[off : off + sz] == bytes(
            frame_byte(2, i, j) for j in range(frame_size(2, i))
        )


def test_multi_run_stsc_resolution():
    """A hand-built stsc with two runs (3 samples in chunk 1, then 2 per
    chunk) must resolve the same offsets as the spec describes."""
    # build via make_mp4 then rewrite stsc/stco into a 3-chunk layout
    seed = 4
    sizes = [frame_size(seed, i) for i in range(7)]
    frames = [
        bytes(frame_byte(seed, i, j) for j in range(sizes[i])) for i in range(7)
    ]
    base = make_mp4(7, seed=seed)
    m = parse_mp4(base)
    first = m["offsets"][0]
    # chunks: [0,1,2] [3,4] [5,6] laid out contiguously (same mdat bytes)
    c1 = first
    c2 = c1 + sum(sizes[:3])
    c3 = c2 + sum(sizes[3:5])

    def patch_box(buf: bytes, name: bytes, payload: bytes) -> bytes:
        i = buf.find(name)  # box type position; size is the 4 bytes before
        assert i > 4
        old_size = struct.unpack(">I", buf[i - 4 : i])[0]
        new = struct.pack(">I", 8 + len(payload)) + name + payload
        out = buf[: i - 4] + new + buf[i - 4 + old_size :]
        # fix every ancestor size (moov/trak/mdia/minf/stbl all precede)
        delta = len(new) - old_size
        if delta:
            for anc in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
                j = out.find(anc)
                sz = struct.unpack(">I", out[j - 4 : j])[0]
                out = out[: j - 4] + struct.pack(">I", sz + delta) + out[j :]
        return out

    stsc_payload = (
        b"\x00\x00\x00\x00"
        + struct.pack(">I", 2)
        + struct.pack(">III", 1, 3, 1)
        + struct.pack(">III", 2, 2, 1)
    )
    stco_payload = b"\x00\x00\x00\x00" + struct.pack(">I", 3) + struct.pack(
        ">III", c1, c2, c3
    )
    patched = patch_box(patch_box(base, b"stsc", stsc_payload), b"stco", stco_payload)
    m2 = parse_mp4(patched)
    assert m2["offsets"] == m["offsets"]  # same contiguous layout
    assert sample_frames(patched, 1) == frames


def test_rejects_non_mp4_and_malformed():
    with pytest.raises(ValueError):
        parse_mp4(b"RIFF this is a wav not an mp4")
    p = bytearray(make_mp4(3, seed=1))
    p[0:4] = struct.pack(">I", 10**9)  # absurd ftyp size
    with pytest.raises(ValueError):
        parse_mp4(bytes(p))


def test_frame_sample_dispatch_routes_mp4():
    from rtcdb_spark.functions.multimodal import frame_sample

    p = make_mp4(9, seed=3)
    frames = frame_sample(p, every_n=3)
    assert len(frames) == 3
    with pytest.raises(NotImplementedError):
        frame_sample(b"\x00\x00\x00\x18unkxsomething", every_n=2)
