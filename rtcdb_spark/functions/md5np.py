"""Vectorized single-block MD5 (RFC 1321) in NumPy.

The repo's engine-portable hash is the md5-prefix integer
(``functions.text.stable_hash60``): bit-identical in Spark, DuckDB and
Python. Expressed as a Spark column over char k-grams it runs inside the
*interpreted* higher-order-function evaluator — substring + md5 + hex-conv
allocations per k-gram, no whole-stage codegen — which measures ~5 µs per
hash. This module computes the identical value batch-wise in NumPy: one
fixed 64-round loop of uint32 vector ops over N messages at once
(~0.5-1 µs/hash single-core, and it parallelizes across tasks inside
``mapInArrow``). All messages of one call must fit a single 512-bit MD5
block (length <= 55 bytes) — always true for the k-gram use (k = 8).

Bit-equality with hashlib is pinned by tests/test_md5np.py over random
inputs, so oracle hash-parity of every query built on it is preserved.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Per-round left-rotate amounts and sine-derived constants (RFC 1321 §3.4).
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = (
    np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2**32)
    .astype(np.uint64)
    .astype(np.uint32)
)
# Message-word index g for round i (RFC 1321 §3.4 rounds 1-4).
_G = np.array(
    list(range(16))
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_INIT_A = np.uint32(0x67452301)
_INIT_B = np.uint32(0xEFCDAB89)
_INIT_C = np.uint32(0x98BADCFE)
_INIT_D = np.uint32(0x10325476)


def _core(M: list[np.ndarray | np.uint32], n: int) -> tuple[np.ndarray, np.ndarray]:
    """Run the 64 MD5 rounds over n parallel single-block messages.

    ``M`` is the 16-entry message schedule; entries are either length-n
    uint32 arrays or scalar uint32 (schedule words constant across the
    batch — the padding/length words for fixed-size messages).
    Returns the first two digest words (a, b) — enough for the 60-bit
    hex-prefix value every caller wants.
    """
    A = np.full(n, _INIT_A, dtype=np.uint32)
    B = np.full(n, _INIT_B, dtype=np.uint32)
    C = np.full(n, _INIT_C, dtype=np.uint32)
    D = np.full(n, _INIT_D, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                F = (B & C) | (~B & D)
            elif i < 32:
                F = (D & B) | (~D & C)
            elif i < 48:
                F = B ^ C ^ D
            else:
                F = C ^ (B | ~D)
            F = F + A + _K[i] + M[_G[i]]
            A, D, C = D, C, B
            s = int(_S[i])
            B = B + ((F << np.uint32(s)) | (F >> np.uint32(32 - s)))
        a = A + _INIT_A
        b = B + _INIT_B
    return a, b


def _u60(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """First 15 hex chars of the digest as an int64 (= big-endian u64 of
    digest bytes 0..7, shifted right one nibble) — exactly Spark's
    ``conv(substr(md5(x), 1, 15), 16, 10)`` and DuckDB's
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    be = (
        a.astype("<u4").byteswap().astype(np.uint64) << np.uint64(32)
    ) | b.astype("<u4").byteswap().astype(np.uint64)
    return (be >> np.uint64(4)).astype(np.int64)


def md5_u60_fixed8(data: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """60-bit md5-prefix of the 8-byte messages ``data[starts[i]:starts[i]+8]``.

    ``data`` is a flat uint8 buffer; ``starts`` an int64 index array. The
    whole message fits words M0/M1; padding (0x80), zeros, and the 64-bit
    length (64 bits) are schedule constants.
    """
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    b8 = np.empty((n, 8), dtype=np.uint8)
    for j in range(8):
        b8[:, j] = data[starts + j]
    words = b8.view("<u4")
    M: list[np.ndarray | np.uint32] = [words[:, 0], words[:, 1]] + [np.uint32(0)] * 14
    M[2] = np.uint32(0x80)
    M[14] = np.uint32(64)
    a, b = _core(M, n)
    return _u60(a, b)


def md5_u32_pair_var(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(hex chars 1-8, hex chars 9-16) of md5 as int64 pairs, for N
    variable-length messages ``data[starts[i]:starts[i]+lens[i]]`` that each
    fit a single MD5 block (len <= 55 bytes — callers route longer messages
    to a hashlib fallback).

    Exactly Spark's ``conv(substring(md5(x), 1, 8), 16, 10)`` /
    ``conv(substring(md5(x), 9, 8), 16, 10)`` — the token-hash pair every
    SimHash operator here is built on.
    """
    n = len(starts)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    lens = lens.astype(np.int64)
    blocks = np.zeros((n, 64), dtype=np.uint8)
    tot = int(lens.sum())
    if tot:
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        blocks.reshape(-1)[rows * 64 + within] = data[
            np.repeat(starts, lens) + within
        ]
    blocks[np.arange(n), lens] = 0x80
    bits = lens * 8  # <= 440 < 2^16: only length bytes 56-57 are nonzero
    blocks[:, 56] = (bits & 0xFF).astype(np.uint8)
    blocks[:, 57] = (bits >> 8).astype(np.uint8)
    words = blocks.view("<u4")
    a, b = _core([words[:, i] for i in range(16)], n)
    hi = a.astype("<u4").byteswap().astype(np.int64)
    lo = b.astype("<u4").byteswap().astype(np.int64)
    return hi, lo


def md5_u60_short(msgs: list[bytes]) -> np.ndarray:
    """60-bit md5-prefix of arbitrary messages up to 55 bytes (one block).

    Row-count is expected to be small (per-doc fallbacks); uses hashlib —
    exact by construction."""
    out = np.empty(len(msgs), dtype=np.int64)
    for i, m in enumerate(msgs):
        out[i] = int(hashlib.md5(m).hexdigest()[:15], 16)
    return out
