"""Winnowing fingerprint statistics as a vectorized Arrow batch kernel.

Computes, per document, exactly what the column-expression formulation in
``functions.text.winnow_select_expr`` computes (Schleimer-Wilkerson-Aiken
winnowing, k = 8 char-grams, w = 4 windows, rightmost-min tie-break):

    n_kgrams, n_fingerprints, fp_sum (sum of selected hashes mod 1e9+7),
    min_fp, max_fp

but does it in NumPy inside ``mapInArrow``: ONE vectorized single-block MD5
pass over every k-gram of the batch (``functions.md5np``), then a global
sliding-window argmin over the flat hash array. The expression formulation
runs in Spark's *interpreted* HOF evaluator (~5 µs per k-gram hash,
single task because the fixture is one small parquet split); this kernel
measures ~50x less CPU per k-gram and parallelizes across tasks.

Bit-equality: md5np is hashlib-exact (pinned by test), ASCII documents make
char k-grams equal byte k-grams (checked per batch — non-ASCII or short
documents take a per-doc Python fallback that mirrors Spark's char/UTF-8
semantics exactly), and all arithmetic is int64-exact. Equivalence with the
expression path is pinned by tests/test_winnow_np.py on fixture + edge-case
documents; the DuckDB oracle gate replays the same selection independently.

Scale shape (100 TB): map-only — no shuffle anywhere; each task hashes and
winnows only its own batch of documents.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from rtcdb_spark.functions.md5np import md5_u60_fixed8

_MOD = 1_000_000_007
_K = 8
_W = 4

OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_kgrams", pa.int64()),
        ("n_fingerprints", pa.int64()),
        ("fp_sum", pa.int64()),
        ("min_fp", pa.int64()),
        ("max_fp", pa.int64()),
    ]
)

OUT_DDL = (
    "doc_id bigint, n_kgrams bigint, n_fingerprints bigint, "
    "fp_sum bigint, min_fp bigint, max_fp bigint"
)


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data, offsets) view of a string/large_string array."""
    if pa.types.is_large_string(arr.type):
        odt: type = np.int64
    else:
        odt = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, offs


def _winnow_picks_small(hs: np.ndarray) -> np.ndarray:
    """Winnow selection for n = len(hs) <= w: one window over all of hs,
    rightmost position of the minimum (0-based flat indices)."""
    m = hs.min()
    return np.array([np.flatnonzero(hs == m)[-1]], dtype=np.int64)


def _fallback_doc(text: str) -> tuple[int, int, int, int, int]:
    """Exact per-doc path for non-ASCII or shorter-than-k documents,
    mirroring the Spark expression's char-substring + UTF-8-md5 semantics."""
    L = len(text)
    n = max(L - (_K - 1), 1)
    hs = np.empty(n, dtype=np.int64)
    for i in range(n):
        kg = text[i : i + _K]
        hs[i] = int(hashlib.md5(kg.encode("utf-8")).hexdigest()[:15], 16)
    if n <= _W:
        picks = _winnow_picks_small(hs)
    else:
        v = np.lib.stride_tricks.sliding_window_view(hs, _W)
        mins = v.min(axis=1)
        off = (_W - 1) - np.argmax(v[:, ::-1] == mins[:, None], axis=1)
        picks = np.unique(np.arange(n - _W + 1, dtype=np.int64) + off)
    vals = hs[picks]
    return (
        n,
        len(picks),
        int((vals % _MOD).sum()),
        int(vals.min()),
        int(vals.max()),
    )


def winnow_stats_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """One input batch (doc_id: int64, text: string) -> one stats batch."""
    doc_ids = batch.column(0)
    texts = batch.column(1)
    ndocs = len(texts)
    out_nk = np.zeros(ndocs, dtype=np.int64)
    out_nf = np.zeros(ndocs, dtype=np.int64)
    out_sum = np.zeros(ndocs, dtype=np.int64)
    out_min = np.zeros(ndocs, dtype=np.int64)
    out_max = np.zeros(ndocs, dtype=np.int64)

    if texts.null_count:
        # Fixture documents are non-null at every SF; the expression path
        # would propagate NULL structs. Refuse loudly rather than diverge.
        raise ValueError("winnow_np: NULL text is not supported")

    data, offs = _string_bytes(texts)
    lens = offs[1:] - offs[:-1]

    # Per-doc non-ASCII detection: byte length == char length only for pure
    # ASCII; any high byte sends the doc to the exact char-semantics path.
    hi = data >= 0x80
    if hi.any():
        cs = np.concatenate([[0], np.cumsum(hi, dtype=np.int64)])
        nonascii = (cs[offs[1:]] - cs[offs[:-1]]) > 0
    else:
        nonascii = np.zeros(ndocs, dtype=bool)

    fast = (~nonascii) & (lens >= _K)
    slow_idx = np.flatnonzero(~fast)
    for d in slow_idx:
        s, e = offs[d], offs[d + 1]
        out = _fallback_doc(bytes(data[s:e]).decode("utf-8"))
        out_nk[d], out_nf[d], out_sum[d], out_min[d], out_max[d] = out

    fast_idx = np.flatnonzero(fast)
    if len(fast_idx):
        nk = lens[fast_idx] - (_K - 1)  # k-grams per fast doc
        kcum = np.concatenate([[0], np.cumsum(nk)])
        total = int(kcum[-1])
        # global k-gram start offsets into `data`
        base = np.repeat(offs[fast_idx], nk)
        within = np.arange(total, dtype=np.int64) - np.repeat(kcum[:-1], nk)
        hs_flat = md5_u60_fixed8(data, base + within)
        out_nk[fast_idx] = nk

        # sliding 4-windows, never crossing doc boundaries
        many = nk >= _W  # docs with >= w k-grams: full vector path
        many_pos = np.flatnonzero(many)
        picks_parts: list[np.ndarray] = []
        if len(many_pos):
            nwin = nk[many_pos] - (_W - 1)
            wstart = np.repeat(kcum[many_pos], nwin) + (
                np.arange(int(nwin.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(nwin) - nwin, nwin)
            )
            v = np.lib.stride_tricks.sliding_window_view(hs_flat, _W)[wstart]
            mins = v.min(axis=1)
            off = (_W - 1) - np.argmax(v[:, ::-1] == mins[:, None], axis=1)
            picks_parts.append(wstart + off)
        for j in np.flatnonzero(~many):
            s, e = kcum[j], kcum[j + 1]
            picks_parts.append(s + _winnow_picks_small(hs_flat[s:e]))
        picks = np.unique(np.concatenate(picks_parts))
        # map flat picks back to their doc (kcum is the doc boundary array)
        doc_of = np.searchsorted(kcum, picks, side="right") - 1
        vals = hs_flat[picks]
        firsts = np.searchsorted(doc_of, np.arange(len(fast_idx)), side="left")
        # every fast doc has >= 1 pick, so no empty reduceat groups
        out_nf[fast_idx] = np.bincount(doc_of, minlength=len(fast_idx))
        out_sum[fast_idx] = np.add.reduceat(vals % _MOD, firsts)
        out_min[fast_idx] = np.minimum.reduceat(vals, firsts)
        out_max[fast_idx] = np.maximum.reduceat(vals, firsts)

    return pa.RecordBatch.from_arrays(
        [
            doc_ids,
            pa.array(out_nk, type=pa.int64()),
            pa.array(out_nf, type=pa.int64()),
            pa.array(out_sum, type=pa.int64()),
            pa.array(out_min, type=pa.int64()),
            pa.array(out_max, type=pa.int64()),
        ],
        schema=OUT_SCHEMA,
    )


def winnow_stats_batches(
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """mapInArrow entry point: (doc_id, text) batches -> stats batches."""
    for batch in it:
        yield winnow_stats_batch(batch)
