"""64-bit SimHash signatures as a vectorized Arrow kernel.

Value-identical to the column-expression fold in
``functions.dedup.simhash64_rowwise_expr`` (md5 prefix-window token hashes,
±1 occurrence-weighted bit sums, >0 sign, 32-bit word split) but computed
batch-wise in NumPy behind a pandas UDF: tokenization is one byte-scan over
the Arrow string buffer, every token of the batch goes through ONE
vectorized single-block MD5 pass (``functions.md5np``), bit sums are a
``reduceat`` over the unpacked bit matrix. The expression fold runs in
Spark's *interpreted* HOF evaluator (zip_with over 64 accumulator slots per
token); this kernel does the same arithmetic ~30-50x cheaper per token and
stays a stateless per-row projection — still legal in front of
``applyInPandasWithState`` in a streaming query, still zero shuffle.

Bit-equality with the expression (and therefore with the DuckDB oracles
built on the same md5 definition) is pinned by tests/test_simhash_np.py.

Splitting on the space BYTE is exact for any UTF-8 input (0x20 never occurs
inside a multi-byte sequence, and Spark's split(text, ' ') keeps empty
tokens, as does this scan), so no ASCII fallback is needed — only tokens
longer than 55 bytes (multi-block MD5) take the hashlib path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from rtcdb_spark.functions.md5np import md5_u32_pair_var

_SIG_TYPE = StructType(
    [
        # Nullable: a NULL text propagates a NULL signature (matching the
        # expression twin) instead of failing the task — values on non-null
        # input are unchanged.
        StructField("sim_hi", LongType(), True),
        StructField("sim_lo", LongType(), True),
    ]
)


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    if pa.types.is_large_string(arr.type):
        odt: type = np.int64
    else:
        odt = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    # The data buffer is None for an empty / all-empty-string array.
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, offs


def simhash64_batch(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(sim_hi, sim_lo) int64 arrays for one Arrow string array.

    NULL entries are the caller's concern (`simhash64_sig` masks them out
    and emits NULL signatures); this kernel requires a null-free array."""
    ndocs = len(texts)
    if ndocs == 0:
        # reduceat on an empty matrix raises; the empty batch IS the answer
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if texts.null_count:
        raise ValueError("simhash_np: NULL text is not supported")
    data, offs = _string_bytes(texts)
    lo_b, hi_b = int(offs[0]), int(offs[-1])

    # --- tokenize: split on the space byte, keeping empty tokens --------
    spaces = lo_b + np.flatnonzero(data[lo_b:hi_b] == 0x20)
    tok_starts = np.sort(np.concatenate([offs[:-1], spaces + 1]))
    tok_ends = np.sort(np.concatenate([spaces, offs[1:]]))
    tok_lens = tok_ends - tok_starts
    # tokens per doc = spaces inside the doc + 1
    n_tok = (
        np.searchsorted(spaces, offs[1:]) - np.searchsorted(spaces, offs[:-1])
    ) + 1

    # --- hash every token (single-block fast path, hashlib for >55B) ----
    long_mask = tok_lens > 55
    if long_mask.any():
        h_hi = np.empty(len(tok_starts), dtype=np.int64)
        h_lo = np.empty(len(tok_starts), dtype=np.int64)
        short = ~long_mask
        sh_hi, sh_lo = md5_u32_pair_var(
            data, tok_starts[short], tok_lens[short]
        )
        h_hi[short], h_lo[short] = sh_hi, sh_lo
        for j in np.flatnonzero(long_mask):
            dig = hashlib.md5(
                bytes(data[tok_starts[j] : tok_ends[j]])
            ).hexdigest()
            h_hi[j] = int(dig[:8], 16)
            h_lo[j] = int(dig[8:16], 16)
    else:
        h_hi, h_lo = md5_u32_pair_var(data, tok_starts, tok_lens)

    # --- ±1 bit sums per doc, sign, pack -------------------------------
    h64 = (h_hi.astype(np.uint64) << np.uint64(32)) | h_lo.astype(np.uint64)
    bits = np.unpackbits(
        h64.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)  # (n_tokens, 64), column b = bit b of h64
    firsts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    sums = np.add.reduceat(2 * bits - 1, firsts, axis=0)  # (ndocs, 64)
    sig_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(sig_bits, axis=1, bitorder="little").view("<u8")[:, 0]
    sim_lo = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    sim_hi = (packed >> np.uint64(32)).astype(np.int64)
    return sim_hi, sim_lo


@F.pandas_udf(_SIG_TYPE)
def simhash64_sig(texts: pd.Series) -> pd.DataFrame:
    arr = pa.Array.from_pandas(texts, type=pa.string())
    if arr.null_count:
        # Propagate NULL text -> NULL signature, exactly like the
        # expression twin (simhash64_rowwise_expr): hash with nulls
        # blanked, then mask the outputs back to NULL.
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        sim_hi, sim_lo = simhash64_batch(arr.fill_null(""))
        hi = pd.array(sim_hi, dtype="Int64")
        lo = pd.array(sim_lo, dtype="Int64")
        hi[mask] = pd.NA
        lo[mask] = pd.NA
        return pd.DataFrame({"sim_hi": hi, "sim_lo": lo})
    sim_hi, sim_lo = simhash64_batch(arr)
    return pd.DataFrame({"sim_hi": sim_hi, "sim_lo": sim_lo})
