"""Equivalence of the vectorized SimHash kernel with the column-expression
fold it replaced on the hot paths (optimization round 12).

`simhash64_rowwise` (kernel, pandas UDF over functions.simhash_np) must be
bit-identical to `simhash64_rowwise_expr` (interpreted HOF fold — the
pre-optimization implementation, and the definition the DuckDB oracles
replay) on the fixture corpus and on adversarial edge documents.
"""

from __future__ import annotations

import hashlib
import random
import string

import pyarrow as pa
import pytest

from rtcdb_spark.functions.dedup import simhash64_rowwise, simhash64_rowwise_expr
from rtcdb_spark.functions.simhash_np import simhash64_batch

EDGE_DOCS = [
    "",  # one empty token
    " ",  # two empty tokens
    "  a  b ",  # runs of spaces -> empty tokens interleaved
    "hello",
    "hello world",
    "a " * 500,  # many duplicate tokens (frequency weighting)
    "word" * 20,  # 80-byte token: beyond the single-block fast path
    "café über naïve — ❄ tokens",  # multi-byte UTF-8
    "x" * 55,  # exactly at the single-block boundary
    "y" * 56,  # one past it
]


def _by_expr(spark, docs):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {
        r.doc_id: (r.sim_hi, r.sim_lo)
        for r in simhash64_rowwise_expr(df).collect()
    }


def _by_kernel(spark, docs):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {
        r.doc_id: (r.sim_hi, r.sim_lo) for r in simhash64_rowwise(df).collect()
    }


def test_kernel_matches_expression_on_edges(spark):
    docs = [(i, t) for i, t in enumerate(EDGE_DOCS)]
    rng = random.Random(7)
    for i in range(40):
        n = rng.randint(0, 200)
        alpha = string.ascii_lowercase + "   "  # extra spaces: empty tokens
        docs.append((100 + i, "".join(rng.choice(alpha) for _ in range(n))))
    assert _by_kernel(spark, docs) == _by_expr(spark, docs)


def test_kernel_matches_expression_on_fixture(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    docs = [(r.doc_id, r.text) for r in df.select("doc_id", "text").collect()]
    assert _by_kernel(spark, docs) == _by_expr(spark, docs)


def test_batch_kernel_matches_hashlib_reference():
    """Direct NumPy-kernel check against a per-token hashlib replay."""
    texts = ["the quick brown fox", "", "a a a b", "tok " * 9]
    arr = pa.array(texts, type=pa.string())
    hi, lo = simhash64_batch(arr)
    for d, text in enumerate(texts):
        sums = [0] * 64
        for tok in text.split(" "):
            dig = hashlib.md5(tok.encode()).hexdigest()
            t_hi, t_lo = int(dig[:8], 16), int(dig[8:16], 16)
            h = (t_hi << 32) | t_lo
            for b in range(64):
                sums[b] += 1 if (h >> b) & 1 else -1
        want_lo = sum(1 << b for b in range(32) if sums[b] > 0)
        want_hi = sum(1 << (b - 32) for b in range(32, 64) if sums[b] > 0)
        assert (hi[d], lo[d]) == (want_hi, want_lo), (d, text)


def test_kernel_rejects_null_text():
    with pytest.raises(ValueError, match="NULL text"):
        simhash64_batch(pa.array(["a", None], type=pa.string()))


def test_extra_cols_ride_along(spark):
    df = spark.createDataFrame(
        [(1, "hello world", 42)], "doc_id bigint, text string, ts bigint"
    )
    out = simhash64_rowwise(df, extra_cols=["ts"])
    assert out.columns == ["doc_id", "ts", "sim_hi", "sim_lo"]
    assert out.collect()[0].ts == 42
