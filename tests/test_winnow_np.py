"""Equivalence of the vectorized winnow kernel with its two references:

1. functions.md5np vs hashlib (bit-exact 60-bit md5-prefix values);
2. functions.winnow_np vs the pure column-expression formulation
   (functions.text.winnow_select_expr) that the DuckDB oracle mirrors —
   on the fixture corpus AND on adversarial edge documents (empty, short,
   ties, runs, non-ASCII).

The optimization round swapped text_winnow_fingerprints' implementation to
the kernel; these tests pin that the swap computes the identical result.
"""

from __future__ import annotations

import hashlib
import random
import string

import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import functions as F

from rtcdb_spark.functions.md5np import md5_u60_fixed8
from rtcdb_spark.functions.winnow_np import OUT_DDL, winnow_stats_batch, winnow_stats_batches


def test_md5np_matches_hashlib():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)  # arbitrary bytes
    starts = np.arange(0, 4992, dtype=np.int64)
    out = md5_u60_fixed8(data, starts)
    for i in range(0, len(starts), 37):
        msg = bytes(data[starts[i] : starts[i] + 8])
        assert out[i] == int(hashlib.md5(msg).hexdigest()[:15], 16)


EDGE_DOCS = [
    "",  # empty: one k-gram = md5("")
    "a",  # shorter than k
    "abcdefg",  # length k-1
    "abcdefgh",  # exactly k: one k-gram, one window
    "abcdefghi",  # k+1: two k-grams, one window
    "abcdefghijk",  # n_kgrams = w: exactly one full window
    "abcdefghijkl",  # n_kgrams = w+1: two windows
    "aaaaaaaaaaaaaaaaaaaaaaaa",  # all k-grams identical: tie-break torture
    "abababababababababababab",  # period-2 run: repeated hash values
    "café au lait café au lait et encore du café",  # non-ASCII
    "überüberüberüberüber",  # non-ASCII run
]


def _expr_reference(spark, docs: list[tuple[int, str]]):
    from rtcdb_spark.functions.text import winnow_select_expr

    sel = winnow_select_expr("text", 8, 4)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    picked = df.select(
        "doc_id",
        F.expr("greatest(length(text) - 7, 1)").cast("bigint").alias("n_kgrams"),
        F.expr(sel).alias("wf"),
    )
    fp_at = "transform(wf.picks, p -> element_at(wf.hs, p))"
    out = picked.select(
        "doc_id",
        "n_kgrams",
        F.expr("size(wf.picks)").cast("bigint").alias("n_fingerprints"),
        F.expr(
            f"aggregate({fp_at}, CAST(0 AS BIGINT), (a, f) -> a + f % 1000000007)"
        ).alias("fp_sum"),
        F.expr(f"array_min({fp_at})").alias("min_fp"),
        F.expr(f"array_max({fp_at})").alias("max_fp"),
    ).orderBy("doc_id")
    return {r.doc_id: tuple(r)[1:] for r in out.collect()}


def _kernel(docs: list[tuple[int, str]]):
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([d[0] for d in docs], type=pa.int64()),
            pa.array([d[1] for d in docs], type=pa.string()),
        ],
        names=["doc_id", "text"],
    )
    out = winnow_stats_batch(batch)
    cols = [out.column(i).to_pylist() for i in range(out.num_columns)]
    return {cols[0][i]: tuple(c[i] for c in cols[1:]) for i in range(len(cols[0]))}


def test_kernel_matches_expression_on_edges(spark):
    docs = [(i, t) for i, t in enumerate(EDGE_DOCS)]
    # random ASCII docs across the interesting length range, with a small
    # alphabet so duplicate k-grams (hash ties) actually occur
    rng = random.Random(42)
    for i in range(60):
        n = rng.randint(0, 120)
        alpha = "ab " if i % 3 == 0 else string.ascii_lowercase + " "
        docs.append((100 + i, "".join(rng.choice(alpha) for _ in range(n))))
    assert _kernel(docs) == _expr_reference(spark, docs)


def test_kernel_matches_expression_on_fixture(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    docs = [(r.doc_id, r.text) for r in df.select("doc_id", "text").collect()]
    assert _kernel(docs) == _expr_reference(spark, docs)


def test_query_runs_via_map_in_arrow(spark, sf_smoke):
    """The registered query returns the kernel's plan (ArrowEvalPython-free
    scan -> MapInArrow) and its rows match the expression reference."""
    from rtcdb_spark.queries import REGISTRY

    df = REGISTRY["text_winnow_fingerprints"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    rows = {r.doc_id: tuple(r)[1:] for r in df.collect()}
    src = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    docs = [(r.doc_id, r.text) for r in src.select("doc_id", "text").collect()]
    assert rows == _expr_reference(spark, docs)


def test_kernel_rejects_null_text():
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1], type=pa.int64()), pa.array([None], type=pa.string())],
        names=["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="NULL text"):
        winnow_stats_batch(batch)


def test_out_ddl_matches_schema():
    names = [f.split()[0] for f in OUT_DDL.split(", ")]
    assert names == [
        "doc_id",
        "n_kgrams",
        "n_fingerprints",
        "fp_sum",
        "min_fp",
        "max_fp",
    ]
    # generator form consumes and yields per batch
    b = pa.RecordBatch.from_arrays(
        [pa.array([1], type=pa.int64()), pa.array(["hello world"], type=pa.string())],
        names=["doc_id", "text"],
    )
    outs = list(winnow_stats_batches(iter([b])))
    assert len(outs) == 1 and outs[0].num_rows == 1
