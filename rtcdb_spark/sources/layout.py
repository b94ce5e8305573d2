"""Physical data layout for the 100 TB deployment: partitioned writes,
partition pruning, and small-file compaction.

The reference's entire performance design is physical layout — per-column
files (reference README.md:10), block compression (README.md:11), sparse
min/max indexes (README.md:12), and a sorted-table contract (README.md:44).
At cluster scale the industrial equivalents are, in order of pruning power:

1. **Hive-style partition directories** (``partitionBy``): a predicate on the
   partition column eliminates whole directories at *planning* time — no file
   is even listed. This is the coarsest and cheapest index; at 100 TB an
   events table partitioned by day turns a one-week query into a 7-directory
   scan regardless of total history.
2. **Parquet row-group min/max stats** on sort columns (the reference's
   sparse index, built into the format) — pruning *within* surviving files.
3. **Bucketing** (``tables.write_bucketed``) — shuffle elimination for joins.

Compaction exists because partitioned streaming/append ingest produces many
small files (one per task per micro-batch); parquet overhead and task
scheduling cost scale with file *count*, not bytes. ``compact`` rewrites a
table to target-size files without changing its logical content.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a Hive-partitioned parquet table.

    ``partition_cols`` become directory levels (coarse pruning);
    ``sort_cols`` are sorted *within* each output file so parquet row-group
    min/max stats stay selective on them (fine pruning — the reference's
    sorted-table contract, README.md:44, enforced at write time).
    ``maxRecordsPerFile`` caps file size so a hot partition still splits
    into parallelizable, memory-bounded scan tasks.
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    target_records_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """Rewrite a parquet table with fewer, larger files; returns
    (files_before, files_after).

    Logical content is unchanged (asserted in tests); only the file layout
    is. Writes to ``dst_path`` rather than in place — an in-place rewrite
    would race the scan reading the same files (on a cluster, compact to a
    new location and swap, or use a table format with ACID rewrite).
    The repartition count comes from the actual row count, so output files
    land near ``target_records_per_file`` regardless of input skew.
    """
    df = spark.read.parquet(src_path)
    files_before = _parquet_file_count(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_records_per_file))  # ceil div
    if partition_cols:
        write_partitioned(
            df, dst_path, partition_cols, sort_cols,
            max_records_per_file=target_records_per_file,
        )
    else:
        out = df.repartition(n_files)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").option(
            "maxRecordsPerFile", target_records_per_file
        ).parquet(dst_path)
    return files_before, _parquet_file_count(dst_path)


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> "F.Column":
    """Z-order (Morton) curve value over numeric columns, as a pure column
    expression (JVM-side, codegen-friendly — no UDF).

    Lexicographic sort clusters only the *leading* sort column: row-group
    min/max stats on the second column span the full domain, so predicates
    on it prune nothing. Interleaving the bits of all columns into one sort
    key bounds every column's range within each row group — min/max pruning
    works on all dimensions at once. This is the multi-column generalization
    of the reference's sorted-table contract (reference README.md:44: first
    column = the only indexed dimension).

    Each column is min/max-normalized to ``bits`` bits (one tiny 2-value
    aggregate per column — scalar driver work, not a data collect), then the
    bit-interleave unrolls into shift/or arithmetic. ncols × bits must be
    ≤ 63 to fit a signed long.
    """
    ncols = len(cols)
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a signed long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top + 1)),
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, v in enumerate(scaled):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    max_records_per_file: int = 1_000_000,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet globally sorted along the Z-order curve of
    ``zorder_cols`` so row-group stats prune on every listed column."""
    z = zorder_value(df, zorder_cols, bits=bits)
    out = df.withColumn("_z", z)
    out = out.repartitionByRange(n_files, "_z") if n_files else out.repartitionByRange("_z")
    (
        out.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def _parquet_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def hilbert_value(df: DataFrame, cols: list[str], bits: int = 16) -> "F.Column":
    """2-D Hilbert curve index over two numeric columns.

    The Hilbert curve preserves locality strictly better than the Morton
    (Z-order) curve: consecutive curve positions are always adjacent cells
    (Morton takes long diagonal jumps at quadrant boundaries), so files cut
    from contiguous curve ranges have tighter per-dimension min/max boxes —
    the same reason Delta's liquid clustering moved from Z-order to Hilbert.
    Columns are min/max-normalized to ``bits`` bits exactly like
    :func:`zorder_value` (codegen column expressions); the xy→d transform
    is Hamilton's standard rotate/reflect fold over bit planes, computed as
    a vectorized NumPy loop behind a pandas UDF (round-12 optimization:
    the former `aggregate` fold over a named_struct accumulator ran in the
    interpreted HOF evaluator at ~16 struct allocations per row — pure
    integer math, so the kernel is exact; the full-grid reference test in
    tests/test_layout.py pins the values). 2·bits ≤ 62 keeps d in a
    signed long.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_value supports exactly 2 columns")
    if 2 * bits > 62:
        raise ValueError(f"2 x {bits} bits exceeds a signed long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    norm = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = (hi - lo) or 1.0
        norm.append(
            F.expr(
                f"CAST(least({top}, floor((CAST({c} AS DOUBLE) - {lo!r}) "
                f"/ {span!r} * {top + 1})) AS BIGINT)"
            )
        )

    @F.pandas_udf("long")
    def _hilbert_d(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return _hilbert_d_arrays(xs, ys, bits)

    return _hilbert_d(norm[0], norm[1])


def _hilbert_d_arrays(xs: "pd.Series", ys: "pd.Series", bits: int) -> "pd.Series":
    """Vectorized Hamilton xy→d transform over normalized coordinates.

    NULL/NaN coordinates can't arise from `hilbert_value`'s own norm
    expression (Spark's `least` absorbs a NULL input into the top cell),
    but callers feeding the kernel directly may pass them: to_numpy(int64)
    would raise and fail the whole task, so mask them out and return NULL
    d for those rows (repartitionByRange sorts NULLS FIRST, same as the
    zorder expression twin would for an explicitly NULL key)."""
    import numpy as np
    import pandas as pd

    na = xs.isna() | ys.isna()
    if na.any():
        x_in = xs.fillna(0)
        y_in = ys.fillna(0)
    else:
        x_in, y_in = xs, ys
    x = x_in.to_numpy(dtype=np.int64, copy=True)
    y = y_in.to_numpy(dtype=np.int64, copy=True)
    d = np.zeros(len(x), dtype=np.int64)
    for i in range(bits - 1, 0 - 1, -1):
        s = np.int64(1 << i)
        rx = ((x & s) != 0).astype(np.int64)
        ry = ((y & s) != 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate/reflect the sub-quadrant where ry == 0
        m = ry == 0
        refl = m & (rx == 1)
        x_new = np.where(m, np.where(refl, s - 1 - y, y), x)
        y_new = np.where(m, np.where(refl, s - 1 - x, x), y)
        x, y = x_new, y_new
    out = pd.Series(d)
    if na.any():
        out = out.astype("Int64")
        out[na.to_numpy()] = pd.NA
    return out
