"""Distributed sequential-scan primitives: global cumulative aggregates and
lag without a single-partition sort.

An unpartitioned ``Window.orderBy(...)`` is correct but collapses to ONE
task — fine at sf0.1, fatal on a 1000-executor cluster. The classic fix
(vector prefix-scan, Blelloch; the same stitch ``skyline_2d`` uses) is a
two-level scheme:

1. stamp each row with a DETERMINISTIC range-bucket id: quantile
   boundaries of the order key are computed once (one tiny aggregate,
   n_partitions-1 values collected to the driver) and injected as literal
   comparisons, so the bucket id is a pure function of the row — every
   plan branch sees the same assignment by construction, with no persist /
   checkpoint barrier (round 5: the materialization barrier used before
   either leaked CacheManager entries or paid an extra write-read job;
   a deterministic expression needs neither, and equal keys co-locate
   because equal values bucket identically);
2. run the sequential operator per bucket (parallel across buckets — the
   window/groupBy hash-shuffles on the bucket id);
3. reduce each bucket to one summary row (sum / last value), prefix-scan
   those ``n_partitions`` rows in a single bounded-size task, and
   broadcast the per-bucket carry back in.

Total cost: one boundary aggregate + one hash exchange per branch over the
data (Catalyst reuses the shared upstream exchange across branches) + one
n_partitions-row side plan — the shape survives 100 TB because no task
ever sees more than one bucket of rows.

Determinism caveat: like any ordered cumulative window, results are only
deterministic when the order key is unique per row (or the caller accepts
tie-order-dependent intermediate prefixes). The query layer always orders
by a unique key (``o_orderkey``, distinct values). Bucket boundaries are
approximate quantiles — they affect load balance only, never results (the
stitch is exact for ANY bucketing that respects key order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _range_bucket(
    df: DataFrame,
    order_col: str,
    n_partitions: int,
    bounds_from: DataFrame | None = None,
) -> Column:
    """A deterministic range-bucket id for ``order_col`` (numeric): the
    count of quantile boundaries strictly below the value. Boundaries are
    collected ONCE (n_partitions-1 scalars) and injected as literals, so
    the returned expression is a pure row function — safe to evaluate
    independently in any number of plan branches. Values equal to a
    boundary fall in the lower bucket, so equal keys always co-locate.

    ``bounds_from`` optionally supplies a CHEAPER frame with the same
    ``order_col`` to sample boundaries from — e.g. the raw fact table
    instead of an aggregated value domain (skips the aggregation shuffle
    in the boundary job; measured 3x cheaper on the KS query). Boundaries
    affect load balance only, never results, so any distribution-similar
    source is sound."""
    qs = [i / n_partitions for i in range(1, n_partitions)]
    src = bounds_from if bounds_from is not None else df
    row = src.select(
        F.percentile_approx(F.col(order_col), qs, 10_000).alias("b")
    ).first()
    bounds = sorted({b for b in (row["b"] or []) if b is not None})
    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    return pid


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    n_partitions: int = 32,
    prefix: str = "cum_",
    bounds_from: DataFrame | None = None,
) -> DataFrame:
    """Inclusive global running SUM of each value column in ``order_col``
    order, as ``<prefix><name>`` columns, with no single-partition sort.
    ``bounds_from``: see ``_range_bucket``.
    """
    pts = df.withColumn(
        "_pid", _range_bucket(df, order_col, n_partitions, bounds_from)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scanned = pts
    for c in value_cols:
        scanned = scanned.withColumn(f"_loc_{c}", F.sum(c).over(w_local))
    # One row per non-empty bucket; the exclusive prefix over these runs
    # in a window bounded by n_partitions, not by the data.
    totals = pts.groupBy("_pid").agg(
        *[F.sum(c).alias(f"_tot_{c}") for c in value_cols]
    )
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    carry = totals.select(
        "_pid",
        *[F.sum(f"_tot_{c}").over(w_prefix).alias(f"_carry_{c}") for c in value_cols],
    )
    out = scanned.join(F.broadcast(carry), "_pid")
    for c in value_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.col(f"_loc_{c}") + F.coalesce(F.col(f"_carry_{c}"), F.lit(0)),
        ).drop(f"_loc_{c}", f"_carry_{c}")
    return out.drop("_pid")


def distributed_lag(
    df: DataFrame,
    order_col: str,
    value_col: Column | str,
    out_col: str = "prev",
    n_partitions: int = 32,
) -> DataFrame:
    """Global ``lag(value_col, 1)`` in ``order_col`` order without a global
    sort: per-bucket lag + a boundary stitch that hands each bucket's
    LAST value to the FIRST row of the next non-empty bucket. The global
    first row keeps NULL, matching ``F.lag`` semantics.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    with_v = df.withColumn("_v", val)
    pts = with_v.withColumn("_pid", _range_bucket(df, order_col, n_partitions))
    w_local = Window.partitionBy("_pid").orderBy(order_col)
    scanned = pts.withColumn("_loc_prev", F.lag("_v").over(w_local)).withColumn(
        "_rn", F.row_number().over(w_local)
    )
    # Last value of each non-empty bucket, shifted to the next one.
    lasts = pts.groupBy("_pid").agg(
        F.max_by("_v", F.col(order_col)).alias("_last_v")
    )
    w_pid = Window.orderBy("_pid")
    boundary = lasts.select(
        "_pid", F.lag("_last_v").over(w_pid).alias("_prev_last")
    )
    out = scanned.join(F.broadcast(boundary), "_pid")
    return out.withColumn(
        out_col,
        F.when(F.col("_rn") == 1, F.col("_prev_last")).otherwise(
            F.col("_loc_prev")
        ),
    ).drop("_pid", "_v", "_loc_prev", "_rn", "_prev_last")
