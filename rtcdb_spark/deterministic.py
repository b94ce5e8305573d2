"""Numeric-determinism helpers (shared by batch queries and streaming).

Cross-engine hash-parity with DuckDB requires results that are *bit-identical*
regardless of execution order. Floating-point SUM/AVG are order-dependent, so
every money aggregate goes through a DECIMAL cast first:

- per-row double arithmetic (``price * (1 - discount)``) is IEEE-deterministic
  and identical on both engines when written identically;
- casting the per-row double to DECIMAL(p, s) rounds it identically on both
  engines *provided* the unscaled value fits double-exact range: |v|·10^s
  < 2^53. Outside that regime (e.g. scale 18 on sub-1.0 scores) DuckDB's
  cast multiplies in double space and diverges from Spark's BigDecimal cast
  by ±1 ulp on ~half of inputs — so keep scale ≤ 15 for values < 1 and
  scale ≤ 2-4 for money magnitudes;
- DECIMAL addition is exact and associative → any aggregation order (Spark's
  partial/final partials, DuckDB's parallel groups) yields the same total;
- the final cast back to DOUBLE is exact for |v| < 2^53.

AVG is computed as exact-decimal-sum divided by count — one double division of
two identical operands — rather than engine-native AVG (order-dependent).

This lives outside the ``queries`` package so modules that must stay
importable on executors (e.g. streaming state functions) can use it without
triggering the query-registry package __init__.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(
    col: Column | str,
    scale: int = 2,
    alias: str | None = None,
    precision: int = 18,
) -> Column:
    """Order-independent SUM of a money-ish double via exact DECIMAL addition.

    ``precision``/``scale`` size the per-row quantization: money uses the
    default ``(18, 2)``; high-resolution scores (PageRank contributions, BM25
    terms) use e.g. ``(38, 15)`` so the 1e-15 quantum sits far below the
    final display rounding while the integer headroom still cannot overflow.
    Cross-engine cast identity requires |v|·10^scale < 2^53 — for sub-1.0
    scores that caps scale at ~15; scale 18 is only statistically identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
