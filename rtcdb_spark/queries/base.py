"""Query registry plus numeric-determinism helpers.

Cross-engine hash-parity with DuckDB requires results that are *bit-identical*
regardless of execution order. Floating-point SUM/AVG are order-dependent, so
every money aggregate goes through a DECIMAL cast first:

- per-row double arithmetic (``price * (1 - discount)``) is IEEE-deterministic
  and identical on both engines when written identically;
- casting the per-row double to DECIMAL(18, s) rounds it identically;
- DECIMAL addition is exact and associative → any aggregation order (Spark's
  partial/final partials, DuckDB's parallel groups) yields the same total;
- the final cast back to DOUBLE is exact for |v| < 2^53.

AVG is computed as exact-decimal-sum divided by count — one double division of
two identical operands — rather than engine-native AVG (order-dependent).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Register a named query; the decorated function is the Spark side."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


# --- deterministic aggregate builders (Spark side) -------------------------


def dsum(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent SUM of a money-ish double via exact DECIMAL addition."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
