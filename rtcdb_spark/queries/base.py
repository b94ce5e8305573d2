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


# --- deterministic aggregate builders (re-exported; see rtcdb_spark.deterministic)
from rtcdb_spark.deterministic import davg, dsum, sql_davg, sql_dsum  # noqa: E402,F401
