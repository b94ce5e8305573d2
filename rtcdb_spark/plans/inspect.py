"""Parse Spark physical plans into checkable facts.

Works on the pre-execution AQE plan (`isFinalPlan=false`): scan-level facts
(pushed filters, read schemas) and plan-shape facts (join strategies,
exchanges, top-k operators) are all visible there.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """One entry per parquet scan: the scan's PushedFilters list (raw text,
    '' if nothing pushed)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """One entry per parquet scan: the column names actually read."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles/broadcasts) in the plan tree
    listing — counts physical data movement points."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\s*\(\d+\)\s+Exchange", plan, flags=re.M)) + len(
        re.findall(r"^\s*\(\d+\)\s+BroadcastExchange", plan, flags=re.M)
    )


@dataclass
class PlanInfo:
    plan: str
    pushed: list[str]
    schemas: list[list[str]]
    broadcast_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    cartesian_products: int
    nested_loop_joins: int
    shuffle_exchanges: int
    broadcast_exchanges: int
    has_take_ordered: bool
    has_partial_agg: bool

    def describe(self) -> str:  # compact one-line summary for assertions
        return (
            f"bhj={self.broadcast_joins} smj={self.sort_merge_joins} "
            f"shj={self.shuffled_hash_joins} cartesian={self.cartesian_products} "
            f"bnlj={self.nested_loop_joins} shuffles={self.shuffle_exchanges} "
            f"topk={self.has_take_ordered} partial_agg={self.has_partial_agg}"
        )


def inspect_plan(df: DataFrame) -> PlanInfo:
    plan = formatted_plan(df)
    return PlanInfo(
        plan=plan,
        pushed=pushed_filters(df),
        schemas=read_schemas(df),
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        shuffle_exchanges=len(
            re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan)
        ),
        broadcast_exchanges=plan.count("BroadcastExchange"),
        has_take_ordered="TakeOrderedAndProject" in plan,
        has_partial_agg="partial_" in plan,
    )
