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


_TREE_LINE = re.compile(r"^(?P<prefix>[\s:+\-*]*)(?P<name>[A-Za-z][\w .]*?)\s*\((?P<id>\d+)\)\s*$")

# Operators that bound the cardinality of whatever flows through them —
# a broadcast subtree containing one of these is size-bounded even if it
# scans an unbounded fact table.
_BOUNDING_OPS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def scan_tables(plan: str) -> dict[str, str]:
    """Map scan node id → table name, from the formatted plan's details
    section (the Location line names the parquet path)."""
    out: dict[str, str] = {}
    for m in re.finditer(
        r"\((\d+)\) Scan parquet[^\n]*\n(?:.*\n)*?Location:[^\n]*?(\w+)\.parquet",
        plan,
    ):
        out[m.group(1)] = m.group(2)
    return out


# First column of each fixture table — identifies a logical `Relation
# [cols] parquet` line, which (unlike the physical plan) carries no path.
_FIRST_COL_TO_TABLE = {
    "r_regionkey": "region",
    "n_nationkey": "nation",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "l_orderkey": "lineitem",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def _logical_tree(text: str) -> list[tuple[int, str]]:
    """(depth, node_text) per line of a logical plan string. Spark indents
    each tree level by 3 chars drawn from ':- ', '+- ', ':  ', '   '."""
    out = []
    for line in text.splitlines():
        stripped = line.lstrip(" :+-")
        if not stripped:
            continue
        depth = (len(line) - len(stripped)) // 3
        out.append((depth, stripped))
    return out


def broadcast_fact_violations(df: DataFrame, fact_tables: set[str]) -> list[str]:
    """Scale contract: no broadcast *hint* may force an unbounded fact-table
    relation (one that grows with corpus size) to the build side of a join.

    This is exactly the failure class of a node-sized `F.broadcast(ranks)`:
    correct and fast at test scale, OOM at 10^9 rows. Only hinted broadcasts
    count — at test scale the planner legitimately broadcasts fact tables
    because their stats ARE small, and the identical plan re-derives to a
    shuffle join at production stats; a hint overrides stats at every scale.

    The hinted join side is located in the optimized logical plan
    (`leftHint`/`rightHint=(strategy=broadcast)`); its subtree is unbounded
    unless an Aggregate, a Limit, or an IN-list filter (bounded key lookup)
    sits between the hint and the fact relation. Caveat: a grouped Aggregate
    on a high-cardinality key (distinct doc ids) still reads as "bounded" —
    group-key cardinality is not derivable from the plan text."""
    try:
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return []  # logical plan unavailable (connect mode) → nothing to check
    if "strategy=broadcast" not in optimized:
        return []
    tree = _logical_tree(optimized)
    violations = []
    for i, (depth, node) in enumerate(tree):
        if "strategy=broadcast" not in node:
            continue
        # Children of the join: consecutive depth+1 subtrees following it.
        child_spans: list[list[tuple[int, str]]] = []
        j = i + 1
        while j < len(tree) and tree[j][0] > depth:
            if tree[j][0] == depth + 1:
                child_spans.append([])
            if child_spans:
                child_spans[-1].append(tree[j])
            j += 1
        hinted_sides = []
        if "leftHint=(strategy=broadcast" in node and child_spans:
            hinted_sides.append(child_spans[0])
        if "rightHint=(strategy=broadcast" in node and len(child_spans) > 1:
            hinted_sides.append(child_spans[-1])
        for side in hinted_sides:
            facts = []
            bounded = False
            for _, n in side:
                if n.startswith("Relation"):
                    first_col = n.split("[", 1)[-1].split("#", 1)[0].strip()
                    t = _FIRST_COL_TO_TABLE.get(first_col)
                    if t in fact_tables:
                        facts.append(t)
                if n.startswith(("Aggregate", "GlobalLimit", "LocalLimit")) or (
                    # bounded key lookup: IN-list (Catalyst rewrites long
                    # lists to INSET) or equality to a literal (1-row case)
                    n.startswith("Filter")
                    and (
                        " IN (" in n
                        or " INSET " in n
                        or re.search(r"= \d+(\.\d+)?\)", n)
                    )
                ):
                    bounded = True
            if facts and not bounded:
                violations.append(
                    f"broadcast hint forces unbounded fact relation(s) {facts}: "
                    + node[:120]
                )
    return violations


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
