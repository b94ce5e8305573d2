"""Physical-plan inspection: the engine's plan-contract layer.

The reference *designed* its optimizations (sparse-index pruning, block
skipping — reference README.md:51-62) but never built them; in this engine
they come from Catalyst, so the thing to own is *verifying they fire*. These
helpers parse `.explain("formatted")` output so tests can pin plan contracts
(filters pushed to the scan, dimensions broadcast, top-k never a global
sort) and fail on performance regressions, not just wrong answers.
"""

from rtcdb_spark.plans.inspect import (  # noqa: F401
    PlanInfo,
    exchange_count,
    formatted_plan,
    inspect_plan,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "PlanInfo",
    "exchange_count",
    "formatted_plan",
    "inspect_plan",
    "pushed_filters",
    "read_schemas",
]
