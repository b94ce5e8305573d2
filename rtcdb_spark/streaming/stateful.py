"""Arbitrary stateful streaming (SURVEY §2 C-VIII: `applyInPandasWithState`).

The reference has no streaming or state at all (SURVEY §3 — no threads, no
async); this is north-star surface. The operator below keeps one fixed-size
state row per key in the state store, so state scales with #distinct keys
(sharded across shuffle partitions / executors), NOT with event volume —
the property that lets it run forever on an unbounded stream.

Python state updates run Arrow-batched (one pandas DataFrame per key per
micro-batch), not per-row — the pandas-UDF fast path.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING, Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"
_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into (count, sum) state and
    emit the updated running totals — one output row per key per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        total += float(pdf["value"].sum()) if len(pdf) else 0.0
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stream_user_running_totals(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Per-user running (count, sum(value)) via arbitrary state.

    Each micro-batch emits the updated totals for every user seen in that
    batch (`update` semantics). Equivalent batch query: ``events.groupBy(
    "user_id").agg(count(*), sum(value))`` — the streaming form trades the
    final-only answer for continuous per-batch answers with O(#users) state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
