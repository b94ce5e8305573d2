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
_STATE_SCHEMA = "n LONG, total_cents LONG"


def _to_cents(v: float) -> int:
    """Quantize one double to integer cents with HALF_UP on its exact binary
    expansion — bit-identical to both engines' double→DECIMAL(18,2) cast
    (Spark BigDecimal.setScale, DuckDB decimal cast), so integer-cent state
    makes the streaming fold order-independent AND cross-engine exact."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP).scaleb(2))


def _cents_sum(vals: "pd.Series") -> int:
    """Vectorized exact cent-sum of a double column (VERDICT r3 item 4 —
    replaces a per-row Decimal loop). ``floor(v*100 + 0.5)`` decides every
    value whose remainder is far from the .5 tie; the float product's
    absolute error is ≤ |v|·100·2⁻⁵² < 1e-6 for |v| ≤ 1e7, so only values
    within 1e-6 of a tie (or huge/non-finite — where the product itself may
    round) can be mis-decided, and exactly those fall back to the per-value
    Decimal path. Result is therefore bit-identical to mapping ``_to_cents``
    over every value, at numpy speed for the overwhelming majority."""
    import numpy as np

    a = vals.to_numpy(dtype="float64")
    if not len(a):
        return 0
    c = a * 100.0
    fl = np.floor(c)
    rem = c - fl
    exact_path = (np.abs(rem - 0.5) >= 1e-6) & (np.abs(a) <= 1e7) & np.isfinite(a)
    fast = np.where(rem >= 0.5, fl + 1.0, fl)
    total = int(fast[exact_path].sum())  # integer-valued floats < 2^53: exact
    for v in a[~exact_path]:
        total += _to_cents(float(v))
    return total


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into (count, cent-sum)
    state and emit the updated running totals — one output row per key per
    batch. Integer-cent state: exact, associative, replay-stable (a float
    accumulator would drift with batch boundaries and retries)."""
    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        total_cents += _cents_sum(pdf["value"])
    state.update((n, total_cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_cents / 100.0],
        }
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


def transform_with_state_available() -> bool:
    """`transformWithStateInPandas` needs the protobuf runtime (its driver
    worker speaks protobuf to the JVM); absent here, so the operator is
    import-gated per the environment contract (no pip installs)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_user_value_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user running (count, sum, min, max) of `value` via the
    `transformWithStateInPandas` stateful-processor API — the successor to
    `applyInPandasWithState` with typed, composable state primitives
    (ValueState here; ListState/MapState and per-key timers are the same
    handle). Same scale property as above: one fixed-size ValueState row per
    user in the partitioned state store, O(#keys) state forever.

    Requires the protobuf runtime (see `transform_with_state_available`);
    the functional twin on the always-available API is
    `stream_user_running_totals`. Equivalent batch query:
    ``events.groupBy("user_id").agg(count(*), sum(value), min(value),
    max(value))`` — checked multi-batch in tests/test_streaming.py when the
    runtime supports it.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ValueStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n LONG, total DOUBLE, vmin DOUBLE, vmax DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, vmin, vmax = (
                self._state.get() if self._state.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                n += int(len(pdf))
                total += float(pdf["value"].sum())
                bmin, bmax = float(pdf["value"].min()), float(pdf["value"].max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
            self._state.update((n, total, vmin, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "min_value": [vmin],
                    "max_value": [vmax],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_ValueStats(),
            outputStructType=(
                "user_id LONG, n_events LONG, total_value DOUBLE, "
                "min_value DOUBLE, max_value DOUBLE"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
