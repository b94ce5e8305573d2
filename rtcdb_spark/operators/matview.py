"""Incremental materialized-view maintenance for self-maintainable
aggregates (count / sum / min / max over append-only deltas).

The classic IVM result (Gupta & Mumick, "Maintenance of Materialized
Views: Problems, Techniques, and Applications", IEEE DE Bulletin 1995):
distributive aggregates over an append-only source can be maintained from
the delta alone — ``agg(R ∪ Δ) = merge(agg(R), agg(Δ))`` — so a refresh
costs O(Δ) + O(|view|), never a rescan of R. Paired with
``VersionedTable.changes`` (the O(new-files) manifest-diff read) this
gives end-to-end incremental rollup refresh over the commit log: at
100 TB the refresh reads only the files the new commits added, and the
merge shuffles only view-sized and delta-sized rows on the group key.

COUNT is maintained as a SUM of partial counts; AVG callers keep
(count, decimal-sum) in the state and divide at read time — the same
decomposition Spark's own partial aggregation uses. MIN/MAX are
append-only-safe only (deletes would need a rescan — documented, not
hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum", "min", "max"}


def merge_agg_state(
    state: DataFrame | None,
    delta_agg: DataFrame,
    keys: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """Fold one delta's partial aggregate into the view state.

    ``merges`` maps each value column to its merge function: ``sum`` (also
    the merge of COUNT partials), ``min`` or ``max``. ``state=None`` (first
    refresh) returns the delta aggregate unchanged. Exactness: pass sums as
    DECIMAL columns and the merge stays associative/exact at any depth;
    cast to double only when serving.
    """
    bad = set(merges.values()) - _MERGEABLE
    if bad:
        raise ValueError(f"non-mergeable aggregate(s): {sorted(bad)}")
    if state is None:
        return delta_agg
    merged = state.unionByName(delta_agg)
    return merged.groupBy(*keys).agg(
        *[getattr(F, how)(c).alias(c) for c, how in merges.items()]
    )
