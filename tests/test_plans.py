"""Plan-contract tests: the optimizations SCALE.md claims must actually fire.

These fail on *performance* regressions (lost pushdown, a dimension join
degrading to sort-merge, top-k becoming a global sort), independent of
result correctness.
"""

from __future__ import annotations

from rtcdb_spark.plans import inspect_plan
from rtcdb_spark.queries import REGISTRY


def _plan(spark, sf_smoke, name):
    return inspect_plan(REGISTRY[name].fn(spark, sf_smoke))


def test_q1_pushdown_and_partial_agg(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "q1_pricing_summary")
    assert any("l_shipdate" in f for f in p.pushed), p.pushed
    # column pruning: far fewer columns than the 11 in lineitem
    assert all(len(cols) <= 7 for cols in p.schemas), p.schemas
    assert p.has_partial_agg, p.describe()
    assert p.sort_merge_joins == 0 and p.cartesian_products == 0, p.describe()


def test_q3_broadcast_star_and_topk(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "q3_shipping_priority")
    # every scan has a pushed filter; dimension joins broadcast; top-k never
    # becomes a global sort
    assert all(f for f in p.pushed), p.pushed
    assert p.broadcast_joins >= 2, p.describe()
    assert p.sort_merge_joins == 0, p.describe()
    assert p.has_take_ordered, p.describe()


def test_q19_disjunction_pushed_both_sides(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "q19_disjunctive_predicates")
    assert any("l_quantity" in f and "Or(" in f for f in p.pushed), p.pushed
    assert any("p_brand" in f and "Or(" in f for f in p.pushed), p.pushed
    assert p.broadcast_joins >= 1 and p.cartesian_products == 0, p.describe()


def test_scan_projection_pruned(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "scan_filter_project")
    assert all(len(cols) <= 6 for cols in p.schemas), p.schemas  # 11 in lineitem
    assert any(f for f in p.pushed), p.pushed


def test_q7_all_dimensions_broadcast(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "q7_volume_shipping")
    # supplier, customer, nation×2 broadcast; lineitem↔orders is the only
    # shuffle join allowed
    assert p.broadcast_joins >= 4, p.describe()
    assert p.cartesian_products == 0 and p.nested_loop_joins == 0, p.describe()


def test_similarity_topk_no_corpus_shuffle(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "similarity_cosine_topk")
    # query set broadcast against corpus scan: the non-equi self join must be
    # a broadcast nested-loop against the tiny query side, never cartesian
    assert p.cartesian_products == 0, p.describe()
    assert p.broadcast_exchanges >= 1, p.describe()


def test_window_topk_single_shuffle(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "window_topk_per_group")
    assert p.sort_merge_joins == 0 and p.cartesian_products == 0, p.describe()


def test_contamination_benchmark_broadcast(spark, sf_smoke):
    # the corpus-side gram stream must join the benchmark gram set via
    # broadcast — a shuffle here would move the (100 TB) corpus
    p = _plan(spark, sf_smoke, "text_contamination")
    assert p.broadcast_joins >= 1, p.describe()
    assert p.sort_merge_joins == 0, p.describe()


def test_profiler_single_scan(spark, sf_smoke):
    # ONE parquet scan feeds all per-column aggregates (vs one scan per
    # column); the formatted plan names each scan once in the tree and once
    # in the node-details section
    import re

    p = _plan(spark, sf_smoke, "profile_columns")
    scans = re.findall(r"^\(\d+\) Scan parquet", p.plan, flags=re.M)
    assert len(scans) == 1, p.plan


def test_chunking_is_map_only(spark, sf_smoke):
    # explode + slice chunking must add no shuffle beyond the display sort
    p = _plan(spark, sf_smoke, "text_chunk_overlap")
    assert p.shuffle_exchanges <= 1, p.describe()  # the final orderBy only
    assert "Scan parquet" in p.plan and p.sort_merge_joins == 0


def test_pii_redact_map_only(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "text_pii_redact")
    assert p.shuffle_exchanges <= 1, p.describe()  # final orderBy only
    assert p.broadcast_exchanges == 0, p.describe()


def test_bm25_stats_broadcast(spark, sf_smoke):
    # df/corpus stats join back into the scoring pass as broadcasts; the
    # only shuffles are the aggregates themselves
    p = _plan(spark, sf_smoke, "text_bm25_search")
    assert p.broadcast_joins + p.nested_loop_joins >= 2, p.describe()
    assert p.sort_merge_joins == 0, p.describe()
    assert p.has_take_ordered, p.describe()


def test_weighted_sample_topk_no_global_sort(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "sample_weighted")
    assert p.has_take_ordered, p.describe()
    assert p.shuffle_exchanges == 0, p.describe()  # map-only + top-k merge


def test_argmax_is_single_pass_agg(spark, sf_smoke):
    # MAX_BY/MIN_BY must plan as one partial/final hash aggregate —
    # no window, no self-join (the idioms it replaces)
    p = _plan(spark, sf_smoke, "agg_argmax")
    assert p.has_partial_agg, p.describe()
    assert "Window" not in p.plan, p.describe()
    assert p.sort_merge_joins == 0 and p.broadcast_joins == 0, p.describe()
    assert p.shuffle_exchanges <= 2, p.describe()  # agg hash + final sort only


def test_nth_value_single_partition_shuffle(spark, sf_smoke):
    # one hash shuffle on user_id for the window; never an empty partitionBy
    p = _plan(spark, sf_smoke, "window_nth_value")
    assert "Window" in p.plan, p.describe()
    assert "hashpartitioning(user_id" in p.plan, p.plan[:500]
    assert p.shuffle_exchanges <= 3, p.describe()  # window + distinct + sort


# --- registry-wide plan contracts -------------------------------------------

import pytest

from rtcdb_spark.plans import inspect_plan as _inspect
from rtcdb_spark.plans.inspect import broadcast_fact_violations

# Tables whose size grows with corpus scale; everything else is a bounded
# dimension and may broadcast freely.
FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}

# Queries whose physical plan is legitimately exempt:
#   join_cross_small — deliberately bounded 5×5 cross-product primitive.
CARTESIAN_ALLOWED = {"join_cross_small"}

_BATCH_QUERIES = sorted(
    name for name, q in REGISTRY.items() if "streaming" not in q.tags
)


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_registry_plan_contract(spark, sf_smoke, name):
    """Every batch query's physical plan must be scale-safe: no cartesian
    product (quadratic at any scale) and no BroadcastExchange whose subtree
    scans a fact table without an aggregate/limit bounding it first (a
    node-sized broadcast OOMs the driver at 1000× data)."""
    df = REGISTRY[name].fn(spark, sf_smoke)
    p = _inspect(df)
    if name not in CARTESIAN_ALLOWED:
        assert p.cartesian_products == 0, f"{name}: {p.describe()}"
    violations = broadcast_fact_violations(df, FACT_TABLES)
    assert not violations, f"{name}: {violations}"


def test_zorder_scan_pushes_both_dimensions(spark, sf_smoke):
    # the whole point of the Morton layout: BOTH box predicates reach the
    # parquet scan of the clustered copy so row-group stats can prune on
    # two dimensions at once
    p = _plan(spark, sf_smoke, "source_zorder_scan")
    assert any("o_custkey" in f for f in p.pushed), p.pushed
    assert any("o_totalprice" in f for f in p.pushed), p.pushed
    assert p.cartesian_products == 0 and p.nested_loop_joins == 0, p.describe()


def test_skyline_is_prefix_scan_not_self_join(spark, sf_smoke):
    # the distributed skyline must never fall back to the quadratic
    # domination self-join (the oracle's NOT-EXISTS shape): no join of any
    # kind except the broadcast of the n_partitions-row prefix table
    p = _plan(spark, sf_smoke, "part_pareto_skyline")
    assert p.cartesian_products == 0 and p.nested_loop_joins == 0, p.describe()
    assert p.sort_merge_joins == 0, p.describe()
    assert p.broadcast_joins >= 1, p.describe()  # the prefix-max stitch
    # round 5: the scan partitions on the deterministic quantile-bucket id
    # (hash exchange on _pid), not a RangePartitioning materialization
    assert "_pid" in p.plan, "expected the stamped range-bucket id"
    assert "hashpartitioning(_pid" in p.plan.lower().replace(" ", ""), (
        "expected a hash exchange on the stamped bucket id"
    )


def test_phash_dedup_corpus_never_shuffles(spark, sf_smoke):
    # decode is a map-only mapInPandas pass; the only join is the broadcast
    # of the 16-bucket signature histogram back onto the signatures
    p = _plan(spark, sf_smoke, "multimodal_image_phash_dedup")
    assert p.cartesian_products == 0 and p.nested_loop_joins == 0, p.describe()
    assert p.sort_merge_joins == 0, p.describe()
    assert p.broadcast_joins >= 1, p.describe()


def test_dsir_top50_is_take_ordered(spark, sf_smoke):
    p = _plan(spark, sf_smoke, "text_importance_resample")
    assert p.has_take_ordered, p.describe()
    assert p.cartesian_products == 0, p.describe()


def test_bucketed_join_query_no_shuffle(spark, sf_smoke):
    # the registry form of the co-located join: bucketed lineitem x orders
    # must join and aggregate with no exchange anywhere (bucket layout
    # satisfies both the join and the aggregate distribution)
    p = _plan(spark, sf_smoke, "source_bucketed_join")
    assert p.shuffle_exchanges <= 1, p.describe()
    assert p.cartesian_products == 0 and p.nested_loop_joins == 0, p.describe()


def test_pagerank_never_hints_broadcast(spark, sf_smoke):
    """Regression pin for the node-sized `F.broadcast(ranks)` bug: the rank
    and degree tables are node-cardinality, so PageRank must leave join
    strategy to AQE stats (the generic contract test can't see this — the
    rank subtree contains a distinct/Aggregate which reads as 'bounded')."""
    df = REGISTRY["graph_pagerank"].fn(spark, sf_smoke)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in optimized


# --- streaming plan contracts ------------------------------------------------
# The streaming queries execute via run_available_now, so the registry-wide
# test above can only see their *batch result*; these build each stream's
# UNSTARTED DataFrame (the plan Spark will run per micro-batch) and assert
# the stateful-operator shape: incremental state-store execution, watermark
# present, stream-stream joins symmetric-hash (never cartesian / BNLJ), and
# static enrichment broadcasting only the dimension side.


def _stream_frames(spark, sf_smoke):
    from pyspark.sql import functions as F

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.streaming import (
        read_events_stream,
        stream_dedup,
        stream_enrich_static,
        stream_session,
        stream_sliding,
        stream_stream_join,
        stream_tumbling,
        stream_user_running_totals,
    )

    sdf = read_events_stream(spark, sf_smoke)
    return {
        "stream_window_tumbling": (
            stream_tumbling(sdf), ["StateStoreSave", "EventTimeWatermark"]
        ),
        "stream_window_sliding": (
            stream_sliding(sdf), ["StateStoreSave", "EventTimeWatermark"]
        ),
        "stream_window_session": (
            stream_session(sdf),
            ["SessionWindowStateStoreSave", "MergingSessions"],
        ),
        "stream_dedup_count": (
            stream_dedup(sdf), ["StreamingDeduplicateWithinWatermark"]
        ),
        "stream_running_totals": (
            stream_user_running_totals(sdf),
            ["FlatMapGroupsInPandasWithState", "EventTimeWatermark"],
        ),
        "stream_join_click_purchase": (
            stream_stream_join(
                sdf.filter(F.col("event_type") == "click"),
                sdf.filter(F.col("event_type") == "purchase"),
            ),
            ["StreamingSymmetricHashJoin"],
        ),
        "stream_enrich_segments": (
            stream_enrich_static(sdf, load_table(spark, sf_smoke, "customer")),
            ["BroadcastHashJoin", "StateStoreSave"],
        ),
    }


@pytest.mark.parametrize(
    "name",
    [
        "stream_window_tumbling",
        "stream_window_sliding",
        "stream_window_session",
        "stream_dedup_count",
        "stream_running_totals",
        "stream_join_click_purchase",
        "stream_enrich_segments",
    ],
)
def test_streaming_microbatch_plan_contract(spark, sf_smoke, name):
    df, markers = _stream_frames(spark, sf_smoke)[name]
    p = _inspect(df)
    assert p.cartesian_products == 0 and p.nested_loop_joins == 0, (
        f"{name}: {p.describe()}"
    )
    for marker in markers:
        assert marker in p.plan, f"{name}: expected {marker} in plan"


def test_stream_enrich_broadcasts_dimension_not_stream(spark, sf_smoke):
    # the broadcast side must be the customer dimension — a broadcast whose
    # subtree reads the (unbounded) event stream would buffer the stream
    df, _ = _stream_frames(spark, sf_smoke)["stream_enrich_segments"]
    p = _inspect(df)
    assert p.broadcast_joins >= 1, p.describe()
    violations = broadcast_fact_violations(df, FACT_TABLES)
    assert not violations, violations


def test_distributed_scan_has_no_data_sized_global_sort(spark, sf_smoke):
    """The two-level prefix scan (operators.scan) must range-partition the
    DATA branch; the only single-partition ordering allowed is the
    n_partitions-row carry (fed by an aggregate, bounded by partition
    count, not data size). Applies to both queries that use it."""
    import re

    for name, key in (
        ("orders_runs_test", "o_orderkey"),
        ("orders_ks_drift_test", "v#"),
    ):
        p = _plan(spark, sf_smoke, name)
        # the data branch is partitioned by the deterministic quantile
        # bucket id (round 5: hash exchange on _pid; no materialization
        # barrier, no RangePartitioning)
        assert "hashpartitioning(_pid" in p.plan.lower().replace(" ", ""), name
        # the per-partition window is keyed on the stamped partition id
        assert "_pid" in p.plan, name
        # a data-sized global window would show a windowspecdefinition
        # whose PARTITION spec starts with the raw order key (no _pid) —
        # i.e. windowspecdefinition(<key> ASC ... with nothing before it
        globals_ = [
            m
            for m in re.findall(r"windowspecdefinition\(([^)]*)\)", p.plan)
            if m.lstrip().startswith(key)
        ]
        assert not globals_, f"{name}: unpartitioned global window over {key}: {globals_}"


def test_stream_near_dedup_signature_is_map_side(spark, sf_smoke):
    """The streaming near-dup gate's ONLY shuffle may be the state groupBy:
    the rowwise HOF signature + band explode must stay inside the scan
    stage (no Exchange, no Aggregate before FlatMapGroupsInPandasWithState
    — a groupBy-computed signature would both shuffle the corpus twice and
    be an illegal second stateful operator)."""
    from rtcdb_spark.streaming import stream_near_dedup_simhash
    from rtcdb_spark.streaming.events import read_table_stream

    sdf = read_table_stream(spark, sf_smoke, "documents")
    plan = stream_near_dedup_simhash(sdf)._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" in plan or "ApplyInPandasWithState" in plan, plan
    assert "Aggregate" not in plan, plan  # signature must not be an agg
