"""Repeat-run determinism: the same query must return bit-identical rows
on consecutive executions in one session.

The oracle tests catch cross-ENGINE divergence; this catches cross-RUN
divergence — nondeterministic tie-breaks, partition-order-dependent folds,
uncached randomness — on the queries whose shapes are most at risk
(sampling, iterative training, hash-gated selection, greedy traversals,
Python-kernel boundaries). A flaky query would alternate between runs and
fail here long before it flaked under the driver.
"""

from __future__ import annotations

import pytest

from rtcdb_spark.queries import REGISTRY

RISKY = [
    "sample_weighted",            # A-ES keyed sampling
    "sample_stratified_fixed",    # per-stratum hash ranks
    "sample_hash_deterministic",  # hash-gated selection
    "similarity_ivf_trained_topk",  # iterative k-means training
    "embedding_kcenter_coreset",  # greedy traversal w/ driver-held state
    "embedding_power_iteration",  # iterative matvec w/ driver-held state
    "dedup_lsh_pairs",            # bucket expansion order
    "dedup_connected_groups_star",  # iterate-to-fixpoint rounds
    "graph_label_propagation",    # argmax tie-breaks per round
    "udf_grouped_map",            # Arrow kernel boundary
    "window_rolling_median",      # order statistics over frames
    "split_train_val_test",       # hash-partitioned split
]


@pytest.mark.parametrize("name", RISKY)
def test_repeat_run_identical(spark, sf_smoke, name):
    fn = REGISTRY[name].fn
    first = sorted(tuple(str(c) for c in r) for r in fn(spark, sf_smoke).collect())
    second = sorted(tuple(str(c) for c in r) for r in fn(spark, sf_smoke).collect())
    assert first == second, f"{name}: results differ between consecutive runs"
