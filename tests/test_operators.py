"""Unit tests for custom operators: connected components, salted join."""

from __future__ import annotations

from pyspark.sql import functions as F

from rtcdb_spark.functions.dedup import connected_components
from rtcdb_spark.operators.relational import salted_join
from rtcdb_spark.sources import load_table


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        (r["node"], r["group_id"]) for r in connected_components(df).collect()
    }


def test_cc_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_cc_path_graph_needs_iterations(spark):
    # A 12-node path: min-label needs ~diameter rounds to flow end to end.
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {(i, 0) for i in range(n + 1)}


def test_cc_clique_and_reversed_edges(spark):
    got = _cc(spark, [(5, 3), (3, 9), (9, 5)])  # unordered/cyclic input
    assert got == {(3, 3), (5, 3), (9, 3)}


def test_salted_join_matches_plain_join(spark, sf_smoke):
    e = load_table(spark, sf_smoke, "events")
    c = load_table(spark, sf_smoke, "customer")
    got = (
        salted_join(e, c, "user_id", "c_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_preserves_columns(spark, sf_smoke):
    e = load_table(spark, sf_smoke, "events")
    c = load_table(spark, sf_smoke, "customer")
    out = salted_join(e, c, "user_id", "c_custkey", n_salts=4)
    assert "_salt" not in out.columns
    assert set(e.columns) | set(c.columns) == set(out.columns)
