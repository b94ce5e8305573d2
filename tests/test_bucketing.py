"""Bucketed tables join without exchanges — the co-located fact-fact join.

At 100 TB the lineitem↔orders shuffle is the single biggest data movement in
the star-schema workload; bucketing both tables by the order key at write
time removes it entirely. This test pins that plan property.
"""

from __future__ import annotations

import pytest

from rtcdb_spark.plans import inspect_plan
from rtcdb_spark.sources import load_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "o_key"), "o_bucketed", "o_key", n_buckets=8
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li = spark.table(li_name)
    o = spark.table(o_name)
    joined = li.join(o, li.l_orderkey == o.o_key).groupBy("o_orderstatus").count()
    p = inspect_plan(joined)
    # Co-located join: no shuffle on either input. The only exchange allowed
    # is the one for the final (tiny) aggregation.
    assert p.shuffle_exchanges <= 1, p.describe()


def test_bucketed_join_matches_unbucketed(spark, sf_smoke, bucketed_tables):
    li_name, o_name = bucketed_tables
    got = (
        spark.table(li_name)
        .join(spark.table(o_name), spark.table(li_name).l_orderkey == spark.table(o_name).o_key)
        .groupBy("o_orderstatus")
        .count()
    )
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    want = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
