"""Every registered query hash-matches the DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json):
row count + schema + order-insensitive values, floats bit-exact.
"""

from __future__ import annotations

import pytest

from rtcdb_spark.queries import REGISTRY
from tests.oracle import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_correct, name):
    n = check_query(spark, name, sf_correct)
    assert n >= 0


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
