"""Structural guard against the driver's pandas-canonicalizer defect class.

The driver compares Spark results and DuckDB oracle results after converting
both to pandas. DuckDB's ``.df()`` renders HUGEINT (the default type of
``SUM(BIGINT)``) and DECIMAL columns as **float64**, while the Spark twin
stays int64 / object(Decimal) — identical values then hash differently
(``24508.0`` vs ``24508``). This class ate three CORRECTNESS rows across
rounds 1-2 (source_csv_roundtrip, multimodal_payload_meta,
window_running_frames); these tests kill it structurally:

* every registered oracle's *declared* DuckDB result types contain no
  HUGEINT / UHUGEINT / DECIMAL column (so ``.df()`` can never downgrade an
  integral/decimal aggregate to float64) — ``CAST(... AS BIGINT)`` or
  ``AS DOUBLE`` at the oracle's output edge is the fix pattern;
* no Spark query's output schema contains DecimalType (decimals are fine
  *inside* a query for exact accumulation, but the output edge must be
  bigint/double so both engines canonicalize identically).

Both checks are analysis-only (DuckDB lazy relation types; Spark schema),
so the whole registry is covered in seconds without executing any plan.
"""

from __future__ import annotations

import pytest

from rtcdb_spark.queries import REGISTRY
from tests.oracle import duck_connect

_BANNED_DUCK = ("HUGEINT", "UHUGEINT", "DECIMAL")

# Queries whose Spark callable eagerly *executes* work on invocation
# (streaming fixtures, file-format roundtrips) still only need schema here —
# but streaming ones block on a full micro-batch run, so they are skipped;
# they have no SQL oracle (rows-only driver check) so the DuckDB half is moot.
def _eager(name: str) -> bool:
    return "streaming" in REGISTRY[name].tags


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connect(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
)
def test_oracle_output_types_survive_pandas(duck, name):
    rel = duck.sql(REGISTRY[name].oracle)
    bad = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, [str(t).upper() for t in rel.types])
        if any(b in typ for b in _BANNED_DUCK)
    ]
    assert not bad, (
        f"{name}: oracle emits types that DuckDB .df() turns into float64 "
        f"while the Spark twin stays integral/decimal -> driver hash mismatch. "
        f"CAST the output edge AS BIGINT/DOUBLE: {bad}"
    )


@pytest.mark.parametrize("name", sorted(n for n in REGISTRY if not _eager(n)))
def test_spark_output_schema_has_no_decimal(spark, sf_smoke, name):
    from pyspark.sql.types import DecimalType

    schema = REGISTRY[name].fn(spark, sf_smoke).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, (
        f"{name}: Spark output has DecimalType columns {bad} — the DuckDB "
        f"twin canonicalizes its DECIMAL to float64 in .df(), so the driver "
        f"hash mismatches even on equal values. Cast the output edge to "
        f"double (keep decimal internally for exact accumulation)."
    )
