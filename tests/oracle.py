"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered query's Spark side and its oracle SQL on the same parquet
fixtures, then compares row count, column-name set, and (column-name-sorted,
row-sorted) cell values. Floats are compared bit-exactly — the query suite is
designed for cross-engine determinism (see rtcdb_spark.queries.base) — with a
diagnostic relative-difference report on failure.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Normalize a cell, keeping the numeric *kind* (int vs float vs bool)
    distinct — the driver's value-hash stringifies, so `2` vs `2.0` is a
    mismatch there and must be one here too."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", str(v + 0.0))  # -0.0 -> 0.0
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out_cols = [cols[i].lower() for i in order]
    out_rows = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return out_cols, out_rows


def compare(spark_cols, spark_rows, duck_cols, duck_rows, name: str) -> None:
    sc, sr = _normalize(spark_cols, spark_rows)
    dc, dr = _normalize(duck_cols, duck_rows)
    assert sc == dc, f"{name}: column mismatch spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duck={len(dr)}"
    mismatches = []
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            detail = []
            for c, (x, y) in zip(sc, zip(a, b)):
                if x != y:
                    rel = ""
                    if isinstance(x, float) and isinstance(y, float) and y:
                        rel = f" (rel={abs(x - y) / abs(y):.2e})"
                    detail.append(f"{c}: spark={x!r} duck={y!r}{rel}")
            mismatches.append(f"row {i}: " + "; ".join(detail))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches:\n" + "\n".join(mismatches)


def _assert_driver_window_scalar_schema(name: str, sdf) -> None:
    """Driver-window queries must return only scalar-typed columns.

    The external driver canonicalizes results with a pandas sort before
    hashing; array/map/struct cells raise ``TypeError: unhashable type``
    there and record the row as `err` regardless of correctness (this burned
    rounds 2 and 4 — `fn_json_map`). Non-window registry queries may still
    return complex types (the local mirror handles them).
    """
    import __spark_entry__ as entry
    from pyspark.sql import types as T

    if name not in entry._PRIORITY:
        return
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name} is in the driver window but returns complex-typed columns "
        f"{complex_cols}; project them to scalars (e.g. array_join) — the "
        "driver canonicalizer cannot sort them"
    )


def check_query(spark, name: str, sf_dir: str) -> int:
    """Run query `name` both ways and compare. Returns the row count."""
    from rtcdb_spark.queries import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    _assert_driver_window_scalar_schema(name, sdf)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    if q.oracle is None:
        assert len(spark_rows) >= 0
        return len(spark_rows)
    con = duck_connect(sf_dir)
    try:
        res = con.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()
    compare(spark_cols, spark_rows, duck_cols, duck_rows, name)
    return len(spark_rows)
