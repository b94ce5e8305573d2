"""Frequency / membership sketches as pure column expressions.

Two classic fixed-size, mergeable sketches the reference has no analogue for
(its only statistics are per-block min/max, src/storage.rs:72-78) but a
100 TB pipeline leans on constantly:

- **Bloom filter** — compact set membership; used here as a join pre-filter
  (`operators.relational.bloom_semi_join`): the dimension side's keys hash
  into an m-bit array that costs KBs to broadcast, and the fact side drops
  non-matching rows *before* the join shuffle. This is Spark's runtime
  row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`) exposed
  as an explicit, inspectable operator.
- **Count-min sketch** — approximate per-item frequencies in
  depth × width counters. Partial sums per (row, bucket) are computed
  map-side and merged by a single groupBy — exactly how partial aggregation
  merges — so the shuffle carries ≤ depth·width rows per partition no matter
  the corpus size. Estimates only ever over-count (collisions add), never
  under-count.

Both use the engine-portable md5-prefix hash (`functions.text.stable_hash60`)
with per-row salts so DuckDB can reproduce every bucket — the count-min
estimate is deterministic and therefore *oracle-checkable*, unusual for a
sketch. xxhash64 would be ~3× faster JVM-side; swap in production where
cross-engine parity is not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rtcdb_spark.functions.text import stable_hash60


def salted_bucket(col: Column | str, salt: int, width: int) -> Column:
    """Hash bucket in [0, width) for hash-function number `salt`."""
    c = F.col(col) if isinstance(col, str) else col
    return stable_hash60(F.concat(F.lit(f"s{salt}|"), c)) % F.lit(width)


def sql_salted_bucket(expr: str, salt: int, width: int) -> str:
    """DuckDB twin of :func:`salted_bucket`."""
    return (
        f"(CAST(('0x' || substr(md5('s{salt}|' || {expr}), 1, 15)) AS BIGINT)"
        f" % {width})"
    )


def cms_build(df: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """Count-min sketch of the values in ``df[col]`` →
    ``(cms_row, cms_pos, cnt)``: one counter row per hash function.

    One explode (depth× fan-out) + one groupBy whose key space is bounded by
    depth·width — the shuffle is sketch-sized, not data-sized.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cms_row"),
                        salted_bucket(col, i, width).alias("cms_pos"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.cms_row", "cell.cms_pos").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, col: str, depth: int, width: int
) -> DataFrame:
    """Point-query the sketch for each distinct value in ``items[col]`` →
    ``items + est`` where est = min over hash rows of the bucket counter.

    The probe is an equi-join on (cms_row, cms_pos); the sketch side is
    ≤ depth·width rows, so Spark broadcasts it and the probe never shuffles
    the items side.
    """
    probes = items.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cms_row"),
                        salted_bucket(col, i, width).alias("cms_pos"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(col, "cell.cms_row", "cell.cms_pos")
    return (
        probes.join(F.broadcast(cms), ["cms_row", "cms_pos"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_bits(dim: DataFrame, key: str, n_bits: int, n_hashes: int) -> list[int]:
    """Build an n_bits bloom filter over ``dim[key]`` as a list of
    n_bits/64 little-endian words.

    Distributed build: per key → n_hashes bit positions (explode), distinct,
    then one word-level ``bit_or`` aggregate; only n_bits/64 rows ever reach
    the driver (8 KB of longs for the default 64 Ki bits — the whole point:
    the *sketch* travels, never the keys).
    """
    assert n_bits % 64 == 0
    positions = dim.select(
        F.explode(
            F.array(*[salted_bucket(key, i, n_bits) for i in range(n_hashes)])
        ).alias("pos")
    ).distinct()
    words = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def bloom_might_contain(
    words: list[int], col: Column | str, n_bits: int, n_hashes: int
) -> Column:
    """Membership predicate against a driver-held bloom word list.

    The words become an array literal in the plan (KB-scale — the analogue
    of a broadcast variable), and the test is pure JVM column math: no UDF,
    no shuffle, evaluated inside the scan stage so it combines with
    predicate pushdown on other columns.
    """
    arr = F.array(*[F.lit(w) for w in words])
    cond = F.lit(True)
    for i in range(n_hashes):
        pos = salted_bucket(col, i, n_bits)
        word = F.element_at(arr, (pos / 64).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond
