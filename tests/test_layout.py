"""Partitioned layout: directory-level partition pruning and compaction.

Pins the two layout properties the 100 TB design depends on:
- a predicate on the partition column reaches the scan as a PartitionFilter
  (directories eliminated at planning time, before any file I/O);
- compaction shrinks file count without changing logical content.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from rtcdb_spark.plans.inspect import formatted_plan
from rtcdb_spark.sources import load_table
from rtcdb_spark.sources.layout import compact, write_partitioned, _parquet_file_count


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_smoke, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "events_by_day")
    e = load_table(spark, sf_smoke, "events").withColumn("event_date", F.to_date("ts"))
    write_partitioned(e, path, ["event_date"], sort_cols=["user_id", "ts"])
    return path


def test_partition_filter_reaches_scan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_day = df.select(F.min("event_date")).first()[0]
    q = df.filter(F.col("event_date") == F.lit(one_day)).groupBy("event_type").count()
    plan = formatted_plan(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # The partition predicate must NOT degrade to a post-scan row filter on
    # data columns; pruning happens at the directory level.
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "event_date" not in pushed.group(1)


def test_partitioned_roundtrip_content(spark, sf_smoke, partitioned_events):
    e = load_table(spark, sf_smoke, "events")
    back = spark.read.parquet(partitioned_events)
    assert back.count() == e.count()
    got = back.groupBy("event_type").count()
    want = e.groupBy("event_type").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_compact_reduces_file_count(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    e = load_table(spark, sf_smoke, "events")
    e.repartition(40).write.parquet(src)  # simulate micro-batch fragmentation
    before, after = compact(spark, src, dst, sort_cols=["ts"])
    assert before >= 40
    assert after <= 2, (before, after)
    assert spark.read.parquet(dst).count() == e.count()


def test_compact_partitioned_keeps_pruning(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "frag_part")
    dst = str(tmp_path / "compact_part")
    e = load_table(spark, sf_smoke, "events").withColumn("event_date", F.to_date("ts"))
    e.repartition(20).write.partitionBy("event_date").parquet(src)
    before, after = compact(spark, src, dst, partition_cols=["event_date"], sort_cols=["ts"])
    assert after < before
    back = spark.read.parquet(dst)
    assert back.count() == e.count()
    one_day = back.select(F.min("event_date")).first()[0]
    plan = formatted_plan(back.filter(F.col("event_date") == F.lit(one_day)))
    assert re.search(r"PartitionFilters: \[[^\]]*event_date", plan), plan


def _rowgroup_spans(path, col):
    """Per-row-group normalized (max-min) span of `col` across all files."""
    import pyarrow.parquet as pq
    import os as _os

    spans, lo, hi = [], None, None
    files = [
        _os.path.join(r, f)
        for r, _d, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    metas = []
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            metas.append((st.min, st.max))
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    width = (hi - lo) or 1
    for mn, mx in metas:
        spans.append((mx - mn) / width)
    return sum(spans) / len(spans)


def test_zorder_bounds_all_dimensions(spark, sf_smoke, tmp_path):
    from rtcdb_spark.sources.layout import write_zordered

    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lexi = str(tmp_path / "lexi")
    zord = str(tmp_path / "zord")
    # lexicographic: perfect on the leading column, blind on the second
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.option("maxRecordsPerFile", 200).parquet(lexi)
    )
    write_zordered(li, zord, ["l_orderkey", "l_partkey"], n_files=8, max_records_per_file=200)

    span_partkey_lexi = _rowgroup_spans(lexi, "l_partkey")
    span_partkey_zord = _rowgroup_spans(zord, "l_partkey")
    # Z-order must materially shrink the second dimension's per-group range
    assert span_partkey_zord < span_partkey_lexi * 0.7, (
        span_partkey_lexi,
        span_partkey_zord,
    )
    assert spark.read.parquet(zord).count() == li.count()


def test_zorder_value_is_deterministic_expression(spark, sf_smoke):
    from rtcdb_spark.sources.layout import zorder_value
    from pyspark.sql import functions as F

    li = load_table(spark, sf_smoke, "lineitem")
    z1 = li.select(zorder_value(li, ["l_orderkey", "l_partkey"]).alias("z")).agg(
        F.sum("z")
    ).first()[0]
    z2 = li.select(zorder_value(li, ["l_orderkey", "l_partkey"]).alias("z")).agg(
        F.sum("z")
    ).first()[0]
    assert z1 == z2


def test_zorder_value_interleaves_known_points(spark):
    """2-bit Morton interleave of a 2x2 grid matches the hand-computed curve
    order (0,0) < (1,0) < (0,1) < (1,1)."""
    from rtcdb_spark.sources.layout import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1)], "x int, y int"
    )
    out = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_value(df, ["x", "y"], bits=1)).collect()
    }
    assert out[(0, 0)] == 0 and out[(1, 0)] == 1
    assert out[(0, 1)] == 2 and out[(1, 1)] == 3


def test_zorder_write_roundtrip_and_clusters_second_dim(spark, sf_smoke, tmp_path):
    """write_zordered preserves content exactly AND actually clusters the
    second dimension: the mean per-file span of o_totalprice must be
    materially narrower than under a lexicographic (o_custkey-led) sort,
    where every file spans the full price domain."""
    import glob

    import pyarrow.parquet as pq

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.sources.layout import write_zordered

    o = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zdir = str(tmp_path / "zord")
    ldir = str(tmp_path / "lex")
    write_zordered(o, zdir, ["o_custkey", "o_totalprice"], bits=16, n_files=8)
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    back = spark.read.parquet(zdir)
    assert sorted(r.o_orderkey for r in back.collect()) == sorted(
        r.o_orderkey for r in o.collect()
    )

    def mean_price_span(d):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(len(md.schema))
                if md.schema.column(i).name == "o_totalprice"
            )
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    z_span, lex_span = mean_price_span(zdir), mean_price_span(ldir)
    # Z-order must at least halve the per-file price span; lexicographic
    # files each cover ~the whole price domain.
    assert z_span < 0.5 * lex_span, (z_span, lex_span)


def _xy2d_reference(n, x, y):
    """Hamilton's xy->d transform, the trivially-correct Python model."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_value_matches_reference_on_full_grid(spark):
    from rtcdb_spark.sources.layout import hilbert_value

    n = 8  # bits=3: the full 64-cell grid, exhaustive
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.withColumn("h", hilbert_value(df, ["x", "y"], bits=3)).collect()
    }
    assert got == {(x, y): _xy2d_reference(n, x, y) for x, y in rows}
    assert sorted(got.values()) == list(range(n * n))  # a space-filling walk


def test_hilbert_rejects_bad_arity_and_width(spark):
    import pytest

    from rtcdb_spark.sources.layout import hilbert_value

    df = spark.range(4).selectExpr("id AS x", "id AS y", "id AS z")
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_value(df, ["x", "y", "z"])
    with pytest.raises(ValueError, match="signed long"):
        hilbert_value(df, ["x", "y"], bits=32)


def test_hilbert_optimize_prunes_both_dimensions(spark, tmp_path):
    from pyspark.sql import functions as F

    from rtcdb_spark.sources.versioned import VersionedTable

    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(df.repartitionByRange(8, "x").sortWithinPartitions("x"))
    vt.optimize(target_files=8, zorder_by=["x", "y"], curve="hilbert")
    kx, total = vt.plan_files("x", 0, 7)
    ky, _ = vt.plan_files("y", 0, 7)
    assert len(kx) < total and len(ky) < total
    # content identical
    assert vt.read().count() == n * n
    got = sorted((r["x"], r["y"]) for r in vt.read_pruned("y", 0, 7).collect())
    want = sorted((r["x"], r["y"]) for r in df.filter("y <= 7").collect())
    assert got == want
