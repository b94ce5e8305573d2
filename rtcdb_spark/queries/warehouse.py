"""Warehouse mutation-shaped queries: MERGE (upsert) and SCD type-2.

The reference is strictly append-only (write path src/storage.rs:224-297;
updates/deletes in the non-features list README.md:14-19). A usable engine at
100 TB needs the two standard patterns that replace in-place mutation:
MERGE-style upsert (copy-on-write) and slowly-changing-dimension history
(interval-typed append). Both are pure relational compositions — one key
shuffle each — so they get full DuckDB-oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.operators.relational import merge_upsert, scd2_intervals
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "merge_upsert_customers",
    """
    WITH src AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT s_suppkey + 1000000, CONCAT('new-', s_name), s_nationkey,
               s_acctbal, 'NEW'
        FROM supplier
    ),
    unioned AS (
        SELECT *, 1 AS _prec FROM src
        UNION ALL
        SELECT *, 0 AS _prec FROM customer
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY _prec DESC) AS _rn
        FROM unioned
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM ranked WHERE _rn = 1
    """,
    tags=("warehouse", "merge"),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE: bump acctbal for every BUILDING customer (update branch) and
    insert one synthetic customer per supplier (insert branch); target-only
    rows pass through. Exercises operators.relational.merge_upsert — one
    shuffle on c_custkey; the oracle re-derives the same merge with
    UNION ALL + ROW_NUMBER."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    updates = c.filter(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(100.0)
    )
    inserts = s.select(
        (F.col("s_suppkey") + F.lit(1000000)).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("s_name")).alias("c_name"),
        F.col("s_nationkey").alias("c_nationkey"),
        F.col("s_acctbal").alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return merge_upsert(c, updates.unionByName(inserts), ["c_custkey"])


@query(
    "scd2_order_status",
    """
    SELECT o_custkey, o_orderkey, o_orderstatus,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("warehouse", "scd2"),
)
def scd2_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each customer's order stream becomes
    validity intervals [valid_from, valid_to) with an is_current flag —
    operators.relational.scd2_intervals; o_orderkey tiebreak makes the
    ordering total (same-day orders) for cross-engine determinism."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    return scd2_intervals(
        o, ["o_custkey"], "o_orderdate", tiebreak_cols=["o_orderkey"]
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        "valid_from",
        "valid_to",
        "is_current",
    )


@query(
    "versioned_changes_feed",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE doc_id >= 100 AND doc_id < 250
    ORDER BY doc_id
    """,
    tags=("warehouse", "versioned", "cdc"),
)
def versioned_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change-feed read against the snapshot-versioned table
    (`VersionedTable.changes`, the Delta readChangeFeed / Iceberg
    incremental-scan pattern): commit two document batches as table
    versions, then read ONLY the rows the second commit added — planned as
    a parquet scan of exactly the manifest file-set difference, O(new
    files) regardless of table size. The oracle is the second batch's
    defining predicate, so a hash match proves the manifest diff returns
    precisely the appended rows."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_changes_"))
    vt.commit(d.filter(F.col("doc_id") < 100))
    vt.commit(d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 250)))
    return vt.changes(0).orderBy("doc_id")


@query(
    "versioned_time_travel",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE doc_id < 250
    ORDER BY doc_id
    """,
    tags=("warehouse", "versioned", "time-travel"),
)
def versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (`VersionedTable.read(version=...)`, the Delta
    VERSION AS OF / Iceberg snapshot-id pattern): commit three batches,
    then read the table AS OF the second commit — the third batch's rows
    must be invisible. Planned as a parquet scan of exactly the files in
    version 1's manifest, so time travel costs the same as a current read
    of that snapshot; no log replay, no row filtering. The oracle is the
    union predicate of the first two batches, so a hash match proves the
    manifest pins the right file set (a leaked version-2 file would add
    rows; a missed version-0 file would drop them)."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_timetravel_"))
    vt.commit(d.filter(F.col("doc_id") < 100))
    vt.commit(d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 250)))
    vt.commit(d.filter(F.col("doc_id") >= 250))
    return vt.read(version=1).orderBy("doc_id")


@query(
    "versioned_timestamp_travel",
    """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 250 ORDER BY doc_id
    """,
    tags=("warehouse", "versioned", "time-travel", "timestamp"),
)
def versioned_timestamp_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF (round 6 — Delta's wall-clock time travel): three
    commits, a probe timestamp captured between the second and third;
    `read_as_of` must resolve to exactly the first two commits' rows. The
    manifest records each commit's wall clock (legacy manifests fall back
    to file mtime), so the resolution is O(versions) metadata reads —
    no data I/O until the chosen snapshot is scanned."""
    import tempfile
    import time

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_ts_travel_"))
    vt.commit(d.filter(F.col("doc_id") < 100))
    vt.commit(d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 250)))
    probe = time.time()
    time.sleep(0.01)  # commit clocks must straddle the probe
    vt.commit(d.filter(F.col("doc_id") >= 250))
    return vt.read_as_of(probe).orderBy("doc_id")


@query(
    "matview_incremental_refresh",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("warehouse", "versioned", "matview", "incremental"),
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance over the commit log
    (`operators.matview.merge_agg_state` + `VersionedTable.changes`):
    commit orders in three append batches; after each commit, refresh a
    revenue-by-priority rollup by aggregating ONLY that commit's change
    feed and merging the partials into the view state — the Gupta–Mumick
    self-maintainable-aggregate scheme every warehouse's incremental
    rollup refresh uses. The oracle aggregates the whole orders table
    directly, so a hash match proves three delta-folds reconstruct the
    full-recompute answer exactly: counts merge as summed partial counts,
    revenue stays DECIMAL through every merge level (exact at any fold
    depth), MAX merges as max of partials. At 100 TB each refresh reads
    O(new files) via the manifest diff and shuffles view+delta rows only."""
    import tempfile

    from rtcdb_spark.operators.matview import merge_agg_state
    from rtcdb_spark.sources.versioned import VersionedTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_matview_"))
    splits = [
        o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    state = None
    last_version = None
    for batch in splits:
        v = vt.commit(batch)
        delta = vt.read(v) if last_version is None else vt.changes(last_version, v)
        delta_agg = delta.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
            F.max("o_totalprice").alias("max_price"),
        )
        state = merge_agg_state(
            state,
            delta_agg,
            ["o_orderpriority"],
            {"n_orders": "sum", "rev_dec": "sum", "max_price": "max"},
        )
        last_version = v
    return state.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("rev_dec").cast("double").alias("total_revenue"),
        "max_price",
    ).orderBy("o_orderpriority")


@query(
    "versioned_optimize_compact",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS char_sum,
           MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id
    FROM documents
    """,
    tags=("warehouse", "versioned", "optimize", "compaction"),
)
def versioned_optimize_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a commit (`VersionedTable.optimize` — the
    OPTIMIZE of Delta/Iceberg): documents land in four fragmented append
    commits (4 partitions each → ~16 small files), then one optimize
    commit rewrites the snapshot into a single file. The query asserts the
    file count actually shrank and prior versions still time-travel, then
    aggregates the optimized snapshot; the oracle aggregates the parquet
    original, so the hash match proves compaction is content-identical —
    no dropped, duplicated, or reordered-into-corruption rows. At scale
    this is the nightly job that keeps manifest size and scan task counts
    bounded as streaming sinks accumulate per-batch files."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_optimize_"))
    for i in range(4):
        vt.commit(d.filter(F.col("doc_id") % 4 == i).repartition(4))
    pre = len(vt._read_manifest(vt.latest_version())["files"])
    v = vt.optimize(target_files=1)
    post = len(vt._read_manifest(v)["files"])
    assert post < pre, f"optimize did not shrink files ({pre} -> {post})"
    assert vt.read(0).count() > 0  # time travel intact
    return vt.read(v).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("char_sum"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "versioned_merge_upsert",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id < 50 THEN n_chars + 1000 ELSE n_chars END
                AS BIGINT) AS n_chars
    FROM documents
    UNION ALL
    SELECT CAST(1000000 AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS n_chars
    ORDER BY doc_id
    """,
    tags=("warehouse", "versioned", "merge", "upsert", "copy-on-write"),
)
def versioned_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE with file-level pruning
    (`VersionedTable.merge_upsert`): documents land in four key-range
    commits (so data files are key-clustered), then one upsert updates the
    low range and inserts a new key. Only files containing matched keys
    are rewritten — asserted in-query: at least half the prior files carry
    over byte-identical into the merge manifest — while the oracle
    recomputes the post-merge content directly, so the hash match proves
    source-wins / survivor-retention / insert semantics are exact. This is
    the keyed-upsert path that stays O(matched files + batch) on a 100 TB
    table; prior versions remain time-travelable."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_merge_"))
    bounds = [(0, 50), (50, 150), (150, 300), (300, 1 << 40)]
    for lo, hi in bounds:
        vt.commit(d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)))
    head = vt.latest_version()
    pre = set(vt._read_manifest(head)["files"])
    src = (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", (F.col("n_chars") + 1000).alias("n_chars"))
        .unionByName(
            spark.createDataFrame([(1000000, 1)], "doc_id long, n_chars long")
        )
    )
    v = vt.merge_upsert(src, ["doc_id"])
    m = vt._read_manifest(v)
    carried = sum(1 for f in m["files"] if f in pre)
    assert carried * 2 >= len(pre), f"file pruning failed: {carried}/{len(pre)}"
    return vt.read(v).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    ).orderBy("doc_id")


@query(
    "versioned_delete_rows",
    """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    WHERE NOT (doc_id >= 100 AND doc_id < 200)
    ORDER BY doc_id
    """,
    tags=("warehouse", "versioned", "delete", "erasure"),
)
def versioned_delete_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE via copy-on-write (`VersionedTable.delete` — the
    GDPR-erasure path on an append-only table): documents land in
    key-range commits, then one delete removes a doc_id band; only the
    files containing matching rows are rewritten (asserted in-query: at
    least half the prior files carry over byte-identical), the pre-delete
    version still time-travels (asserted), and the oracle recomputes the
    surviving rows directly, so the hash match proves the predicate
    removed exactly the right rows and nothing else. Full erasure of the
    bytes is delete + vacuum, unit-tested in tests/test_versioned.py."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_delete_"))
    for lo, hi in [(0, 100), (100, 200), (200, 350), (350, 1 << 40)]:
        vt.commit(d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)))
    head = vt.latest_version()
    pre = set(vt._read_manifest(head)["files"])
    v = vt.delete("doc_id >= 100 AND doc_id < 200")
    m = vt._read_manifest(v)
    carried = sum(1 for f in m["files"] if f in pre)
    assert carried * 2 >= len(pre), f"delete rewrote too much: {carried}/{len(pre)}"
    assert vt.read(head).filter("doc_id = 150").count() == 1  # time travel
    return vt.read(v).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    ).orderBy("doc_id")


@query(
    "versioned_schema_evolution",
    """
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CASE WHEN doc_id >= 250 THEN lang END AS lang
    FROM documents
    ORDER BY doc_id
    """,
    tags=("warehouse", "versioned", "schema-evolution"),
)
def versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution on the versioned table (Delta/Iceberg
    add-column, a reference non-feature — 'no schema migrations',
    README.md:18): the first commit writes (doc_id, n_chars), the second
    adds a `lang` column; `read(merge_schema=True)` unions the file
    schemas so pre-evolution rows surface the new column as NULL with no
    data rewrite (footer merge only). The oracle builds the same frame
    with a CASE on the commit boundary, so the hash match proves old rows
    are NULL-extended (not dropped, not defaulted) and new rows carry
    their values."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_evolve_"))
    vt.commit(d.filter(F.col("doc_id") < 250).select("doc_id", "n_chars"))
    vt.commit(
        d.filter(F.col("doc_id") >= 250).select("doc_id", "n_chars", "lang")
    )
    return (
        vt.read(merge_schema=True)
        .select(
            "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"), "lang"
        )
        .orderBy("doc_id")
    )


@query(
    "quality_gate_orders",
    """
    SELECT 'orderkey_unique' AS rule,
           CAST((SELECT COUNT(*) FROM (
               SELECT o_orderkey FROM orders GROUP BY o_orderkey
               HAVING COUNT(*) > 1)) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'custkey_not_null',
           CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'custkey_references_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'totalprice_positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'orderdate_in_epoch_range',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderdate < DATE '1990-01-01'
                    OR o_orderdate > DATE '2030-01-01') AS BIGINT)
    ORDER BY rule
    """,
    tags=("warehouse", "quality", "expectations", "audit"),
)
def quality_gate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation gate (the dbt-test / Great Expectations
    pattern): five declarative rules over orders — key uniqueness,
    not-null, referential integrity against customer, value range, and
    date sanity — each evaluated as a violation COUNT so the gate is one
    job, not five scans' worth of collected rows. Scale shapes: uniqueness
    is a groupBy-count (map-side combine), referential integrity is a
    broadcast anti-join against the dimension, the rest are scan
    predicates; all five counts union into one tiny frame. A pipeline
    promotes the batch only when every count is zero."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def rule(name: str, cnt) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("rule"), F.col("cnt").cast("bigint").alias("n_violations")
        )

    dup_keys = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    null_cust = o.filter(F.col("o_custkey").isNull()).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    orphan = (
        o.join(F.broadcast(c.select("c_custkey")),
               o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nonpos = o.filter(F.col("o_totalprice") <= 0).agg(F.count(F.lit(1)).alias("cnt"))
    bad_date = o.filter(
        (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
        | (F.col("o_orderdate") > F.lit("2030-01-01").cast("date"))
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        rule("orderkey_unique", dup_keys)
        .unionByName(rule("custkey_not_null", null_cust))
        .unionByName(rule("custkey_references_customer", orphan))
        .unionByName(rule("totalprice_positive", nonpos))
        .unionByName(rule("orderdate_in_epoch_range", bad_date))
        .orderBy("rule")
    )


@query(
    "versioned_shallow_clone",
    """
    SELECT 'dev' AS branch, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id >= 100
    UNION ALL
    SELECT 'src', doc_id, CAST(n_chars AS BIGINT)
    FROM documents
    ORDER BY branch, doc_id
    """,
    tags=("warehouse", "versioned", "clone", "branch"),
)
def versioned_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy table branching (`VersionedTable.clone`, Delta SHALLOW
    CLONE): the documents table is cloned metadata-only (asserted
    in-query: the clone's data dir holds no parquet), a delete runs on
    the BRANCH, and both branches are read back side by side. The oracle
    recomputes each branch directly, so the hash match proves clone reads
    see the source's files, branch mutations never leak back, and the
    source is bit-intact after the branch diverged — the isolation
    contract dev/experiment branches rely on."""
    import os as _os
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="rtcdb_clone_")
    src = VersionedTable(spark, f"{root}/src")
    src.commit(d)
    dev = src.clone(f"{root}/dev")
    assert not any(
        f.endswith(".parquet")
        for _, _, fs in _os.walk(_os.path.join(dev.root, "data"))
        for f in fs
    ), "shallow clone copied data"
    dev.delete("doc_id < 100")
    dev_df = dev.read().select(
        F.lit("dev").alias("branch"),
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    src_df = src.read().select(
        F.lit("src").alias("branch"),
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    return dev_df.unionByName(src_df).orderBy("branch", "doc_id")


@query(
    "versioned_data_skipping",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS char_sum,
           MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id
    FROM documents
    WHERE doc_id BETWEEN 120 AND 260
    """,
    tags=("warehouse", "versioned", "data-skipping", "stats"),
)
def versioned_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level data skipping (Delta/Iceberg file-stats pruning):
    every commit records per-file column min/max from the parquet footers
    into the manifest (one metadata read per file, no data I/O), and
    `read_pruned` plans only the files whose stats can intersect the
    predicate — asserted in-query: the key-range probe reads strictly
    fewer files than the table holds. Pruning can only skip files whose
    stats PROVE emptiness (files without stats always read), and the row
    filter still applies, so the oracle's direct range aggregate must
    hash-match exactly — the ACID log and the zone-map idea from the
    reference's own sparse index (README.md:49,56) finally meet in one
    table."""
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_skip_"))
    for lo, hi in [(0, 100), (100, 200), (200, 350), (350, 1 << 40)]:
        vt.commit(
            d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(1)
        )
    keep, total = vt.plan_files("doc_id", 120, 260)
    assert len(keep) < total, f"no files skipped ({len(keep)}/{total})"
    return vt.read_pruned("doc_id", 120, 260).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("char_sum"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "versioned_zorder_skipping",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           MIN(l_orderkey) AS min_okey,
           MAX(l_orderkey) AS max_okey
    FROM lineitem
    WHERE l_partkey BETWEEN 0 AND 49
    """,
    tags=("warehouse", "versioned", "zorder", "data-skipping"),
)
def versioned_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY inside the versioned table (Delta's
    multi-dimensional clustering): the table starts clustered by
    l_orderkey only, so the manifest's per-file l_partkey stats span the
    full domain and a partkey predicate prunes NOTHING. One
    ``optimize(zorder_by=[l_orderkey, l_partkey])`` rewrite later, the
    same manifest stats are tight on BOTH dimensions — asserted in-query:
    the partkey probe plans strictly fewer files after z-ordering than
    before, and an orderkey probe still prunes too. Clustering is a plan
    property, never a result change, so the oracle's direct partkey-range
    aggregate must hash-match exactly. This is the lakehouse form of the
    reference's single-dimension sorted-table contract (README.md:44) —
    generalized to every z-ordered column at once."""
    import tempfile

    from rtcdb_spark.deterministic import dsum
    from rtcdb_spark.sources.versioned import VersionedTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_zorder_"))
    vt.commit(
        li.repartitionByRange(8, "l_orderkey").sortWithinPartitions("l_orderkey")
    )
    before, total_before = vt.plan_files("l_partkey", 0, 49)
    vt.optimize(target_files=8, zorder_by=["l_orderkey", "l_partkey"])
    after, total_after = vt.plan_files("l_partkey", 0, 49)
    assert len(after) < total_after, f"zorder pruned nothing ({len(after)}/{total_after})"
    assert len(after) < len(before), (
        f"zorder did not improve partkey pruning ({len(before)} -> {len(after)})"
    )
    okey_keep, okey_total = vt.plan_files("l_orderkey", 0, 300)
    assert len(okey_keep) < okey_total, "orderkey dimension lost pruning"
    return vt.read_pruned("l_partkey", 0, 49).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("l_quantity", alias="qty_sum"),
        F.min("l_orderkey").alias("min_okey"),
        F.max("l_orderkey").alias("max_okey"),
    )


@query(
    "versioned_hilbert_skipping",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           MIN(l_partkey) AS min_pkey,
           MAX(l_partkey) AS max_pkey
    FROM lineitem
    WHERE l_partkey BETWEEN 60 AND 119
    """,
    tags=("warehouse", "versioned", "hilbert", "data-skipping"),
)
def versioned_hilbert_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE with Hilbert-curve clustering (`curve="hilbert"`, the
    liquid-clustering upgrade over Morton): the orderkey-clustered table
    prunes nothing for a partkey range; one Hilbert rewrite later both
    dimensions prune — asserted in-query exactly like the Morton flagship
    (`versioned_zorder_skipping`), plus the Hilbert-specific property
    measured in SCALE.md §16: no quadrant-boundary jumps keeps contiguous
    curve ranges spatially compact, so per-file boxes are tighter than
    Morton's on the same file count. `layout.hilbert_value` is Hamilton's
    xy→d transform as one `aggregate` fold (pure column expressions),
    exhaustively reference-pinned in tests/test_layout.py. Clustering is
    a plan property, never a result change — the oracle's direct range
    aggregate hash-matches."""
    import tempfile

    from rtcdb_spark.deterministic import dsum
    from rtcdb_spark.sources.versioned import VersionedTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_hilbert_"))
    vt.commit(
        li.repartitionByRange(8, "l_orderkey").sortWithinPartitions("l_orderkey")
    )
    before, _ = vt.plan_files("l_partkey", 60, 119)
    vt.optimize(
        target_files=8, zorder_by=["l_orderkey", "l_partkey"], curve="hilbert"
    )
    after, total = vt.plan_files("l_partkey", 60, 119)
    assert len(after) < total, f"hilbert pruned nothing ({len(after)}/{total})"
    assert len(after) < len(before), (
        f"hilbert did not improve partkey pruning ({len(before)} -> {len(after)})"
    )
    okey, okey_total = vt.plan_files("l_orderkey", 0, 300)
    assert len(okey) < okey_total, "orderkey dimension lost pruning"
    return vt.read_pruned("l_partkey", 60, 119).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("l_quantity", alias="qty_sum"),
        F.min("l_partkey").alias("min_pkey"),
        F.max("l_partkey").alias("max_pkey"),
    )


@query(
    "versioned_bloom_point_skipping",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
           MIN(o_custkey) AS min_ckey
    FROM orders
    WHERE o_orderkey = 1234
    """,
    tags=("warehouse", "versioned", "bloom", "data-skipping"),
)
def versioned_bloom_point_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom filter index (Delta's bloom index): the table is
    round-robin distributed, so every file's [o_orderkey min, max] spans
    the whole domain and RANGE stats prune nothing for a point key — but
    the commit-time per-file blooms prove which files never saw the key,
    and the planner keeps ~1 of 8 (plus the bloom's false-positive rate,
    vanishing at these fill ratios). Asserted in-query: the bloom plan is
    a strict subset of the stats-only plan. Blooms are built distributed
    (one (file, word) bit_or aggregate; only n_files x 1 KiB of words
    reach the driver/manifest) and tested driver-side with the md5-prefix
    hash twin — no Spark job at plan time, the property that matters when
    a 100 TB table's point lookup should read one file, not list a
    million. Pruning is sound (no bloom false negatives; bloom-less files
    always read), so the oracle's direct point aggregate hash-matches."""
    import tempfile

    from rtcdb_spark.deterministic import dsum
    from rtcdb_spark.sources.versioned import VersionedTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_bloom_"))
    vt.commit(o.repartition(8), bloom_cols=["o_orderkey"])
    stats_keep, total = vt.plan_files("o_orderkey", 1234, 1234)
    bloom_keep, _ = vt.plan_files_point("o_orderkey", 1234)
    assert len(bloom_keep) < total, f"bloom pruned nothing ({len(bloom_keep)}/{total})"
    assert len(bloom_keep) < len(stats_keep), (
        f"bloom no better than range stats ({len(stats_keep)} -> {len(bloom_keep)})"
    )
    return vt.read_point("o_orderkey", 1234).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("o_totalprice", alias="price_sum"),
        F.min("o_custkey").alias("min_ckey"),
    )


@query(
    "versioned_incremental_optimize",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS char_sum,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    """,
    tags=("warehouse", "versioned", "optimize", "compaction"),
)
def versioned_incremental_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental OPTIMIZE (Delta's real semantic): only files under the
    size threshold compact; already-large files carry into the new
    manifest byte-identical. A full-table OPTIMIZE is O(table) — routine
    maintenance cannot rewrite 100 TB because ingest dropped some KB-sized
    files next to it; the incremental form is O(small files) = O(ingest
    since last optimize). Asserted in-query: the big file's path survives
    the rewrite verbatim (zero data movement for it), the six small files
    become one, and the metadata-only ``count_rows`` (per-file footer
    row counts recorded at commit — the reference's index-not-data trick,
    README.md:49) is invariant across the rewrite. Content-identical, so
    the oracle's whole-table aggregate hash-matches."""
    import tempfile

    from rtcdb_spark.sources.versioned import _META_KEY, VersionedTable

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_incropt_"))
    vt.commit(d.filter(F.col("doc_id") < 440).coalesce(1))
    for lo in range(440, 500, 10):
        vt.commit(
            d.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)
            ).coalesce(1)
        )
    head = vt.latest_version()
    files = vt._read_manifest(head)["files"]
    stats = vt.file_stats(head)
    sizes = {f: stats[f][_META_KEY]["bytes"] for f in files}
    big = max(sizes, key=sizes.get)
    rows_before = vt.count_rows(head)
    v = vt.optimize(small_only_bytes=sizes[big])
    after = vt._read_manifest(v)["files"]
    assert big in after, "incremental optimize rewrote the large file"
    assert len(after) == 2, f"expected big + 1 compacted, got {len(after)}"
    assert vt.count_rows(v) == rows_before, "metadata row count drifted"
    return vt.read(v).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("char_sum"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


@query(
    "versioned_predicate_routing",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           MIN(l_orderkey) AS min_okey,
           MAX(l_orderkey) AS max_okey
    FROM lineitem
    WHERE l_orderkey BETWEEN 400 AND 700 AND l_quantity >= 25
    """,
    tags=("warehouse", "versioned", "data-skipping", "predicate-routing"),
)
def versioned_predicate_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transparent predicate-routed data skipping (what Delta/Iceberg do
    inside their scan): the user hands ``read_where`` a SQL WHERE string;
    the planner splits the conjunction, routes range conjuncts through the
    manifest's min/max stats and equality conjuncts through the per-file
    blooms, intersects the keep-sets, and still applies the FULL predicate
    row-level — pruning is a plan change, never a result change.
    Unrecognized conjuncts (the ``l_quantity >= 25`` here prunes nothing
    on a quantity-uniform layout, and anything with OR/parens) simply
    contribute no pruning — sound by construction. Asserted in-query: the
    orderkey-ranged table plans strictly fewer files than it holds, and
    the exact metadata min/max of the cluster key (the reference's A8
    get_min/get_max, served index-only, README.md:49) brackets the probe
    range."""
    import tempfile

    from rtcdb_spark.deterministic import dsum
    from rtcdb_spark.sources.versioned import VersionedTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rtcdb_route_"))
    vt.commit(
        li.repartitionByRange(8, "l_orderkey").sortWithinPartitions("l_orderkey")
    )
    pred = "l_orderkey BETWEEN 400 AND 700 AND l_quantity >= 25"
    keep, total = vt.plan_files_where(pred)
    assert len(keep) < total, f"routing pruned nothing ({len(keep)}/{total})"
    mn, mx = vt.min_max("l_orderkey")
    assert mn <= 400 and mx >= 700, "metadata min/max does not bracket probe"
    return vt.read_where(pred).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum("l_quantity", alias="qty_sum"),
        F.min("l_orderkey").alias("min_okey"),
        F.max("l_orderkey").alias("max_okey"),
    )
