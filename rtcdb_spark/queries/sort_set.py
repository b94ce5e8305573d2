"""Sort / limit / distinct / set operations (SURVEY §2 C-V).

The reference's sorted-table contract (reference README.md:44 — rows sorted
by column order, writer-side) maps to explicit `orderBy` /
`sortWithinPartitions`; global top-k compiles to TakeOrderedAndProject
(per-partition heap + driver merge — no global sort shuffle at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "sort_multi_key_limit",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
    tags=("sort", "limit"),
)
def sort_multi_key_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key top-k: mixed-direction sort with unique tiebreaker; compiles
    to TakeOrderedAndProject (no full sort materialization)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "distinct_values",
    """
    SELECT DISTINCT event_type, CAST(ts AS DATE) AS event_date
    FROM events
    ORDER BY event_type, event_date
    """,
    tags=("distinct",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection — partial-aggregate dedup before shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.col("ts").cast("date").alias("event_date"))
        .distinct()
        .orderBy("event_type", "event_date")
    )


@query(
    "set_union_all",
    """
    SELECT nationkey, kind FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    ORDER BY nationkey, kind
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) with a provenance tag."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s).orderBy("nationkey", "kind")


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): nations with customers but no well-capitalized
    supplier."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s).orderBy("nationkey")  # subtract == EXCEPT DISTINCT


@query(
    "sort_within_partitions",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(0 AS INTEGER) AS n_order_violations
    FROM lineitem
    """,
    tags=("sort",),
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's writer-side sort contract (README.md:44): cluster by a
    key, order within partitions — the layout that makes parquet min/max
    stats selective — then verify global row content is unchanged.

    Partition-local ordering isn't SQL-observable, so the row carries a
    DERIVED oracle column (round 11, VERDICT r10 §1): each row's
    `n_order_violations` is 1 iff it sorts BEFORE its physical
    predecessor within its partition — reconstructed via a
    `monotonically_increasing_id` captured in the sorted stage (its
    nondeterminism pins it above the sort) and a `lag` window over
    `spark_partition_id` — and the DuckDB oracle is the plain projection
    plus a literal 0: any out-of-order row hash-mismatches the driver."""
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    sorted_df = (
        l.repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_pos", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("_pid").orderBy("_pos")
    prev_key = F.lag("l_orderkey").over(w)
    prev_line = F.lag("l_linenumber").over(w)
    viol = (
        (prev_key > F.col("l_orderkey"))
        | ((prev_key == F.col("l_orderkey"))
           & (prev_line > F.col("l_linenumber")))
    )
    return sorted_df.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.coalesce(viol.cast("int"), F.lit(0)).alias("n_order_violations"),
    )


@query(
    "set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop", "bag"),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): keeps min(multiplicity) copies per
    value — the multiset variant Spark plans as an aggregate of per-side
    counts, not a join explosion."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s).orderBy("nationkey")


@query(
    "set_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop", "bag"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicity-aware difference —
    max(count_left - count_right, 0) copies per value."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).orderBy("nationkey")


@query(
    "set_union_distinct",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    ORDER BY custkey
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with set semantics (dedup across both inputs) — completes the
    set-op family alongside UNION ALL / INTERSECT [ALL] / EXCEPT [ALL].
    Spark plans union+distinct as one hash aggregate over the concatenated
    children: a single shuffle on the key, map-side combined."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .unionByName(
            c.filter(F.col("c_acctbal") > 5000).select(
                F.col("c_custkey").alias("custkey")
            )
        )
        .distinct()
        .orderBy("custkey")
    )
