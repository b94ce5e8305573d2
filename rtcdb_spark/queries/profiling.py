"""Data-profiling and rollup-maintenance operators: multi-resolution
aggregate cascade (the batch form of a hypertable continuous aggregate),
single-pass column profiling, and grouped mode. SURVEY §2 C-III adjuncts —
the operational queries a warehouse runs over every ingested table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "rollup_cascade",
    """
    WITH lv AS (
        SELECT 'minute' AS level, date_trunc('minute', ts) AS bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'hour', date_trunc('hour', ts),
               COUNT(*),
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'day', date_trunc('day', ts),
               COUNT(*),
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        FROM events GROUP BY 2
    )
    SELECT level, bucket, n_events, total_value
    FROM lv ORDER BY level, bucket
    """,
    tags=("rollup", "timeseries", "materialize"),
)
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade: minute aggregates from the raw
    stream, hour aggregates *from the minute partials*, day from hour — the
    hypertable/continuous-aggregate maintenance pattern. Only the minute
    level ever scans the events table; coarser levels re-aggregate tables
    that are orders of magnitude smaller, which is what makes refreshing a
    year of day-level rollups cheap at 100 TB. Sums stay in exact DECIMAL
    through every level (associative ⇒ cascade ≡ direct), cast to double
    only at the edge — the oracle computes each level directly from raw and
    the results match value-exact, proving the partials are mergeable."""
    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    minute = e.groupBy(F.date_trunc("minute", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), F.sum(dec).alias("sdec")
    )
    hour = minute.groupBy(F.date_trunc("hour", "bucket").alias("bucket")).agg(
        F.sum("n_events").alias("n_events"), F.sum("sdec").alias("sdec")
    )
    day = hour.groupBy(F.date_trunc("day", "bucket").alias("bucket")).agg(
        F.sum("n_events").alias("n_events"), F.sum("sdec").alias("sdec")
    )

    def lv(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            "bucket",
            "n_events",
            F.col("sdec").cast("double").alias("total_value"),
        )

    return (
        lv(minute, "minute")
        .unionByName(lv(hour, "hour"))
        .unionByName(lv(day, "day"))
        .orderBy("level", "bucket")
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "profile_columns",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT({c}) AS n_nonnull,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_v,
           CAST(MAX({c}) AS VARCHAR) AS max_v
    FROM orders"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY column_name",
    tags=("profiling", "stats"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler: per-column row/non-null/distinct counts and min/max
    (stringified) for every column of `orders` — the stats collection that
    feeds CBO, data-quality monitors, and layout decisions (which columns
    are worth sorting/Z-ordering on). Computed in ONE scan: all columns'
    aggregates in a single `agg` (Catalyst plans multi-distinct via expand),
    then unpivoted row-wise — vs the naive per-column scan loop, this reads
    the 100 TB table once instead of once per column."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nonnull").alias("n_nonnull"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(rows).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


@query(
    "agg_mode",
    """
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    ranked AS (
        SELECT o_orderstatus, o_orderpriority, cnt,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM ranked WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    tags=("agg", "mode"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode (most frequent value, deterministic tie-break by value):
    count-then-rank — the portable formulation of MODE() that gives an
    explicit, engine-independent tie rule. The window sees only the
    (status, priority) count table, never the raw rows."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
        .orderBy("o_orderstatus")
    )
