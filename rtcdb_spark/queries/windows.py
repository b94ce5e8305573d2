"""Window functions (SURVEY §2 C-VI): ranking, analytic, frame aggregates.

Every window spec orders by a unique key chain so results are deterministic
across engines. One shuffle per distinct partitioning; specs sharing a
partitioning reuse the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtcdb_spark.operators import top_k_per_group
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "window_ranking",
    """
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ORDER BY p_brand, rn
    """,
    tags=("window",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile over one shared window spec."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("p_brand", "rn")
    )


@query(
    "window_topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    )
    WHERE rn <= 5
    ORDER BY c_mktsegment, rn
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per market segment (operators.top_k_per_group)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        top_k_per_group(
            c,
            ["c_mktsegment"],
            [F.desc("c_acctbal"), F.asc("c_custkey")],
            k=5,
        )
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_lag_lead",
    """
    SELECT user_id, event_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS micros_since_prev
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation plus inter-event gap in seconds."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (us - prev_us).alias("micros_since_prev"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_frames",
    """
    SELECT user_id, event_id,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / LEAST(
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 3) AS moving_avg_3,
           MAX(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS running_max
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
    tags=("window", "frame"),
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregates: running sum (exact via decimal), 3-row moving average,
    running max. rowsBetween frames over a deterministic order."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    last3 = w.rowsBetween(-2, 0)
    vdec = F.col("value").cast("decimal(18,2)")
    return (
        e.select(
            "user_id",
            "event_id",
            vdec.cast("double").alias("v"),
            F.sum(vdec).over(cum).cast("double").alias("running_total"),
            (
                F.sum(vdec).over(last3).cast("double")
                / F.least(F.count(F.lit(1)).over(last3), F.lit(3))
            ).alias("moving_avg_3"),
            F.max("value").over(cum).alias("running_max"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_first_last",
    """
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type,
           FIRST_VALUE(ts) OVER w AS first_ts,
           LAST_VALUE(ts)  OVER w AS last_ts
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY user_id
    """,
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over an unbounded frame → per-user journey endpoints."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.first("ts").over(w).alias("first_ts"),
            F.last("ts").over(w).alias("last_ts"),
        )
        .distinct()
        .orderBy("user_id")
    )


@query(
    "window_nth_value",
    """
    SELECT DISTINCT user_id,
           NTH_VALUE(event_type, 2) OVER w AS second_type,
           NTH_VALUE(event_type, 3) OVER w AS third_type
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY user_id
    """,
    tags=("window", "analytic"),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over an unbounded frame — the user's 2nd and 3rd events
    (NULL when the journey is shorter). Completes the analytic family next
    to first/last/lag/lead. Ordering includes the unique event_id so the
    frame is total and both engines agree. Same scale shape as any
    partitioned window: one shuffle on user_id, sort within partitions."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.nth_value("event_type", 2).over(w).alias("second_type"),
            F.nth_value("event_type", 3).over(w).alias("third_type"),
        )
        .distinct()
        .orderBy("user_id")
    )


@query(
    "window_percent_rank_cume",
    """
    SELECT event_type, event_id,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM events
    WHERE event_id < 2000
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    ORDER BY event_type, event_id
    """,
    tags=("window", "ranking", "distribution"),
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position window functions: percent_rank (rank-1)/(n-1),
    cume_dist, and quartile assignment per event type — the percentile-of-
    peer-group primitives behind scorecards and outlier reports. Both are
    rank arithmetic over the same single hash-partition shuffle the ranking
    family uses (deterministic via the (value, event_id) total order);
    rounding to 6 pins the one double division cross-engine."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_type",
        "event_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("event_type", "event_id")
