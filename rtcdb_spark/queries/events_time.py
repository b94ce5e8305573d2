"""Event-stream analytics in batch mode (SURVEY §2 C-VIII).

The same operators run under Structured Streaming in
``rtcdb_spark.streaming`` (readStream + watermark); batch mode is what the
DuckDB oracle can check, and `F.window`/`F.session_window` semantics are
identical in both modes.

Windowing semantics notes:
- tumbling/sliding windows are half-open [start, end);
- session windows: an event extends the session iff it lands strictly before
  last_ts + gap, so a gap of exactly `gap` starts a NEW session — oracles
  replicate with `diff >= gap`;
- the `sessionize` operator (gaps-and-islands) uses `diff > gap` (classic
  merge semantics) — its oracle matches that instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.operators import sessionize
from rtcdb_spark.queries.base import dsum, query, sql_dsum
from rtcdb_spark.sources import load_table


@query(
    "window_tumbling",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
    tags=("events", "window"),
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type. In streaming mode this is the
    same plan with a watermark; partial aggregation keeps the shuffle small."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", alias="total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "window_sliding",
    f"""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(o))
    SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS window_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events CROSS JOIN offsets
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("events", "window"),
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — every event lands in
    exactly 2 windows. Spark expands via `window()`; the oracle replicates the
    expansion with an explicit offsets cross join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", alias="total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@query(
    "window_session",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    tags=("events", "session"),
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-minute gap) per user — `F.session_window`,
    the same operator Structured Streaming uses for stateful sessionization.
    Oracle rebuilds the merge with gaps-and-islands (diff >= gap ⇒ new)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", alias="total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "sessionize_islands",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM flagged
    ORDER BY user_id, event_id
    """,
    tags=("events", "session"),
)
def sessionize_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level session assignment via the `sessionize` operator
    (gaps-and-islands, diff > gap ⇒ new session)."""
    e = load_table(spark, sf_dir, "events")
    return (
        sessionize(e, key="user_id", ts="ts", gap_seconds=1800)
        .select("user_id", "event_id", "ts", "session_id")
        .orderBy("user_id", "event_id")
    )


@query(
    "pivot_events",
    f"""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("events", "pivot"),
)
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type. A fixed pivot
    value list keeps it a single-pass aggregate (no extra distinct job)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("event_date"))
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("event_date")
    )


@query(
    "funnel_conversion",
    """
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
               MIN(ts) FILTER (WHERE event_type = 'click') AS first_click,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(first_view) AS n_viewed,
           COUNT(CASE WHEN first_click > first_view THEN 1 END) AS n_clicked_after_view,
           COUNT(CASE WHEN first_purchase > first_click
                       AND first_click > first_view THEN 1 END) AS n_full_funnel
    FROM firsts
    """,
    tags=("events", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View → click → purchase funnel over per-user first-touch times —
    one aggregation pass, no self-joins."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count(F.when(F.col("first_click") > F.col("first_view"), 1)).alias(
            "n_clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("first_purchase") > F.col("first_click"))
                & (F.col("first_click") > F.col("first_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@query(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(datediff('week', CAST(f.cohort_week AS TIMESTAMP), date_trunc('week', e.ts)) AS BIGINT)
                   AS week_offset
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("events", "cohort", "retention"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen week,
    counted once per (cohort, weeks-since-first) cell. Classic product
    analytics. Scale shape: the firsts CTE is one groupBy(user_id) — high
    cardinality but uniform; the join back is user_id-keyed (co-partitioned
    with the aggregate's shuffle); the final cell count is tiny. No window
    over an unbounded partition anywhere."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
                )
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "histogram_value_bins",
    """
    WITH b AS (
        SELECT event_type,
               LEAST(GREATEST(CAST(floor(value / 10.0) AS BIGINT), 0), 9) AS bin
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT event_type, bin, COUNT(*) AS n
    FROM b
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
    tags=("agg", "histogram"),
)
def histogram_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type (10 bins, clamped).
    Binning is a per-row expression → the aggregate partial-combines to at
    most (#types × 10) cells per partition; the shuffle is constant-size
    regardless of input volume."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bin_col = F.least(
        F.greatest(F.floor(F.col("value") / 10.0).cast("long"), F.lit(0)), F.lit(9)
    ).alias("bin")
    return (
        e.select("event_type", bin_col)
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )
