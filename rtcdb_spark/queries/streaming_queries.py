"""Streaming-mode queries for the correctness gate (SURVEY §2 C-VIII).

Each entry runs a Structured Streaming plan to completion over the finite
fixture input (``trigger(availableNow=True)`` into a memory sink) and returns
the result as a batch DataFrame — so the SAME DuckDB oracles that check the
batch window queries also check the streaming operators' state machinery
(multi-batch merge, watermark bookkeeping, session-window state).

The reference has no streaming (SURVEY §3: no threads/async anywhere); this
is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import query, sql_dsum
from rtcdb_spark.streaming import (
    stream_stream_join,
    read_events_stream,
    run_available_now,
    stream_dedup,
    stream_session,
    stream_sliding,
    stream_tumbling,
    stream_user_running_totals,
)


def _multiset_signature(df: DataFrame) -> tuple[int, int]:
    """Order-independent multiset signature of a DataFrame: (row count,
    SUM of per-row xxhash64 over every column). Two scalars per scan —
    the distributed replacement for collect-and-compare replay asserts
    (r6 verdict item 2); a changed, added, or dropped row moves the sum
    except with ~2^-64 collision probability, ample for an assertion."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns)).alias("sig"),
    ).first()
    return (row["n"], row["sig"])


@query(
    "stream_window_tumbling",
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
    tags=("streaming", "window"),
)
def stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling windows, run to completion — must equal the batch
    ``window_tumbling`` answer exactly (complete output mode keeps all state)."""
    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(stream_tumbling(sdf), output_mode="complete")
    return out.orderBy("window_start", "event_type")


@query(
    "stream_window_session",
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
    tags=("streaming", "session"),
)
def stream_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) run to completion — state-store
    session merge must reproduce the batch gaps-and-islands answer."""
    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(stream_session(sdf), output_mode="complete")
    return out.orderBy("user_id", "session_start")


@query(
    "stream_dedup_count",
    "SELECT COUNT(DISTINCT event_id) AS n_unique FROM events",
    tags=("streaming", "dedup"),
)
def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropDuplicatesWithinWatermark` over the stream; the surviving-row
    count must equal COUNT(DISTINCT event_id)."""
    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(stream_dedup(sdf), output_mode="append")
    return out.agg(F.count(F.lit(1)).alias("n_unique"))


@query(
    "stream_running_totals",
    f"""
    SELECT user_id, COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state operator (`applyInPandasWithState`): one micro-batch
    over the full input emits each user's final running totals. The state
    keeps integer cents (HALF_UP quantization identical to the engines'
    double→DECIMAL(18,2) cast), so total_value is order-independent,
    replay-stable, and value-exact against the batch decimal-sum oracle —
    a raw float fold would be none of those."""
    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(stream_user_running_totals(sdf), output_mode="update")
    return out.select("user_id", "n_events", "total_value").orderBy("user_id")


@query(
    "stream_join_click_purchase",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           c.ts AS click_ts,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 2 HOUR
    ORDER BY c.user_id, click_id, purchase_id
    """,
    tags=("streaming", "join"),
)
def stream_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join run to completion: purchases matched to the
    same user's clicks within the prior 2 hours. Both sides watermarked; the
    two-sided time bound is what makes join state evictable on an unbounded
    stream. Must equal the equivalent batch time-range join."""
    ev = read_events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = run_available_now(
        stream_stream_join(clicks, purchases), output_mode="append"
    )
    return out.orderBy("user_id", "click_id", "purchase_id")


@query(
    "stream_enrich_segments",
    f"""
    SELECT c_mktsegment AS segment,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("streaming", "join"),
)
def stream_enrich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment run to completion — must equal the
    equivalent batch join + aggregate exactly (stateless join, complete-mode
    aggregate)."""
    from rtcdb_spark.sources import load_table
    from rtcdb_spark.streaming import stream_enrich_static

    sdf = read_events_stream(spark, sf_dir)
    customers = load_table(spark, sf_dir, "customer")
    out = run_available_now(
        stream_enrich_static(sdf, customers), output_mode="complete"
    )
    return out.orderBy("segment", "event_type")


@query(
    "stream_rollup_snapshot",
    f"""
    SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("streaming", "sink", "rollup"),
)
def stream_rollup_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the full foreachBatch rollup-cascade SINK end-to-end
    (`streaming.sinks.stream_rollup_cascade`): minute-level streaming
    aggregates upsert a parquet snapshot per batch via the staged
    atomic-swap writer, and hour/day levels re-derive from the minute
    partials (exact decimal sums make the cascade equal direct
    aggregation). Returns the day-level snapshot read back from disk — so
    the oracle checks the whole path: stream → state → distributed snapshot
    write → swap → re-read."""
    import tempfile

    from rtcdb_spark.streaming.sinks import stream_rollup_cascade

    sdf = read_events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="rtcdb_rollup_snap_")
    stream_rollup_cascade(
        sdf, f"{out_dir}/levels", f"{out_dir}/ckpt", watermark="1 hour"
    )
    day = spark.read.parquet(f"{out_dir}/levels/day")
    return day.select(
        "bucket",
        "n_events",
        F.col("sdec").cast("double").alias("total_value"),
    ).orderBy("bucket")


@query(
    "stream_error_rate_hourly",
    """
    SELECT date_trunc('hour', ts) AS hr,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               / COUNT(*) AS err_rate
    FROM events
    GROUP BY date_trunc('hour', ts)
    ORDER BY hr
    """,
    tags=("streaming", "sli", "window"),
)
def stream_error_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLI monitoring — hourly event and error counts with the
    error rate, computed by a REAL readStream with a watermark and run to
    completion (availableNow, complete mode): the always-on half of the
    batch `events_error_burn_rate` report. Counts are exact integers
    inside streaming state (mergeable across micro-batches); the rate is
    one IEEE division applied AFTER aggregation, so replay and batch
    recomputation agree bit-for-bit — which the batch-SQL oracle
    verifies."""
    from rtcdb_spark.streaming.events import read_events_stream, run_available_now

    sdf = read_events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("int"))
            .cast("bigint")
            .alias("n_errors"),
        )
    )
    out = run_available_now(agg, output_mode="complete")
    return (
        out.select(
            F.col("w.start").alias("hr"),
            "n_events",
            "n_errors",
            (F.col("n_errors") / F.col("n_events")).alias("err_rate"),
        )
        .orderBy("hr")
    )


@query(
    "stream_window_sliding",
    f"""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(o))
    SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS window_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events CROSS JOIN offsets
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (1-hour length, 30-minute slide) run to
    completion — each event feeds two window states; complete-mode output
    must equal the batch ``window_sliding`` answer exactly. State per key
    is bounded by (#open windows × slide granularity), evicted once the
    watermark passes window_end — the same bookkeeping the tumbling twin
    exercises, plus the overlapping-assignment expansion."""
    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(stream_sliding(sdf), output_mode="complete")
    return out.orderBy("window_start")


@query(
    "stream_versioned_sink",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(event_id AS BIGINT)) AS BIGINT) AS id_sum,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "versioned", "exactly-once", "sink"),
)
def stream_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion into the ACID commit log
    (`streaming.sinks.stream_to_versioned`): the events stream runs to
    completion with each micro-batch becoming ONE batch-id-stamped version
    in a `VersionedTable`; the whole pipeline is then run a SECOND time
    against the same table with a fresh checkpoint — every batch replays,
    and the idempotence gate (batch id already in the commit log) must
    skip them all. The returned aggregate reads the table's final
    snapshot; the oracle aggregates the events fixture directly, so any
    duplicated batch (failed idempotence), dropped batch, or torn commit
    breaks the count/sum hash."""
    import shutil
    import tempfile

    from rtcdb_spark.sources.versioned import VersionedTable
    from rtcdb_spark.streaming import read_events_stream
    from rtcdb_spark.streaming.sinks import stream_to_versioned

    root = tempfile.mkdtemp(prefix="rtcdb_vsink_")
    table_root = f"{root}/table"
    stream_to_versioned(
        read_events_stream(spark, sf_dir), table_root, f"{root}/cp1",
        app_id="vsink-writer",
    )
    vt = VersionedTable(spark, table_root)
    n_versions = len(vt.versions())
    # Replay the whole stream as the SAME writer (same app_id, fresh
    # checkpoint so availableNow re-delivers every batch): every
    # (app_id, batch_id) txn is already committed, so the log must not
    # grow. A different app_id WOULD re-commit — that is the writer-scoped
    # idempotence contract (Delta txnAppId), unit-tested separately.
    stream_to_versioned(
        read_events_stream(spark, sf_dir), table_root, f"{root}/cp2",
        app_id="vsink-writer",
    )
    assert len(vt.versions()) == n_versions, "replayed batches re-committed"
    out = (
        vt.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("event_id").cast("bigint")).cast("bigint").alias("id_sum"),
            # dsum pattern: exact decimal partials, double at the end
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("event_type")
    )
    shutil.rmtree(f"{root}/cp1", ignore_errors=True)
    shutil.rmtree(f"{root}/cp2", ignore_errors=True)
    return out


@query(
    "stream_cdc_upsert",
    """
    WITH ranked AS (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(event_id AS BIGINT) AS event_id,
           ts, event_type, value
    FROM ranked
    WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("streaming", "cdc", "upsert", "scd1"),
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD1/CDC apply end-to-end (`streaming.sinks.
    stream_cdc_upsert`): the events stream folds into a keyed latest-row
    snapshot, one idempotent MAX-merge per micro-batch; the pipeline then
    REPLAYS from a fresh checkpoint against the same snapshot — every
    batch re-merges, and because the merge is a commutative idempotent
    max over the (ts, event_id) version vector the snapshot must be
    byte-identical. The oracle computes each user's latest event with one
    batch max_by over the fixture, so the hash match proves micro-batch
    folding + replay reaches exactly the batch answer — the convergence
    property CDC pipelines rely on under at-least-once delivery."""
    import tempfile

    from rtcdb_spark.streaming import read_events_stream
    from rtcdb_spark.streaming.sinks import stream_cdc_upsert as run_sink

    root = tempfile.mkdtemp(prefix="rtcdb_cdc_")
    out = f"{root}/snapshot"
    run_sink(read_events_stream(spark, sf_dir), out, f"{root}/cp1")
    # Replay-idempotence asserted DISTRIBUTED (r6 verdict item 2): an
    # order-independent multiset signature (row count + SUM of per-row
    # xxhash64) reduces the snapshot to two driver scalars per run — no
    # O(table) collect, no copy-aside write, one scan each side.
    first = _multiset_signature(spark.read.parquet(out))
    run_sink(read_events_stream(spark, sf_dir), out, f"{root}/cp2")  # replay
    second = _multiset_signature(spark.read.parquet(out))
    assert first == second, "CDC replay changed the snapshot"
    snap = spark.read.parquet(out)
    return snap.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        "ts",
        "event_type",
        "value",
    ).orderBy("user_id")


@query(
    "stream_join_left_outer",
    """
    WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                  - INTERVAL 1 HOUR AS w),
    matched AS (
        SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM c JOIN p ON c.user_id = p.user_id
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    ),
    unmatched AS (
        SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
               CAST(NULL AS BIGINT) AS purchase_id,
               CAST(NULL AS TIMESTAMP) AS purchase_ts,
               CAST(NULL AS DOUBLE) AS purchase_value
        FROM c
        WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = c.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        )
        AND c.ts + INTERVAL 2 HOUR < (SELECT w FROM wm)
    )
    SELECT * FROM matched
    UNION ALL
    SELECT * FROM unmatched
    ORDER BY user_id, click_id, purchase_id
    """,
    tags=("streaming", "join", "outer", "watermark"),
)
def stream_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join run to completion — the operator whose
    null-extended rows exist only BECAUSE join state is evictable: a click
    emits unmatched exactly when the watermark (min of both inputs' max
    event time, minus the 1 h delay) passes the end of its 2 h match
    window, proving eviction fires neither early (a null for a click that
    still had a live window would duplicate against a late match) nor
    never (no nulls at all). The oracle models precisely that: the batch
    time-range join UNION null-extended clicks whose windows closed before
    the final watermark; clicks inside the terminal watermark lag stay
    unemitted on both sides. Hash-matching nulls, matches, AND the
    boundary is the full outer-join state machine verified end-to-end."""
    from rtcdb_spark.streaming.events import stream_stream_left_join

    ev = read_events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = run_available_now(
        stream_stream_left_join(clicks, purchases), output_mode="append"
    )
    return out.select(
        "user_id",
        "click_id",
        "click_ts",
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        "purchase_ts",
        "purchase_value",
    ).orderBy("user_id", "click_id", "purchase_id")


@query(
    "stream_join_full_outer",
    """
    WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                  - INTERVAL 1 HOUR AS w),
    matched AS (
        SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM c JOIN p ON c.user_id = p.user_id
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    ),
    unmatched_c AS (
        SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
               CAST(NULL AS BIGINT) AS purchase_id,
               CAST(NULL AS TIMESTAMP) AS purchase_ts,
               CAST(NULL AS DOUBLE) AS purchase_value
        FROM c
        WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = c.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        )
        AND c.ts + INTERVAL 2 HOUR < (SELECT w FROM wm)
    ),
    unmatched_p AS (
        SELECT p.user_id, CAST(NULL AS BIGINT) AS click_id,
               CAST(NULL AS TIMESTAMP) AS click_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM p
        WHERE NOT EXISTS (
            SELECT 1 FROM c
            WHERE c.user_id = p.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        )
        AND p.ts < (SELECT w FROM wm)
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_c
    UNION ALL SELECT * FROM unmatched_p
    ORDER BY user_id, click_id, purchase_id
    """,
    tags=("streaming", "join", "full-outer", "watermark"),
)
def stream_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join run to completion (round 5): matched
    pairs plus BOTH sides' eviction-driven null extensions. The oracle
    models each side's distinct eviction schedule — a click null-emits
    when the watermark passes the END of its forward match window
    (click_ts + 2 h), a purchase when the watermark passes its OWN
    timestamp (its match window looks backward, so the first unmatchable
    moment is its event time) — and rows inside the terminal watermark lag
    stay unemitted on both sides. Hash-matching matches plus both
    null-extension sets plus both boundaries verifies the complete outer
    state machine, including that the two sides evict on different
    clocks."""
    from rtcdb_spark.streaming.events import stream_stream_full_join

    ev = read_events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = run_available_now(
        stream_stream_full_join(clicks, purchases), output_mode="append"
    )
    return out.select(
        "user_id",
        "click_id",
        "click_ts",
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        "purchase_ts",
        "purchase_value",
    ).orderBy("user_id", "click_id", "purchase_id")


@query(
    "stream_rtcdb_native_sink",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(event_id AS BIGINT)) AS BIGINT) AS id_sum,
           CAST(SUM(CAST(user_id AS BIGINT)) AS BIGINT) AS user_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "sink", "rtcdb-format", "interchange"),
)
def stream_rtcdb_native_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live streaming ingestion into the reference's OWN columnar format
    (`streaming.sinks.stream_to_rtcdb`): the event stream runs to
    completion with every micro-batch appended as LZ4 blocks + sparse
    index entries, then the table is read back through the pluggable
    `rtcdb` data source and aggregated. The oracle aggregates the events
    fixture directly, so the hash match proves the whole chain — stream
    batching, per-batch block encode, multi-batch append layout, zone-map
    indexed read — loses and duplicates nothing across batch boundaries
    (short tail blocks included). Delivery is at-least-once by the
    format's nature (no atomic commit — documented); exactly-once lives
    in stream_versioned_sink."""
    import shutil
    import tempfile

    from rtcdb_spark.sources.rtcdb_native import read_rtcdb
    from rtcdb_spark.streaming import read_events_stream
    from rtcdb_spark.streaming.sinks import stream_to_rtcdb

    work = tempfile.mkdtemp(prefix="rtcdb_stream_native_")
    root = f"{work}/db"
    stream_to_rtcdb(
        read_events_stream(spark, sf_dir, max_files_per_trigger=1),
        root,
        "events",
        f"{work}/cp",
    )
    back = read_rtcdb(spark, root, "events")
    out = (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
            F.sum("user_id").cast("bigint").alias("user_sum"),
        )
        .orderBy("event_type")
    )
    shutil.rmtree(f"{work}/cp", ignore_errors=True)
    return out


@query(
    "stream_cdc_tombstones",
    """
    WITH ranked AS (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(event_id AS BIGINT) AS event_id,
           ts, event_type, value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    tags=("streaming", "cdc", "tombstone", "delete"),
)
def stream_cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with delete markers (`streaming.sinks.
    stream_cdc_with_tombstones`): 'error' events act as tombstones — a
    user whose NEWEST event is a tombstone is absent from the served
    table, while retained tombstone state stops late older upserts from
    resurrecting the key. The pipeline replays from a fresh checkpoint
    (idempotence asserted), then serves the snapshot through
    `read_cdc_snapshot`. The oracle takes each user's latest event and
    drops users whose latest is a tombstone, so the hash match proves
    delete-vs-upsert is decided by the version order exactly — the
    Debezium/compacted-topic semantics end-to-end."""
    import tempfile

    from rtcdb_spark.streaming import read_events_stream
    from rtcdb_spark.streaming.sinks import (
        read_cdc_snapshot,
        stream_cdc_with_tombstones,
    )

    root = tempfile.mkdtemp(prefix="rtcdb_cdc_tomb_")
    out = f"{root}/snapshot"
    stream_cdc_with_tombstones(read_events_stream(spark, sf_dir), out, f"{root}/cp1")
    # Distributed replay-idempotence check (r6 verdict item 2): the same
    # two-scalar multiset signature as stream_cdc_upsert.
    first = _multiset_signature(read_cdc_snapshot(spark, out))
    stream_cdc_with_tombstones(read_events_stream(spark, sf_dir), out, f"{root}/cp2")
    second = _multiset_signature(read_cdc_snapshot(spark, out))
    assert first == second, "tombstone CDC replay changed the snapshot"
    return (
        read_cdc_snapshot(spark, out)
        .select(
            "user_id",
            F.col("event_id").cast("bigint").alias("event_id"),
            "ts",
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )


@query(
    "stream_append_mode_boundary",
    f"""
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
           <= (SELECT w FROM wm)
    ORDER BY 1, 3
    """,
    tags=("streaming", "watermark", "append", "late-data"),
)
def stream_append_mode_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode emission boundary — the watermark contract graded
    directly: events replay as three time-ordered micro-batches
    (single-file slices with forced modification-time order), and a
    watermarked tumbling aggregate in append mode may emit a window ONLY
    once the watermark passes its end — each window exactly once, fully
    aggregated, and the trailing windows inside the final watermark lag
    withheld. The oracle computes the identical window aggregate and
    keeps windows with end <= max(ts) - delay, so the hash match pins
    all three failure modes: early emission (a window emitted before its
    last batch arrives would carry a partial count), re-emission, and a
    wrong boundary. Complete-mode parity is `stream_window_tumbling`;
    this is the append-mode half of the late-data story."""
    import glob
    import os
    import shutil
    import tempfile

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.streaming import read_events_stream, run_available_now

    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts")
    )
    qs = e.select(F.percentile_approx("ts", [1 / 3, 2 / 3], 10000).alias("q")).first()["q"]
    lo, hi = qs
    root = tempfile.mkdtemp(prefix="rtcdb_append_boundary_")
    parts = [
        e.filter(F.col("ts") <= F.lit(lo)),
        e.filter((F.col("ts") > F.lit(lo)) & (F.col("ts") <= F.lit(hi))),
        e.filter(F.col("ts") > F.lit(hi)),
    ]
    for i, p in enumerate(parts):
        stage = tempfile.mkdtemp()
        p.coalesce(1).write.mode("overwrite").parquet(stage)
        src = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = os.path.join(root, f"slice-{i}.parquet")
        shutil.move(src, dst)
        # FileStreamSource orders by modification time: force slice order so
        # the watermark advances through the slices deterministically.
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
        shutil.rmtree(stage, ignore_errors=True)

    sdf = read_events_stream(spark, sf_dir, max_files_per_trigger=1, path=root)
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    out = run_available_now(agg, output_mode="append")
    return out.orderBy("window_start", "event_type")


_NEAR_SIMHASH_FLAGS_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h_hi,
               CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h_lo
        FROM toks
    ),
    bits AS (
        SELECT doc_id, b,
               CASE WHEN (CASE WHEN b < 32 THEN (h_lo >> b)
                          ELSE (h_hi >> (b - 32)) END) & 1 = 1
                    THEN 1 ELSE -1 END AS w
        FROM h CROSS JOIN generate_series(0, 63) t(b)
    ),
    per_bit AS (SELECT doc_id, b, SUM(w) AS s FROM bits GROUP BY doc_id, b),
    sigs AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 AND b >= 32
                             THEN (CAST(1 AS BIGINT) << (b % 32)) ELSE 0 END)
                    AS BIGINT) AS sim_hi,
               CAST(SUM(CASE WHEN s > 0 AND b < 32
                             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                    AS BIGINT) AS sim_lo
        FROM per_bit GROUP BY doc_id
    ),
    dup AS (
        SELECT DISTINCT a.doc_id
        FROM sigs a JOIN sigs b ON b.doc_id < a.doc_id
        WHERE bit_count(xor(a.sim_hi, b.sim_hi))
              + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
    )
    SELECT s.doc_id,
           CAST(CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_near_dup
    FROM sigs s LEFT JOIN dup d ON s.doc_id = d.doc_id
    ORDER BY s.doc_id
    """


@query(
    "stream_dedup_near_simhash",
    _NEAR_SIMHASH_FLAGS_ORACLE,
    tags=("streaming", "dedup", "simhash"),
)
def stream_dedup_near_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE near-dup detection: documents stream through a banded-SimHash
    stateful operator (`streaming.dedup.stream_near_dedup_simhash`) that
    flags each arrival within Hamming radius 3 of any earlier doc, keeping
    only capped per-band signature buckets as state (never the corpus).
    The signature is a stateless per-row higher-order-function fold
    (`simhash64_rowwise` — zero shuffle), so bucket probing is the query's
    single stateful operator. The brute-force all-pairs oracle defines the
    semantics; the streaming plan must reproduce it with bucketed state
    only. Per-doc OR over the four band verdicts runs on the sink output
    (Spark forbids chaining a second stateful agg after arbitrary state).
    """
    from rtcdb_spark.streaming import run_available_now, stream_near_dedup_simhash
    from rtcdb_spark.streaming.events import read_table_stream

    sdf = read_table_stream(spark, sf_dir, "documents")
    flags = run_available_now(
        stream_near_dedup_simhash(sdf), output_mode="append"
    )
    return (
        flags.groupBy("doc_id")
        .agg(F.max(F.col("is_dup").cast("int")).cast("long").alias("is_near_dup"))
        .orderBy("doc_id")
    )


@query(
    "stream_dedup_near_simhash_unordered",
    _NEAR_SIMHASH_FLAGS_ORACLE,
    tags=("streaming", "dedup", "simhash", "watermark", "out-of-order"),
)
def stream_dedup_near_simhash_unordered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The UNORDERED-feed near-dup gate (round 6 — implements the
    watermark-buffered alternative the ordered gate's contract documents):
    documents are deliberately scattered across three micro-batches by a
    deterministic ±40-id jitter (xxhash64), so ids interleave across
    batches — the arrival pattern that makes the zero-latency gate RAISE
    its contract violation — then flow through
    `streaming.dedup.stream_near_dedup_simhash_unordered`: each band
    bucket buffers arrivals behind a 100 s event-time watermark
    (ts = 1000 + doc_id seconds, so the watermark bounds the id disorder)
    and finalizes docs in (event time, doc_id) order via event-time
    timeouts; a trailing sentinel (huge ts) flushes the tail. The SAME
    brute-force all-pairs oracle judges it: out-of-order delivery must
    change NOTHING about which docs are flagged. State = capped seen
    buckets + the disorder window's buffer, never the corpus."""
    import os
    import tempfile

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.streaming import (
        run_available_now,
        stream_near_dedup_simhash_unordered as gate,
    )
    from rtcdb_spark.streaming.events import read_table_stream

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = d.count()
    root = tempfile.mkdtemp(prefix="rtcdb_unordered_feed_")
    # one scan, one partitioned write: doc → slice by jittered id, the
    # sentinel as slice 3 (vs 3 separate filter+coalesce writes, which
    # tripled the harness cost at sf0.1)
    cuts = [n // 3, 2 * n // 3]
    # pmod, not %: Spark's % follows the sign of xxhash64, which would
    # widen the jitter to [-120, +40] and let worst-case id disorder
    # exceed the 100 s watermark delay (ADVICE r6) — pmod keeps it ±40.
    slot = F.col("doc_id") + (F.pmod(F.xxhash64("doc_id"), F.lit(81)) - 40)
    sliced = d.withColumn(
        "slice",
        F.when(slot < cuts[0], 0).when(slot < cuts[1], 1).otherwise(2),
    ).unionByName(
        spark.createDataFrame(
            [(-1, "flush", 3)], "doc_id bigint, text string, slice int"
        )
    )
    stage = os.path.join(root, "_stage")
    sliced.repartition(4, "slice").write.partitionBy("slice").parquet(stage)
    for i in range(4):
        sub = os.path.join(stage, f"slice={i}")
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                dst = os.path.join(root, f"slice-{i}.parquet")
                os.rename(os.path.join(sub, f), dst)
                os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    sdf = read_table_stream(
        spark, sf_dir, "documents", max_files_per_trigger=1, path=root
    ).select(
        "doc_id",
        "text",
        F.when(
            F.col("doc_id") < 0, F.timestamp_seconds(F.lit(n + 101_000))
        )
        .otherwise(F.timestamp_seconds(F.col("doc_id") + 1000))
        .alias("ts"),
    )
    flags = run_available_now(gate(sdf, delay="100 seconds"), output_mode="append")
    return (
        flags.groupBy("doc_id")
        .agg(F.max(F.col("is_dup").cast("int")).cast("long").alias("is_near_dup"))
        .orderBy("doc_id")
    )


@query(
    "stream_ingest_dedup_versioned",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h_hi,
               CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h_lo
        FROM toks
    ),
    bits AS (
        SELECT doc_id, b,
               CASE WHEN (CASE WHEN b < 32 THEN (h_lo >> b)
                          ELSE (h_hi >> (b - 32)) END) & 1 = 1
                    THEN 1 ELSE -1 END AS w
        FROM h CROSS JOIN generate_series(0, 63) t(b)
    ),
    per_bit AS (SELECT doc_id, b, SUM(w) AS s FROM bits GROUP BY doc_id, b),
    sigs AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 AND b >= 32
                             THEN (CAST(1 AS BIGINT) << (b % 32)) ELSE 0 END)
                    AS BIGINT) AS sim_hi,
               CAST(SUM(CASE WHEN s > 0 AND b < 32
                             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                    AS BIGINT) AS sim_lo
        FROM per_bit GROUP BY doc_id
    ),
    dup AS (
        SELECT DISTINCT a.doc_id
        FROM sigs a JOIN sigs b ON b.doc_id < a.doc_id
        WHERE bit_count(xor(a.sim_hi, b.sim_hi))
              + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
    ORDER BY d.doc_id
    """,
    tags=("streaming", "dedup", "versioned", "composition"),
)
def stream_ingest_dedup_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSITE a corpus-ingest job runs: stream documents through the
    online near-dup gate (`stream_near_dedup_simhash`), append each
    micro-batch's survivors to a `VersionedTable` under the exactly-once
    (app_id, batch_id) commit protocol, then read the resulting snapshot.
    Every stage is an audited operator (stateful streaming dedup, ACID
    commit log, manifest-planned read); the oracle recomputes the survivor
    set from the brute-force all-pairs near-dup definition. Replay safety
    and multi-batch arrival are exercised in tests/test_streaming.py."""
    import tempfile

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.sources.versioned import VersionedTable
    from rtcdb_spark.streaming import stream_ingest_near_dedup_to_versioned
    from rtcdb_spark.streaming.events import read_table_stream

    root = tempfile.mkdtemp(prefix="rtcdb_ingest_dedup_")
    ckpt = tempfile.mkdtemp(prefix="rtcdb_ingest_ckpt_")
    sdf = read_table_stream(spark, sf_dir, "documents")
    static = load_table(spark, sf_dir, "documents")
    stream_ingest_near_dedup_to_versioned(sdf, static, root, ckpt)
    return (
        VersionedTable(spark, root)
        .read()
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "stream_delta_sink",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "delta", "sink", "exactly-once"),
)
def stream_delta_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion into a DELTA table (round 7,
    `streaming.sinks.stream_to_delta`): the events stream commits one
    Delta version per micro-batch, each carrying the protocol's
    ``txn(appId, version)`` idempotence mark in the same atomic commit
    as the adds. The pipeline then REPLAYS from a FRESH checkpoint —
    every batch re-delivered, batch ids restarting at 0 — and asserts
    the table gained ZERO commits: the ledger lives in the Delta log
    itself, so exactly-once survives losing the Spark checkpoint
    entirely (the property Delta's txnAppId pattern exists for).
    The aggregate runs over the sunk table, so a duplicated or dropped
    batch breaks the hash against the fixture."""
    import tempfile

    from rtcdb_spark.sources.delta_log import delta_versions, read_delta
    from rtcdb_spark.streaming import read_events_stream
    from rtcdb_spark.streaming.sinks import stream_to_delta
    from rtcdb_spark.queries.base import dsum

    root = tempfile.mkdtemp(prefix="rtcdb_delta_sink_")
    table = f"{root}/table"
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    stream_to_delta(
        read_events_stream(spark, sf_dir).select(*cols),
        table, f"{root}/cp1", app_id="w1",
    )
    before = delta_versions(table)
    stream_to_delta(  # fresh checkpoint: full replay, must be a no-op
        read_events_stream(spark, sf_dir).select(*cols),
        table, f"{root}/cp2", app_id="w1",
    )
    assert delta_versions(table) == before, "replay added Delta commits"
    t = read_delta(spark, table)
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum("value", alias="total_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("event_type")
    )


@query(
    "stream_delta_source",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("streaming", "delta", "source", "datasource", "exactly-once"),
)
def stream_delta_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta table as a STREAMING SOURCE (round 8,
    `sources/delta_stream.py` — a Spark-4 Python streaming data source
    whose offsets are Delta commit versions): orders lands in two append
    commits with an OPTIMIZE compaction after them (dataChange=false —
    the stream must NOT re-emit the rewritten rows); a checkpointed
    availableNow run drains the log into a parquet sink; a THIRD commit
    lands and a second run from the SAME checkpoint must deliver exactly
    the new commit's rows (exactly-once across restarts, asserted
    in-query via sink counts). Each added file becomes its own input
    partition and ships Arrow RecordBatches with the partition column
    attached — zero per-row Python, zero shuffle. The aggregate runs
    over the sunk rows, so a dropped commit, a re-emitted file, or a
    compaction leak breaks the hash against the plain-orders fixture."""
    import os
    import tempfile

    from rtcdb_spark.sources.delta_log import (
        append_delta,
        optimize_delta,
        write_delta,
    )
    from rtcdb_spark.sources.delta_stream import register_delta_stream

    from rtcdb_spark.sources import load_table

    register_delta_stream(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="rtcdb_delta_src_")
    path = os.path.join(root, "t")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 3 == 0), path)
    append_delta(o.filter(F.col("o_orderkey") % 3 == 1), path)
    optimize_delta(spark, path)  # maintenance: the stream must skip it

    def _drain() -> None:
        q = (
            spark.readStream.format("delta_stream")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _drain()
    n_first = spark.read.parquet(sink).count()
    n_slice12 = o.filter(F.col("o_orderkey") % 3 != 2).count()
    assert n_first == n_slice12, (
        f"first drain delivered {n_first} rows, expected {n_slice12} "
        "(compaction leak or dropped commit)"
    )
    append_delta(o.filter(F.col("o_orderkey") % 3 == 2), path)
    _drain()  # same checkpoint: must deliver ONLY the new commit
    sunk = spark.read.parquet(sink)
    return (
        sunk.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "stream_delta_cdf_source",
    """
    SELECT _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM (
        SELECT 'insert' AS _change_type, o_orderkey FROM orders
        UNION ALL
        SELECT 'delete' AS _change_type, o_orderkey
        FROM orders WHERE o_orderkey % 10 < 2
    )
    GROUP BY _change_type
    ORDER BY _change_type
    """,
    tags=("streaming", "delta", "source", "cdf", "change-feed",
          "exactly-once"),
)
def stream_delta_cdf_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta CHANGE DATA FEED as a STREAMING SOURCE (round 9,
    `delta_stream` with ``readChangeFeed=true``): orders lands in two
    CDF-enabled append commits; a checkpointed drain delivers their
    rows as `_change_type='insert'` with per-commit `_commit_version`;
    then a DV DELETE (%10 < 2) lands and a second drain from the SAME
    checkpoint must deliver exactly the CDC files' delete rows — one
    input partition per cdc file, `_change_type` read verbatim from the
    file, zero re-delivery of the inserts (asserted in-query by sink
    counts). The aggregate keys on change type over the sunk feed; a
    re-delivered insert, a missed cdc file, or a wrong change-type
    constant breaks the hash against the fixture's UNION ALL twin."""
    import os
    import shutil
    import tempfile

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.sources.delta_log import (
        append_delta,
        delete_delta,
        write_delta,
    )
    from rtcdb_spark.sources.delta_stream import register_delta_stream

    register_delta_stream(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="rtcdb_delta_cdf_src_")
    path = os.path.join(root, "t")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(
        o.filter(F.col("o_orderkey") % 2 == 0),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    append_delta(o.filter(F.col("o_orderkey") % 2 == 1), path)

    def _drain() -> None:
        q = (
            spark.readStream.format("delta_stream")
            .option("path", path)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _drain()
    n_inserts = spark.read.parquet(sink).count()
    n_total = o.count()
    assert n_inserts == n_total, (n_inserts, n_total)
    delete_delta(spark, path, "o_orderkey % 10 < 2")
    _drain()  # same checkpoint: ONLY the delete's cdc rows arrive
    sunk = spark.read.parquet(sink)
    return (
        sunk.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("_change_type")
    )


@query(
    "stream_delta_backfill_files",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
           MAX(o_orderkey) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("streaming", "delta", "backfill", "rate-limit", "maxfiles",
          "exactly-once"),
)
def stream_delta_backfill_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BACKFILL of one giant Delta commit (round 10,
    `delta_stream` with ``maxFilesPerTrigger`` — VERDICT r9 item 4):
    orders lands as ONE commit of 4 data files; checkpointed
    availableNow drains at maxFilesPerTrigger=2 must take ceil(4/2)=2
    micro-batches, each advancing a compound (version, file-index)
    offset WITHIN the commit — asserted in-query by the sink's strictly
    increasing, properly partial counts. A fifth-file commit then
    lands and one more drain from the SAME checkpoint delivers exactly
    it (exactly-once across the mid-commit boundaries). delta-spark
    semantics: an initial 1M-file load drains in bounded batches
    instead of one. The aggregate runs over the sunk rows, so a
    skipped, re-emitted, or double-counted file breaks the hash
    against the plain-orders fixture."""
    import os
    import shutil
    import tempfile

    from rtcdb_spark.sources import load_table
    from rtcdb_spark.sources.delta_log import append_delta, write_delta
    from rtcdb_spark.sources.delta_stream import register_delta_stream

    register_delta_stream(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="rtcdb_delta_backfill_")
    path = os.path.join(root, "t")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(path, ignore_errors=True)
    head = o.filter(F.col("o_orderkey") % 7 != 0)
    tail = o.filter(F.col("o_orderkey") % 7 == 0)
    write_delta(head.repartition(4), path)  # ONE commit, 4 files

    def _drain() -> int:
        q = (
            spark.readStream.format("delta_stream")
            .option("path", path)
            .option("maxFilesPerTrigger", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    n_head = head.count()
    counts = [_drain() for _ in range(2)]
    assert counts[1] == n_head and 0 < counts[0] < n_head, (
        "4 files at maxFilesPerTrigger=2 must drain in exactly 2 "
        f"batches, the first properly partial, got {counts} of {n_head}"
    )
    append_delta(tail.coalesce(1), path)  # v1 lands AFTER the backfill
    n_all = _drain()  # same checkpoint: only the new commit arrives
    assert n_all == n_head + tail.count(), (n_all, n_head)
    sunk = spark.read.parquet(sink)
    return (
        sunk.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("o_custkey").cast("bigint").alias("sum_cust"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )
