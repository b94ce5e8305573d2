"""Reshape / sampling / lateral / time-series operators (SURVEY §2 C-II/C-V+).

Four operator families the reference has no analogue for but any analytics
engine at 100 TB needs:

- **unpivot (melt)** — wide→long reshaping, `df.unpivot` (Spark 3.4+). The
  reference stores wide rows (reference README.md:8); melting is how wide
  metrics become groupable key/value pairs.
- **deterministic hash sampling** — `WHERE h(key) % N = 0` with a hash both
  engines compute identically (md5 hex prefix → int). Unlike `TABLESAMPLE` /
  `df.sample` (RNG-dependent, not reproducible cross-engine), a hash sample
  is a pure row-local predicate: it pushes down to the scan, needs no
  shuffle, is stable under repartitioning, and at 100 TB gives every
  executor an unbiased slice with zero coordination.
- **LATERAL correlated subquery** — per-outer-row top-N, the SQL-standard
  form Spark plans as a correlated join; complements the window-rank top-k
  in `window_topk_per_group`.
- **time-series gap-fill + forward-fill** — date spine via `sequence()` +
  explode, left join, then `last(value, ignorenulls=True)` over an ordered
  window. The spine is O(days × #series) — tiny next to the fact table —
  and the ffill window partitions by series, so state per partition is one
  running value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rtcdb_spark.queries.base import dsum, query, sql_dsum
from rtcdb_spark.sources import load_table


@query(
    "reshape_unpivot",
    f"""
    WITH a AS (
        SELECT l_returnflag,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a
    ORDER BY l_returnflag, metric
    """,
    tags=("reshape", "unpivot"),
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt: per-returnflag totals unpivoted to (key, metric, value)
    rows via `df.unpivot`. The unpivot itself is a per-row expansion (no
    shuffle); only the upstream aggregate exchanges data."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", alias="sum_qty"),
        dsum("l_extendedprice", alias="sum_price"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("l_returnflag", "metric")


@query(
    "sample_hash_deterministic",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 20 = 0
    ORDER BY o_orderkey
    """,
    tags=("sampling", "hash"),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% Bernoulli sample keyed on md5(o_orderkey): reproducible on any
    engine, any partitioning, any run — the property RNG-based TABLESAMPLE
    lacks. The predicate is row-local, so Catalyst keeps it in the scan
    stage; at 100 TB the sample costs one full scan and zero shuffles, and
    consistent keying means the *same* entities are sampled in every table
    (sample orders and their lineitems stay joinable)."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
    return (
        o.filter(h.cast("long") % 20 == 0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "join_lateral_topn",
    """
    SELECT n_name, c.c_name, c.c_acctbal
    FROM nation, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) c
    ORDER BY n_name, c_acctbal DESC, c_name
    """,
    tags=("join", "lateral"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by balance as a LATERAL correlated
    subquery (SQL-standard; Spark ≥3.2 plans it as a correlated join and
    decorrelates where it can). Functional twin of window-rank top-k; kept
    as the SQL-form coverage of the same operator."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_name, c.c_name, c.c_acctbal
        FROM nation, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) c
        ORDER BY n_name, c_acctbal DESC, c_name
        """
    )


@query(
    "timeseries_gapfill_ffill",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {sql_dsum('value', 4)} AS day_value
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
        SELECT t.event_type, gs.day
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM bounds
        ) gs
    )
    SELECT s.event_type, s.day, d.day_value,
           last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM spine s
    LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
    ORDER BY s.event_type, s.day
    """,
    tags=("timeseries", "gapfill", "window"),
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize a daily series: build a complete date spine per event_type
    (sequence + explode), left-join the observed daily totals, forward-fill
    gaps with `last(ignorenulls=True)`. Scale shape: the spine is
    O(#days × #series) — negligible vs the events fact table; the daily
    aggregate partial-combines before its shuffle; the ffill window holds
    one running value per series partition. The aggregated daily side is
    broadcast (O(#days × #series) rows however big the fact table is) — it
    must be the build side since the spine is the preserved side of the
    left join."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(dsum("value", scale=4, alias="day_value"))
    bounds = e.select(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    spine = e.select("event_type").distinct().crossJoin(days)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(F.broadcast(daily), ["event_type", "day"], "left")
        .withColumn("filled_value", F.last("day_value", ignorenulls=True).over(w))
        .select("event_type", "day", "day_value", "filled_value")
        .orderBy("event_type", "day")
    )


@query(
    "reshape_posexplode",
    """
    SELECT vec_id, pos, ROUND(CAST(val AS DOUBLE), 6) AS val
    FROM (
        SELECT vec_id,
               UNNEST(range(len(embedding))) AS pos,
               UNNEST(embedding) AS val
        FROM embeddings
        WHERE vec_id < 5
    )
    ORDER BY vec_id, pos
    """,
    tags=("reshape", "array"),
)
def reshape_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (posexplode): array → (position, value) rows, the
    long-format bridge used by the IVF/PQ kernels internally
    (functions/similarity.py). Map-side only — row count multiplies by the
    vector dimension, so downstream aggregates should partial-combine before
    any shuffle (the k-means update in functions.similarity does exactly
    that)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            "pos",
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


@query(
    "reshape_explode_outer",
    """
    WITH t AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN []
                    ELSE string_split(text, ' ')[1:3] END AS toks
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id, u.tok
    FROM t LEFT JOIN (
        SELECT doc_id, unnest(toks) AS tok FROM t
    ) u USING (doc_id)
    ORDER BY doc_id, tok NULLS FIRST
    """,
    tags=("reshape", "explode", "nulls"),
)
def reshape_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (`explode_outer`): rows with empty arrays
    survive as a single null row instead of vanishing — the difference
    between an inner and outer lateral flatten, and the semantics a
    row-accounting pipeline needs (every input doc appears in the output,
    exploded or not). Map-side operation, no shuffle; the oracle emulates
    it with unnest + left join since DuckDB's unnest drops empties."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.when(F.col("doc_id") % 7 == 0, F.array().cast("array<string>")).otherwise(
        F.slice(F.split("text", " "), 1, 3)
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", F.asc_nulls_first("tok"))
    )


@query(
    "timeseries_resample_interp",
    f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bkt,
               {sql_dsum('value', 4)} AS bkt_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS t0,
               date_trunc('hour', MAX(ts)) AS t1
        FROM events
    ),
    spine AS (
        SELECT t.event_type, gs.bkt
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bkt
            FROM bounds
        ) gs
    ),
    ctx AS (
        SELECT s.event_type, s.bkt, h.bkt_value,
               last_value(h.bkt_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN h.bkt_value IS NOT NULL THEN s.bkt END IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
               first_value(h.bkt_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.bkt
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN h.bkt_value IS NOT NULL THEN s.bkt END IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.bkt
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM spine s
        LEFT JOIN hourly h ON s.event_type = h.event_type AND s.bkt = h.bkt
    )
    SELECT event_type, bkt, bkt_value,
           CASE
               WHEN bkt_value IS NOT NULL THEN bkt_value
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               ELSE pv + (nv - pv) * (CAST(date_diff('hour', pd, bkt) AS DOUBLE)
                                      / date_diff('hour', pd, nd))
           END AS interp_value
    FROM ctx
    ORDER BY event_type, bkt
    """,
    tags=("timeseries", "resample", "interpolate", "window"),
)
def timeseries_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an hourly series by LINEAR INTERPOLATION — the resampling
    mode forward-fill can't provide (ffill steps, interp ramps; edges fall
    back to the nearest observation). Hourly buckets leave real gaps in the
    fixture (~6% of the spine at sf0.01), so the interpolation branch is
    genuinely exercised, not vacuous. Same scale shape as the ffill twin:
    tiny per-series spine, broadcast hourly aggregate, and per-series
    windows that carry one running (value, bucket) pair each way. The
    interpolation weight is written identically on both engines — one
    int-hour ratio cast to double, one multiply, one add — so the doubles
    match bit-exact."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bkt")
    ).agg(dsum("value", scale=4, alias="bkt_value"))
    bounds = e.select(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("bkt")
    )
    spine = e.select("event_type").distinct().crossJoin(grid)
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bkt = F.when(F.col("bkt_value").isNotNull(), F.col("bkt"))
    ctx = (
        spine.join(F.broadcast(hourly), ["event_type", "bkt"], "left")
        .withColumn("pv", F.last("bkt_value", ignorenulls=True).over(wb))
        .withColumn("pd", F.last(obs_bkt, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("bkt_value", ignorenulls=True).over(wf))
        .withColumn("nd", F.first(obs_bkt, ignorenulls=True).over(wf))
    )
    frac = (
        F.expr("timestampdiff(HOUR, pd, bkt)").cast("double")
        / F.expr("timestampdiff(HOUR, pd, nd)")
    )
    interp = (
        F.when(F.col("bkt_value").isNotNull(), F.col("bkt_value"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return (
        ctx.select("event_type", "bkt", "bkt_value", interp.alias("interp_value"))
        .orderBy("event_type", "bkt")
    )


@query(
    "timeseries_interval_union",
    """
    WITH iv AS (
        SELECT event_type,
               epoch_us(ts) AS s_us,
               epoch_us(ts) + 1800000000 AS e_us,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT event_type, s_us, e_us, event_id,
               CASE WHEN s_us > MAX(e_us) OVER (
                        PARTITION BY event_type ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR ROW_NUMBER() OVER (
                        PARTITION BY event_type ORDER BY s_us, event_id) = 1
                    THEN 1 ELSE 0 END AS is_new
        FROM iv
    ),
    blocks AS (
        SELECT event_type, s_us, e_us,
               SUM(is_new) OVER (
                   PARTITION BY event_type ORDER BY s_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk
        FROM flagged
    ),
    merged AS (
        SELECT event_type, blk, MIN(s_us) AS bs, MAX(e_us) AS be
        FROM blocks GROUP BY event_type, blk
    )
    SELECT event_type,
           COUNT(*) AS n_blocks,
           CAST(SUM(be - bs) AS BIGINT) AS covered_us
    FROM merged
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "interval", "union", "window"),
)
def timeseries_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (coverage) — merge each event's 30-minute activity
    interval into maximal covered blocks per event_type and report block
    count + total covered time: the classic gaps-and-islands interval
    algebra (uptime/occupancy coverage) that no plain aggregate expresses.
    One per-series sort window computes the running max of interval ends;
    a new block starts exactly where an interval's start clears every
    earlier end. All arithmetic is exact integer microseconds. Scale
    shape: one shuffle on the series key, then two map-combined
    aggregates; window state is a single running max per partition.
    Window ordering includes event_id so equal timestamps have a
    deterministic frame on both engines."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 1_800_000_000).alias("e_us"),
        "event_id",
    )
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnum = Window.partitionBy("event_type").orderBy("s_us", "event_id")
    flagged = iv.select(
        "event_type",
        "s_us",
        "e_us",
        "event_id",
        F.when(
            (F.col("s_us") > F.max("e_us").over(wprev))
            | (F.row_number().over(wnum) == 1),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # Same (s_us, event_id) order as the flag window: equal-timestamp rows
    # keep a deterministic frame, so block assignment can never split a tie
    # group across a boundary on either engine.
    wblk = (
        Window.partitionBy("event_type")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = flagged.withColumn("blk", F.sum("is_new").over(wblk))
    merged = blocks.groupBy("event_type", "blk").agg(
        F.min("s_us").alias("bs"), F.max("e_us").alias("be")
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("be") - F.col("bs")).cast("bigint").alias("covered_us"),
        )
        .orderBy("event_type")
    )
