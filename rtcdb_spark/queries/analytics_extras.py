"""Warehouse-maintenance and analytics extras: CDC snapshot diff, rolling
median, weighted sampling, and fuzzy string matching (SURVEY §2 C-III/C-VI
plus the warehouse surface). Each shows a scale-critical shape: the CDC diff
is the co-partitioned full-outer join incremental pipelines run per batch;
the rolling median is an exact order-statistic over a bounded window frame;
weighted sampling is the one-pass A-ES scheme whose top-k needs no global
sort of the corpus; the fuzzy join is deliberately sample-bounded (edit
distance is quadratic — the scale path is LSH, see dedup_lsh_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtcdb_spark.functions.text import MERSENNE_P, sql_stable_hash_mod, stable_hash_mod
from rtcdb_spark.queries.base import dsum, query, sql_dsum
from rtcdb_spark.sources import load_table


@query(
    "cdc_snapshot_diff",
    """
    WITH v_old AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    v_new AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_orderstatus AS old_status,
           n.o_orderstatus AS new_status
    FROM v_old o FULL OUTER JOIN v_new n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus <> n.o_orderstatus
    ORDER BY o_orderkey
    """,
    tags=("warehouse", "cdc", "diff"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: full-outer join on
    the key classifies every row as insert / delete / update (value drift on
    non-key columns), emitting the change feed an incremental consumer
    (MERGE, SCD2 — see warehouse.py) would apply. The two snapshots are
    carved deterministically from `orders` (drop-mod-7 vs drop-mod-11, with
    a status rewrite playing the 'updated' rows). At 100 TB both snapshots
    hash-partition on the key — AQE handles the join; if snapshots are
    bucketed on the key (sources.write_bucketed) the diff is exchange-free."""
    o = load_table(spark, sf_dir, "orders")
    v_old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    v_new = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    j = v_old.alias("o").join(v_new.alias("n"), "o_orderkey", "full_outer")
    old_k, new_k = F.col("o.o_orderstatus"), F.col("n.o_orderstatus")
    return (
        j.filter(old_k.isNull() | new_k.isNull() | (old_k != new_k))
        .select(
            "o_orderkey",
            F.when(old_k.isNull(), "insert")
            .when(new_k.isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            old_k.alias("old_status"),
            new_k.alias("new_status"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "window_rolling_median",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS cnt
        FROM orders GROUP BY 1
    ),
    framed AS (
        SELECT d, cnt,
               list(cnt) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS frame
        FROM daily
    )
    SELECT d, cnt,
           len(frame) AS n_days,
           list_sort(frame)[(len(frame) + 1) // 2] AS rolling_median
    FROM framed
    ORDER BY d
    """,
    tags=("window", "median", "timeseries"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling (lower) median of daily order counts: collect the
    bounded frame, sort it, index the middle — an exact order statistic no
    built-in moving aggregate provides. The frame is ≤7 integers so the
    per-row cost is O(1); the only shuffle is the daily pre-aggregate (the
    raw table never enters the window). Integer medians keep the result
    bit-exact across engines."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    framed = daily.withColumn("frame", F.collect_list("cnt").over(w))
    srt = F.array_sort("frame")
    n = F.size("frame")
    return framed.select(
        "d",
        "cnt",
        n.cast("bigint").alias("n_days"),
        F.element_at(srt, ((n + 1) / 2).cast("int")).alias("rolling_median"),
    ).orderBy("d")


@query(
    "sample_weighted",
    f"""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               ROUND(ln((CAST({sql_stable_hash_mod('CAST(o_orderkey AS VARCHAR)')}
                         AS DOUBLE) + 1) / {MERSENNE_P + 1})
                     / o_totalprice, 12) AS k
        FROM orders
    )
    SELECT o_orderkey, o_totalprice, k
    FROM keyed
    ORDER BY k DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sampling", "weighted"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws u ∈ (0,1] from a *deterministic* md5-based hash of its
    key and ranks by ln(u)/w — the top-k under that key is a weighted sample
    favoring high `o_totalprice`. One scan, no RNG state, reproducible on
    any engine/cluster/partitioning; top-k via TakeOrderedAndProject means
    no global sort at 100 TB. (ln(u)/w is the log-space form of u^(1/w) —
    monotone-equivalent, numerically safer for large weights.)"""
    o = load_table(spark, sf_dir, "orders")
    u = (
        stable_hash_mod(F.col("o_orderkey").cast("string")).cast("double") + 1
    ) / (MERSENNE_P + 1)
    k = F.round(F.log(u) / F.col("o_totalprice"), 12)
    return (
        o.select("o_orderkey", "o_totalprice", k.alias("k"))
        .orderBy(F.desc("k"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "join_fuzzy_levenshtein",
    """
    WITH s AS (
        SELECT p_partkey, p_name FROM part WHERE p_partkey < 100
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM s a JOIN s b
      ON a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY key_a, key_b
    """,
    tags=("join", "fuzzy", "levenshtein"),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: edit-distance ≤ 2 pairs over a bounded sample
    of part names, with a length-difference band as the cheap pre-filter
    (|len(a)-len(b)| ≤ 2 is implied by dist ≤ 2, and it prunes before the
    O(len²) levenshtein evaluates). Sample-bounded on purpose: all-pairs
    edit distance is quadratic; the 100 TB path blocks candidates first
    (LSH/shingle buckets, dedup_lsh_pairs) and runs levenshtein only inside
    buckets."""
    p = load_table(spark, sf_dir, "part")
    s = p.filter(F.col("p_partkey") < 100).select("p_partkey", "p_name")
    a = s.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = s.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.col("key_a") < F.col("key_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= 2
            ),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
        .orderBy("key_a", "key_b")
    )


_EWMA_ALPHA = 0.3
_EWMA_WINDOW = 14  # days of history per point


@query(
    "timeseries_ewma",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS cnt
        FROM orders GROUP BY 1
    ),
    framed AS (
        SELECT d, cnt,
               list({{'d': d, 'cnt': cnt}}) OVER
                   (ORDER BY d ROWS BETWEEN {_EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW)
                   AS frame
        FROM daily
    )
    SELECT d, cnt,
           ROUND(
               list_reduce([CAST(0 AS DOUBLE)] ||
                   list_transform(list_sort(frame),
                       e -> e.cnt * power(1 - {_EWMA_ALPHA}, date_diff('day', e.d, d))),
                   (a, x) -> a + x)
               /
               list_reduce([CAST(0 AS DOUBLE)] ||
                   list_transform(list_sort(frame),
                       e -> power(1 - {_EWMA_ALPHA}, date_diff('day', e.d, d))),
                   (a, x) -> a + x),
               6) AS ewma
    FROM framed
    ORDER BY d
    """,
    tags=("timeseries", "ewma", "smoothing"),
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily order volume
    (α=0.3, 14-day window): each day's smoothed value weights its frame by
    (1-α)^age-in-days and normalizes — the standard trend/anomaly smoother.
    Computed as a fold over the bounded collected frame in *date-sorted
    order* so double accumulation is engine-deterministic; the gap-aware
    day-difference weighting (not row offsets) makes missing days decay
    correctly. Only the vocabulary-sized daily table enters the window."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("d").rowsBetween(-(_EWMA_WINDOW - 1), 0)
    framed = daily.withColumn(
        "frame", F.collect_list(F.struct("d", "cnt")).over(w)
    )
    decay = lambda e: F.pow(  # noqa: E731
        F.lit(1 - _EWMA_ALPHA), F.datediff(F.col("d"), e["d"])
    )
    num = F.aggregate(
        F.array_sort("frame"), F.lit(0.0), lambda a, e: a + e["cnt"] * decay(e)
    )
    den = F.aggregate(
        F.array_sort("frame"), F.lit(0.0), lambda a, e: a + decay(e)
    )
    return framed.select(
        "d", "cnt", F.round(num / den, 6).alias("ewma")
    ).orderBy("d")


@query(
    "histogram_equidepth",
    """
    WITH ranked AS (
        SELECT value,
               NTILE(10) OVER (ORDER BY value, event_id) AS bucket
        FROM events WHERE value IS NOT NULL
    )
    SELECT bucket, COUNT(*) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM ranked GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("agg", "histogram", "quantile"),
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram: NTILE(10) over the value order gives
    ten equal-population buckets with their [lo, hi] ranges — the histogram
    CBOs and data-quality monitors want when the distribution is skewed
    (equi-width puts 99% of rows in one bin). Exact NTILE needs a global
    sort; at 100 TB swap in approx_percentile boundaries + a per-row bucket
    lookup (same output schema, one pass, no sort) — the exact form here is
    what the oracle can pin value-identical."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.orderBy("value", "event_id")
    return (
        e.select("value", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "events_user_paths",
    """
    WITH ordered AS (
        SELECT user_id,
               list(event_type ORDER BY ts, event_id) AS evs
        FROM events GROUP BY user_id
    ),
    paths AS (
        SELECT user_id, array_to_string(evs[1:3], '>') AS path
        FROM ordered
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
    tags=("analytics", "path", "funnel"),
)
def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: each user's first three event types (time-ordered,
    event_id tie-break) joined into a path string; top-20 most common entry
    paths — the product-analytics companion to funnel_conversion, but
    pattern-discovering rather than pattern-matching. One (user)-keyed
    aggregate whose state is 3 strings per user, then a tiny path count —
    no global sort, no self-join; at 100 TB the user-key shuffle is the
    only data movement."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    paths = first3.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(20)
    )


@query(
    "fn_bitwise",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 4096 AS b_or,
           xor(o_orderkey, 255) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("functions", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (AND/OR/XOR/shifts) — the tool kit behind
    bitmap flags, hash mixing, and bucket masks elsewhere in the engine.
    Pure codegen expressions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
    ).orderBy("o_orderkey")


@query(
    "agg_string_agg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("agg", "string_agg"),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped string aggregation (LISTAGG/STRING_AGG): collect, sort for
    determinism, join — collect_list order is partition-dependent in a
    distributed engine, so the explicit array_sort is what makes the result
    well-defined at any parallelism."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "window_moving_distinct",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, list(DISTINCT user_id) AS users
        FROM events GROUP BY 1
    )
    SELECT d,
           len(list_distinct(flatten(list(users) OVER
               (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))))
               AS active_7d
    FROM daily
    ORDER BY d
    """,
    tags=("window", "distinct", "timeseries"),
)
def window_moving_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users — the classic WAU-style metric.
    COUNT(DISTINCT) isn't frameable in any engine, so each day first
    reduces to its distinct-user set (corpus-sized aggregate, map-combined)
    and the window unions/dedups the ≤7 small sets per row. At 100 TB the
    window input is days × daily-actives, not events; if daily actives
    outgrow frame unions, swap the sets for mergeable HLL sketches
    (agg_hll_sketch_union) and trade exactness for fixed size."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.collect_set("user_id").alias("users")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d",
        F.size(F.array_distinct(F.flatten(F.collect_list("users").over(w)))).alias(
            "active_7d"
        ),
    ).orderBy("d")


@query(
    "fn_datetime_intervals",
    """
    WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
               FROM orders WHERE o_orderkey < 500)
    SELECT o_orderkey, od,
           CAST(od + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           last_day(od) AS month_end,
           date_diff('day', od, DATE '1998-12-31') AS days_to_eoy,
           date_diff('day', DATE '1992-01-01', od) // 7 AS weeks_since_epoch_start,
           CAST(date_trunc('week', od) AS DATE) AS week_start
    FROM d
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime", "interval"),
)
def fn_datetime_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: month addition (end-of-month clamped the
    same way in both engines), last_day, day/week differences, week
    truncation. Complements fn_datetime's extraction family; all codegen
    expressions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        od.alias("od"),
        F.add_months(od, 3).alias("plus_3m"),
        F.last_day(od).alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), od).alias("days_to_eoy"),
        F.floor(
            F.datediff(od, F.lit("1992-01-01").cast("date")) / 7
        ).cast("bigint").alias("weeks_since_epoch_start"),
        F.date_trunc("week", od).cast("date").alias("week_start"),
    ).orderBy("o_orderkey")


@query(
    "join_cross_small",
    """
    SELECT a.r_name AS name_a, b.r_name AS name_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    ORDER BY name_a, name_b
    """,
    tags=("join", "cross"),
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (bounded: region × region, 5×5) with a
    post-filter — the all-pairs primitive under the sample-bounded fuzzy/
    Jaccard joins. Deliberately small: an unbounded cross join is the one
    plan shape that has no 100 TB story; every scale path in this engine
    replaces it with blocking (LSH buckets, prefix filters, cells)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_name").alias("name_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .orderBy("name_a", "name_b")
    )


@query(
    "basket_brand_affinity",
    """
    WITH baskets AS (
        SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS brands
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY l_orderkey
        HAVING COUNT(DISTINCT p_brand) > 1
    ),
    n_orders AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem
    ),
    brand_counts AS (
        SELECT p_brand, COUNT(DISTINCT l_orderkey) AS n_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand
    ),
    pairs AS (
        SELECT u.a AS brand_a, u.b AS brand_b, COUNT(*) AS n_both
        FROM baskets,
             LATERAL (
                 SELECT unnest(flatten(list_transform(brands, (x, i) ->
                            list_transform(brands[i + 1:], y -> {'a': x, 'b': y}))),
                        recursive := true)
             ) u
        GROUP BY u.a, u.b
    )
    SELECT brand_a, brand_b, n_both,
           ROUND(CAST(n_both AS DOUBLE) * n.n
                 / (ca.n_brand * cb.n_brand), 6) AS lift
    FROM pairs
    JOIN brand_counts ca ON ca.p_brand = brand_a
    JOIN brand_counts cb ON cb.p_brand = brand_b
    CROSS JOIN n_orders n
    WHERE n_both >= 10
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 25
    """,
    tags=("analytics", "basket", "affinity"),
)
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top brand pairs by lift = P(A∧B)/(P(A)P(B))
    over orders containing both — the co-occurrence analysis behind
    recommendations and assortment planning. The pair expansion runs
    INSIDE each order's sorted distinct-brand array (the same
    transform/slice trick as the LSH bucket expansion — no self-join of
    the fact table, and per-order arrays are bounded by the brand
    universe, not order size); supports and the order count are
    map-combined aggregates broadcast back into the pair relation."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    lb = l.join(p, F.col("p_partkey") == F.col("l_partkey")).select(
        "l_orderkey", "p_brand"
    )
    baskets = (
        lb.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        .filter(F.size("brands") > 1)
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(brands, (x, i) -> "
                    "transform(slice(brands, i + 2, size(brands)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("brand_a"), F.col("p.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    n_orders = lb.agg(F.countDistinct("l_orderkey").alias("n"))
    brand_counts = lb.groupBy("p_brand").agg(
        F.countDistinct("l_orderkey").alias("n_brand")
    )
    ca = brand_counts.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("na")
    )
    cb = brand_counts.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("nb")
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .filter(F.col("n_both") >= 10)
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(25)
    )


@query(
    "events_activity_streaks",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    numbered AS (
        SELECT user_id, day,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM days
    ),
    runs AS (
        SELECT user_id, day - CAST(rn AS INTEGER) AS grp,
               COUNT(*) AS streak_days, MIN(day) AS streak_start
        FROM numbered GROUP BY user_id, day - CAST(rn AS INTEGER)
    ),
    ranked AS (
        SELECT user_id, streak_days, streak_start,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY streak_days DESC, streak_start ASC) AS pick
        FROM runs
    )
    SELECT user_id, streak_days, streak_start
    FROM ranked WHERE pick = 1
    ORDER BY user_id
    """,
    tags=("events", "streaks", "window"),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (tie → earliest) —
    the second classic gaps-and-islands shape (row_number difference: all
    days of one unbroken run share day − rn), the retention metric every
    engagement dashboard needs and no plain aggregate expresses. One
    shuffle on the user key; both windows and both aggregates reuse that
    partitioning; per-partition state is a single row number."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    wnum = Window.partitionBy("user_id").orderBy("day")
    numbered = days.withColumn("rn", F.row_number().over(wnum))
    runs = (
        numbered.withColumn("grp", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).alias("streak_days"),
            F.min("day").alias("streak_start"),
        )
    )
    wpick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        runs.withColumn("pick", F.row_number().over(wpick))
        .filter(F.col("pick") == 1)
        .select("user_id", "streak_days", "streak_start")
        .orderBy("user_id")
    )


@query(
    "anomaly_mad_robust",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS ad
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type, m.med, a.mad,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.ad > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           CAST(SUM(CASE WHEN d.ad > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
               / COUNT(*) AS outlier_rate
    FROM dev d
    JOIN mad a USING (event_type)
    JOIN med m USING (event_type)
    GROUP BY d.event_type, m.med, a.mad
    ORDER BY d.event_type
    """,
    tags=("anomaly", "robust", "percentile"),
)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    data-quality screen that survives what z-scores can't (a single wild
    value inflates mean AND stddev, hiding itself; median and MAD are
    50%-breakdown robust). Two exact-percentile passes (Spark `percentile`
    ≡ DuckDB `quantile_cont`, interpolation-identical): per-series median,
    then the median of absolute deviations, each a tiny per-series scalar
    broadcast back over the fact stream; the outlier threshold |v − med| >
    3·MAD evaluates identically on both engines. Scale shape: two
    series-key aggregations + two broadcast joins — the fact table never
    shuffles by anything but its series key."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = (F.col("ad") > 3 * F.col("mad")).cast("int")
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            "med",
            "mad",
            "n",
            "n_outliers",
            (F.col("n_outliers") / F.col("n")).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


_PMI_MIN_DF = 25  # token must appear in >= this many docs to enter pairing
_PMI_MIN_AB = 10  # pair must co-occur in >= this many docs to be reported


@query(
    "text_pmi_collocations",
    f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    df AS (SELECT tok, COUNT(*) AS dfreq FROM toks GROUP BY tok),
    freq AS (SELECT tok, dfreq FROM df WHERE dfreq >= {_PMI_MIN_DF}),
    ft AS (SELECT t.doc_id, t.tok FROM toks t JOIN freq USING (tok)),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS df_ab
        FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT tok_a, tok_b, df_ab,
           ROUND(ln(CAST(df_ab AS DOUBLE) * nd / (fa.dfreq * fb.dfreq)), 9) AS pmi
    FROM pairs
    JOIN freq fa ON fa.tok = tok_a
    JOIN freq fb ON fb.tok = tok_b
    CROSS JOIN n
    WHERE df_ab >= {_PMI_MIN_AB}
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT 20
    """,
    tags=("text", "pmi", "collocation", "llm-pipeline"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations — which token pairs
    co-occur in documents far more than chance (PMI = ln(df_ab·N /
    (df_a·df_b))): the corpus-linguistics step behind phrase mining and
    tokenizer-merge candidates. Scale shape: document-frequency filter
    FIRST (df ≥ {_PMI_MIN_DF} bounds the pairing vocabulary), then each
    doc's surviving tokens pair in-array (sorted collect_set + one
    triangular expansion expression — the same bounded-bucket shape as the
    LSH expansions, no per-doc self-join shuffle), one pair-key aggregate,
    and two broadcast joins against the tiny frequent-token table. The
    single ln() rounds to 9 decimals — libm vs JVM log may differ in the
    last ulp; everything inside is exact integer arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    nd = d.count()
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    freq = df.filter(F.col("dfreq") >= _PMI_MIN_DF)
    ft = toks.join(F.broadcast(freq.select("tok")), "tok")
    per_doc = ft.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("tok")).alias("ts")
    )
    pair_expr = """
        flatten(transform(ts, (a, i) ->
            transform(slice(ts, i + 2, size(ts) - i - 1),
                      b -> struct(a AS tok_a, b AS tok_b))))
    """
    pairs = (
        per_doc.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy("p.tok_a", "p.tok_b")
        .agg(F.count(F.lit(1)).alias("df_ab"))
        .filter(F.col("df_ab") >= _PMI_MIN_AB)
    )
    fa = freq.select(F.col("tok").alias("tok_a"), F.col("dfreq").alias("dfa"))
    fb = freq.select(F.col("tok").alias("tok_b"), F.col("dfreq").alias("dfb"))
    return (
        pairs.join(F.broadcast(fa), "tok_a")
        .join(F.broadcast(fb), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "df_ab",
            F.round(
                F.log(
                    F.col("df_ab").cast("double")
                    * F.lit(nd)
                    / (F.col("dfa") * F.col("dfb"))
                ),
                9,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(20)
    )


@query(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    trans AS (
        SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    ),
    outdeg AS (
        SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM trans GROUP BY src
    )
    SELECT t.src, t.dst, t.n AS n_transitions,
           t.n / o.total AS p_transition
    FROM trans t JOIN outdeg o USING (src)
    ORDER BY t.src, t.dst
    """,
    tags=("events", "markov", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event stream —
    the empirical P(next=b | current=a) behind journey modeling, anomaly
    detection on flows, and next-action prediction baselines. One user-key
    window (deterministic (ts, event_id) order), one (src, dst) aggregate
    with map-side combine, and a row-count-sized probability division —
    exact integers until the final IEEE division, identical on both
    engines. At 100 TB the transition matrix is |event_types|² rows — tiny
    — while the stream only shuffles by its user key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    outdeg = trans.groupBy("src").agg(
        F.sum("n_transitions").cast("bigint").alias("total")
    )
    return (
        trans.join(outdeg, "src")
        .select(
            "src",
            "dst",
            "n_transitions",
            (F.col("n_transitions") / F.col("total")).alias("p_transition"),
        )
        .orderBy("src", "dst")
    )


@query(
    "orders_rfm_segmentation",
    f"""
    WITH rfm AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               {sql_dsum('o_totalprice')} AS monetary
        FROM orders
        GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, last_order, frequency, monetary,
               NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        FROM rfm
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           {sql_dsum('monetary')} AS segment_value
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("warehouse", "rfm", "window"),
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — quintile scores on Recency (last order
    date), Frequency (order count), Monetary (exact-decimal spend), rolled
    into segment cells with customer counts and value: the classic
    warehouse scoring every CRM/retention pipeline computes. NTILE ties
    are broken by custkey in every ORDER BY so both engines assign
    identical quintiles. Scale note: a global NTILE is a single-partition
    sort — correct for customer-dimension cardinality (n_customers ≪
    fact rows); for a billion-customer corpus swap in percent_rank over
    range-partitioned sort, same semantics."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", alias="monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(5).over(Window.orderBy(F.desc("last_order"), F.asc("o_custkey"))).alias("r_score"),
        F.ntile(5).over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))).alias("f_score"),
        F.ntile(5).over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("monetary", alias="segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "lineitem_abc_pareto",
    f"""
    WITH rev AS (
        SELECT l_partkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
        FROM lineitem
        GROUP BY l_partkey
    ),
    tot AS (SELECT {sql_dsum('revenue', 4)} AS total FROM rev),
    ranked AS (
        SELECT l_partkey, revenue,
               SUM(CAST(revenue AS DECIMAL(38,4))) OVER (
                   ORDER BY revenue DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_dec
        FROM rev
    ),
    classed AS (
        SELECT l_partkey, revenue,
               CAST(cum_dec AS DOUBLE) / tot.total AS cum_share,
               CASE WHEN CAST(cum_dec AS DOUBLE) / tot.total <= 0.8 THEN 'A'
                    WHEN CAST(cum_dec AS DOUBLE) / tot.total <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked, tot
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           {sql_dsum('revenue', 4)} AS class_revenue,
           ROUND(MIN(cum_share), 9) AS share_from,
           ROUND(MAX(cum_share), 9) AS share_to
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    tags=("warehouse", "pareto", "window"),
)
def lineitem_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — rank parts by net revenue, accumulate
    the running share, and cut at 80%/95% into A/B/C classes: the
    inventory-analysis classic behind "20% of parts drive 80% of
    revenue". The running sum accumulates as exact DECIMAL over a fully
    deterministic (revenue DESC, partkey) order, so every cumulative
    share is ONE double division of identical operands on both engines;
    the per-class rollup then re-sums exactly. Scale note: the global
    ordered window is a single-partition sort over the PART dimension
    (≪ fact rows) — the fact table itself only shuffles once, by
    partkey, for the revenue rollup."""
    l = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = l.groupBy("l_partkey").agg(dsum(net, scale=4, alias="revenue"))
    total = rev.agg(dsum("revenue", scale=4, alias="total"))
    w = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.withColumn(
        "cum_dec", F.sum(F.col("revenue").cast("decimal(38,4)")).over(w)
    )
    classed = ranked.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "revenue",
        (F.col("cum_dec").cast("double") / F.col("total")).alias("cum_share"),
    )
    abc = F.when(F.col("cum_share") <= 0.8, "A").when(
        F.col("cum_share") <= 0.95, "B"
    ).otherwise("C")
    return (
        classed.withColumn("abc_class", abc)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("revenue", scale=4, alias="class_revenue"),
            F.round(F.min("cum_share"), 9).alias("share_from"),
            F.round(F.max("cum_share"), 9).alias("share_to"),
        )
        .orderBy("abc_class")
    )


@query(
    "events_behavior_entropy",
    """
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    packed AS (
        SELECT user_id, list_sort(list(c)) AS cl,
               CAST(SUM(c) AS BIGINT) AS n
        FROM counts GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(len(cl) AS BIGINT) AS n_types,
           ROUND(ln(CAST(n AS DOUBLE))
                 - list_reduce(list_transform(cl, c -> c * ln(CAST(c AS DOUBLE))),
                               (a, b) -> a + b) / n, 9) AS entropy
    FROM packed
    ORDER BY user_id
    """,
    tags=("events", "entropy", "statistics"),
)
def events_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity score (0 = single-action bots, ln(k) = uniform
    explorers) used for segmentation and bot screens. Computed as
    H = ln(n) − (Σ c·ln c)/n from exact integer counts; the Σ folds a
    SORTED count list left-to-right on BOTH engines (Spark `aggregate`
    lambda ≡ DuckDB `list_reduce`), so double addition order is pinned,
    and the one libm-vs-JVM ln ulp wobble is absorbed by the final
    9-decimal round. Per-user count lists are |event_types|-sized — the
    collect_list is bounded, never row-scaled."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    packed = counts.groupBy("user_id").agg(
        F.sort_array(F.collect_list("c")).alias("cl"),
        F.sum("c").cast("bigint").alias("n"),
    )
    ssum = F.expr(
        "aggregate(transform(cl, c -> c * ln(CAST(c AS DOUBLE))), 0D, (a, b) -> a + b)"
    )
    return packed.select(
        "user_id",
        "n",
        F.size("cl").cast("bigint").alias("n_types"),
        F.round(F.log(F.col("n").cast("double")) - ssum / F.col("n"), 9).alias(
            "entropy"
        ),
    ).orderBy("user_id")


_BACKLOG_OPEN_DAYS = 30


@query(
    "orders_backlog_timeseries",
    f"""
    WITH deltas AS (
        SELECT o_orderdate AS day, 1 AS d FROM orders
        UNION ALL
        SELECT CAST(o_orderdate + INTERVAL {_BACKLOG_OPEN_DAYS} DAY AS DATE), -1
        FROM orders
    ),
    daily AS (
        SELECT day, CAST(SUM(d) AS BIGINT) AS delta
        FROM deltas GROUP BY day
    )
    SELECT day, delta,
           CAST(SUM(delta) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS open_orders
    FROM daily
    ORDER BY day
    """,
    tags=("warehouse", "backlog", "window", "timeseries"),
)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by delta-event accounting: each order
    contributes +1 at placement and −1 when it ages out
    ({_BACKLOG_OPEN_DAYS} days), and the daily running sum of deltas IS
    the concurrent-open count — the event-sourcing/balance pattern
    (interval stabbing without an interval join) that turns "how many X
    were active on each day" into two map-only projections, one day-key
    aggregate, and one ordered prefix sum over the DATE dimension. Exact
    integers end to end. The global ordered window runs over distinct
    days only — thousands of rows at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    deltas = o.select(F.col("o_orderdate").alias("day"), F.lit(1).alias("d")).unionByName(
        o.select(
            F.date_add("o_orderdate", _BACKLOG_OPEN_DAYS).alias("day"),
            F.lit(-1).alias("d"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("d").cast("bigint").alias("delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn("open_orders", F.sum("delta").over(w).cast("bigint"))
        .select("day", "delta", "open_orders")
        .orderBy("day")
    )


@query(
    "orders_growth_mom",
    f"""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               {sql_dsum('o_totalprice', 2)} AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT CAST(month AS DATE) AS month, n_orders, revenue,
           LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
           (revenue - LAG(revenue) OVER (ORDER BY month))
               / LAG(revenue) OVER (ORDER BY month) AS growth
    FROM monthly
    ORDER BY month
    """,
    tags=("warehouse", "reporting", "window", "timeseries"),
)
def orders_growth_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the canonical reporting window
    (exact-decimal monthly totals, LAG, one IEEE division per row).
    The lag window runs over the MONTH dimension only; the fact table
    shuffles once for the monthly rollup with map-side combine. First
    month's growth is NULL on both engines (no prior period)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        dsum("o_totalprice", scale=2, alias="revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.select(
            F.col("month").cast("date").alias("month"),
            "n_orders",
            "revenue",
            prev.alias("prev_revenue"),
            ((F.col("revenue") - prev) / prev).alias("growth"),
        )
        .orderBy("month")
    )


@query(
    "timeseries_max_drawdown",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {sql_dsum('value', 4)} AS v
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    cum AS (
        SELECT event_type, day, v,
               MAX(v) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM daily
    ),
    dd AS (
        SELECT event_type, day, v, peak, v / peak - 1 AS drawdown
        FROM cum
    )
    SELECT event_type,
           ROUND(MIN(drawdown), 9) AS max_drawdown,
           CAST(SUM(CASE WHEN drawdown < -0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_days_below_half_peak
    FROM dd
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "drawdown", "window"),
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series — the peak-to-trough metric (finance's
    risk stat, ops' regression-from-peak monitor): running max of the
    exact-decimal daily totals, then the worst v/peak − 1. One series-key
    shuffle; the running max carries a single value per partition; each
    drawdown is one division of engine-identical doubles (rounded at the
    final MIN to absorb nothing — the inputs are already bit-equal — but
    kept for uniformity with the other ratio outputs)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        dsum("value", scale=4, alias="v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.withColumn("peak", F.max("v").over(w)).withColumn(
        "drawdown", F.col("v") / F.col("peak") - 1
    )
    return (
        dd.groupBy("event_type")
        .agg(
            F.round(F.min("drawdown"), 9).alias("max_drawdown"),
            F.sum((F.col("drawdown") < -0.5).cast("int"))
            .cast("bigint")
            .alias("n_days_below_half_peak"),
        )
        .orderBy("event_type")
    )


@query(
    "customer_order_gap_stats",
    """
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         LAG(o_orderdate) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    ),
    valid AS (SELECT o_custkey, gap_days FROM gaps WHERE gap_days IS NOT NULL)
    SELECT o_custkey,
           COUNT(*) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           quantile_cont(gap_days, 0.5) AS median_gap,
           CAST(SUM(gap_days) AS BIGINT) / COUNT(*) AS mean_gap
    FROM valid
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    ORDER BY o_custkey
    """,
    tags=("warehouse", "gaps", "window", "percentile"),
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer — purchase-cadence profiling
    (median/mean days between orders) behind churn prediction and
    replenishment models. LAG over a deterministic (orderdate, orderkey)
    order produces integer day gaps; min/max/median/mean are then exact
    (`percentile` ≡ `quantile_cont`; the mean is one division of exact
    integers). One customer-key shuffle reused by the window and the
    aggregate; HAVING keeps customers with enough history to profile."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").cast("bigint").alias("min_gap"),
            F.max("gap_days").cast("bigint").alias("max_gap"),
            F.expr("percentile(gap_days, 0.5)").alias("median_gap"),
            (F.sum("gap_days").cast("bigint") / F.count(F.lit(1))).alias("mean_gap"),
        )
        .filter(F.col("n_gaps") >= 3)
        .orderBy("o_custkey")
    )


@query(
    "supplier_concentration_hhi",
    f"""
    WITH srev AS (
        SELECT s.s_nationkey AS nationkey, l.l_suppkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey
    ),
    packed AS (
        SELECT nationkey,
               COUNT(*) AS n_suppliers,
               {sql_dsum('revenue', 4)} AS total,
               list_sort(list(revenue)) AS revs
        FROM srev GROUP BY nationkey
    )
    SELECT nationkey, n_suppliers,
           ROUND(list_reduce(list_transform(revs, r -> (r / total) * (r / total)),
                             (a, b) -> a + b), 9) AS hhi
    FROM packed
    ORDER BY nationkey
    """,
    tags=("warehouse", "concentration", "statistics"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per nation — Σ (supplier
    revenue share)², the antitrust/market-structure metric (1/n = perfect
    competition, 1.0 = monopoly) that also reads as join-skew risk: a
    high-HHI nation means one supplier key carries most of that nation's
    fact rows. Per-supplier revenue folds as exact decimals; each share²
    is two IEEE ops on engine-identical doubles; and the final Σ folds a
    SORTED share list left-to-right on both engines (Spark `aggregate` ≡
    DuckDB `list_reduce`) so double addition order is pinned — the same
    pinned-fold trick as events_behavior_entropy. Per-nation lists are
    supplier-dimension sized, never fact-scaled."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    srev = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(dsum(net, scale=4, alias="revenue"))
    )
    packed = srev.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dsum("revenue", scale=4, alias="total"),
        F.sort_array(F.collect_list("revenue")).alias("revs"),
    )
    hhi = F.expr(
        "aggregate(transform(revs, r -> (r / total) * (r / total)),"
        " 0D, (a, b) -> a + b)"
    )
    return packed.select(
        "nationkey", "n_suppliers", F.round(hhi, 9).alias("hhi")
    ).orderBy("nationkey")


@query(
    "funnel_time_to_convert",
    """
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events
        GROUP BY user_id
    ),
    converted AS (
        SELECT user_id,
               epoch_us(first_purchase) - epoch_us(first_view) AS gap_us
        FROM firsts
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    )
    SELECT COUNT(*) AS n_converted,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           quantile_cont(gap_us, 0.5) AS p50_gap_us,
           quantile_cont(gap_us, 0.9) AS p90_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM converted
    """,
    tags=("events", "funnel", "percentile"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — how long from a user's FIRST view to
    their FIRST purchase (view-led conversions only): the latency half of
    funnel analysis that `funnel_conversion`'s step counts don't show.
    One user-key aggregate computes both firsts with conditional MINs
    (no self-join of the events table), then exact integer-microsecond
    gaps feed exact percentiles (`percentile` ≡ `quantile_cont`). Scale:
    a single map-combined shuffle on user_id, then a scalar rollup."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            F.unix_micros(F.col("first_purchase").cast("timestamp"))
            - F.unix_micros(F.col("first_view").cast("timestamp"))
        ).alias("gap_us")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_gap_us"),
        F.expr("percentile(gap_us, 0.9)").alias("p90_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@query(
    "events_error_burn_rate",
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    rated AS (
        SELECT hr, n_events, n_errors,
               n_errors / n_events AS err_rate,
               CAST(SUM(n_errors) OVER (
                   ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS err_6h,
               CAST(SUM(n_events) OVER (
                   ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS tot_6h
        FROM hourly
    )
    SELECT hr, n_events, n_errors, err_rate,
           err_6h / tot_6h AS burn_rate_6h,
           CAST(err_6h / tot_6h > 0.25 AS BIGINT) AS alert
    FROM rated
    ORDER BY hr
    """,
    tags=("events", "sli", "window", "timeseries"),
)
def events_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn-rate monitoring — hourly error rate plus the 6-hour
    rolling burn rate and its alert flag: the multiwindow error-budget
    pattern from SRE practice, expressed as one hour-key aggregate and
    one bounded rolling frame over the HOUR dimension (the fact stream
    shuffles once; the window carries six partial sums). Counts are exact
    integers; each rate is one IEEE division; the alert flag is emitted
    as 0/1 BIGINT for canonicalizer-stable dtypes."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("int"))
        .cast("bigint")
        .alias("n_errors"),
    )
    w6 = Window.orderBy("hr").rowsBetween(-5, Window.currentRow)
    rated = hourly.select(
        "hr",
        "n_events",
        "n_errors",
        (F.col("n_errors") / F.col("n_events")).alias("err_rate"),
        F.sum("n_errors").over(w6).cast("bigint").alias("err_6h"),
        F.sum("n_events").over(w6).cast("bigint").alias("tot_6h"),
    )
    burn = F.col("err_6h") / F.col("tot_6h")
    return rated.select(
        "hr",
        "n_events",
        "n_errors",
        "err_rate",
        burn.alias("burn_rate_6h"),
        (burn > 0.25).cast("bigint").alias("alert"),
    ).orderBy("hr")


@query(
    "orders_new_vs_returning",
    """
    WITH firsts AS (
        SELECT o_custkey,
               MIN(date_trunc('month', o_orderdate)) AS first_month
        FROM orders GROUP BY o_custkey
    ),
    monthly AS (
        SELECT date_trunc('month', o.o_orderdate) AS month,
               COUNT(DISTINCT o.o_custkey) AS active_customers,
               COUNT(DISTINCT CASE WHEN f.first_month = date_trunc('month', o.o_orderdate)
                                   THEN o.o_custkey END) AS new_customers
        FROM orders o JOIN firsts f USING (o_custkey)
        GROUP BY date_trunc('month', o.o_orderdate)
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(active_customers AS BIGINT) AS active_customers,
           CAST(new_customers AS BIGINT) AS new_customers,
           CAST(active_customers - new_customers AS BIGINT) AS returning_customers,
           CAST(SUM(new_customers) OVER (
               ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_customers
    FROM monthly
    ORDER BY month
    """,
    tags=("warehouse", "growth", "window", "timeseries"),
)
def orders_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — per month: active customers, first-time (new)
    vs returning split, and the cumulative acquired-customer curve: the
    standard customer-ledger report. Each customer's acquisition month is
    one key-shuffle MIN; the monthly split is one distinct-count
    aggregate with the acquisition flag joined in (customer-dimension
    broadcast); the cumulative curve is a prefix sum over months only.
    Exact integers end to end."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("first_month"))
    monthly = (
        o.join(F.broadcast(firsts), "o_custkey")
        .groupBy(month.alias("month"))
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.countDistinct(
                F.when(
                    F.col("first_month") == F.date_trunc("month", "o_orderdate"),
                    F.col("o_custkey"),
                )
            ).alias("new_customers"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        monthly.select(
            F.col("month").cast("date").alias("month"),
            F.col("active_customers").cast("bigint").alias("active_customers"),
            F.col("new_customers").cast("bigint").alias("new_customers"),
            (F.col("active_customers") - F.col("new_customers"))
            .cast("bigint")
            .alias("returning_customers"),
            F.sum("new_customers").over(w).cast("bigint").alias("cumulative_customers"),
        )
        .orderBy("month")
    )


@query(
    "part_brand_share_shift",
    f"""
    WITH monthly AS (
        SELECT date_trunc('month', o.o_orderdate) AS month, p.p_brand,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY date_trunc('month', o.o_orderdate), p.p_brand
    ),
    tot AS (
        SELECT month, {sql_dsum('revenue', 4)} AS month_total
        FROM monthly GROUP BY month
    ),
    shares AS (
        SELECT m.month, m.p_brand, m.revenue,
               m.revenue / t.month_total AS share
        FROM monthly m JOIN tot t USING (month)
    )
    SELECT CAST(month AS DATE) AS month, p_brand, revenue, share,
           share - LAG(share) OVER (
               PARTITION BY p_brand ORDER BY month) AS share_shift
    FROM shares
    ORDER BY month, p_brand
    """,
    tags=("warehouse", "share", "window", "timeseries"),
)
def part_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand market-share shift — each brand's monthly revenue share and
    its month-over-month delta: the competitive-dynamics report behind
    assortment decisions. Exact-decimal revenue rolls up once from the
    fact join; shares divide engine-identical doubles by the broadcast
    month totals; the shift is one LAG over the (brand, month) dimension
    — no second pass over facts."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    monthly = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"), "p_brand")
        .agg(dsum(net, scale=4, alias="revenue"))
    )
    tot = monthly.groupBy("month").agg(dsum("revenue", scale=4, alias="month_total"))
    shares = monthly.join(F.broadcast(tot), "month").select(
        "month",
        "p_brand",
        "revenue",
        (F.col("revenue") / F.col("month_total")).alias("share"),
    )
    w = Window.partitionBy("p_brand").orderBy("month")
    return (
        shares.select(
            F.col("month").cast("date").alias("month"),
            "p_brand",
            "revenue",
            "share",
            (F.col("share") - F.lag("share").over(w)).alias("share_shift"),
        )
        .orderBy("month", "p_brand")
    )


@query(
    "events_peak_concurrency",
    """
    WITH deltas AS (
        SELECT event_type, epoch_us(ts) AS t, 1 AS d, event_id FROM events
        UNION ALL
        SELECT event_type, epoch_us(ts) + 1800000000 AS t, -1 AS d, event_id
        FROM events
    ),
    running AS (
        SELECT event_type, t, d,
               SUM(d) OVER (
                   PARTITION BY event_type
                   ORDER BY t, d, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        FROM deltas
    ),
    peak AS (
        SELECT event_type, MAX(conc) AS peak_concurrency FROM running
        GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(p.peak_concurrency AS BIGINT) AS peak_concurrency,
           MIN(r.t) AS peak_at_us
    FROM running r JOIN peak p
      ON r.event_type = p.event_type AND r.conc = p.peak_concurrency
    GROUP BY r.event_type, p.peak_concurrency
    ORDER BY r.event_type
    """,
    tags=("events", "concurrency", "interval", "window"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per series — the maximum number of simultaneously
    active 30-minute event intervals and the first microsecond it was
    reached: the capacity-planning complement to the interval-union and
    backlog queries (union gives covered time, backlog the daily curve,
    this the instantaneous max). Sweep-line as SQL: ±1 delta events, one
    per-series ordered prefix sum (end-exclusive semantics pinned by
    ordering (t, d, event_id) — a −1 at instant t sorts before a +1, and
    the unique event_id makes equal instants deterministic on both
    engines), then max + earliest-attainment. Exact integers only."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    deltas = e.select(
        "event_type", t_us.alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionByName(
        e.select(
            "event_type",
            (t_us + 1_800_000_000).alias("t"),
            F.lit(-1).alias("d"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn("conc", F.sum("d").over(w))
    peak = running.groupBy("event_type").agg(
        F.max("conc").alias("peak_concurrency")
    )
    return (
        running.join(peak, ["event_type"])
        .filter(F.col("conc") == F.col("peak_concurrency"))
        .groupBy("event_type", "peak_concurrency")
        .agg(F.min("t").alias("peak_at_us"))
        .select(
            "event_type",
            F.col("peak_concurrency").cast("bigint").alias("peak_concurrency"),
            "peak_at_us",
        )
        .orderBy("event_type")
    )


@query(
    "customer_spend_gini",
    f"""
    WITH spend AS (
        SELECT o_custkey, {sql_dsum('o_totalprice', 2)} AS x
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM spend
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(i * x AS DECIMAL(38,2))) AS DOUBLE) AS six
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(2 * six / (n * sx) - (n + 1.0) / n, 9) AS gini
    FROM m
    """,
    tags=("warehouse", "inequality", "statistics", "window"),
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality summary
    (0 = everyone spends alike, →1 = one whale) used for revenue-risk
    and whale-dependency reporting; the same number also predicts fact
    skew on the customer key. Computed from the sorted-rank identity
    G = 2·Σ i·xᵢ / (n·Σ xᵢ) − (n+1)/n: spend is exact-decimal money
    (2 dp), so every i·xᵢ term is EXACT at scale 2 and both Σ accumulate
    as decimals — order-independent, engine-identical; the finale is a
    handful of IEEE ops rounded at 9. The rank window sorts the
    customer dimension, not facts."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(dsum("o_totalprice", scale=2, alias="x"))
    w = Window.orderBy("x", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("i") * F.col("x")).cast("decimal(38,2)")).cast("double").alias("six"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(
            2 * F.col("six") / (nd * F.col("sx")) - (nd + 1.0) / nd, 9
        ).alias("gini"),
    )


@query(
    "events_json_schema_profile",
    """
    WITH n AS (SELECT COUNT(*) AS total FROM events),
    keys AS (
        SELECT unnest(json_keys(props)) AS key FROM events
        WHERE props IS NOT NULL
    )
    SELECT key,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) AS BIGINT) / n.total AS coverage
    FROM keys, n
    GROUP BY key, n.total
    ORDER BY key
    """,
    tags=("events", "json", "schema-discovery", "profiling"),
)
def events_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema discovery — which keys the JSON `props`
    column actually carries and how much of the stream each covers: the
    first question against any event payload column, and the input to
    promote-to-column decisions (a key at 99% coverage belongs in the
    schema; one at 0.1% stays in the blob). JVM-native JSON key
    extraction on both engines (`json_object_keys` ≡ `json_keys`), one
    key aggregate, one scalar total — exact integers until the coverage
    division."""
    e = load_table(spark, sf_dir, "events")
    total = e.count()
    keys = e.filter(F.col("props").isNotNull()).select(
        F.explode(F.json_object_keys("props")).alias("key")
    )
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("bigint") / F.lit(total)).alias("coverage"),
        )
        .orderBy("key")
    )


@query(
    "orders_cohort_ltv_curve",
    f"""
    WITH firsts AS (
        SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    aged AS (
        SELECT f.cohort,
               date_diff('month', f.cohort, date_trunc('month', o.o_orderdate))
                   AS age_months,
               o.o_totalprice
        FROM orders o JOIN firsts f USING (o_custkey)
    ),
    cohort_rev AS (
        SELECT cohort, age_months, {sql_dsum('o_totalprice', 2)} AS rev
        FROM aged GROUP BY cohort, age_months
    )
    SELECT CAST(cohort AS DATE) AS cohort,
           CAST(age_months AS BIGINT) AS age_months,
           rev,
           CAST(SUM(CAST(rev AS DECIMAL(38,2))) OVER (
               PARTITION BY cohort ORDER BY age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cumulative_ltv
    FROM cohort_rev
    WHERE age_months <= 12
    ORDER BY cohort, age_months
    """,
    tags=("warehouse", "cohort", "ltv", "window", "timeseries"),
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — cumulative revenue per acquisition cohort by
    month age (first year): the lifetime-value report that decides
    acquisition spend. Acquisition months come from one key-shuffle MIN
    broadcast back over orders; per-(cohort, age) revenue and the running
    LTV both accumulate as exact decimals, so the curve is
    order-independent and engine-identical. The cumulative window runs
    over the cohort×age grid (months², tiny) — never over facts."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("cohort"))
    aged = o.join(F.broadcast(firsts), "o_custkey").select(
        "cohort",
        F.months_between(F.date_trunc("month", "o_orderdate"), F.col("cohort"))
        .cast("long")
        .alias("age_months"),
        "o_totalprice",
    )
    cohort_rev = aged.groupBy("cohort", "age_months").agg(
        dsum("o_totalprice", scale=2, alias="rev")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cohort_rev.filter(F.col("age_months") <= 12)
        .withColumn(
            "cumulative_ltv",
            F.sum(F.col("rev").cast("decimal(38,2)")).over(w).cast("double"),
        )
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            F.col("age_months").cast("bigint").alias("age_months"),
            "rev",
            "cumulative_ltv",
        )
        .orderBy("cohort", "age_months")
    )


@query(
    "timeseries_cusum_drift",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {sql_dsum('value', 4)} AS v
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(CAST(v AS DECIMAL(28,4))
                             * CAST(v AS DECIMAL(28,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sxx
        FROM daily GROUP BY event_type
    ),
    derived AS (
        SELECT event_type, n,
               sx / n AS mean_v,
               sqrt((sxx - sx * sx / n) / n) AS std_v
        FROM stats
    ),
    walked AS (
        SELECT d.event_type, d.day,
               SUM(d.v - s.mean_v) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
        FROM daily d JOIN derived s USING (event_type)
    ),
    cusum AS (
        SELECT event_type, day,
               prefix - least(CAST(0.0 AS DOUBLE), MIN(prefix) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS c
        FROM walked
    )
    SELECT c.event_type,
           CAST(s.n AS BIGINT) AS n_days,
           ROUND(s.mean_v, 9) AS mean_v,
           ROUND(MAX(c.c), 9) AS max_cusum,
           CAST(MAX(c.c) > 2 * s.std_v AS BIGINT) AS drift_alarm
    FROM cusum c JOIN derived s USING (event_type)
    GROUP BY c.event_type, s.n, s.mean_v, s.std_v
    ORDER BY c.event_type
    """,
    tags=("timeseries", "cusum", "drift", "statistics"),
)
def timeseries_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per series — the sequential change-point
    statistic cₜ = max(0, cₜ₋₁ + (xₜ − μ)) whose peak exceeding 2σ flags
    sustained upward drift (SPC's classic, catching slow shifts a
    threshold-on-daily-value misses). The recurrence looks
    fold-only, but the prefix-minimum identity cₜ = prefixₜ −
    min(0, min_{{j≤t}} prefixⱼ) turns it into TWO ordinary cumulative
    windows over the same per-series ordering — no recursion, no UDF,
    deterministic on both engines (deviations subtract engine-identical
    means from exact-decimal daily totals, and every prefix is the same
    left-to-right windowed sum). μ and σ come from exact decimal
    moments; the alarm is emitted as 0/1 BIGINT."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        dsum("value", scale=4, alias="v")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(28,4)")).cast("double").alias("sx"),
        F.sum(
            (F.col("v").cast("decimal(28,4)") * F.col("v").cast("decimal(28,4)"))
            .cast("decimal(38,8)")
        ).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    derived = stats.select(
        "event_type",
        "n",
        (F.col("sx") / nd).alias("mean_v"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / nd) / nd).alias("std_v"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = (
        daily.join(F.broadcast(derived), "event_type")
        .withColumn("prefix", F.sum(F.col("v") - F.col("mean_v")).over(wcum))
        .withColumn(
            "c",
            F.col("prefix")
            - F.least(F.lit(0.0), F.min("prefix").over(wcum)),
        )
    )
    return (
        walked.groupBy("event_type", "n", "mean_v", "std_v")
        .agg(F.max("c").alias("mc"))
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.round("mean_v", 9).alias("mean_v"),
            F.round("mc", 9).alias("max_cusum"),
            (F.col("mc") > 2 * F.col("std_v")).cast("bigint").alias("drift_alarm"),
        )
        .orderBy("event_type")
    )


@query(
    "timeseries_stl_decompose",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    trended AS (
        SELECT event_type, d, cnt,
               SUM(cnt) OVER w AS s7, COUNT(*) OVER w AS c7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detrended AS (
        SELECT event_type, d, cnt, s7, c7,
               420 * cnt - (420 * s7) // c7 AS det420,
               dayofweek(d) AS dow
        FROM trended
    ),
    seasonal AS (
        SELECT event_type, dow,
               CAST(SUM(det420) AS DOUBLE) / (420 * COUNT(*)) AS s
        FROM detrended GROUP BY 1, 2
    )
    SELECT t.event_type, t.d AS day, t.cnt,
           ROUND(CAST(t.s7 AS DOUBLE) / t.c7, 6) AS trend,
           ROUND(s.s, 6) AS seasonal,
           ROUND(CAST(t.det420 AS DOUBLE) / 420 - s.s, 6) AS residual
    FROM detrended t JOIN seasonal s
      ON t.event_type = s.event_type AND t.dow = s.dow
    ORDER BY t.event_type, t.d
    """,
    tags=("timeseries", "decomposition", "stl", "anomaly"),
)
def timeseries_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition (STL-lite) of daily event
    volume per type: trend = centered 7-day moving average, seasonal =
    day-of-week mean of the detrended series, residual = what neither
    explains — the residual stream is what anomaly detectors should score
    instead of raw counts (a Monday spike is seasonality, not an anomaly).

    Determinism: everything stays in exact integers until the final
    divisions. The detrended value cnt - s7/c7 is scaled by 420 (the LCM of
    every possible centered-window count 4..7), making det420 = 420*cnt -
    (420*s7)/c7 an exact integer; the seasonal mean divides the exact
    integer sum once, and each emitted double is the same short division/
    subtraction sequence on both engines, rounded at 6. No double->decimal
    cast sits at a rounding boundary (the defect class the dtype-parity
    test exists for).
    Scale shape: the raw stream collapses to (type, day) map-side first —
    the windows run on the collapsed frame (rows = types × days), never on
    events; at 100 TB that is the difference between a window over 10^12
    rows and one over 10^4."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    trended = daily.withColumn("s7", F.sum("cnt").over(w)).withColumn(
        "c7", F.count(F.lit(1)).over(w)
    )
    detrended = trended.withColumn(
        "det420",
        F.lit(420) * F.col("cnt") - F.expr("(420 * s7) div c7"),
    ).withColumn("dow", F.dayofweek("d"))
    seasonal = detrended.groupBy("event_type", "dow").agg(
        (
            F.sum("det420").cast("double") / (F.lit(420) * F.count(F.lit(1)))
        ).alias("s")
    )
    return (
        detrended.join(F.broadcast(seasonal), ["event_type", "dow"])
        .select(
            "event_type",
            F.col("d").alias("day"),
            "cnt",
            F.round(F.col("s7").cast("double") / F.col("c7"), 6).alias("trend"),
            F.round("s", 6).alias("seasonal"),
            F.round(
                F.col("det420").cast("double") / 420 - F.col("s"), 6
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "orders_seasonal_naive_backtest",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    )
    SELECT a.d AS day, a.revenue AS actual, f.revenue AS forecast,
           ROUND(abs(a.revenue - f.revenue) / a.revenue, 8) AS abs_pct_err
    FROM daily a JOIN daily f ON f.d = a.d - 7
    ORDER BY a.d
    """,
    tags=("timeseries", "forecast", "backtest"),
)
def orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's revenue as the
    revenue 7 days earlier and score the absolute percentage error — the
    standard forecasting baseline every model must beat (and the error
    column feeds a MAPE/sMAPE summary). The self-join on (d - 7) handles
    calendar gaps correctly where a LAG-by-rows would silently misalign
    after a missing day.

    Determinism: daily revenue is the exact-decimal dsum; the error is one
    |a-f|/a double composition rounded at 8. Scale shape: orders collapse
    to one row per day map-side; the self-join runs on the collapsed frame
    (365 rows here, date-count rows generally), broadcastable at any
    realistic calendar span."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        dsum("o_totalprice", alias="revenue")
    )
    f = daily.select(
        F.date_add(F.col("d"), 7).alias("d"), F.col("revenue").alias("forecast")
    )
    return (
        daily.join(F.broadcast(f), "d")
        .select(
            F.col("d").alias("day"),
            F.col("revenue").alias("actual"),
            "forecast",
            F.round(
                F.abs(F.col("revenue") - F.col("forecast")) / F.col("revenue"), 8
            ).alias("abs_pct_err"),
        )
        .orderBy("day")
    )
