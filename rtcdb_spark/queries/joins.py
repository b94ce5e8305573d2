"""Join surface (SURVEY §2 C-IV): inner/outer/semi/anti/full equi-joins,
broadcast strategy, and the as-of (time-travel) join.

The reference declares joins a non-feature (reference README.md:15); the
fixture star schema requires them. Strategy at 100 TB: dimensions broadcast
(no shuffle of the fact side); fact↔fact joins shuffle on the join key with
AQE skew-splitting enabled (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.operators import asof_join
from rtcdb_spark.queries.base import dsum, query, sql_dsum
from rtcdb_spark.sources import load_table


@query(
    "join_left_outer",
    f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({sql_dsum('o_totalprice')}, 0.0) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders (NULL-aware count)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
          AND o_totalprice > 150000
    )
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 qualifying order, no row duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers who never placed an urgent order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    f"""
    WITH cn AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ), sn AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    ORDER BY nationkey
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides (nation coverage asymmetry)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@query(
    "join_range_nonequi",
    f"""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           {sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
      AND l_extendedprice BETWEEN p_retailprice * 8 AND p_retailprice * 60
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("join", "range"),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a residual range predicate: the equi key keeps it a hash
    join (broadcast here), the BETWEEN runs as a post-join filter — never a
    cartesian. (Pure range joins without an equi key should be bucketized
    first; see operators.asof_join for the time variant.)"""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (l.l_partkey == p.p_partkey)
        & (l.l_extendedprice >= p.p_retailprice * 8)
        & (l.l_extendedprice <= p.p_retailprice * 60)
    )
    return (
        l.join(F.broadcast(p), cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", alias="total_price"),
        )
        .orderBy("p_brand")
    )


@query(
    "join_asof_events_orders",
    """
    WITH o1 AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
            ) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.event_type,
           o1.o_orderkey AS last_orderkey,
           o1.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN o1
      ON e.user_id = o1.o_custkey AND o1.o_orderdate <= e.ts
    ORDER BY e.event_id
    """,
    tags=("join", "asof"),
)
def join_asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's most recent order at/before the
    event time. Spark side uses the scalable union+carry-forward merge
    (operators.asof_join — one shuffle, no pair explosion); oracle uses
    DuckDB's native ASOF JOIN.

    Tie-break note: o_orderdate has day granularity so a user can have several
    orders on the asof date; both engines then pick an arbitrary one. To stay
    deterministic we pre-reduce the right side to one row per (custkey, date)
    — the max orderkey — which fixes the same winner on both engines."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    # Deterministic right side: one order per (custkey, orderdate).
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    o1 = o.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return _asof_events_orders(e, o1).orderBy("event_id")


def _asof_events_orders(e: DataFrame, o1: DataFrame) -> DataFrame:
    # asof_join needs a shared key column name; align orders to user_id.
    o_aligned = o1.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    joined = asof_join(
        e,
        o_aligned,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("right_o_orderkey").alias("last_orderkey"),
        F.col("right_o_totalprice").alias("last_totalprice"),
    )


@query(
    "join_asof_forward",
    """
    WITH o1 AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey ASC
            ) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.event_type,
           o1.o_orderkey AS next_orderkey,
           o1.o_totalprice AS next_totalprice
    FROM events e
    ASOF LEFT JOIN o1
      ON e.user_id = o1.o_custkey AND o1.o_orderdate >= e.ts
    ORDER BY e.event_id
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event picks the user's *next* order at/after
    the event time ("what did this user buy next?"). Same scalable
    union+merge strategy as the backward direction (operators.asof_join,
    direction="forward" — one key shuffle, first-upcoming carried back over
    a leading frame), mirrored ordering; oracle is DuckDB's native ASOF with
    the >= comparator.

    Tie-break note: as in join_asof_events_orders, o_orderdate is day-
    granular, so the right side is pre-reduced to one deterministic row per
    (custkey, date) — here the MIN orderkey — fixing the same winner on both
    engines."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.asc("o_orderkey"))
    o1 = o.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    o_aligned = o1.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    joined = asof_join(
        e,
        o_aligned,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("right_o_orderkey").alias("next_orderkey"),
        F.col("right_o_totalprice").alias("next_totalprice"),
    ).orderBy("event_id")


@query(
    "join_skew_salted",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "skew", "salt"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: events salted into 8 sub-keys, customer replicated
    8x, joined on (key, salt) — result identical to the plain join (the
    oracle IS the plain join), but a pathologically hot user_id spreads over
    8 partitions. The tool for skew beyond what AQE's skew-split can fix."""
    from rtcdb_spark.operators.relational import salted_join

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(e, c, "user_id", "c_custkey", n_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", alias="total_value"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_right_outer",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderstatus
    FROM orders
    RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey < 200
    ORDER BY c_custkey, o_orderkey NULLS FIRST
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving customers without orders — the mirror of
    join_left_outer at the row level (no aggregation), pinning NULL-side
    column semantics. Planner note: Spark rewrites right outer to left outer
    with sides swapped, so the same broadcast/shuffle strategies apply."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .select("c_custkey", "c_name", "o_orderkey", "o_orderstatus")
        .orderBy("c_custkey", F.asc_nulls_first("o_orderkey"))
    )


@query(
    "join_interval_overlap",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sn
        FROM flagged
    ),
    sess AS (
        SELECT user_id, MIN(ts) AS s, MAX(ts) + INTERVAL '30 minutes' AS e
        FROM numbered GROUP BY user_id, sn
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_overlaps,
           CAST(SUM(epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)))
                AS BIGINT) AS overlap_us
    FROM sess a
    JOIN sess b ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id, b.user_id
    ORDER BY overlap_us DESC, user_a, user_b
    LIMIT 50
    """,
    tags=("join", "interval", "range"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (concurrent user sessions) via the BINNED
    equi-join strategy: every session interval explodes into the hour
    buckets it covers, candidate pairs come from ONE bucket-key equi-join
    (a < b on user id), are deduplicated, then verified with the exact
    overlap predicate — the standard way to make an interval×interval join
    scale, because a naive θ-join (a.s <= b.e AND b.s <= a.e) has no
    equi-key and degenerates to a partition-wise cross product. Candidate
    volume is Σ_bucket (intervals covering it)², bounded by interval
    length / bucket width; the oracle runs the naive θ-join (fine at
    sf0.01, the size the driver checks). Overlap mass sums exact integer
    microseconds. Sessions come from the same `session_window` operator
    the sessionize query audits."""
    e = load_table(spark, sf_dir, "events")
    sess = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"))
    )
    W = 3600  # bucket width: 1 hour
    binned = sess.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("s") / W).cast("long"),
                F.floor(F.unix_timestamp("e") / W).cast("long"),
            )
        ),
    )
    a, b = binned.alias("a"), binned.alias("b")
    cand = (
        a.join(b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.user_id") < F.col("b.user_id")))
        .select(
            F.col("a.user_id").alias("user_a"), F.col("a.s").alias("sa"), F.col("a.e").alias("ea"),
            F.col("b.user_id").alias("user_b"), F.col("b.s").alias("sb"), F.col("b.e").alias("eb"),
        )
        .distinct()  # a pair sharing k buckets appears k times
    )
    overlaps = cand.filter((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
    return (
        overlaps.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(
                F.unix_micros(F.least("ea", "eb").cast("timestamp"))
                - F.unix_micros(F.greatest("sa", "sb").cast("timestamp"))
            ).cast("bigint").alias("overlap_us"),
        )
        .orderBy(F.desc("overlap_us"), "user_a", "user_b")
        .limit(50)
    )


@query(
    "join_asof_nearest",
    """
    WITH o1 AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey ASC
            ) AS rn
            FROM orders
        ) WHERE rn = 1
    ),
    b AS (
        SELECT e.event_id, o1.o_orderkey AS bk, o1.o_totalprice AS bp,
               o1.o_orderdate AS bt
        FROM events e
        ASOF LEFT JOIN o1
          ON e.user_id = o1.o_custkey AND o1.o_orderdate <= e.ts
    ),
    f AS (
        SELECT e.event_id, o1.o_orderkey AS fk, o1.o_totalprice AS fp,
               o1.o_orderdate AS ft
        FROM events e
        ASOF LEFT JOIN o1
          ON e.user_id = o1.o_custkey AND o1.o_orderdate >= e.ts
    )
    SELECT e.event_id, e.user_id, e.event_type,
           CASE WHEN ft IS NULL THEN bk
                WHEN bt IS NULL THEN fk
                WHEN epoch_us(e.ts) - epoch_us(CAST(bt AS TIMESTAMP))
                     <= epoch_us(CAST(ft AS TIMESTAMP)) - epoch_us(e.ts)
                THEN bk ELSE fk END AS near_orderkey,
           CASE WHEN ft IS NULL THEN bp
                WHEN bt IS NULL THEN fp
                WHEN epoch_us(e.ts) - epoch_us(CAST(bt AS TIMESTAMP))
                     <= epoch_us(CAST(ft AS TIMESTAMP)) - epoch_us(e.ts)
                THEN bp ELSE fp END AS near_totalprice
    FROM events e
    JOIN b USING (event_id)
    JOIN f USING (event_id)
    ORDER BY e.event_id
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — the third merge_asof direction: each event picks
    the user's order CLOSEST in time, whichever side it falls on (ties,
    including an order exactly at the event time, prefer the backward
    candidate). One key shuffle carries both one-sided candidates over the
    same partitioning (two in-partition sorts, no extra shuffle), then a
    per-row microsecond distance comparison picks the winner — still the
    linear merge strategy, never a key x key range join. The oracle
    composes DuckDB's native backward and forward ASOF joins with the
    identical tie rule. Right side pre-reduced to one deterministic row
    per (custkey, orderdate) as in the other as-of directions."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.asc("o_orderkey"))
    o1 = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    joined = asof_join(
        e.select("event_id", "user_id", "event_type", "ts"),
        o1.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("right_o_orderkey").alias("near_orderkey"),
        F.col("right_o_totalprice").alias("near_totalprice"),
    ).orderBy("event_id")


@query(
    "join_asof_tolerance",
    """
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM (
            SELECT user_id, ts, event_id, ROW_NUMBER() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ) WHERE rn = 1
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.ts AS click_ts, c.event_id AS click_event_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, value,
           CASE WHEN click_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(click_ts) <= 3600000000
                THEN click_event_id END AS attributed_click,
           CASE WHEN click_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(click_ts) <= 3600000000
                THEN CAST((epoch_us(ts) - epoch_us(click_ts)) // 1000000
                          AS BIGINT) END AS seconds_since_click
    FROM matched
    ORDER BY event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toleranced as-of join — last-click attribution: each purchase joins
    the user's most recent click, but only if it happened within the last
    hour; staler clicks attribute to nothing (NULL), exactly pandas
    ``merge_asof(tolerance=...)``. The tolerance is applied AFTER the
    merge-carry (one per-row comparison), so the plan is identical to the
    untoleranced as-of: one shuffle on user_id + one in-partition sort —
    no pair explosion at any scale. Right side pre-reduced to one click
    per (user, ts) (max event_id) for cross-engine tie determinism."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_event_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_cols=["click_event_id", "click_ts"],
        direction="backward",
        tolerance_seconds=3600,
    )
    secs = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("right_click_ts").cast("timestamp"))
    )
    return joined.select(
        "event_id",
        "user_id",
        "value",
        F.col("right_click_event_id").alias("attributed_click"),
        F.when(
            F.col("right_click_event_id").isNotNull(),
            F.floor(secs / 1_000_000).cast("bigint"),
        ).alias("seconds_since_click"),
    ).orderBy("event_id")
