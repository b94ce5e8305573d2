"""Additional analytic surface: distribution window functions
(ntile/percent_rank/cume_dist), TF-IDF token scoring, and the multimodal
frame-sampling offset plan.

All three are declared Tier-C north-star surface (SURVEY §2 C-VI, C-IX); the
reference implements none of them (its query engine is unimplemented —
reference README.md:51-62 is a design sketch only).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "window_ntile_distribution",
    """
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER w AS BIGINT) AS balance_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
    tags=("window", "distribution"),
)
def window_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — quartile bucketing and relative rank
    of each customer's balance within its nation. The window order includes
    the key (c_custkey) so bucket boundaries are total-order deterministic.
    percent_rank/cume_dist are rank-ratio doubles: one division of two exact
    integers, bit-identical across engines."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).cast("long").alias("balance_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )


@query(
    "text_tfidf_topk",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    dfreq AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
               CAST(CAST(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)
                    AS DECIMAL(18,8)) AS DOUBLE) AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf, rnk FROM (
        SELECT doc_id, token, tf, df, tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token
               ) AS rnk
        FROM scored
    )
    WHERE rnk <= 3 AND doc_id < 200
    ORDER BY doc_id, rnk
    """,
    tags=("text", "tfidf"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF tokens per document (first 200 docs) — the classic
    keyword-extraction pipeline: explode to tokens, per-doc term frequency,
    corpus document frequency, idf = ln(N/df). The score is rounded through
    DECIMAL(18,8) before ranking: libm ln() differs by ULPs across engines,
    and both the values and the rank order must hash-match the oracle.

    Scale notes: the corpus explodes ONCE into the (doc, token) tf group-by —
    one shuffle of token rows; dfreq derives from tf (tf has exactly one row
    per distinct (doc, token), so df = row count per token — no second
    explode, no countDistinct shuffle of raw tokens). tf is persisted because
    two consumers (dfreq + scoring join) would otherwise each re-run the
    explode; post-aggregation it is vocabulary×doc sized, far smaller than
    the exploded corpus. The dfreq side is tiny post-aggregation and
    broadcasts into the join. N is a scalar broadcast."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")))
            .cast("decimal(18,8)")
            .cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 200))
        .select("doc_id", "token", "tf", "df", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


@query(
    "multimodal_frame_index",
    """
    SELECT doc_id,
           unnest(range(0, CAST(ceil(n_bytes / 64.0) AS BIGINT))) AS frame_no,
           n_bytes
    FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
    WHERE doc_id < 100
    ORDER BY doc_id, frame_no
    """,
    tags=("multimodal", "explode"),
)
def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling offset plan for opaque binary payloads: one output row
    per 64-byte frame of each payload (doc text bytes stand in for video — the
    actual frame decode is the stubbed ``functions.multimodal.frame_sample``).
    This is the fan-out half of a video pipeline: `sequence` + `explode`
    stays in whole-stage codegen, and at 100 TB the explode happens after
    partition-local pruning, never materializing the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        d.select(
            "doc_id",
            F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.ceil(F.col("n_bytes") / F.lit(64.0)).cast("long") - 1,
                )
            ).alias("frame_no"),
            "n_bytes",
        )
        .orderBy("doc_id", "frame_no")
    )


@query(
    "anomaly_zscore_daily",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date, COUNT(*) AS cnt
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(cnt) AS s1,
               SUM(cnt * cnt) AS s2
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.event_date, d.cnt,
           ROUND((d.cnt - CAST(s.s1 AS DOUBLE) / s.n)
                 / sqrt((s.s2 - CAST(s.s1 AS DOUBLE) * s.s1 / s.n) / (s.n - 1)),
                 6) AS z,
           ABS((d.cnt - CAST(s.s1 AS DOUBLE) / s.n)
               / sqrt((s.s2 - CAST(s.s1 AS DOUBLE) * s.s1 / s.n) / (s.n - 1))) > 2
               AS is_anomaly
    FROM daily d JOIN stats s USING (event_type)
    ORDER BY event_type, event_date
    """,
    tags=("analytics", "anomaly", "zscore"),
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per event type, z-score each day's event
    count against that type's mean/std and flag |z| > 2. The moments come
    from exact integer sums (s1, s2 are BIGINTs — no float accumulation
    order anywhere), then one identical double expression on both engines —
    the same exact-moments trick as agg_moments_stats. Shuffle shape: two
    map-combined aggregates on (type, day) then (type); the stats side is
    tiny and broadcast into the final join."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("cnt") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "event_date",
            "cnt",
            F.round(z, 6).alias("z"),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
        .orderBy("event_type", "event_date")
    )


@query(
    "part_pareto_skyline",
    """
    WITH pts AS (
        SELECT p_retailprice AS price, CAST(p_size AS BIGINT) AS size,
               COUNT(*) AS n_parts
        FROM part GROUP BY 1, 2
    )
    SELECT price, size, CAST(n_parts AS BIGINT) AS n_parts
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price <= p.price AND q.size >= p.size
          AND (q.price < p.price OR q.size > p.size)
    )
    ORDER BY price
    """,
    tags=("analytics", "skyline", "pareto"),
)
def part_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over parts: the price/size frontier — every
    (retailprice, size) point not dominated by a cheaper-and-at-least-as-big
    alternative (minimize price, maximize size). The classic skyline
    operator (Börzsönyi et al., ICDE 2001), whose naive form is a quadratic
    NOT-EXISTS self-join — the oracle runs exactly that on the fixture-sized
    distinct-point set. The Spark side instead reduces rows to distinct
    points (a map-combined aggregate) and runs
    :func:`rtcdb_spark.operators.relational.skyline_2d` — a distributed
    monotone prefix-scan: range-partition by price, per-partition running
    max of size, and an n_partitions-row exclusive prefix max stitched
    across partitions. O(n log n) total work, no self-join, no global
    single-partition sort — the shape that survives 100 TB."""
    from rtcdb_spark.operators.relational import skyline_2d

    p = load_table(spark, sf_dir, "part")
    pts = p.groupBy(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("bigint").alias("size"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    return skyline_2d(pts, minimize="price", maximize="size").orderBy("price")


@query(
    "events_ab_test_ztest",
    """
    WITH assign AS (
        SELECT user_id,
               user_id % 2 AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
        FROM assign GROUP BY arm
    ),
    wide AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
               MAX(CASE WHEN arm = 0 THEN conv END) AS c_a,
               MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
               MAX(CASE WHEN arm = 1 THEN conv END) AS c_b
        FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
           ROUND(CAST(c_a AS DOUBLE) / n_a, 9) AS rate_a,
           ROUND(CAST(c_b AS DOUBLE) / n_b, 9) AS rate_b,
           ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)),
                 9) AS z_stat,
           abs((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
               / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                      * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                      * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)))
               > 1.959963985 AS significant_95
    FROM wide
    """,
    tags=("analytics", "abtest", "statistics"),
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the experimentation primitive: users split
    into arms by a deterministic hash (parity here), per-user conversion =
    ever fired a purchase event, then the pooled-variance z statistic and
    a 95% significance verdict (|z| > 1.96). The per-user MAX collapse is
    the dedup guard every A/B pipeline needs (event-level counting
    overweights heavy users).

    Determinism: the z composition is one fixed expression over four exact
    integers, identically written on both engines, rounded at 9; the
    significance compare runs on the unrounded value. Scale shape: events
    collapse per-user map-side, arms are a 2-row aggregate, and the final
    stat is a scalar — nothing after the first aggregate exceeds two
    rows."""
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", F.col("user_id") % 2)
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c_b"),
    )
    na, ca = F.col("n_a").cast("double"), F.col("c_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("c_b").cast("double")
    p = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    z = (ca / na - cb / nb) / F.sqrt(
        p * (1 - p) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        F.round(ca / na, 9).alias("rate_a"),
        F.round(cb / nb, 9).alias("rate_b"),
        F.round(z, 9).alias("z_stat"),
        (F.abs(z) > 1.959963985).alias("significant_95"),
    )


_DFT_PERIODS = (24, 12, 168, 17)  # hours: daily, half-day, weekly, control


@query(
    "events_periodicity_dft",
    f"""
    WITH hourly AS (
        SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS cnt
        FROM events GROUP BY 1
    ),
    based AS (
        SELECT h - (SELECT MIN(h) FROM hourly) AS t, cnt FROM hourly
    ),
    terms AS (
        SELECT p.period, b.cnt,
               CAST(b.cnt * cos(2 * pi() * (b.t % p.period) / p.period)
                    AS DECIMAL(18,6)) AS c_term,
               CAST(b.cnt * sin(2 * pi() * (b.t % p.period) / p.period)
                    AS DECIMAL(18,6)) AS s_term
        FROM based b CROSS JOIN (
            SELECT unnest(ARRAY{list(_DFT_PERIODS)}) AS period
        ) p
    )
    SELECT CAST(period AS BIGINT) AS period_hours,
           ROUND((CAST(SUM(c_term) AS DOUBLE) * CAST(SUM(c_term) AS DOUBLE)
                  + CAST(SUM(s_term) AS DOUBLE) * CAST(SUM(s_term) AS DOUBLE))
                 / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)), 9)
               AS relative_power
    FROM terms
    GROUP BY period
    ORDER BY period_hours
    """,
    tags=("analytics", "timeseries", "spectral", "periodicity"),
)
def events_periodicity_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral periodicity detection: single-frequency DFT power of the
    hourly event-count series at candidate periods (daily / half-day /
    weekly, plus a 17-hour control that should stay near noise) —
    |Σ xₜ·e^(-2πi t/P)|² normalized by (Σxₜ)². The relative-power ranking
    is how cadence detectors pick the seasonality to feed STL
    (`timeseries_stl_decompose`) without assuming it up front.

    Determinism: the phase reduces t mod P in exact integers BEFORE the
    trig call (large-argument reduction is where libm implementations
    disagree; |angle| ≤ 2π is where they are bit-identical), each term
    quantizes to DECIMAL(18,6) once, and the power is a fixed
    multiply/add/divide composition of exact sums. Scale shape: the event
    stream collapses to hour buckets map-side; the per-period expansion
    multiplies the BUCKET count (×4), never the corpus."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
        .cast("bigint")
        .alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    h0 = hourly.agg(F.min("h").alias("h0"))
    periods = spark.createDataFrame(
        [(p,) for p in _DFT_PERIODS], "period long"
    )
    based = hourly.crossJoin(F.broadcast(h0)).select(
        (F.col("h") - F.col("h0")).alias("t"), "cnt"
    )
    angle = (
        F.lit(2.0)
        * F.lit(math.pi)
        * (F.col("t") % F.col("period"))
        / F.col("period")
    )
    terms = based.crossJoin(F.broadcast(periods)).select(
        "period",
        "cnt",
        (F.col("cnt") * F.cos(angle)).cast("decimal(18,6)").alias("c_term"),
        (F.col("cnt") * F.sin(angle)).cast("decimal(18,6)").alias("s_term"),
    )
    sc = F.sum("c_term").cast("double")
    ss = F.sum("s_term").cast("double")
    tot = F.sum("cnt").cast("double")
    return (
        terms.groupBy("period")
        .agg(F.round((sc * sc + ss * ss) / (tot * tot), 9).alias("relative_power"))
        .select(
            F.col("period").cast("bigint").alias("period_hours"),
            "relative_power",
        )
        .orderBy("period_hours")
    )


@query(
    "orders_benford_audit",
    """
    WITH digits AS (
        SELECT CAST(floor(o_totalprice
                          / power(10, floor(log10(o_totalprice))))
                    AS BIGINT) AS d
        FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT SUM(n) AS t FROM obs),
    scored AS (
        SELECT o.d, o.n,
               ROUND(log10(1 + CAST(1 AS DOUBLE) / o.d), 9) AS expected_p,
               ROUND(CAST(o.n AS DOUBLE) / tot.t, 9) AS observed_p,
               CAST(POWER(CAST(o.n AS DOUBLE)
                          - log10(1 + CAST(1 AS DOUBLE) / o.d) * tot.t, 2)
                    / (log10(1 + CAST(1 AS DOUBLE) / o.d) * tot.t)
                    AS DECIMAL(18,6)) AS chi2_term
        FROM obs o CROSS JOIN tot
    )
    SELECT CAST(d AS BIGINT) AS first_digit,
           CAST(n AS BIGINT) AS n_orders,
           expected_p, observed_p,
           ROUND(CAST((SELECT SUM(chi2_term) FROM scored) AS DOUBLE), 6)
               AS chi2_total
    FROM scored
    ORDER BY first_digit
    """,
    tags=("analytics", "benford", "quality", "audit"),
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the leading-digit distribution
    of genuine transaction amounts follows log10(1 + 1/d); fabricated or
    system-generated values don't, so the per-digit deviation and the
    chi-square total are the standard forensic data-quality screen. The
    leading digit comes from floor(p / 10^floor(log10 p)) — pure math, no
    string formatting (double→string rendering differs across engines).

    Determinism: digit counts are exact integers; expected probabilities
    are the identical log10 composition on both engines; each chi² term
    quantizes to DECIMAL(18,6) so the total is an order-free exact sum.
    Scale shape: one map-side digit projection, a 9-bucket aggregate, and
    scalar-sized everything after."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("bigint")
    obs = o.select(d.alias("d")).groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    exp_p = F.log10(1 + F.lit(1.0) / F.col("d"))
    scored = (
        obs.crossJoin(F.broadcast(tot))
        .withColumn(
            "chi2_term",
            (
                F.pow(F.col("n").cast("double") - exp_p * F.col("t"), F.lit(2.0))
                / (exp_p * F.col("t"))
            ).cast("decimal(18,6)"),
        )
        .persist()
    )
    chi2 = scored.agg(F.sum("chi2_term").cast("double").alias("c"))
    return (
        scored.crossJoin(F.broadcast(chi2))
        .select(
            F.col("d").cast("bigint").alias("first_digit"),
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(exp_p, 9).alias("expected_p"),
            F.round(F.col("n").cast("double") / F.col("t"), 9).alias("observed_p"),
            F.round(F.col("c"), 6).alias("chi2_total"),
        )
        .orderBy("first_digit")
    )


@query(
    "orders_runs_test",
    """
    WITH seq AS (
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS hi,
               LAG(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
                   OVER (ORDER BY o_orderkey) AS prev
        FROM orders
    ),
    stats AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(hi) AS BIGINT) AS n1,
               CAST(SUM(1 - hi) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN prev IS NULL OR hi <> prev THEN 1 ELSE 0 END)
                    AS BIGINT) AS runs
        FROM seq
    )
    SELECT n1 AS n_high, n2 AS n_low, runs,
           ROUND(1 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
           ROUND((runs - (1 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z_stat
    FROM stats
    """,
    tags=("analytics", "statistics", "randomness", "audit"),
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test over the order sequence: binarize each
    order (total above/below 100k), count runs of equal outcomes in key
    order, and z-score against the expected run count under randomness —
    the audit that catches batch-sorted, interleaved, or machine-generated
    row orderings that per-value statistics (Benford, moments) cannot see.
    All inputs to the z composition are exact integers (run count via a
    LAG-transition sum); the expectation and variance are the standard
    closed forms, written identically on both engines and rounded at 6.
    Scale shape: the global LAG runs as a two-level scan (per-range-
    partition lag + an n_partitions-row boundary stitch,
    operators.scan.distributed_lag) — no single-partition sort anywhere
    (ADVICE r3)."""
    from rtcdb_spark.operators.scan import distributed_lag

    o = load_table(spark, sf_dir, "orders")
    hi = F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)
    seq = distributed_lag(
        o.select("o_orderkey", hi.alias("hi")), "o_orderkey", "hi", "prev"
    )
    stats = seq.agg(
        F.sum("hi").cast("bigint").alias("n1"),
        F.sum(1 - F.col("hi")).cast("bigint").alias("n2"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("hi") != F.col("prev")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("runs"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    exp = 1 + 2.0 * n1 * n2 / (F.col("n1") + F.col("n2"))
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((F.col("n1") + F.col("n2")).cast("double")
           * (F.col("n1") + F.col("n2"))
           * (F.col("n1") + F.col("n2") - 1))
    )
    return stats.select(
        F.col("n1").alias("n_high"),
        F.col("n2").alias("n_low"),
        F.col("runs"),
        F.round(exp, 6).alias("expected_runs"),
        F.round((F.col("runs") - exp) / F.sqrt(var), 6).alias("z_stat"),
    )


@query(
    "orders_ks_drift_test",
    """
    WITH tagged AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS grp
        FROM orders
    ),
    by_value AS (
        SELECT v,
               CAST(SUM(grp) AS BIGINT) AS c1,
               CAST(SUM(1 - grp) AS BIGINT) AS c2
        FROM tagged GROUP BY v
    ),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM by_value
    ),
    ecdf AS (
        SELECT SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2
        FROM by_value
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    d AS (
        SELECT MAX(ABS(CAST(cum1 AS DOUBLE) / tot.n1
                       - CAST(cum2 AS DOUBLE) / tot.n2)) AS d_stat
        FROM ecdf CROSS JOIN tot
    )
    SELECT tot.n1, tot.n2,
           ROUND(d.d_stat, 9) AS d_stat,
           ROUND(1.358 * sqrt(CAST(tot.n1 + tot.n2 AS DOUBLE)
                              / (CAST(tot.n1 AS DOUBLE) * tot.n2)), 9)
               AS critical_05,
           d.d_stat > 1.358 * sqrt(CAST(tot.n1 + tot.n2 AS DOUBLE)
                                   / (CAST(tot.n1 AS DOUBLE) * tot.n2))
               AS distributions_differ_95
    FROM d CROSS JOIN tot
    """,
    tags=("analytics", "statistics", "drift", "ks-test"),
)
def orders_ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test — the distribution-drift monitor:
    compare urgent/high-priority order totals against the rest by the
    maximum ECDF gap D, with the asymptotic 5% critical value. This is the
    nonparametric check pipelines run between cohorts, time slices, or
    before/after a change, where moment tests miss shape differences.

    Determinism: per-value counts are exact integers; each ECDF point is
    one division of exact integers and the max is a comparison — nothing
    accumulates in floats. Scale shape: rows collapse to DISTINCT values
    map-side first, so the cumulative scan runs on the value domain, not
    the row count; the scan itself is the two-level prefix sum
    (operators.scan.distributed_cumsum — per-range-partition running sums
    plus an n_partitions-row carry), so even a huge value domain never
    funnels through one task (ADVICE r3); for unbounded domains swap the
    exact ECDF for quantile-bucketed ECDFs at the same plan shape."""
    o = load_table(spark, sf_dir, "orders")
    grp = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    by_value = (
        o.select(F.col("o_totalprice").alias("v"), grp.alias("grp"))
        .groupBy("v")
        .agg(
            F.sum("grp").cast("bigint").alias("c1"),
            F.sum(1 - F.col("grp")).cast("bigint").alias("c2"),
        )
    )
    tot = by_value.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    from rtcdb_spark.operators.scan import distributed_cumsum

    # bounds_from the raw rows: boundary sampling skips by_value's
    # aggregation shuffle (3x cheaper boundary job; balance-only choice)
    ecdf = distributed_cumsum(
        by_value,
        "v",
        ["c1", "c2"],
        bounds_from=o.select(F.col("o_totalprice").alias("v")),
    ).select(F.col("cum_c1").alias("cum1"), F.col("cum_c2").alias("cum2"))
    d = (
        ecdf.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ).alias("d_stat")
        )
    )
    crit = 1.358 * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.round("d_stat", 9).alias("d_stat"),
        F.round(crit, 9).alias("critical_05"),
        (F.col("d_stat") > crit).alias("distributions_differ_95"),
    )


@query(
    "events_bot_cadence_detect",
    """
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS g
        FROM events
    ),
    stats AS (
        SELECT user_id,
               COUNT(g) AS n_gaps,
               CAST(SUM(g) AS BIGINT) AS s1,
               SUM(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0))) AS s2
        FROM gaps WHERE g IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(g) >= 5
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           ROUND(CAST(s1 AS DOUBLE) / n_gaps / 1000000, 6) AS mean_gap_s,
           ROUND(sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
                               - (CAST(s1 AS DOUBLE) / n_gaps)
                                 * (CAST(s1 AS DOUBLE) / n_gaps), 0))
                 / (CAST(s1 AS DOUBLE) / n_gaps), 6) AS cadence_cv,
           (sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
                          - (CAST(s1 AS DOUBLE) / n_gaps)
                            * (CAST(s1 AS DOUBLE) / n_gaps), 0))
            / (CAST(s1 AS DOUBLE) / n_gaps)) < 0.3 AS bot_like
    FROM stats
    ORDER BY user_id
    """,
    tags=("analytics", "events", "bot-detection", "quality"),
)
def events_bot_cadence_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection by cadence regularity: per user, the
    coefficient of variation of inter-event gaps — humans are bursty
    (CV ≳ 1), schedulers and scripted clients are metronomic (CV → 0) —
    flagged below 0.3. The traffic-quality screen a training-data pipeline
    runs before trusting behavioral signals. Gaps are exact integer
    microseconds; the first moment is an exact integer sum and the second
    an exact DECIMAL(38,0) product sum (microsecond squares overflow
    int64), so the CV is one shared double composition per user, rounded
    at 6. One shuffle on user_id for the
    lag window; the moment aggregate reuses its partitioning."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    gaps = e.select("user_id", (us - prev).alias("g")).filter(
        F.col("g").isNotNull()
    )
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count("g").alias("n_gaps"),
            F.sum("g").cast("bigint").alias("s1"),
            F.sum(
                F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)")
            ).alias("s2"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps")
    var = F.greatest(
        F.col("s2").cast("double") / F.col("n_gaps") - mean * mean, F.lit(0.0)
    )
    cv = F.sqrt(var) / mean
    return stats.select(
        "user_id",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.round(mean / 1_000_000, 6).alias("mean_gap_s"),
        F.round(cv, 6).alias("cadence_cv"),
        (cv < 0.3).alias("bot_like"),
    ).orderBy("user_id")


@query(
    "lineitem_woe_binning",
    """
    WITH labeled AS (
        SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS band,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem
    ),
    bands AS (
        SELECT band,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(1 - pos) AS BIGINT) AS n_neg
        FROM labeled GROUP BY band
    ),
    tot AS (
        SELECT CAST(SUM(n_pos) AS BIGINT) AS p, CAST(SUM(n_neg) AS BIGINT) AS q
        FROM bands
    ),
    scored AS (
        SELECT b.band, b.n_pos, b.n_neg,
               ln(((CAST(b.n_pos AS DOUBLE) + 0.5) / tot.p)
                  / ((CAST(b.n_neg AS DOUBLE) + 0.5) / tot.q)) AS woe,
               CAST((CAST(b.n_pos AS DOUBLE) / tot.p
                     - CAST(b.n_neg AS DOUBLE) / tot.q)
                    * ln(((CAST(b.n_pos AS DOUBLE) + 0.5) / tot.p)
                         / ((CAST(b.n_neg AS DOUBLE) + 0.5) / tot.q))
                    AS DECIMAL(18,9)) AS ivc
        FROM bands b CROSS JOIN tot
    )
    SELECT s.band, s.n_pos, s.n_neg,
           ROUND(s.woe, 6) AS woe,
           ROUND(CAST((SELECT SUM(ivc) FROM scored) AS DOUBLE), 6)
               AS information_value
    FROM scored s
    ORDER BY s.band
    """,
    tags=("analytics", "feature-engineering", "woe", "ml-prep"),
)
def lineitem_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning with information value — the classic
    credit-scoring/feature-prep transform: price bands scored by
    ln(P(band|pos)/P(band|neg)) with +0.5 Laplace smoothing, and the IV
    total that ranks the feature's predictive power (rule of thumb:
    <0.02 useless, >0.3 strong). Returnflag='R' stands in for the binary
    target. Determinism: band counts are exact integers, each WoE is one
    identical log composition, and IV contributions quantize to
    DECIMAL(18,9) so the total sums order-free. Scale shape: one
    map-combined band histogram; everything after is band-cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.floor(F.col("l_extendedprice") / 10000).cast("bigint").alias("band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    bands = labeled.groupBy("band").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    tot = bands.agg(
        F.sum("n_pos").cast("bigint").alias("p"),
        F.sum("n_neg").cast("bigint").alias("q"),
    )
    woe = F.log(
        ((F.col("n_pos").cast("double") + 0.5) / F.col("p"))
        / ((F.col("n_neg").cast("double") + 0.5) / F.col("q"))
    )
    scored = (
        bands.crossJoin(F.broadcast(tot))
        .withColumn("woe", woe)
        .withColumn(
            "ivc",
            (
                (
                    F.col("n_pos").cast("double") / F.col("p")
                    - F.col("n_neg").cast("double") / F.col("q")
                )
                * F.col("woe")
            ).cast("decimal(18,9)"),
        )
        .persist()
    )
    iv = scored.agg(F.sum("ivc").cast("double").alias("iv"))
    return (
        scored.crossJoin(F.broadcast(iv))
        .select(
            "band",
            "n_pos",
            "n_neg",
            F.round("woe", 6).alias("woe"),
            F.round("iv", 6).alias("information_value"),
        )
        .orderBy("band")
    )


@query(
    "attribution_multi_touch",
    """
    WITH touches AS (
        SELECT user_id, ts, event_id, event_type
        FROM events WHERE event_type IN ('click', 'view', 'signup')
    ),
    purchases AS (
        SELECT user_id, ts, event_id, value
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT t.event_type AS touch_type,
               p.event_id AS purchase_id, p.value,
               t.ts AS touch_ts, t.event_id AS touch_id
        FROM purchases p
        JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts > p.ts - INTERVAL 2 HOUR
    ),
    scored AS (
        SELECT touch_type, purchase_id, value,
               ROW_NUMBER() OVER (PARTITION BY purchase_id
                                  ORDER BY touch_ts DESC, touch_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
        FROM pairs
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CASE WHEN rn = 1
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS last_touch_revenue,
           CAST(SUM(CAST(value / n_touches AS DECIMAL(18,6))) AS DOUBLE)
               AS linear_revenue
    FROM scored
    GROUP BY touch_type
    ORDER BY touch_type
    """,
    tags=("analytics", "attribution", "events", "marketing"),
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution over the event stream, two models at once:
    every purchase's value is credited to the user's touches (click/view/
    signup) in the preceding 2 hours — 100% to the final touch
    (last-touch) and value/n to each (linear). The join is the bounded
    time-range shape (same as the stream-stream join: user-key shuffle +
    in-partition range predicate, no cartesian); per-purchase ranking and
    touch counts come from one window pass over purchase-sized groups.
    Determinism: last-touch ties break on (ts, event_id); linear credits
    quantize to DECIMAL(18,6) per row before the exact decimal sum, so
    both engines fold identically in any order."""
    touches = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view", "signup"))
        .select(
            F.col("user_id").alias("t_user"),
            F.col("ts").alias("touch_ts"),
            F.col("event_id").alias("touch_id"),
            F.col("event_type").alias("touch_type"),
        )
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
    )
    pairs = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("touch_ts") <= F.col("p_ts"))
        & (F.col("touch_ts") > F.col("p_ts") - F.expr("INTERVAL 2 HOURS")),
    )
    w_rank = Window.partitionBy("purchase_id").orderBy(
        F.desc("touch_ts"), F.desc("touch_id")
    )
    w_all = Window.partitionBy("purchase_id")
    scored = pairs.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n_touches", F.count(F.lit(1)).over(w_all)
    )
    return (
        scored.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(
                F.when(
                    F.col("rn") == 1, F.col("value").cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("last_touch_revenue"),
            F.sum(
                (F.col("value") / F.col("n_touches")).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("linear_revenue"),
        )
        .orderBy("touch_type")
    )


@query(
    "events_burstiness_fano",
    """
    WITH perbin AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 minute', ts) AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        GROUP BY event_type, time_bucket(INTERVAL '1 minute', ts)
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2,
               CAST(MAX(c) AS BIGINT) AS peak
        FROM perbin
        GROUP BY event_type
    )
    SELECT event_type, n_bins, s1 AS n_events, peak,
           ROUND(
               (CAST(s2 AS DOUBLE) / n_bins
                - (CAST(s1 AS DOUBLE) / n_bins)
                  * (CAST(s1 AS DOUBLE) / n_bins))
               / (CAST(s1 AS DOUBLE) / n_bins), 9) AS fano
    FROM agg
    ORDER BY event_type
    """,
    tags=("events", "anomaly", "burstiness", "timeseries"),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness via the FANO FACTOR (variance-to-mean ratio of
    per-minute arrival counts, per event type) — the dispersion index
    that separates Poisson-like organic traffic (fano ≈ 1) from bursty
    machine traffic (fano >> 1) and metronomic bots (fano << 1); the
    standard first screen before the heavier cadence detectors.

    Determinism: per-bin counts are exact integers; variance comes from
    the EXACT bigint sums (Σc, Σc², bin count) with the identical
    double formula evaluated once per group on both engines — no
    accumulation of floats across rows. Scale: two hash aggregates
    (type+minute, then type); the first pre-reduces map-side, the
    second is |types| rows."""
    e = load_table(spark, sf_dir, "events")
    perbin = (
        e.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    agg = perbin.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.max("c").cast("bigint").alias("peak"),
    )
    mean = F.col("s1").cast("double") / F.col("n_bins")
    return agg.select(
        "event_type",
        "n_bins",
        F.col("s1").alias("n_events"),
        "peak",
        F.round(
            (F.col("s2").cast("double") / F.col("n_bins") - mean * mean)
            / mean,
            9,
        ).alias("fano"),
    ).orderBy("event_type")
