"""Aggregation surface (SURVEY §2 C-III): distinct, approx-distinct,
grouping sets (rollup/cube), exact percentiles, and the reference's own
min/max semantics (reference src/data.rs:22-60 `get_min`/`get_max` — string =
lexicographic, numeric = numeric) as `F.min`/`F.max`.

Scale notes: count-distinct on a high-cardinality key is the one aggregate
that can't partial-combine cheaply; Spark plans it as a two-phase expand —
for 100 TB use `approx_count_distinct` (HLL, mergeable sketches, no row
explosion) which is provided here as the scale path with a rows-only check
(HLL implementations differ across engines, so no value-level oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import dsum, query, sql_dsum
from rtcdb_spark.sources import load_table


@query(
    "agg_min_max",
    """
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           MIN(l_linestatus) AS min_status,
           MAX(l_linestatus) AS max_status
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A8 semantics (`get_min`/`get_max`, src/data.rs:22-60): numeric
    min/max on doubles, lexicographic on strings, plus timestamps (which the
    reference stored as Uint64)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.min("l_linestatus").alias("min_status"),
            F.max("l_linestatus").alias("max_status"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column count-distinct (Spark plans an Expand + two-phase agg)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_approx_count_distinct",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           COUNT(*) AS n_events,
           CAST(1 AS INTEGER) AS within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale distinct path: mergeable HLL++ sketch, no shuffle
    blowup. HLL internals differ across engines, so the estimate itself has
    no SQL twin — instead the row carries a DERIVED oracle (round 12, the
    `sort_within_partitions` pattern): both the sketch estimate and the
    exact distinct run in ONE aggregate pass, and `within_bound` is 1 iff
    the estimate lands within 5×rsd (rsd=0.01 requested, so ±5%, plus an
    absolute slack of 4 for tiny groups) of the exact count. The DuckDB
    twin is the exact distinct plus a literal 1 — an out-of-bound sketch
    hash-mismatches the driver. At 100 TB the exact branch is dropped and
    only the O(1)-per-group sketch ships through the shuffle."""
    e = load_table(spark, sf_dir, "events")
    exact = F.col("n_users_exact")
    err = F.abs(F.col("approx_users") - exact)
    bound = F.greatest(F.ceil(exact * F.lit(0.05)), F.lit(4))
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("n_users_exact"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "n_users_exact",
            "n_events",
            (err <= bound).cast("int").alias("within_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_rollup",
    f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", alias="total_acctbal"))
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@query(
    "agg_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-dimensional subtotals over two low-cardinality dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", alias="total_price"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "agg_grouping_sets",
    f"""
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))
    ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent groupings in one pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    j.createOrReplaceTempView("orders_customers_gs")
    return spark.sql(
        f"""
        SELECT c_mktsegment, o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS total_price
        FROM orders_customers_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))
        ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST
        """
    )


@query(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_extendedprice, 0.99) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). The approx scale path is `percentile_approx` — see
    `agg_percentiles_approx`."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentiles_approx",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           quantile_cont(l_extendedprice, 0.5) AS p50_price,
           quantile_cont(l_extendedprice, 0.99) AS p99_price,
           CAST(1 AS INTEGER) AS p50_within_bound,
           CAST(1 AS INTEGER) AS p99_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "approx", "percentile"),
)
def agg_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the mergeable, single-pass 100 TB path.
    GK-sketch outputs differ across engines, so the approx values have no
    SQL twin — the row carries a DERIVED oracle instead (round 12, the
    `sort_within_partitions` pattern): `percentile_approx(accuracy=10000)`
    guarantees the returned element's RANK is within eps·N of the target
    rank (eps = 1/accuracy, Greenwald-Khanna bound, Spark docs). The query
    re-derives each approx value's true rank interval [n_lt+1, n_le] with
    one conditional re-aggregation over a broadcast of the 3-row sketch
    output, and `pXX_within_bound` is 1 iff that interval intersects
    [q·N − eps·N − 1, q·N + eps·N + 1]. The hashed payload is the EXACT
    interpolated percentile (Spark `percentile` ≡ DuckDB `quantile_cont`)
    plus the flags; the DuckDB twin emits literal 1s — a sketch outside
    its published bound hash-mismatches the driver. At 100 TB the exact
    branch is dropped and only the O(1/eps)-sized mergeable sketch ships."""
    l = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    sketch = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50a"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99a"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("p50_price"),
        F.expr("percentile(l_extendedprice, 0.99D)").alias("p99_price"),
    )
    j = l.join(F.broadcast(sketch), "l_returnflag")
    p = F.col("l_extendedprice")
    ranks = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((p < F.col("p50a")).cast("long")).alias("lt50"),
        F.sum((p <= F.col("p50a")).cast("long")).alias("le50"),
        F.sum((p < F.col("p99a")).cast("long")).alias("lt99"),
        F.sum((p <= F.col("p99a")).cast("long")).alias("le99"),
        F.first("p50_price").alias("p50_price"),
        F.first("p99_price").alias("p99_price"),
    )
    n_d = F.col("n_rows").cast("double")
    eps = F.lit(1.0 / 10000.0)

    def _ok(lt: str, le: str, q: float):
        target = F.lit(q) * n_d
        slack = eps * n_d + F.lit(1.0)
        return (
            (F.col(le).cast("double") >= target - slack)
            & (F.col(lt).cast("double") + F.lit(1.0) <= target + slack)
        ).cast("int")

    return ranks.select(
        "l_returnflag",
        "n_rows",
        "p50_price",
        "p99_price",
        _ok("lt50", "le50", 0.5).alias("p50_within_bound"),
        _ok("lt99", "le99", 0.99).alias("p99_within_bound"),
    ).orderBy("l_returnflag")


@query(
    "agg_conditional",
    f"""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           {sql_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")} AS urgent_total,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) / COUNT(*) AS urgent_frac
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "conditional"),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (CASE-gated measures)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big"),
            dsum(F.when(urgent, F.col("o_totalprice")).otherwise(0.0), alias="urgent_total"),
            (F.count(F.when(urgent, 1)).cast("double") / F.count(F.lit(1))).alias("urgent_frac"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_moments_stats",
    """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                             * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sy / CAST(n AS DOUBLE) AS mean_price,
           (syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_pop_price,
           sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS std_pop_price,
           (sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS covar_pop_qty_price,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))
               AS corr_qty_price
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("agg", "statistics", "moments"),
)
def agg_moments_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution statistics (variance, stddev, covariance, correlation)
    from exact decimal moments. Engine-native VAR/CORR accumulate doubles in
    execution order — non-deterministic under parallelism — so each moment
    (Σx, Σx², Σxy) is an exact DECIMAL sum (associative, any partial-agg
    order), cast once to double, and the statistic is one fixed IEEE
    expression both engines evaluate identically. Scale shape: a plain
    partial/final hash aggregate — the moments are mergeable, so the shuffle
    carries 6 numbers per group."""
    li = load_table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(18,2)")
    pd_ = F.col("l_extendedprice").cast("decimal(18,2)")
    n_d = F.col("n").cast("double")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qd).cast("double").alias("sx"),
        F.sum(pd_).cast("double").alias("sy"),
        F.sum((qd * qd).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum((pd_ * pd_).cast("decimal(38,4)")).cast("double").alias("syy"),
        F.sum((qd * pd_).cast("decimal(38,4)")).cast("double").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        "n",
        (F.col("sy") / n_d).alias("mean_price"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / n_d) / n_d).alias("var_pop_price"),
        F.sqrt((F.col("syy") - F.col("sy") * F.col("sy") / n_d) / n_d).alias("std_pop_price"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / n_d) / n_d).alias("covar_pop_qty_price"),
        (
            (n_d * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n_d * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n_d * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "agg_hll_sketch_union",
    """
    SELECT lang, COUNT(DISTINCT doc_id) AS n_docs_exact,
           CAST(1 AS INTEGER) AS within_bound
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '__all__' AS lang, COUNT(DISTINCT doc_id) AS n_docs_exact,
           CAST(1 AS INTEGER) AS within_bound
    FROM documents
    ORDER BY lang
    """,
    tags=("agg", "sketch", "hll"),
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): one
    sketch per lang via `hll_sketch_agg`, re-merged with `hll_union_agg`
    for the corpus-wide estimate. The point vs `approx_count_distinct`:
    the sketch is a *value* — persistable and unionable across partitions,
    days, or tables without re-scanning, which is how 100 TB rollups avoid
    recomputing distincts. DataSketches estimates have no DuckDB twin, so
    the row carries a DERIVED oracle (round 12, the `sort_within_partitions`
    pattern): per-lang AND post-union estimates are checked in-query
    against exact distincts computed in the same plan; `within_bound` is 1
    iff |est − exact| ≤ max(5×rsd×exact, 4), where rsd = 1.04/√2¹² ≈ 1.63%
    for the default lgConfigK=12 (DataSketches HLL accuracy table). The
    DuckDB twin is exact + a literal 1 — an out-of-bound sketch OR a lossy
    union hash-mismatches the driver. The hashed payload is the exact
    count; at 100 TB only the fixed-size sketches ship and persist."""
    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.countDistinct("doc_id").alias("n_docs_exact"),
    )
    rsd5 = F.lit(5 * 1.04 / 64.0)  # 5 sigma at lgConfigK=12
    exact = F.col("n_docs_exact")
    est = F.hll_sketch_estimate("sk").cast("long")
    bound = F.greatest(F.ceil(exact * rsd5), F.lit(4))
    lang_est = per_lang.select(
        "lang",
        "n_docs_exact",
        (F.abs(est - exact) <= bound).cast("int").alias("within_bound"),
    )
    overall = (
        per_lang.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(d.agg(F.countDistinct("doc_id").alias("n_docs_exact"))))
        .select(
            F.lit("__all__").alias("lang"),
            "n_docs_exact",
            (F.abs(est - exact) <= bound).cast("int").alias("within_bound"),
        )
    )
    return lang_est.unionByName(overall).orderBy("lang")


@query(
    "agg_argmax",
    """
    SELECT c_nationkey,
           MAX_BY(c_name, c_custkey) AS newest_customer,
           MIN_BY(c_name, c_custkey) AS oldest_customer,
           MAX_BY(c_mktsegment, c_acctbal * 1e6 + c_custkey) AS richest_segment,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("agg", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (MAX_BY / MIN_BY): fetch the value of one
    column at the extremum of another in a single hash-aggregate pass — no
    self-join or window needed, so it partial-combines map-side like any
    other agg (each partial keeps only its best (value, ordering) pair).
    Determinism: the ordering values are collision-free by construction —
    c_custkey is unique, and the acctbal ordering is disambiguated by
    folding the unique key into the low digits (acctbal has 2 decimal
    places, so *1e6 leaves room for sf up to ~1e4 keys exactly within
    double precision). At 100 TB this replaces the common
    window-row_number-filter idiom for "row with max X per group" at a
    fraction of the cost (no sort, no shuffle beyond the agg's own)."""
    c = load_table(spark, sf_dir, "customer")
    tiebreak = F.col("c_acctbal") * F.lit(1e6) + F.col("c_custkey")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", "c_custkey").alias("newest_customer"),
            F.min_by("c_name", "c_custkey").alias("oldest_customer"),
            F.max_by("c_mktsegment", tiebreak).alias("richest_segment"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "agg_grouping_id",
    """
    SELECT l_returnflag,
           l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    tags=("agg", "rollup"),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns over a ROLLUP: distinguishes "NULL
    because subtotal row" from "NULL because the data was NULL" — required
    for downstream consumers of multi-level aggregates. Spark evaluates the
    rollup as one Expand + hash aggregate (single shuffle)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "agg_collect_array",
    """
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "array"),
)
def agg_collect_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array aggregation (collect_set → sorted array): folds a
    group's values into one array cell — the bridge from relational rows to
    the array functions (C-VII). Sorted for determinism (collect order is
    partition-dependent), then serialized to a canonical comma-joined string
    so cross-engine comparators can hash the cell (array cells are not
    hashable in pandas-based canonicalizers). Scale note: the array must fit
    in one row — collect only bounded-cardinality values (statuses, tags),
    never raw event streams; for unbounded groups use the windowed/top-k
    forms."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_corr_regression",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS price_at_zero,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "statistics", "regression"),
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates: Pearson correlation, sample
    covariance, and ordinary-least-squares regression (slope / intercept /
    R²) of price against quantity per return flag — the profiling layer
    above the univariate moments (`agg_moments_stats`). All are single-pass
    co-moment aggregates: Spark plans one partial/final hash aggregate
    carrying constant-size (n, Σx, Σy, Σxx, Σyy, Σxy) state per group — the
    same shuffle shape as a plain SUM at any scale. Cross-engine float
    caveat: co-moment accumulation differs in rounding at ~1e-12 relative,
    so outputs are display-rounded well above that divergence."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covar"
            ),
            F.round(
                F.regr_slope("l_extendedprice", "l_quantity"), 4
            ).alias("price_per_qty"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 2
            ).alias("price_at_zero"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


# Shared central-moment formula text: the SAME expression string is compiled
# by both engines (Spark via F.expr, DuckDB verbatim), so every double op
# runs in the same order with the same associativity — bit-equal outputs
# from bit-equal exact-decimal raw moments. m2^1.5 is written m2*sqrt(m2)
# (both factors correctly rounded) instead of pow(), whose rounding is
# implementation-defined.
_MOM_MU = "(s1 / nd)"
_MOM_M2 = f"(s2 / nd - {_MOM_MU} * {_MOM_MU})"
_MOM_M3 = (
    f"(s3 / nd - 3 * {_MOM_MU} * (s2 / nd) + 2 * {_MOM_MU} * {_MOM_MU} * {_MOM_MU})"
)
_MOM_M4 = (
    f"(s4 / nd - 4 * {_MOM_MU} * (s3 / nd) + 6 * {_MOM_MU} * {_MOM_MU} * (s2 / nd)"
    f" - 3 * {_MOM_MU} * {_MOM_MU} * {_MOM_MU} * {_MOM_MU})"
)
# The s3/s4 decimal sums exceed 2^53 x 10^-scale, so their cast to double
# rounds differently per engine (Java BigDecimal rounds once; DuckDB's
# int128 -> double -> /10^scale rounds twice) - a ~1 ulp divergence that
# raw-moment cancellation surfaces in the last digits. ROUND(..., 9) on the
# shared formula (9 decimals vs ~1e-16 noise) restores bit-equality.
_MOM_SKEW = f"round({_MOM_M3} / ({_MOM_M2} * sqrt({_MOM_M2})), 9)"
_MOM_KURT = f"round({_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3, 9)"


@query(
    "agg_skew_kurtosis",
    f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS DOUBLE) AS s3,
               CAST(SUM(CAST(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))
                             * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS DOUBLE) AS s4
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {_MOM_MU} AS mean_qty,
           {_MOM_M2} AS var_pop_qty,
           {_MOM_SKEW} AS skewness_qty,
           {_MOM_KURT} AS kurtosis_excess_qty
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("agg", "statistics", "moments"),
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher distribution moments — population skewness (m3/m2^1.5) and
    excess kurtosis (m4/m2² − 3) per group, the asymmetry/tail-weight
    signals data-quality monitors and CBO histograms track beyond
    variance. Raw power sums accumulate as exact DECIMALs (order-
    independent, mergeable map-side partials — the same mergeable-moments
    trick as agg_moments_stats, extended to 4th order), then ONE shared
    formula string computes the central moments on both engines so every
    double op matches (skew/kurtosis rounded to 9 decimals — their decimal
    power sums exceed the 2^53-exact cast regime, see _MOM_SKEW note). Engine-native skewness()/kurtosis()
    are deliberately not used: their float accumulation is
    partition-order-dependent."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    q2 = (q * q).cast("decimal(38,4)")
    q3 = (q2 * q).cast("decimal(38,6)")
    q4 = (q3 * q).cast("decimal(38,8)")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q2).cast("double").alias("s2"),
        F.sum(q3).cast("double").alias("s3"),
        F.sum(q4).cast("double").alias("s4"),
    )
    return m.select(
        "l_returnflag",
        "n",
        F.expr(_MOM_MU).alias("mean_qty"),
        F.expr(_MOM_M2).alias("var_pop_qty"),
        F.expr(_MOM_SKEW).alias("skewness_qty"),
        F.expr(_MOM_KURT).alias("kurtosis_excess_qty"),
    ).orderBy("l_returnflag")


@query(
    "agg_bitmap_distinct",
    """
    WITH words AS (
        SELECT event_type, user_id // 63 AS word_ix,
               bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
        FROM events
        GROUP BY event_type, user_id // 63
    )
    SELECT event_type,
           CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct_users,
           CAST(COUNT(*) AS BIGINT) AS n_words
    FROM words
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "bitmap", "distinct"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting by bitmap aggregation — the
    ClickHouse/Doris `groupBitmap` pattern built from int64 words: bucket
    each user id into word = id//63, OR the bit id%63 into the word's
    mask, popcount and sum. Equals COUNT(DISTINCT) exactly, but the
    aggregate state is fixed-width integers with a trivially mergeable
    combine (OR), so map-side partials stay tiny and there is no
    sort-based dedup anywhere — the exact-count answer when
    approx_count_distinct's error bound is not acceptable and the id
    domain is dense. n_words reports the bitmap's footprint (63 ids per
    word; bit 63 stays clear so the shift never overflows a signed int64
    on either engine). One shuffle on (type, word); both aggregates map-combine."""
    e = load_table(spark, sf_dir, "events")
    words = e.groupBy(
        "event_type", (F.col("user_id") / 63).cast("bigint").alias("word_ix")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
        ).alias("bits")
    )
    return (
        words.groupBy("event_type")
        .agg(
            F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_rolling_distinct_bitmap",
    """
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    )
    SELECT d.day,
           CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
                 WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day)
                AS BIGINT) AS wau,
           CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
                 WHERE CAST(e.ts AS DATE) = d.day) AS BIGINT) AS dau
    FROM days d
    ORDER BY d.day
    """,
    tags=("aggregate", "bitmap", "distinct", "rolling", "analytics"),
)
def agg_rolling_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (WAU) and daily distinct (DAU) via
    mergeable bitmaps — the hard version of distinct counting: a rolling
    window cannot reuse per-day COUNT(DISTINCT)s (they don't merge), but
    per-day BITMAPS do: OR seven daily word-masks together and popcount.
    Plan: per-(day, word) bitmap aggregate (map-combined), densified over
    the day×active-word grid so absent days still merge, one
    windowed bit_or per word over the 7-day frame, then popcount-sum per
    day. The oracle computes the same numbers by a DIFFERENT algorithm
    (direct COUNT(DISTINCT) per window), so the check is cross-algorithm,
    not a twin. Density caveat (documented bitmap domain): the grid is
    days × active words — right when the id space is dense/bounded; for
    sparse 64-bit ids swap words for roaring containers, same plan."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        F.col("ts").cast("date").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "dnum"
        ),
        (F.col("user_id") / 63).cast("bigint").alias("word_ix"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias(
            "bit"
        ),
    )
    daily = base.groupBy("day", "dnum", "word_ix").agg(
        F.bit_or("bit").alias("bits")
    )
    days = daily.select("day", "dnum").distinct()
    words = daily.select("word_ix").distinct()
    grid = days.crossJoin(F.broadcast(words))
    dense = grid.join(daily, ["day", "dnum", "word_ix"], "left").select(
        "day",
        "dnum",
        "word_ix",
        F.coalesce(F.col("bits"), F.lit(0)).alias("bits"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("word_ix")
        .orderBy("dnum")
        .rangeBetween(-6, 0)
    )
    rolled = dense.withColumn("rbits", F.bit_or("bits").over(w))
    return (
        rolled.groupBy("day")
        .agg(
            F.sum(F.bit_count("rbits")).cast("bigint").alias("wau"),
            F.sum(F.bit_count("bits")).cast("bigint").alias("dau"),
        )
        .orderBy("day")
    )
