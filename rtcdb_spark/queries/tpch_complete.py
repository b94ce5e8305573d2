"""Remaining TPC-H query shapes (q8/q11/q13/q15/q16/q20/q21/q22) — completes
the 22-query surface started in ``relational`` (q1/q3/q5/q6/q10) and
``tpch_more`` (q2/q4/q7/q9/q12/q14/q17/q18/q19).

The fixture star schema (FIXTURES.md) has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``c_phone`` columns, so the queries that
depend on them (q11/q16/q20/q21/q22) are adapted: same operator shape —
nested/correlated subqueries, CTEs, NOT IN, EXISTS + NOT EXISTS, scalar
thresholds — on the columns that exist. All of this is a declared non-feature
of the reference (reference README.md:14-15: no SQL, no joins, no complex
queries); correctness ground truth is the DuckDB oracle.

Scale notes (100 TB): every query pre-aggregates or pre-filters the fact
table before joining; dimension sides are broadcast; the CTE/subquery forms
decorrelate to one extra shuffle of an already-aggregated (small) relation,
never a second shuffle of raw lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import dsum, query, sql_davg, sql_dsum
from rtcdb_spark.sources import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", 4)}
               / {sql_dsum('volume', 4)} AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of STANDARD-part revenue sold into ASIA,
    per order year. Ratio of two order-independent decimal sums per group.
    Five dimension broadcasts; lineitem↔orders is the only big shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cust_nk")
        )
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("cust_nk") == F.col("c_nationkey"))
        .join(n2, F.col("supp_nk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((dsum(nation_vol, 4) / dsum(vol, 4)).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q11_part_value_concentration",
    f"""
    WITH part_value AS (
        SELECT l_partkey, {sql_dsum('l_extendedprice', 2)} AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM part_value
    WHERE part_value > (
        SELECT 0.0008 * {sql_dsum('l_extendedprice', 2)} FROM lineitem
    )
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("subquery", "cte", "tpch"),
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp → lineitem value): parts whose total
    shipped value exceeds 0.08% of the global total. The scalar threshold is a
    one-row aggregate broadcast against the per-part aggregate — at scale both
    sides of the comparison are post-aggregation (tiny)."""
    l = load_table(spark, sf_dir, "lineitem")
    part_value = l.groupBy("l_partkey").agg(
        dsum("l_extendedprice", 2, alias="part_value")
    )
    threshold = l.agg(
        (F.lit(0.0008) * dsum("l_extendedprice", 2)).alias("threshold")
    )
    return (
        part_value.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "histogram", "tpch"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of non-low-priority order counts per customer.
    LEFT OUTER with a build-side predicate inside the join condition (customers
    with zero orders must survive with count 0), then a re-aggregation of the
    (already small) per-customer counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "cte", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue CTE is
    computed once; its MAX is a one-row broadcast joined back — the DataFrame
    plan reuses the aggregated relation instead of rescanning lineitem."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, alias="total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_count_by_part",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 500
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("subquery", "anti", "distinct", "tpch"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp → lineitem supply edges): distinct
    supplier counts per part attribute, excluding one brand and low-balance
    suppliers via NOT IN (anti-join against a filtered broadcast; the
    fixture has no NULL suppkeys so NOT IN ≡ anti-join)."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#23")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    bad = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 500)
        .select("s_suppkey")
    )
    return (
        l.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_suppliers",
    """
    WITH part_qty AS (
        SELECT l_partkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_partkey
    ),
    supp_part_qty AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS supp_qty
        FROM lineitem GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM supp_part_qty
        JOIN part_qty USING (l_partkey)
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%' AND supp_qty > 0.2 * total_qty
    )
    ORDER BY s_suppkey
    """,
    tags=("subquery", "cte", "semi", "tpch"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availqty → share-of-shipments): suppliers
    who shipped >20% of some '%red%' part's total quantity. Both CTEs are
    aggregates of the same scan; the IN becomes a semi-join of the tiny
    supplier table against an aggregated relation. Quantities are
    integer-valued doubles → sums exact, no decimal cast needed."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(
        """
        WITH part_qty AS (
            SELECT l_partkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_partkey
        ),
        supp_part_qty AS (
            SELECT l_suppkey, l_partkey, SUM(l_quantity) AS supp_qty
            FROM lineitem GROUP BY l_suppkey, l_partkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM supp_part_qty
            JOIN part_qty USING (l_partkey)
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%red%' AND supp_qty > 0.2 * total_qty
        )
        ORDER BY s_suppkey
        """
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("subquery", "exists", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >60 days after order date; fixture has
    no commit/receipt dates): the sole late supplier on multi-supplier
    finished orders. EXISTS → semi-join, NOT EXISTS → anti-join, both on
    l_orderkey — Catalyst plans three passes over lineitem co-shuffled on the
    order key, so at scale they share one exchange footprint."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders    ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )


@query(
    "q22_inactive_rich_customers",
    f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_dsum('c_acctbal', 2)} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {sql_davg('c_acctbal', 2)} FROM customer WHERE c_acctbal > 0.0
    )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("subquery", "anti", "tpch"),
)
def q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no c_phone → nation instead of phone prefix):
    customers with above-average balance and no *urgent* orders, grouped by
    nation (plain no-orders is vacuous on the fixture: every customer has
    orders). Scalar AVG threshold (deterministic decimal avg) + anti-join
    against the filtered order custkeys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    from rtcdb_spark.queries.base import davg

    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", 2, alias="avg_bal")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2, alias="totacctbal"),
        )
        .orderBy("c_nationkey")
    )
