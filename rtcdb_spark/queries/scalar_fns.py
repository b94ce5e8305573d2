"""Scalar function library (SURVEY §2 C-VII): string, regexp, date/time,
math, conditional, array, JSON, and hash families — each exercised end-to-end
against the DuckDB oracle.

All of these run JVM-side inside whole-stage codegen (no Python UDFs), so the
plans stay vectorized at any scale. Transcendental results (ln/log10/exp) are
rounded to 9 decimals on both engines: libm implementations may differ in the
last ulp across platforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@query(
    "fn_string",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           length(p_name) AS name_len,
           substring(p_name, 1, 5) AS name_head,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           reverse(p_type) AS type_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim('  ' || p_name || '  ') AS name_trim,
           starts_with(p_name, 'red') AS is_red
    FROM part
    WHERE p_name LIKE '%bolt%'
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, replace, reverse, pad,
    trim, prefix test, LIKE filter."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_brand").alias("brand_lower"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_head"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.reverse("p_type").alias("type_rev"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
            F.startswith(F.col("p_name"), F.lit("red")).alias("is_red"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_regexp",
    """
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
           regexp_matches(p_name, '^(red|blue)') AS primary_color
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
    tags=("scalar", "regexp"),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: extract, replace, count-all, match-test. Patterns kept to
    the common subset of Java and RE2 dialects."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return (
        p.select(
            "p_partkey",
            "p_name",
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
            F.size(F.expr("regexp_extract_all(p_name, '[a-z]+', 0)")).alias("n_words"),
            F.col("p_name").rlike("^(red|blue)").alias("primary_color"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           dayofweek(o_orderdate) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           epoch_us(o_orderdate) AS epoch_micros,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: field extraction, truncation, epoch, date arithmetic.
    Weekday normalized to DuckDB's Sunday=0 convention (Spark's is Sunday=1)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_micros"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_extendedprice - 50000) AS dist_from_50k,
           round(sqrt(l_extendedprice), 9) AS price_sqrt,
           round(ln(l_extendedprice), 9) AS price_ln,
           round(log10(l_extendedprice), 9) AS price_log10,
           round(pow(l_discount, 2), 9) AS disc_sq,
           CAST(sign(l_extendedprice - 50000) AS INT) AS side_of_50k,
           CAST(l_orderkey % 7 AS BIGINT) AS okey_mod7
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family; transcendentals rounded to 9 decimals (libm ulp drift)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    ep = F.col("l_extendedprice")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.round(ep, 1).alias("price_r1"),
            F.floor(ep).alias("price_floor"),
            F.ceil(ep).alias("price_ceil"),
            F.abs(ep - 50000).alias("dist_from_50k"),
            F.round(F.sqrt(ep), 9).alias("price_sqrt"),
            F.round(F.log(ep), 9).alias("price_ln"),
            F.round(F.log10(ep), 9).alias("price_log10"),
            F.round(F.pow("l_discount", F.lit(2)), 9).alias("disc_sq"),
            F.signum(ep - 50000).cast("int").alias("side_of_50k"),
            (F.col("l_orderkey") % 7).alias("okey_mod7"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_renamed,
           greatest(c_acctbal, 0.0) AS acctbal_clamped,
           least(CAST(c_nationkey AS BIGINT), 9) AS nation_capped,
           (c_acctbal IS NOT NULL AND c_acctbal > 9000) AS is_vip
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE/when chains, coalesce∘nullif, greatest/least,
    null checks."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return (
        c.select(
            "c_custkey",
            F.when(bal < 0, "overdrawn")
            .when(bal < 1000, "low")
            .when(bal < 5000, "mid")
            .otherwise("high")
            .alias("balance_band"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
                "segment_renamed"
            ),
            F.greatest(bal, F.lit(0.0)).alias("acctbal_clamped"),
            F.least(F.col("c_nationkey").cast("bigint"), F.lit(9)).alias("nation_capped"),
            (bal.isNotNull() & (bal > 9000)).alias("is_vip"),
        )
        .orderBy("c_custkey")
    )


@query(
    "fn_array",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
           round(CAST(list_sum(embedding[1:8]) AS DOUBLE), 5) AS head_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_sum(list_transform(embedding, x -> x * x)) AS DOUBLE), 4) AS sq_norm
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
    tags=("scalar", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, indexing, slice,
    filter-count, element-wise transform + fold. Sums run the same sequential
    left fold on both engines (float32 math), rounded to absorb ulp drift."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
            F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_elem"),
            F.round(
                F.expr("aggregate(slice(embedding, 1, 8), CAST(0.0 AS FLOAT), (a, x) -> a + x)").cast("double"),
                5,
            ).alias("head_sum"),
            F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
            F.round(
                F.expr(
                    "aggregate(transform(embedding, x -> x * x), CAST(0.0 AS FLOAT), (a, x) -> a + x)"
                ).cast("double"),
                4,
            ).alias("sq_norm"),
        )
        .orderBy("vec_id")
    )


@query(
    "fn_json",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("scalar", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: extract a field from the props JSON string, cast, group.
    (from_json → MapType is the typed alternative; get_json_object keeps the
    whole pipeline codegen'd.)"""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.get_json_object("props", "$.k").cast("bigint").alias("k_value"))
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("k_value")
    )


@query(
    "fn_hash",
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS md5_prefix_int
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    tags=("scalar", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha256 hex digests and the 60-bit integer hash
    derived from an md5 prefix — the cross-engine-stable hash primitive the
    dedup/minhash operators build on. (xxhash64 is Spark-native and faster,
    but has no DuckDB twin, so deterministic pipelines use this.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2("text", 256).alias("text_sha256"),
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias("md5_prefix_int"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_try_cast",
    """
    SELECT c_custkey,
           TRY_CAST(SUBSTRING(c_name, 10) AS BIGINT) AS name_num,
           TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
           TRY_CAST('2024-13-01' AS DATE) AS bad_date
    FROM customer
    ORDER BY c_custkey
    LIMIT 500
    """,
    tags=("fn", "cast"),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-cast family (TRY_CAST): malformed input yields NULL instead of
    a job-killing exception — essential for 100 TB ingest of dirty data,
    where one bad cell must not fail a 1000-executor stage. Covers a
    succeeding numeric parse (the digits of c_name), a failing string→int,
    and a failing date literal. try_cast stays inside codegen (no UDF)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.substring("c_name", 10, 100).try_cast("bigint").alias("name_num"),
            F.col("c_mktsegment").try_cast("bigint").alias("seg_num"),
            F.lit("2024-13-01").try_cast("date").alias("bad_date"),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


@query(
    "fn_json_map",
    """
    SELECT array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY k_mod
    """,
    tags=("scalar", "json", "map"),
)
def fn_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed map path for JSON props (SURVEY C-VII map/json): `from_json` →
    MapType, then `map_keys` / `element_at` — the alternative to
    get_json_object when many fields are read (parse once, not per field).
    Map parsing is JVM-side Jackson; no Python boundary.

    The key list is projected as ``array_join(map_keys(m), ',')`` — a scalar
    string — because array/map-typed output columns break external result
    canonicalizers (pandas cannot sort ndarray cells); see
    tests/test_registry_hygiene.py's scalar-output guard for the
    driver-window queries.
    """
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        e.select(
            F.array_join(F.map_keys(m), ",").alias("prop_keys"),
            (F.element_at(m, F.lit("k")) % 10).alias("k_mod"),
        )
        .groupBy("prop_keys", "k_mod")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_mod")
    )


@query(
    "fn_string_split",
    """
    SELECT doc_id,
           split_part(text, ' ', 1) AS first_word,
           split_part(text, ' ', 3) AS third_word,
           len(str_split(text, ' ')) AS n_space_tokens,
           len(regexp_extract_all(text, '[aeiou]')) AS n_vowels
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    tags=("scalar", "string"),
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field extraction without full tokenization: split_part for positional
    fields (log/CSV-ish lines) and regexp_extract_all for occurrence counts.
    All codegen'd string ops — map-only, no shuffle before the final sort."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        d.select(
            "doc_id",
            F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.split_part(F.col("text"), F.lit(" "), F.lit(3)).alias("third_word"),
            F.size(F.split("text", " ")).alias("n_space_tokens"),
            F.size(F.regexp_extract_all("text", F.lit("[aeiou]"), 0)).alias("n_vowels"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_array_setops",
    """
    SELECT user_id,
           list_sort(list_intersect(a, b)) AS common,
           list_sort(list_distinct(list_concat(a, b))) AS united,
           list_sort(list_filter(a, x -> NOT list_contains(b, x))) AS only_a
    FROM (
        SELECT user_id,
               generate_series(1, user_id % 5 + 3) AS a,
               generate_series(2, 6) AS b
        FROM (SELECT DISTINCT user_id FROM events)
    )
    ORDER BY user_id
    """,
    tags=("scalar", "array", "setop"),
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect / union / except) — element-level
    set algebra inside a row, used by the shingle/token pipelines before
    any explode. Results are sort-normalized because neither engine
    guarantees an output order for set ops. All codegen'd; map-only."""
    e = load_table(spark, sf_dir, "events").select("user_id").distinct()
    a = F.sequence(F.lit(1), F.col("user_id") % 5 + 3)
    b = F.sequence(F.lit(2), F.lit(6))
    return (
        e.select(
            "user_id",
            F.sort_array(F.array_intersect(a, b)).alias("common"),
            F.sort_array(F.array_union(a, b)).alias("united"),
            F.sort_array(F.array_except(a, b)).alias("only_a"),
        )
        .orderBy("user_id")
    )


@query(
    "fn_variant_json",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS BIGINT)
               AS k_decile,
           json_extract(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    tags=("scalar", "variant", "json"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: `parse_json`
    turns the props string into a binary variant ONCE at scan time, and
    every subsequent field access (`variant_get` with a typed path) reads
    the pre-parsed tree — the engine-native answer to repeated
    `get_json_object` calls, each of which re-parses the string
    (`fn_json` shows that older path). `try_variant_get` on an absent
    path yields NULL instead of erroring — the schema-drift-tolerant
    accessor. The oracle uses DuckDB's JSON extraction over the same
    documents; matching values prove the variant encode/decode round-trip
    is lossless for the extracted fields."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        e.select(
            "event_id",
            k.alias("k"),
            F.floor(k / 10).cast("bigint").alias("k_decile"),
            F.try_variant_get(v, "$.missing", "string").isNull().alias(
                "missing_is_null"
            ),
        )
        .orderBy("event_id")
    )
