"""Sketch-backed operators: bloom join pre-filter, count-min heavy hitters,
exact heavy hitters, stratified deterministic sampling.

The only statistics the reference keeps are per-block min/max
(src/storage.rs:72-78). At 100 TB a pipeline also needs *frequency* and
*membership* summaries whose size is fixed regardless of data volume; these
queries exercise `functions.sketches` and prove the results exactly against
DuckDB — including the count-min estimates, which are deterministic here
because the hashes are the engine-portable md5 family (see sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.functions.sketches import cms_build, cms_estimate, sql_salted_bucket
from rtcdb_spark.functions.text import stable_hash60
from rtcdb_spark.operators.relational import bloom_semi_join, top_k_per_group
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table

_CMS_DEPTH, _CMS_WIDTH = 3, 256


@query(
    "join_bloom_prefilter",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("join", "bloom"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with a bloom pre-filter on the fact scan
    (operators.relational.bloom_semi_join): part keys build a 64 Ki-bit
    filter, lineitem rows failing it never reach the join. The oracle is the
    plain IN-subquery — equality proves the bloom phase admits a superset
    (no false negatives) and the exact phase removes the false positives."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        bloom_semi_join(li, dim, "l_partkey", "p_partkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "freq_heavy_hitters",
    """
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT tok, cnt FROM counts, tot
    WHERE cnt * 200 >= n
    ORDER BY cnt DESC, tok
    """,
    tags=("frequency", "heavy-hitters"),
)
def freq_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: tokens carrying ≥ 0.5% of corpus mass. The
    relative threshold (cnt·200 ≥ total) scales with SF — no magic absolute
    count. One explode + one groupBy with map-side partial counts; the
    scalar total is a broadcast cross join (1 row)."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 200 >= F.col("n"))
        .select("tok", "cnt")
        .orderBy(F.desc("cnt"), "tok")
    )


def _sql_cms_topk() -> str:
    buckets = ",\n    ".join(
        f"b{i} AS (SELECT {sql_salted_bucket('tok', i, _CMS_WIDTH)} AS pos,"
        f" COUNT(*) AS c FROM toks GROUP BY 1)"
        for i in range(_CMS_DEPTH)
    )
    joins = "\n      ".join(
        f"JOIN b{i} ON b{i}.pos = {sql_salted_bucket('cand.tok', i, _CMS_WIDTH)}"
        for i in range(_CMS_DEPTH)
    )
    least = ", ".join(f"b{i}.c" for i in range(_CMS_DEPTH))
    return f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    {buckets},
    cand AS (SELECT DISTINCT tok FROM toks)
    SELECT cand.tok, LEAST({least}) AS est
    FROM cand
      {joins}
    ORDER BY est DESC, cand.tok
    LIMIT 20
    """


@query("freq_topk_cms", _sql_cms_topk(), tags=("frequency", "sketch", "cms"))
def freq_topk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by count-min-sketch estimated frequency
    (functions.sketches.cms_build/cms_estimate, depth 3 × width 256). The
    sketch shuffle is ≤ depth·width rows per partition regardless of corpus
    size; probes broadcast the sketch. Deterministic md5-family hashing makes
    even the *approximation* oracle-checkable: DuckDB rebuilds the identical
    counters and LEAST() over them."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    cms = cms_build(toks, "tok", _CMS_DEPTH, _CMS_WIDTH)
    est = cms_estimate(cms, toks.distinct(), "tok", _CMS_DEPTH, _CMS_WIDTH)
    return est.orderBy(F.desc("est"), "tok").limit(20)


@query(
    "sample_stratified_fixed",
    """
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id, ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT),
                     doc_id) AS rn
        FROM documents) t
    WHERE rn <= 5
    ORDER BY lang, doc_id
    """,
    tags=("sampling", "stratified"),
)
def sample_stratified_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-size sample: exactly 5 docs per language, chosen by
    hash order — reproducible on any engine/partitioning (the per-stratum
    twin of sample_hash_deterministic). One shuffle on the stratum key;
    within-stratum sort is bounded by stratum size. At 100 TB prefer
    hash-threshold (fraction) sampling per stratum to avoid sorting giant
    strata; fixed-size is for balanced eval/test splits."""
    d = load_table(spark, sf_dir, "documents")
    h = stable_hash60(F.col("doc_id").cast("string"))
    return (
        top_k_per_group(d, ["lang"], [h.asc(), F.col("doc_id").asc()], 5)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )
