"""Similarity-search query surface (SURVEY §2 C-IX): exact cosine top-k,
sign-LSH bucketing, and LSH-probed approximate top-k — all value-exact
against DuckDB (shared hyperplane constants, identical double arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.functions.similarity import (
    ann_lsh_topk,
    cosine_topk,
    ivf_topk,
    lsh_signature,
    sql_lsh_signature,
    with_norm,
)
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table

_QUERY_IDS = [0, 1, 2, 3, 4]

_SQL_COS = """
    base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS qid, v AS qv, norm AS qnorm FROM base
        WHERE vec_id IN (0, 1, 2, 3, 4)
    )
"""


@query(
    "similarity_cosine_topk",
    f"""
    WITH {_SQL_COS},
    scored AS (
        SELECT q.qid, b.vec_id,
               list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) AS cos_sim
        FROM base b JOIN q ON b.vec_id <> q.qid
    )
    SELECT qid, vec_id, cos_sim, rank FROM (
        SELECT qid, vec_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cos_sim DESC, vec_id
               ) AS rank
        FROM scored
    )
    WHERE rank <= 10
    ORDER BY qid, rank
    """,
    tags=("similarity",),
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors: broadcast query
    set × one corpus scan; no corpus shuffle at any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(e, _QUERY_IDS, k=10).orderBy("qid", "rank")


@query(
    "similarity_lsh_buckets",
    f"""
    SELECT {sql_lsh_signature('embedding::DOUBLE[]')} AS sig,
           COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec_id
    FROM embeddings
    GROUP BY 1
    ORDER BY sig
    """,
    tags=("similarity", "lsh"),
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket histogram: 8-bit hyperplane signatures partition the
    corpus; bucket sizes show the candidate-set reduction the ANN path gets."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("sig", lsh_signature())
        .groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("sig")
    )


@query(
    "similarity_ann_lsh_topk",
    f"""
    WITH sigs AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
               {sql_lsh_signature('embedding::DOUBLE[]')} AS sig
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS qid, v AS qv, norm AS qnorm, sig AS qsig
        FROM sigs WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    scored AS (
        SELECT q.qid, s.vec_id,
               list_dot_product(s.v, q.qv) / (s.norm * q.qnorm) AS cos_sim
        FROM sigs s JOIN q ON s.sig = q.qsig AND s.vec_id <> q.qid
    )
    SELECT qid, vec_id, cos_sim, rank FROM (
        SELECT qid, vec_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cos_sim DESC, vec_id
               ) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY qid, rank
    """,
    tags=("similarity", "lsh", "ann"),
)
def similarity_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via LSH bucket probing + exact re-rank — the
    sublinear ANN path: candidates come from a signature equi-join, not a
    full corpus scan per query."""
    e = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(e, _QUERY_IDS, k=5).orderBy("qid", "rank")


@query(
    "similarity_ivf_topk",
    """
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS cid, v AS cv, norm AS cnorm FROM base WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15)
    ),
    assign AS (
        SELECT vec_id, v, norm, cid FROM (
            SELECT b.vec_id, b.v, b.norm, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_dot_product(b.v, c.cv) / (b.norm * c.cnorm) DESC, c.cid
                   ) AS rn
            FROM base b CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS qid, v AS qv, norm AS qnorm FROM base
        WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    probe AS (
        SELECT qid, qv, qnorm, cid FROM (
            SELECT q.qid, q.qv, q.qnorm, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_dot_product(q.qv, c.cv) / (q.qnorm * c.cnorm) DESC, c.cid
                   ) AS rn
            FROM q CROSS JOIN cents c
        ) WHERE rn <= 4
    )
    SELECT qid, vec_id, cos_sim, rank FROM (
        SELECT p.qid, a.vec_id,
               list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY p.qid
                   ORDER BY list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) DESC, a.vec_id
               ) AS rank
        FROM assign a JOIN probe p ON a.cid = p.cid AND a.vec_id <> p.qid
    )
    WHERE rank <= 5
    ORDER BY qid, rank
    """,
    tags=("similarity", "ivf", "ann"),
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic centroids, Voronoi cell assignment in one
    corpus scan, probe the 4 nearest of 16 cells per query, exact re-rank.
    The scale path when LSH bucket skew is a concern: cell granularity is
    explicit and candidate volume is bounded by n_probe/n_cells."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, _QUERY_IDS, k=5, n_cells=16, n_probe=4).orderBy("qid", "rank")


def _ivf_trained_oracle_sql() -> str:
    """Replay trained-IVF assignment + probe + exact re-rank in DuckDB
    over the PINNED sf0.01 centroids (functions/pq_pinned.py): identical
    cosine arithmetic to the untrained `similarity_ivf_topk` oracle
    (list_dot_product matches Spark's zip_with fold bit-for-bit, proven
    by that row's standing hash match), same tie-breaks everywhere."""
    from rtcdb_spark.functions.pq_pinned import cents_values_sql

    return f"""
    WITH cents0(cid, cv) AS (VALUES
        {cents_values_sql()}
    ),
    cents AS (
        SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cnorm FROM cents0
    ),
    base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS norm
        FROM embeddings
    ),
    assign AS (
        SELECT vec_id, v, norm, cid FROM (
            SELECT b.vec_id, b.v, b.norm, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_dot_product(b.v, c.cv) / (b.norm * c.cnorm) DESC, c.cid
                   ) AS rn
            FROM base b CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS qid, v AS qv, norm AS qnorm FROM base
        WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    probe AS (
        SELECT qid, qv, qnorm, cid FROM (
            SELECT q.qid, q.qv, q.qnorm, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_dot_product(q.qv, c.cv) / (q.qnorm * c.cnorm) DESC, c.cid
                   ) AS rn
            FROM q CROSS JOIN cents c
        ) WHERE rn <= 4
    )
    SELECT qid, vec_id, cos_sim, rank FROM (
        SELECT p.qid, a.vec_id,
               list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY p.qid
                   ORDER BY list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) DESC, a.vec_id
               ) AS rank
        FROM assign a JOIN probe p ON a.cid = p.cid AND a.vec_id <> p.qid
    )
    WHERE rank <= 5
    ORDER BY qid, rank
    """


@query(
    "similarity_ivf_trained_topk",
    _ivf_trained_oracle_sql(),
    tags=("similarity", "ann", "ivf", "kmeans", "iterative"),
)
def similarity_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-IVF ANN: Lloyd's k-means (3 distributed iterations,
    deterministic init) learns the cell centroids, the corpus is assigned
    once (broadcast argmax, no shuffle), and each query probes its 4 nearest
    cells with exact re-ranking inside. The trained upgrade of
    `similarity_ivf_topk` — same probe plan, data-adaptive cells.

    Oracle (round 7, r6 verdict item 7): iterative training has no SQL
    twin, but the DECIMAL-recenter change makes it a bit-exact function of
    the corpus, so the sf0.01-trained centroids are PINNED as a literal
    (functions/pq_pinned.py, asserted equal to a fresh run by
    tests/test_operators.py) and DuckDB replays assignment + probe +
    re-rank over them — the full hash gate replaces the old rows-only
    check. sf0.01-specific by construction, like the BPE merge table; at
    other SFs the query trains its own centroids."""
    from rtcdb_spark.functions.similarity import ivf_assign, kmeans_centroids, with_norm

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, n_cells=16, n_iter=3)
    assign = ivf_assign(emb, cents)
    q = with_norm(
        emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
            F.col("vec_id").alias("qid"), F.col("embedding").cast("array<double>").alias("qv")
        ),
        "qv",
        "qnorm",
    )
    from pyspark.sql import Window
    from rtcdb_spark.functions.similarity import _dot

    cents_n = with_norm(cents, "cv", "cnorm")
    w_probe = Window.partitionBy("qid").orderBy(F.desc("qcos"), F.asc("cid"))
    probe = (
        q.join(F.broadcast(cents_n))
        .withColumn("qcos", _dot("qv", "cv") / (F.col("qnorm") * F.col("cnorm")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 4)
        .select("qid", "qv", "qnorm", "cid")
    )
    w_rank = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        assign.join(F.broadcast(probe), (assign.cid == probe.cid) & (F.col("vec_id") != F.col("qid")))
        .select(
            "qid",
            "vec_id",
            (_dot("v", "qv") / (F.col("norm") * F.col("qnorm"))).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 5)
        .orderBy("qid", "rank")
    )


def _pq_oracle_sql() -> str:
    """Replay PQ encode + ADC scoring in DuckDB over the PINNED
    sf0.01-trained codebooks (functions/pq_pinned.py — the BPE-merge-table
    treatment): per-subspace argmin with the same (d2, cid) tie-break,
    the query's distance table from the same pinned doubles, and the
    final ADC sum folded in sub order with the same left-to-right
    associativity (list_reduce == Spark's aggregate with 0D init, since
    0+x == x bitwise). Every float op is (x-y)*(x-y) — not pow — so both
    engines execute the identical IEEE sequence."""
    from rtcdb_spark.functions.pq_pinned import books_values_sql

    return f"""
    WITH books(sub, cid, cv) AS (VALUES
        {books_values_sql()}
    ),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    subs AS (
        SELECT vec_id, gs.sub, list_slice(v, gs.sub*8+1, gs.sub*8+8) AS sv
        FROM base CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) gs
    ),
    scored AS (
        SELECT s.vec_id, s.sub, b.cid,
               list_reduce(list_transform(generate_series(1, 8),
                   i -> (s.sv[i]-b.cv[i])*(s.sv[i]-b.cv[i])),
                   (a, x) -> a + x) AS d2
        FROM subs s JOIN books b USING (sub)
    ),
    codes AS (
        SELECT vec_id, sub, cid FROM (
            SELECT vec_id, sub, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2 ASC, cid ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    dtable AS (
        SELECT b.sub, b.cid,
               list_reduce(list_transform(generate_series(1, 8),
                   i -> (q[b.sub*8+i]-b.cv[i])*(q[b.sub*8+i]-b.cv[i])),
                   (a, x) -> a + x) AS pd
        FROM books b CROSS JOIN qv
    ),
    adc AS (
        SELECT c.vec_id,
               list_reduce(list(d.pd ORDER BY c.sub), (a, x) -> a + x)
                   AS adc_d2
        FROM codes c JOIN dtable d ON c.sub = d.sub AND c.cid = d.cid
        GROUP BY c.vec_id
    )
    SELECT vec_id, ROUND(adc_d2, 6) AS adc_d2
    FROM adc ORDER BY adc_d2 ASC, vec_id ASC LIMIT 10
    """


@query(
    "similarity_pq_topk",
    _pq_oracle_sql(),
    tags=("similarity", "ann", "pq", "compression", "iterative"),
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: per-subspace k-means codebooks (8 subspaces
    × 32 codewords over the 64-d embeddings) compress each vector to 8 small
    codes; search is asymmetric-distance (ADC) — the query's exact distances
    to all codewords form a broadcast lookup table and each corpus vector
    costs 8 integer lookups, no float vectors read at query time
    (functions.similarity.pq_train/pq_encode/pq_topk). At 100 TB the code
    column is ~64× smaller than the embeddings — the index fits where the
    vectors cannot.

    Oracle (round 7, the r6 verdict's item 7 — the BPE treatment): training
    is iterative argmax with no SQL twin, but since the DECIMAL-recenter
    change it is a bit-exact function of the corpus, so the sf0.01-trained
    codebooks are PINNED as a literal (functions/pq_pinned.py, re-derived
    and asserted by tests/test_operators.py) and DuckDB replays encode +
    ADC over them. A hash match verifies training determinism AND the
    encode/score pipeline. The pinned table is sf0.01-specific — exactly
    the scale the driver's comparison runs at; at other SFs the query
    trains its own codebooks as before."""
    from rtcdb_spark.functions.similarity import pq_encode, pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=32, n_iter=2)
    codes = pq_encode(emb, books, 8)
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    return pq_topk(codes, books, qv, 8, top_k=10).select(
        "vec_id", F.round("adc_d2", 6).alias("adc_d2")
    )


@query(
    "embedding_quantize_int8",
    """
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scaled AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM base
    ),
    q AS (
        SELECT vec_id, v, scale,
               list_transform(v, x -> floor(x / scale + 0.5)) AS qv
        FROM scaled
    )
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           ROUND(scale, 9) AS scale,
           CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT) AS max_code,
           ROUND(list_max(list_transform(generate_series(1, len(v)),
                 i -> abs(qv[i] * scale - v[i]))), 9) AS max_abs_err
    FROM q
    ORDER BY vec_id
    """,
    tags=("similarity", "quantization", "llm-pipeline"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column — the
    standard 4× compression applied before shipping vectors to an ANN index
    or a training shard — plus the reconstruction-error audit (max |dequant
    - original| per vector). Quantized code = floor(x/scale + 0.5) with
    scale = max|x|/127; floor(+0.5) not round() because HALF_UP tie behavior
    is engine-specific while floor is IEEE-exact everywhere.

    Scale shape: pure array expressions per row (transform/zip_with/
    aggregate) — map-only, no shuffle, whole-stage codegen; at 100 TB this
    is one streaming pass over the embedding column."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    base = e.select("vec_id", v.alias("v"), scale.alias("scale"))
    qv = F.transform(F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)))
    quant = base.withColumn("qv", qv)
    err = F.array_max(
        F.zip_with(
            F.col("qv"), F.col("v"), lambda q, x: F.abs(q * F.col("scale") - x)
        )
    )
    # Raw values first, rounding in a SEPARATE select: a lambda's
    # F.col("scale") resolves lazily, and an output alias reusing the name
    # in the same projection would silently rebind it to the rounded value.
    raw = quant.select(
        "vec_id",
        F.size("v").cast("bigint").alias("n_dims"),
        F.col("scale").alias("raw_scale"),
        F.array_max(F.transform(F.col("qv"), lambda q: F.abs(q)))
        .cast("bigint")
        .alias("max_code"),
        err.alias("raw_err"),
    )
    return raw.select(
        "vec_id",
        "n_dims",
        F.round("raw_scale", 9).alias("scale"),
        "max_code",
        F.round("raw_err", 9).alias("max_abs_err"),
    ).orderBy("vec_id")


@query(
    "embedding_label_centroids",
    """
    WITH dims AS (
        SELECT label, u.dim, u.x
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS dim,
                             unnest(embedding::DOUBLE[]) AS x) u
    ),
    cent AS (
        SELECT label, dim,
               CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
        FROM dims GROUP BY label, dim
    )
    SELECT label,
           COUNT(*) AS n_dims,
           ROUND(SQRT(CAST(SUM(CAST(c * c AS DECIMAL(28,15))) AS DOUBLE)), 6)
               AS centroid_norm,
           ROUND(MAX(ABS(c)), 6) AS max_abs_component
    FROM cent
    GROUP BY label
    ORDER BY label
    """,
    tags=("similarity", "embedding", "profiling", "llm-pipeline"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype computation
    behind nearest-centroid classification, cluster drift monitoring, and
    label-quality audits (a centroid norm near zero means the label's
    vectors cancel out, i.e. the label is incoherent). Reported per label
    as the centroid's L2 norm and largest component.

    Element-wise mean over vectors is computed by exploding (vector, dim)
    pairs into a (label, dim) decimal-sum aggregate — order-independent
    cross-engine, map-side combined, shuffle carries |labels|×|dims|
    partials per partition regardless of corpus size. The per-label
    reduction of 64 centroid components is a second tiny aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x"),
    ).select("label", (F.col("dim0") + 1).alias("dim"), "x")
    cent = dims.groupBy("label", "dim").agg(
        (F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1))).alias("c")
    )
    return (
        cent.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.round(
                F.sqrt(F.sum((F.col("c") * F.col("c")).cast("decimal(28,15)")).cast("double")),
                6,
            ).alias("centroid_norm"),
            F.round(F.max(F.abs("c")), 6).alias("max_abs_component"),
        )
        .orderBy("label")
    )


from rtcdb_spark.functions.similarity import random_projection, sql_random_projection

_JL_K = 16
_JL_D = 64
_JL_SQL_ITEMS = ",\n           ".join(sql_random_projection("embedding::DOUBLE[]", _JL_K, _JL_D))


@query(
    "embedding_random_projection",
    f"""
    SELECT vec_id,
           {_JL_SQL_ITEMS}
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("similarity", "projection", "llm-pipeline"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction (Achlioptas ±1
    variant): every {_JL_D}-dim embedding is projected to {_JL_K} dims by
    {_JL_K} fixed ±1 sign vectors scaled 1/√{_JL_K} — the byte-diet step a
    100 TB embedding corpus runs before k-means / coarse ANN (4× fewer
    vector bytes; inner products preserved in expectation, distortion
    O(√(log n / k))).

    Scale shape: map-only — the sign matrix is inlined as literals into
    the row expression (not even a broadcast), all {_JL_K} dot products run
    inside one whole-stage-codegen projection, zero shuffles, zero Python.
    Cross-engine: the same LCG-generated literals are baked into both the
    Spark fold and the DuckDB `list_dot_product` twin, and both folds are
    sequential left-to-right, so every output double is bit-identical."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return (
        random_projection(v, "v", _JL_K, _JL_D)
        .drop("v")
        .orderBy("vec_id")
    )


_HIST_STRIDE = 37  # deterministic pair sample: (i, (i + stride) mod n)


@query(
    "embedding_distance_histogram",
    f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    n AS (SELECT COUNT(*) AS cnt FROM base),
    pairs AS (
        SELECT a.vec_id AS id_a,
               list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos_sim
        FROM base a
        JOIN n ON TRUE
        JOIN base b ON b.vec_id = (a.vec_id + {_HIST_STRIDE}) % n.cnt
        WHERE a.vec_id <> b.vec_id
    )
    SELECT CAST(floor((cos_sim + 1.0) * 10) AS BIGINT) AS bin,
           COUNT(*) AS n_pairs,
           ROUND(MIN(cos_sim), 9) AS bin_min,
           ROUND(MAX(cos_sim), 9) AS bin_max
    FROM pairs
    GROUP BY 1
    ORDER BY bin
    """,
    tags=("similarity", "histogram", "llm-pipeline"),
)
def embedding_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-geometry diagnostic: the distribution of cosine similarity
    over a deterministic linear-probe pair sample ((i, i+{_HIST_STRIDE}
    mod n) touches every vector once — no RNG, no quadratic all-pairs),
    binned at 0.1 width over [-1, 1]. This is how a near-dup threshold
    (dedup_embedding_cosine) or an ANN probe budget is CALIBRATED before
    running the expensive pass: a bimodal histogram separates the
    duplicate mode from the background mode. Scale shape: one equi-join
    on the shifted id (AQE-broadcastable), dot products in JVM folds,
    then a 20-bucket aggregate. floor((cos+1)·10) binning is exact on
    both engines; bin edges round to 9 decimals."""
    from rtcdb_spark.functions.similarity import _dot, with_norm

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    base = with_norm(v, "v", "norm")
    n = base.count()
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        ((F.col("vec_id") + _HIST_STRIDE) % n).alias("probe_id"),
    )
    b = base.select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    pairs = (
        a.join(b, "probe_id")
        .filter(F.col("id_a") != F.col("probe_id"))
        .select((_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_sim"))
    )
    return (
        pairs.select(
            F.floor((F.col("cos_sim") + F.lit(1.0)) * 10).cast("bigint").alias("bin"),
            "cos_sim",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.min("cos_sim"), 9).alias("bin_min"),
            F.round(F.max("cos_sim"), 9).alias("bin_max"),
        )
        .orderBy("bin")
    )


@query(
    "similarity_knn_graph",
    f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    sigs AS (SELECT vec_id, v, norm, {{sig}} AS sig FROM base),
    nbrs AS (
        SELECT a.vec_id,
               b.vec_id AS nbr_id,
               ROUND(list_dot_product(a.v, b.v) / (a.norm * b.norm), 9) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_dot_product(a.v, b.v) / (a.norm * b.norm) DESC,
                            b.vec_id) AS rk,
               COUNT(*) OVER (PARTITION BY a.vec_id) AS n_candidates
        FROM sigs a JOIN sigs b
          ON a.sig = b.sig AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, CAST(n_candidates AS BIGINT) AS n_candidates,
           nbr_id AS nn_id, cos_sim AS nn_cos
    FROM nbrs WHERE rk = 1
    ORDER BY vec_id
    """.format(sig=sql_lsh_signature("v")),
    tags=("similarity", "knn-graph", "llm-pipeline"),
)
def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction (k=1 edge per vector shown; same plan shape
    for any k) over sign-LSH buckets — the precursor to semantic-dedup
    clustering and graph-based ANN (HNSW-style neighborhoods): every
    vector links to its best cosine neighbor among bucket peers, with the
    bucket size reported as the candidate count. One signature equi-join
    replaces the corpus×corpus product; per-bucket work is bounded by
    bucket cardinality (hyperplane count tunes it), and the per-vector
    top-1 is a row_number window over the bucket-pair stream — ties on
    cosine break by neighbor id on both engines."""
    from rtcdb_spark.functions.similarity import _dot, lsh_signature, with_norm
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    base = with_norm(v, "v", "norm").withColumn("sig", lsh_signature("v"))
    a = base.select(
        F.col("vec_id"), F.col("v").alias("va"), F.col("norm").alias("na"), "sig"
    )
    b = base.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        F.col("sig").alias("sigb"),
    )
    pairs = a.join(
        b, (F.col("sig") == F.col("sigb")) & (F.col("vec_id") != F.col("nbr_id"))
    ).select(
        "vec_id",
        "nbr_id",
        (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    wc = Window.partitionBy("vec_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .withColumn("n_candidates", F.count(F.lit(1)).over(wc).cast("bigint"))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            "n_candidates",
            F.col("nbr_id").alias("nn_id"),
            F.round("cos", 9).alias("nn_cos"),
        )
        .orderBy("vec_id")
    )


@query(
    "embedding_norm_quality",
    """
    WITH base AS (
        SELECT vec_id, label,
               CAST(len(embedding) AS BIGINT) AS dim,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
               CAST(list_sum(list_transform(embedding::DOUBLE[],
                    x -> CASE WHEN isnan(x) OR NOT isfinite(x) THEN 1 ELSE 0 END))
                    AS BIGINT) AS n_bad_components
        FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(MIN(dim) AS BIGINT) AS min_dim,
           CAST(MAX(dim) AS BIGINT) AS max_dim,
           ROUND(MIN(norm), 9) AS min_norm,
           ROUND(MAX(norm), 9) AS max_norm,
           CAST(SUM(CASE WHEN n_bad_components > 0 OR norm < 1e-6
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
    FROM base
    GROUP BY label
    ORDER BY label
    """,
    tags=("similarity", "quality", "llm-pipeline"),
)
def embedding_norm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA screen — the sanity audit run before ANY similarity
    work: per label, vector counts, dimension consistency, the norm
    range, and a degenerate count (NaN/Inf components or near-zero norm —
    vectors that silently poison cosine math with NaN or division
    blowups). Pure column expressions: the NaN/Inf scan folds each array
    once, the norm is the usual sequential dot fold; one label-key
    aggregate. On both engines isnan/isfinite agree bit-for-bit because
    the inputs are the same floats."""
    from rtcdb_spark.functions.similarity import _dot

    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    base = e.select(
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.sqrt(F.expr(
            "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),"
            " CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y),"
            " 0D, (acc, x) -> acc + x)"
        )).alias("norm"),
        F.expr(
            "aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>),"
            " x -> CASE WHEN isnan(x) OR x = double('inf') OR x = double('-inf')"
            " THEN 1 ELSE 0 END), 0L, (a, b) -> a + b)"
        ).cast("bigint").alias("n_bad_components"),
    )
    return (
        base.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("dim").cast("bigint").alias("min_dim"),
            F.max("dim").cast("bigint").alias("max_dim"),
            F.round(F.min("norm"), 9).alias("min_norm"),
            F.round(F.max("norm"), 9).alias("max_norm"),
            F.sum(
                ((F.col("n_bad_components") > 0) | (F.col("norm") < 1e-6)).cast("int")
            ).cast("bigint").alias("n_degenerate"),
        )
        .orderBy("label")
    )


_PCA_ITERS = 3
_PCA_SQL_PARTS = [
    "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
    "v0 AS (SELECT list_transform(range(64), x -> 0.125) AS l)",
]
for _k in range(1, _PCA_ITERS + 1):
    _PCA_SQL_PARTS.append(f"""
    d{_k} AS (
        SELECT t.v, list_dot_product(t.v, (SELECT l FROM v{_k - 1})) AS dot
        FROM base t
    ),
    c{_k} AS (
        SELECT g.i AS dim,
               CAST(SUM(CAST(t.v[g.i] * t.dot AS DECIMAL(28,15))) AS DOUBLE) AS wd
        FROM d{_k} t, generate_series(1, 64) g(i)
        GROUP BY g.i
    ),
    w{_k} AS (SELECT list(wd ORDER BY dim) AS l FROM c{_k}),
    m{_k} AS (SELECT list_max(list_transform(l, x -> abs(x))) AS m FROM w{_k}),
    v{_k} AS (SELECT list_transform(w{_k}.l, e -> e / m{_k}.m) AS l FROM w{_k}, m{_k})"""
        .strip()
    )
_PCA_SQL = (
    "WITH "
    + ",\n    ".join(_PCA_SQL_PARTS)
    + f"""
    SELECT g.i AS dim,
           ROUND(v{_PCA_ITERS}.l[g.i]
                 / sqrt(list_dot_product(v{_PCA_ITERS}.l, v{_PCA_ITERS}.l)), 9)
               AS loading,
           ROUND(m{_PCA_ITERS}.m, 6) AS growth
    FROM v{_PCA_ITERS}, m{_PCA_ITERS}, generate_series(1, 64) g(i)
    ORDER BY dim
"""
)


@query(
    "embedding_power_iteration",
    _PCA_SQL,
    tags=("similarity", "embedding", "pca", "iterative", "llm-pipeline"),
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal axis of the embedding cloud by distributed power
    iteration — 3 rounds of v ← X^T (X v), the spectral primitive under
    PCA whitening, embedding-drift monitoring, and ABTT-style common-
    component removal (Mu & Viswanath, ICLR 2018: dominant directions of
    an embedding cloud are corpus-wide artifacts worth projecting out).

    Each round is one matvec expressed relationally: the per-vector dot
    x·v folds sequentially inside the row (same order as DuckDB's
    list_dot_product), then per-dimension contributions x_d·(x·v) sum as
    exact DECIMAL(28,15) — cast-exact because |c| ≤ max|x_d|·|dot| < 9 —
    so any aggregation order gives bit-identical w. Rescaling divides by
    max|w_d| (an exact comparison, no rounding boundary) instead of the
    L2 norm, so no double→decimal or ROUND sits inside the loop; the L2
    normalization and rounding happen once at output. The 64-float
    iterate is driver-held (sketch-sized, like kmeans centroids) and
    re-broadcast per round; corpus work per round is one scan + one
    64-group map-combined aggregate — no shuffle of the embedding table.
    Note the fixed 3 rounds pin the ALGORITHM, not convergence: on
    near-isotropic data (the fixture's gap ratio is ~1.02) power iteration
    converges slowly by nature — production use iterates until the
    Rayleigh quotient stabilizes, growing the oracle's unrolled CTE chain
    linearly with rounds.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(F.col("embedding").cast("array<double>").alias("v"))
    v = [0.125] * 64
    m = 1.0
    for _ in range(_PCA_ITERS):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        dot = F.expr(
            "aggregate(zip_with(v, _vl, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        )
        scored = base.withColumn("_vl", vlit).withColumn("dot", dot)
        w_rows = (
            scored.select(F.posexplode("v").alias("d0", "xd"), "dot")
            .groupBy("d0")
            .agg(
                F.sum((F.col("xd") * F.col("dot")).cast("decimal(28,15)"))
                .cast("double")
                .alias("wd")
            )
            .collect()
        )
        w = [r["wd"] for r in sorted(w_rows, key=lambda r: r["d0"])]
        m = max(abs(x) for x in w)
        v = [x / m for x in w]
    # L2-normalize and emit through Spark expressions so the final ROUND
    # semantics are the engine's (one division + one round per element).
    norm = sum(x * x for x in v) ** 0.5  # sequential fold, IEEE-exact
    vlit = F.array(*[F.lit(float(x)) for x in v])
    return (
        spark.range(1)
        .select(F.posexplode(vlit).alias("d0", "vd"))
        .select(
            (F.col("d0") + 1).cast("bigint").alias("dim"),
            F.round(F.col("vd") / F.lit(float(norm)), 9).alias("loading"),
            F.round(F.lit(float(m)), 6).alias("growth"),
        )
        .orderBy("dim")
    )


_KC_ROUNDS = 8  # coreset size: seed + 7 greedy farthest-point picks


def _kc_cos(vec: str, k: int) -> str:
    """Cosine of `vec` to the k-th picked center (SQL scalar subqueries)."""
    return (
        f"list_dot_product({vec}, (SELECT v FROM base WHERE vec_id = "
        f"(SELECT vec_id FROM pick{k})))"
        f" / (norm * (SELECT norm FROM base WHERE vec_id = "
        f"(SELECT vec_id FROM pick{k})))"
    )


def _kc_sql() -> str:
    parts = [
        """base AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS norm
        FROM embeddings
    )""",
        "pick0 AS MATERIALIZED (SELECT 0 AS vec_id, CAST(0 AS DOUBLE) AS dist)",
    ]
    for k in range(1, _KC_ROUNDS):
        cos_terms = ", ".join(_kc_cos("v", j) for j in range(k))
        parts.append(f"""
    d{k} AS (
        SELECT vec_id, 1 - GREATEST({cos_terms}) AS dist
        FROM base
        WHERE vec_id NOT IN ({", ".join(f"(SELECT vec_id FROM pick{j})" for j in range(k))})
    ),
    pick{k} AS MATERIALIZED (SELECT vec_id, dist FROM d{k} ORDER BY dist DESC, vec_id LIMIT 1)"""
            .strip()
        )
    rows = " UNION ALL ".join(
        f"SELECT {k} AS sel_order, vec_id, ROUND(dist, 9) AS dist_at_selection "
        f"FROM pick{k}"
        for k in range(_KC_ROUNDS)
    )
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT CAST(sel_order AS BIGINT) AS sel_order,
           vec_id, dist_at_selection
    FROM ({rows})
    ORDER BY sel_order
"""
    )


@query(
    "embedding_kcenter_coreset",
    _kc_sql(),
    tags=("similarity", "embedding", "coreset", "iterative", "llm-pipeline"),
)
def embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal) —
    the diversity-sampling primitive training-data curation uses to pick a
    small set that covers the embedding space (2-approximation of the
    optimal k-center radius): seed with vec_id 0, then repeatedly take the
    vector farthest (cosine distance) from every center chosen so far.
    The reported dist_at_selection sequence is non-increasing and its last
    value bounds the coverage radius.

    Determinism: cosine folds sequentially (list_dot_product order); the
    running min-to-centers uses GREATEST over per-center cosines (exact
    comparisons, no accumulation); argmax breaks ties on vec_id. Scale
    shape per round: centers broadcast (driver-held, like the PCA iterate
    and k-means centroids), one corpus scan, and the argmax is a
    TakeOrderedAndProject(1) — no shuffle of the embedding table, ever.
    The oracle unrolls the same greedy rounds as scalar-subquery CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = with_norm(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).persist()
    first = base.filter(F.col("vec_id") == 0).first()
    centers = [(0, list(first["v"]), float(first["norm"]))]
    out = [(0, 0, 0.0)]
    for k in range(1, _KC_ROUNDS):
        cand = base.filter(
            ~F.col("vec_id").isin([c[0] for c in centers])
        )
        cos_cols = []
        for cid, cv, cn in centers:
            clit = F.array(*[F.lit(float(x)) for x in cv])
            cand = cand.withColumn(f"_c{cid}", clit)
            cos_cols.append(
                F.expr(
                    f"aggregate(zip_with(v, _c{cid}, (x, y) -> x * y), 0D, "
                    f"(acc, x) -> acc + x)"
                )
                / (F.col("norm") * F.lit(cn))
            )
        dist = F.lit(1) - F.greatest(*cos_cols) if len(cos_cols) > 1 else (
            F.lit(1) - cos_cols[0]
        )
        pick = (
            cand.withColumn("dist", dist)
            .orderBy(F.desc("dist"), F.asc("vec_id"))
            .select("vec_id", "v", "norm", "dist")
            .limit(1)
            .first()
        )
        centers.append((int(pick["vec_id"]), list(pick["v"]), float(pick["norm"])))
        out.append((k, int(pick["vec_id"]), float(pick["dist"])))
    return (
        spark.createDataFrame(
            out, "sel_order long, vec_id long, dist double"
        )
        .select(
            "sel_order",
            "vec_id",
            F.round("dist", 9).alias("dist_at_selection"),
        )
        .orderBy("sel_order")
    )


@query(
    "embedding_matryoshka_energy",
    """
    WITH base AS (
        SELECT label,
               sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS norm,
               sqrt(list_dot_product(
                   (embedding::DOUBLE[])[1:len(embedding) // 2],
                   (embedding::DOUBLE[])[1:len(embedding) // 2]
               )) AS half
        FROM embeddings
    ),
    r AS (
        SELECT label,
               CASE WHEN norm < 1e-12 THEN 0.0 ELSE half / norm END AS ratio
        FROM base
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(MIN(ratio), 9) AS min_ratio,
           ROUND(MAX(ratio), 9) AS max_ratio,
           CAST(SUM(CASE WHEN ratio >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_truncatable,
           CAST(SUM(CASE WHEN ratio >= 0.75 AND ratio < 0.9
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_marginal,
           CAST(SUM(CASE WHEN ratio < 0.75 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tail_heavy
    FROM r
    GROUP BY label
    ORDER BY label
    """,
    tags=("similarity", "embedding", "matryoshka", "llm-pipeline",
          "quality"),
)
def embedding_matryoshka_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka (MRL) truncation audit — the screen run before cutting
    embedding dimensions in half to halve ANN index cost: per vector,
    the fraction of the L2 norm the FIRST d/2 coordinates retain
    (energy ratio = ||prefix|| / ||full||); per label, the ratio range
    and a three-way census (>= 0.9 safely truncatable, 0.75-0.9
    marginal, < 0.75 tail-heavy — truncation would reorder neighbors).
    MRL-trained encoders concentrate energy in the prefix, so this
    measures whether a corpus's embeddings actually have that property
    before a pipeline relies on it.

    Determinism: both engines fold the SAME doubles in the same
    sequential order (list_dot_product vs zip_with+aggregate — the
    `embedding_norm_quality` precedent), per-row division and ROUND are
    single float ops, and every aggregate is a count or an exact
    MIN/MAX. Scale: pure map-side column expressions + one label-key
    hash aggregate; no shuffle before it, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    half_dot = F.expr(
        "aggregate(zip_with("
        " slice(CAST(embedding AS ARRAY<DOUBLE>), 1,"
        "       CAST(floor(size(embedding) / 2) AS INT)),"
        " slice(CAST(embedding AS ARRAY<DOUBLE>), 1,"
        "       CAST(floor(size(embedding) / 2) AS INT)),"
        " (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    full_dot = F.expr(
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),"
        " CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y),"
        " 0D, (acc, x) -> acc + x)"
    )
    base = e.select(
        "label",
        F.sqrt(full_dot).alias("norm"),
        F.sqrt(half_dot).alias("half"),
    )
    r = base.select(
        "label",
        F.when(F.col("norm") < 1e-12, F.lit(0.0))
        .otherwise(F.col("half") / F.col("norm"))
        .alias("ratio"),
    )
    return (
        r.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.min("ratio"), 9).alias("min_ratio"),
            F.round(F.max("ratio"), 9).alias("max_ratio"),
            F.sum((F.col("ratio") >= 0.9).cast("int"))
            .cast("bigint").alias("n_truncatable"),
            F.sum(
                ((F.col("ratio") >= 0.75) & (F.col("ratio") < 0.9)).cast("int")
            ).cast("bigint").alias("n_marginal"),
            F.sum((F.col("ratio") < 0.75).cast("int"))
            .cast("bigint").alias("n_tail_heavy"),
        )
        .orderBy("label")
    )
