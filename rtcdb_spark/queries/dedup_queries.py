"""Dedup query surface (SURVEY §2 C-IX): exact, MinHash, LSH, Jaccard,
SimHash — each checked value-exact against a DuckDB re-implementation built
from the same md5-based hash primitive and the same hardcoded permutation
constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtcdb_spark.functions.dedup import (
    MINHASH_AB,
    N_BANDS,
    ROWS_PER_BAND,
    doc_shingles,
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash32,
    simhash64_rowwise,
    simhash_hamming_pairs,
)
from rtcdb_spark.functions.text import (
    MERSENNE_P,
    shingles,
    sql_shingles,
    sql_stable_hash_mod,
)
from rtcdb_spark.functions.similarity import (
    _dot as _sim_dot,
    lsh_signature,
    sql_lsh_signature,
    with_norm,
)
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table

_SQL_SH = f"""
    sh AS (
        SELECT DISTINCT doc_id, {sql_stable_hash_mod('shingle')} AS sh
        FROM (
            SELECT doc_id, unnest({sql_shingles('text')}) AS shingle
            FROM documents
        )
    )
"""

_SQL_MH_COLS = ",\n           ".join(
    f"min(({a} * sh + {b}) % {MERSENNE_P}) AS mh{j}" for j, (a, b) in enumerate(MINHASH_AB)
)

_SQL_SIGS = f"sigs AS (SELECT doc_id, {_SQL_MH_COLS} FROM sh GROUP BY doc_id)"

_SQL_BANDS = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, "
    + " || '-' || ".join(
        f"CAST(mh{{b}} * 0 + mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )
    + " AS sig FROM sigs"
    for b in range(N_BANDS)
)
# simpler: regenerate cleanly below (the mh{b}*0 trick above is needless)
_SQL_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, "
    + " || '-' || ".join(f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND))
    + " AS sig FROM sigs"
    for b in range(N_BANDS)
)


@query(
    "dedup_exact",
    """
    SELECT sha256(text) AS digest,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_dups
    FROM documents
    GROUP BY 1
    ORDER BY keep_id
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: sha256 digest → group → canonical survivor.
    The uniform digest key shuffles without skew at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d).orderBy("keep_id")


@query(
    "dedup_minhash_signatures",
    f"""
    WITH {_SQL_SH}
    SELECT doc_id,
           {_SQL_MH_COLS}
    FROM sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "minhash"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash pipeline: 3-token shingles → stable hash → 16 affine
    permutations → per-doc min. Value-exact across engines by construction."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_signatures(doc_shingles(d)).orderBy("doc_id")


@query(
    "dedup_lsh_pairs",
    f"""
    WITH {_SQL_SH},
    {_SQL_SIGS},
    bands AS ({_SQL_BANDS}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, sig)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           CAST(COALESCE(i.n_common, 0) AS DOUBLE)
               / (za.n + zb.n - COALESCE(i.n_common, 0)) AS jaccard
    FROM pairs p
    LEFT JOIN inter i USING (id_a, id_b)
    JOIN sizes za ON za.doc_id = p.id_a
    JOIN sizes zb ON zb.doc_id = p.id_b
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (4 bands × 4 rows) with exact Jaccard
    verification — the linear-time near-dedup path for a 100 TB corpus (the
    banded self-join replaces the O(n²) all-pairs comparison)."""
    d = load_table(spark, sf_dir, "documents")
    # The shingle set feeds four plan subtrees (minhash + sizes + both sides
    # of the intersection join); persist so the explode+distinct runs once.
    sh = doc_shingles(d).persist()
    pairs = lsh_candidate_pairs(minhash_signatures(sh))
    return jaccard_pairs(sh, pairs).orderBy("id_a", "id_b")


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SQL_SH},
    sample AS (SELECT doc_id FROM documents WHERE doc_id < 60),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT p.id_a, p.id_b,
               CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / (za.n + zb.n - COALESCE(i.n_common, 0)) AS jaccard
        FROM pairs p
        LEFT JOIN inter i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
    )
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 20
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs n-gram Jaccard on a bounded sample (doc_id < 60):
    the brute-force ground truth the LSH path approximates. Bounded on
    purpose — all-pairs is quadratic and is NOT the scale path."""
    d = load_table(spark, sf_dir, "documents")
    sample = d.filter(F.col("doc_id") < 60)
    sh = doc_shingles(sample)
    ids = sample.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .join(ids.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    return (
        jaccard_pairs(sh, pairs)
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(20)
    )


@query(
    "dedup_simhash",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    h AS (SELECT doc_id, {sql_stable_hash_mod('tok')} AS h FROM toks),
    bits AS (
        SELECT doc_id, b,
               CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS w
        FROM h CROSS JOIN generate_series(0, 31) t(b)
    ),
    per_bit AS (SELECT doc_id, b, SUM(w) AS s FROM bits GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM per_bit
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures (frequency-weighted token bits) — near-dup
    detection by small Hamming distance; signature computation is two
    aggregations, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    return simhash32(d).orderBy("doc_id")


_SQL_SIMHASH64 = """
    toks AS (
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
    )
"""


@query(
    "dedup_simhash_probe",
    f"""
    WITH {_SQL_SIMHASH64}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim_hi, b.sim_hi))
                + bit_count(xor(a.sim_lo, b.sim_lo)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim_hi, b.sim_hi))
          + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "simhash", "hamming"),
)
def dedup_simhash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs within Hamming radius 3 via banded
    multi-probe (`functions.dedup.simhash_hamming_pairs`): 4×16-bit bands
    make candidate lookup an equi-join with *exact* recall at radius ≤ 3
    (pigeonhole), so the Spark side never does the all-pairs product the
    brute-force oracle uses. The signature itself is a per-row
    higher-order-function fold (`simhash64_rowwise` — map-side, no token
    explode), so the bucket-key groupBy is the query's ONLY shuffle;
    Hamming verified inline with bit_count(xor) on the carried words."""
    d = load_table(spark, sf_dir, "documents")
    return (
        simhash_hamming_pairs(simhash64_rowwise(d))
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_embedding_cosine",
    f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    sigs AS (SELECT vec_id, v, norm, {sql_lsh_signature('v')} AS sig FROM base),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos_sim
        FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.3
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup candidates: sign-LSH buckets make candidate
    generation an equi-join on the 8-bit signature (never an all-pairs corpus
    product), then exact cosine filters within the bucket. At 100 TB the
    bucket join shuffles on the signature — bounded by bucket skew, handled
    by AQE skew-join; the threshold is fixture-calibrated (max pairwise
    cosine in the synthetic corpus is ~0.51)."""
    e = load_table(spark, sf_dir, "embeddings")
    base = with_norm(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).withColumn("sig", lsh_signature())
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "sig",
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        F.col("sig").alias("sig_b"),
    )
    return (
        a.join(b, (F.col("sig") == F.col("sig_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            (_sim_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_connected_groups",
    f"""
    WITH RECURSIVE {_SQL_SH},
    {_SQL_SIGS},
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, sig)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM cand p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    ),
    edges AS (
        SELECT p.id_a, p.id_b
        FROM cand p
        JOIN inter i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
        WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION
        SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(node, r) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.src, q.r FROM sym e JOIN reach q ON q.node = e.dst
    )
    SELECT node, MIN(r) AS group_id FROM reach GROUP BY node ORDER BY node
    """,
    tags=("dedup", "lsh", "connected-components", "iterative"),
)
def dedup_connected_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidates → Jaccard ≥ 0.5 edges →
    connected components (iterative min-label propagation; DuckDB oracle uses
    a recursive CTE over the same edges). group_id = min doc_id per cluster —
    the canonical survivor; dropping every node with node != group_id IS the
    dedup. The fixpoint is unique, so both engines agree exactly."""
    from rtcdb_spark.functions.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d).persist()
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    edges = jaccard_pairs(sh, cand).filter(F.col("jaccard") >= 0.5).select("id_a", "id_b")
    return connected_components(edges).orderBy("node")


_SQL_CC_EDGES = f"""
    {_SQL_SH},
    {_SQL_SIGS},
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, sig)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM cand p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    ),
    edges AS (
        SELECT p.id_a, p.id_b
        FROM cand p
        JOIN inter i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
        WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION
        SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(node, r) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.src, q.r FROM sym e JOIN reach q ON q.node = e.dst
    ),
    groups AS (SELECT node, MIN(r) AS group_id FROM reach GROUP BY node)
"""


@query(
    "dedup_materialize_survivors",
    f"""
    WITH RECURSIVE {_SQL_CC_EDGES}
    SELECT d.doc_id, length(d.text) AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM groups WHERE node <> group_id)
    ORDER BY d.doc_id
    """,
    tags=("dedup", "materialize", "pipeline"),
)
def dedup_materialize_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup pipeline's OUTPUT: the corpus with duplicate
    clusters collapsed to their canonical member (min doc_id). Everything
    upstream (LSH → Jaccard → connected components) produces a *removal
    list* — nodes whose label differs from their own id; one left-anti join
    applies it. At 100 TB the removal list is tiny next to the corpus, so
    the anti-join broadcasts and the corpus never shuffles."""
    from rtcdb_spark.functions.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d).persist()
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    edges = jaccard_pairs(sh, cand).filter(F.col("jaccard") >= 0.5).select("id_a", "id_b")
    removals = (
        connected_components(edges)
        .filter(F.col("node") != F.col("group_id"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        d.join(F.broadcast(removals), "doc_id", "left_anti")
        .select("doc_id", F.length("text").alias("n_chars"))
        .orderBy("doc_id")
    )


_PF_T = 0.6  # Jaccard threshold for the prefix-filtering join


@query(
    "dedup_prefix_filter_pairs",
    f"""
    WITH {_SQL_SH},
    freq AS (SELECT sh, COUNT(*) AS f FROM sh GROUP BY sh),
    sized AS (
        SELECT doc_id, sh, f,
               COUNT(*) OVER (PARTITION BY doc_id) AS n,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f ASC, sh ASC) AS rn
        FROM sh JOIN freq USING (sh)
    ),
    prefix AS (
        SELECT doc_id, sh FROM sized
        WHERE rn <= n - CAST(ceil({_PF_T} * n) AS BIGINT) + 1
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN prefix b USING (sh)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT p.id_a, p.id_b,
               CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / (za.n + zb.n - COALESCE(i.n_common, 0)) AS jaccard
        FROM pairs p
        LEFT JOIN inter i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
    )
    WHERE jaccard >= {_PF_T}
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "prefix-filter", "ppjoin"),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join via prefix filtering (PPJoin's candidate scheme):
    for Jaccard ≥ t, two sets must share a shingle within each one's
    (n - ⌈t·n⌉ + 1)-element prefix when shingles are ordered rarest-first —
    so candidates come from joining only the short prefixes, then exact
    Jaccard verifies. Complements MinHash-LSH (dedup_lsh_pairs): exact (no
    probabilistic misses) while still never comparing all pairs. At 100 TB
    the global-frequency table is a broadcast side, the prefix join keys on
    rare shingles (few collisions ⇒ no skew), and verification touches only
    surviving candidates."""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d).persist()
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id")
    sized = (
        sh.join(freq, "sh")
        .withColumn("n", F.count(F.lit(1)).over(wd))
        .withColumn(
            "rn", F.row_number().over(wd.orderBy(F.asc("f"), F.asc("sh")))
        )
    )
    prefix = sized.filter(
        F.col("rn") <= F.col("n") - F.ceil(_PF_T * F.col("n")).cast("bigint") + 1
    ).select("doc_id", "sh")
    pairs = (
        prefix.alias("a")
        .join(prefix.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    return (
        jaccard_pairs(sh, pairs)
        .filter(F.col("jaccard") >= _PF_T)
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_rate_by_source",
    """
    WITH d AS (SELECT source, sha256(text) AS digest FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT digest) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT digest) AS DOUBLE) / COUNT(*), 6)
               AS dup_rate
    FROM d
    GROUP BY source
    ORDER BY source
    """,
    tags=("dedup", "profiling", "llm-pipeline"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication audit: exact-duplicate rate per provenance
    bucket (`source` column) — the first report a data-curation pipeline
    produces when deciding which crawls/feeds to keep. One hash-groupBy
    shape: count-distinct over the content digest per source; Spark plans
    it as a partial-combined two-phase aggregate, so the shuffle carries
    per-(source, digest-partial) rows, never documents."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select("source", F.sha2("text", 256).alias("digest"))
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("digest").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                1.0 - F.col("n_unique").cast("double") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "dedup_connected_groups_star",
    f"""
    WITH RECURSIVE {_SQL_SH},
    {_SQL_SIGS},
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, sig)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM cand p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    ),
    edges AS (
        SELECT p.id_a, p.id_b
        FROM cand p
        JOIN inter i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
        WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= 0.5
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION
        SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(node, r) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.src, q.r FROM sym e JOIN reach q ON q.node = e.dst
    )
    SELECT node, MIN(r) AS group_id FROM reach GROUP BY node ORDER BY node
    """,
    tags=("dedup", "lsh", "connected-components", "iterative", "star"),
)
def dedup_connected_groups_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via alternating large-star/small-star
    (`functions.dedup.connected_components_star`) — identical result to
    `dedup_connected_groups` (the fixpoint is the unique min-rooted star
    forest) but O(log n) rounds on ANY graph shape instead of O(diameter):
    the scale-safe choice when near-dup chains can be long (sliding-window
    shingles, boilerplate series). Oracle = the same recursive-CTE
    reachability the label-propagation variant checks against."""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d).persist()
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    edges = (
        jaccard_pairs(sh, cand)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    from rtcdb_spark.functions.dedup import connected_components_star

    return connected_components_star(edges).orderBy("node")


@query(
    "dedup_star_connectivity_groups",
    f"""
    WITH RECURSIVE {_SQL_SH},
    {_SQL_SIGS},
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, sig)
        WHERE a.doc_id < b.doc_id
    ),
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM cand
        UNION
        SELECT id_b AS src, id_a AS dst FROM cand
    ),
    reach(node, r) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.src, q.r FROM sym e JOIN reach q ON q.node = e.dst
    ),
    groups AS (SELECT node, MIN(r) AS group_id FROM reach GROUP BY node)
    SELECT node, group_id,
           CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members
    FROM groups
    ORDER BY node
    """,
    tags=("dedup", "lsh", "connectivity-only", "star", "extreme-multiplicity"),
)
def dedup_star_connectivity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The designed 100 TB dedup-grouping path, oracle-gated (round 6):
    ``lsh_candidate_pairs(connectivity_only=True)`` emits ONLY star links
    (anchor = bucket min id) — O(m) pairs per duplicate cluster of
    multiplicity m instead of the O(m²) clique (`functions/dedup.py`;
    measured 100x rung in SCALE.md §14: 17.5 s clique vs 2.7 s star,
    identical groups) — then large-star/small-star connected components
    produce the cluster census. The oracle computes reachability over the
    FULL candidate clique set in DuckDB; a hash match therefore proves the
    star-link graph has the exact same transitive closure as all-pairs
    expansion — the property the whole mode rests on. Per-node output
    (node, group_id, component size) rather than just a census, so a
    single mis-grouped doc fails the gate."""
    from pyspark.sql.window import Window

    from rtcdb_spark.functions.dedup import connected_components_star

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d)
    links = lsh_candidate_pairs(
        minhash_signatures(sh), connectivity_only=True
    )
    groups = connected_components_star(links)
    w = Window.partitionBy("group_id")
    return groups.select(
        "node",
        "group_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_members"),
    ).orderBy("node")


_SPAN_N = 8  # tokens per span ("line" analogue for the single-line fixture text)
_SPAN_MIN_DOCS = 3  # spans in at least this many docs are boilerplate (fixture-calibrated)


@query(
    "dedup_boilerplate_spans",
    f"""
    WITH spans AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(
                       generate_series(1, greatest(len(string_split(text, ' ')) - {_SPAN_N - 1}, 1)),
                       i -> array_to_string(string_split(text, ' ')[i:i+{_SPAN_N - 1}], ' ')
                   )
               )) AS span
        FROM documents
    )
    SELECT span,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM spans
    GROUP BY span
    HAVING COUNT(*) >= {_SPAN_MIN_DOCS}
    ORDER BY n_docs DESC, span
    """,
    tags=("dedup", "boilerplate", "span", "llm-pipeline"),
)
def dedup_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (span-level) duplication — the CCNet/RefinedWeb
    line-dedup step that document-level dedup cannot do: token spans
    repeated across ≥{_SPAN_MIN_DOCS} distinct documents are boilerplate
    (headers, navigation, license blurbs) to strip from otherwise-unique
    docs. Spans are {_SPAN_N}-token windows (the fixture's 'line'
    analogue); per-doc distinct spans explode → one (span) groupBy with
    map-side combine; the HAVING threshold keeps the result
    boilerplate-sized. At 100 TB this is the same single-shuffle shape as
    exact dedup — the span hash is the key; removal is then a broadcast
    anti-join of the (tiny) boilerplate set against the span stream."""
    d = load_table(spark, sf_dir, "documents")
    spans = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text", _SPAN_N))).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= _SPAN_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.asc("span"))
    )


@query(
    "dedup_exact_normalized",
    """
    WITH norm AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS digest
        FROM documents
    )
    SELECT digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM norm
    GROUP BY digest
    ORDER BY keep_id
    """,
    tags=("dedup", "normalize", "llm-pipeline"),
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized exact dedup — the practical first dedup pass every corpus
    pipeline runs before byte-exact hashing: lowercase, collapse repeated
    whitespace, trim, THEN digest. Catches trivially-reformatted copies
    (case changes, double spaces) that byte-exact dedup misses while
    staying a pure map expression + one uniform digest-key shuffle — the
    same scale shape as `dedup_exact`. Normalization is deliberately
    conservative (no punctuation stripping / unicode folding here — those
    change retrieval semantics and belong to a separate policy layer)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    return (
        d.select("doc_id", F.sha2(norm, 256).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("keep_id")
    )


_SPAN_DROP_FRAC = 0.30  # drop a doc when ≥30% of its distinct spans are boilerplate


@query(
    "dedup_span_fraction",
    f"""
    WITH spans AS (
        SELECT doc_id, unnest(list_distinct({sql_shingles('text', _SPAN_N)})) AS span
        FROM documents
    ),
    counts AS (
        SELECT span, COUNT(*) AS n_docs FROM spans GROUP BY span
    ),
    flagged AS (
        SELECT s.doc_id,
               CASE WHEN c.n_docs >= {_SPAN_MIN_DOCS} THEN 1 ELSE 0 END AS is_b
        FROM spans s JOIN counts c USING (span)
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(is_b) AS BIGINT) AS n_boiler,
           CAST(SUM(is_b) AS BIGINT) / COUNT(*) AS dup_frac,
           CAST(CAST(SUM(is_b) AS BIGINT) / COUNT(*) < {_SPAN_DROP_FRAC} AS BIGINT) AS keep
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "span", "filter", "llm-pipeline"),
)
def dedup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction → keep/drop decision — the
    RefinedWeb/CCNet line-dedup *filter* that `dedup_boilerplate_spans`
    only inventories: a doc whose distinct {_SPAN_N}-token spans are
    ≥{_SPAN_DROP_FRAC:.0%} boilerplate (spans shared by ≥{_SPAN_MIN_DOCS}
    docs) is mostly navigation/template text and is dropped whole, even
    when its exact hash is unique.

    Scale shape: one explode of per-doc *distinct* spans (array_distinct
    runs map-side, bounding the explode at the doc's span count), one
    span-key shuffle for the global span→doc-count, then the count table
    joins back to the span stream and ONE doc_id-key shuffle computes both
    the span total and the boilerplate subtotal in a single aggregate. At
    100 TB the span→count table is corpus-sized, so the join-back stays a
    shuffle equi-join (not a broadcast) — but it carries only (span,
    n_docs), and AQE converts it to a broadcast automatically whenever the
    HAVING-style cardinality collapse makes it small. dup_frac is one
    IEEE double division of two identical BIGINTs per row — bit-equal on
    both engines; the keep flag is emitted as 0/1 BIGINT so the driver's
    pandas canonicalizer sees the same dtype from both."""
    d = load_table(spark, sf_dir, "documents")
    spans = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text", _SPAN_N))).alias("span"),
    )
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("n_docs"))
    flagged = spans.join(counts, "span").select(
        "doc_id",
        (F.col("n_docs") >= _SPAN_MIN_DOCS).cast("int").alias("is_b"),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("is_b").cast("bigint").alias("n_boiler"),
    )
    dup_frac = F.col("n_boiler") / F.col("n_spans")
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_boiler",
        dup_frac.alias("dup_frac"),
        (dup_frac < F.lit(_SPAN_DROP_FRAC)).cast("bigint").alias("keep"),
    ).orderBy("doc_id")


@query(
    "dedup_containment_pairs",
    f"""
    WITH {_SQL_SH},
    sample AS (SELECT doc_id FROM documents WHERE doc_id < 60),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_common
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.id_a
        JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    )
    SELECT id_a, id_b, jaccard, containment FROM (
        SELECT p.id_a, p.id_b,
               CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / (za.n + zb.n - COALESCE(i.n_common, 0)) AS jaccard,
               CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / least(za.n, zb.n) AS containment
        FROM pairs p
        LEFT JOIN inter i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
    )
    ORDER BY containment DESC, jaccard DESC, id_a, id_b
    LIMIT 20
    """,
    tags=("dedup", "containment", "llm-pipeline"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (near-superset) detection on the bounded ground-truth
    sample: |A∩B| / min(|A|,|B|) alongside Jaccard, surfacing pairs where
    one document nearly CONTAINS the other — quotes, boilerplate-wrapped
    copies — which symmetric Jaccard dilutes toward zero as the size gap
    grows. On the scale path the same expression drops into the LSH
    verify stage (candidates from banding, exact containment verify);
    here it runs over the bounded all-pairs sample so the oracle is
    exhaustive."""
    d = load_table(spark, sf_dir, "documents")
    sample = d.filter(F.col("doc_id") < 60)
    sh = doc_shingles(sample)
    ids = sample.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .join(ids.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    from rtcdb_spark.functions.dedup import containment_pairs

    return (
        containment_pairs(sh, pairs)
        .orderBy(F.desc("containment"), F.desc("jaccard"), "id_a", "id_b")
        .limit(20)
    )


@query(
    "dedup_minhash_calibration",
    f"""
    WITH {_SQL_SH},
    {_SQL_SIGS},
    sample AS (SELECT doc_id FROM documents WHERE doc_id < 60),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
    ),
    est AS (
        SELECT p.id_a, p.id_b,
               ({' + '.join(f'CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END' for i in range(16))})
                   AS n_match
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.id_a
        JOIN sigs sb ON sb.doc_id = p.id_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    exact AS (
        SELECT p.id_a, p.id_b,
               CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / (za.n + zb.n - COALESCE(i.n_common, 0)) AS jac
        FROM pairs p
        LEFT JOIN (
            SELECT p2.id_a, p2.id_b, COUNT(*) AS n_common
            FROM pairs p2
            JOIN sh sa ON sa.doc_id = p2.id_a
            JOIN sh sb ON sb.doc_id = p2.id_b AND sb.sh = sa.sh
            GROUP BY p2.id_a, p2.id_b
        ) i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
    )
    SELECT e.n_match,
           COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(CAST(x.jac AS DECIMAL(28,15))) AS DOUBLE) / COUNT(*), 9)
               AS mean_exact_jaccard
    FROM est e JOIN exact x USING (id_a, id_b)
    GROUP BY e.n_match
    ORDER BY e.n_match
    """,
    tags=("dedup", "minhash", "calibration"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration curve — for every ground-truth pair, how many of
    the 16 signature components agree vs the pair's EXACT Jaccard: the
    estimator-audit that tells you whether 16 permutations suffice before
    trusting banded LSH at corpus scale (E[matches/16] = J; a flat or
    noisy curve says widen the signature). Mean exact Jaccard per
    match-count bucket accumulates via DECIMAL(28,15) (order-independent)
    and rounds to 9. Bounded to the same doc_id < 60 ground-truth sample
    as the other exact-verification queries — the audit is O(sample²) by
    design; the production signature path stays linear."""
    d = load_table(spark, sf_dir, "documents")
    sample = d.filter(F.col("doc_id") < 60)
    sh = doc_shingles(sample).persist()
    sigs = minhash_signatures(sh)
    ids = sample.select("doc_id")
    pairs = ids.select(F.col("doc_id").alias("id_a")).join(
        ids.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b")
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)])
    sb = sigs.select(F.col("doc_id").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)])
    n_match = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(16)
    ).alias("n_match")
    est = pairs.join(sa, "id_a").join(sb, "id_b").select("id_a", "id_b", n_match)
    exact = jaccard_pairs(sh, pairs)
    return (
        est.join(exact, ["id_a", "id_b"])
        .groupBy("n_match")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(28,15)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_exact_jaccard"),
        )
        .orderBy("n_match")
    )


@query(
    "dedup_cluster_size_distribution",
    f"""
    WITH {_SQL_SIMHASH64},
    clusters AS (
        SELECT sim_hi, sim_lo, COUNT(*) AS cluster_size
        FROM sigs GROUP BY sim_hi, sim_lo
    )
    SELECT cluster_size,
           COUNT(*) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN cluster_size > 1
                     THEN (cluster_size - 1) * COUNT(*) ELSE 0 END AS BIGINT)
               AS n_removable
    FROM clusters
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    tags=("dedup", "diagnostics", "simhash"),
)
def dedup_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster size histogram — the dedup diagnostic read
    BEFORE running removal: documents sharing a full 64-bit SimHash
    signature form candidate-duplicate clusters; the histogram shows how
    many exist at each size, how many documents they hold, and how many
    rows collapsing them would delete (size−1 per cluster). A heavy tail
    predicts hot signature keys for the dedup shuffle (AQE skew-join
    territory) and quantifies the win up front. Signature clustering is
    used (not raw sha256) so the histogram reflects NEAR-duplication —
    the fixture has no byte-identical pairs but does plant near-dups,
    which this surfaces. Two map-combined aggregates over the signature
    key — the same single-shuffle scale shape as exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    clusters = simhash64_rowwise(d).groupBy("sim_hi", "sim_lo").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            F.when(
                F.col("cluster_size") > 1,
                (F.col("cluster_size") - 1) * F.col("n_clusters"),
            )
            .otherwise(0)
            .cast("bigint")
            .alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


@query(
    "dedup_survivorship_best_record",
    f"""
    WITH {_SQL_SIMHASH64},
    scored AS (
        SELECT s.doc_id, s.sim_hi, s.sim_lo, d.n_chars, d.source,
               ROW_NUMBER() OVER (
                   PARTITION BY s.sim_hi, s.sim_lo
                   ORDER BY d.n_chars DESC, s.doc_id ASC) AS pick,
               COUNT(*) OVER (PARTITION BY s.sim_hi, s.sim_lo) AS cluster_size
        FROM sigs s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM scored
    WHERE pick = 1 AND cluster_size > 1
    ORDER BY doc_id
    """,
    tags=("dedup", "survivorship", "mdm"),
)
def dedup_survivorship_best_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship by QUALITY, not by id — the MDM golden-record policy:
    within each near-duplicate cluster (full 64-bit SimHash signature),
    keep the richest record (longest content, doc_id tie-break) instead
    of the arbitrary minimum id that `dedup_materialize_survivors` uses.
    This is the policy layer a real corpus pipeline wants — near-dups
    differ, and which copy survives determines training-data quality.
    One signature-key window (row_number + cluster size over the same
    partitioning) picks winners with zero extra shuffles beyond the
    signature computation; output lists each multi-member cluster's
    golden record."""
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash64_rowwise(d).join(d.select("doc_id", "n_chars", "source"), "doc_id")
    from pyspark.sql import Window

    wp = Window.partitionBy("sim_hi", "sim_lo").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wc = Window.partitionBy("sim_hi", "sim_lo")
    return (
        sigs.withColumn("pick", F.row_number().over(wp))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc))
        .filter((F.col("pick") == 1) & (F.col("cluster_size") > 1))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_threshold_sweep",
    f"""
    WITH {_SQL_SH},
    {_SQL_SIMHASH64},
    sample AS (SELECT doc_id FROM documents WHERE doc_id < 60),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    truth AS (
        SELECT p.id_a, p.id_b,
               CASE WHEN CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                         / (za.n + zb.n - COALESCE(i.n_common, 0)) >= 0.5
                    THEN 1 ELSE 0 END AS is_dup
        FROM pairs p
        LEFT JOIN (
            SELECT p2.id_a, p2.id_b, COUNT(*) AS n_common
            FROM pairs p2
            JOIN sh sa ON sa.doc_id = p2.id_a
            JOIN sh sb ON sb.doc_id = p2.id_b AND sb.sh = sa.sh
            GROUP BY p2.id_a, p2.id_b
        ) i USING (id_a, id_b)
        JOIN sizes za ON za.doc_id = p.id_a
        JOIN sizes zb ON zb.doc_id = p.id_b
    ),
    ham AS (
        SELECT t.id_a, t.id_b, t.is_dup,
               bit_count(xor(ga.sim_hi, gb.sim_hi))
                   + bit_count(xor(ga.sim_lo, gb.sim_lo)) AS hd
        FROM truth t
        JOIN sigs ga ON ga.doc_id = t.id_a
        JOIN sigs gb ON gb.doc_id = t.id_b
    ),
    grid AS (SELECT unnest(generate_series(0, 8)) AS h)
    SELECT g.h AS hamming_threshold,
           CAST(SUM(CASE WHEN m.hd <= g.h AND m.is_dup = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN m.hd <= g.h AND m.is_dup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN m.hd > g.h AND m.is_dup = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CASE WHEN SUM(CASE WHEN m.hd <= g.h THEN 1 ELSE 0 END) = 0 THEN NULL
                ELSE CAST(SUM(CASE WHEN m.hd <= g.h AND m.is_dup = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     / CAST(SUM(CASE WHEN m.hd <= g.h THEN 1 ELSE 0 END) AS BIGINT) END AS precision,
           CASE WHEN SUM(m.is_dup) = 0 THEN NULL
                ELSE CAST(SUM(CASE WHEN m.hd <= g.h AND m.is_dup = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     / CAST(SUM(m.is_dup) AS BIGINT) END AS recall
    FROM ham m CROSS JOIN grid g
    GROUP BY g.h
    ORDER BY g.h
    """,
    tags=("dedup", "simhash", "calibration", "evaluation"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector operating curve — precision/recall of every SimHash Hamming
    radius (0..8) against exact-Jaccard ground truth (J ≥ 0.5 on the
    bounded sample): the evaluation that picks the production radius
    BEFORE a corpus-scale run, completing the calibration trio
    (minhash_calibration audits the estimator, cluster_size_distribution
    the corpus, this the decision threshold). Counts are exact integers;
    precision/recall are single divisions with engine-consistent NULL on
    empty denominators."""
    d = load_table(spark, sf_dir, "documents")
    sample = d.filter(F.col("doc_id") < 60)
    sh = doc_shingles(sample).persist()
    ids = sample.select("doc_id")
    pairs = ids.select(F.col("doc_id").alias("id_a")).join(
        ids.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b")
    )
    truth = jaccard_pairs(sh, pairs).select(
        "id_a", "id_b", (F.col("jaccard") >= 0.5).cast("int").alias("is_dup")
    )
    sigs = simhash64_rowwise(sample)
    ga = sigs.select(F.col("doc_id").alias("id_a"), F.col("sim_hi").alias("ha"), F.col("sim_lo").alias("la"))
    gb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sim_hi").alias("hb"), F.col("sim_lo").alias("lb"))
    ham = (
        truth.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "is_dup",
            (
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            ).alias("hd"),
        )
    )
    grid = spark.range(0, 9).select(F.col("id").alias("h"))
    joined = ham.crossJoin(F.broadcast(grid))
    hit = (F.col("hd") <= F.col("h")).cast("int")
    agg = joined.groupBy("h").agg(
        F.sum(hit * F.col("is_dup")).cast("bigint").alias("tp"),
        F.sum(hit * (1 - F.col("is_dup"))).cast("bigint").alias("fp"),
        F.sum((1 - hit) * F.col("is_dup")).cast("bigint").alias("fn"),
        F.sum(hit).cast("bigint").alias("pred_pos"),
        F.sum("is_dup").cast("bigint").alias("n_dup"),
    )
    return (
        agg.select(
            F.col("h").alias("hamming_threshold"),
            "tp",
            "fp",
            "fn",
            F.when(F.col("pred_pos") == 0, F.lit(None)).otherwise(
                F.col("tp") / F.col("pred_pos")
            ).alias("precision"),
            F.when(F.col("n_dup") == 0, F.lit(None)).otherwise(
                F.col("tp") / F.col("n_dup")
            ).alias("recall"),
        )
        .orderBy("hamming_threshold")
    )


@query(
    "dedup_semantic_clusters",
    """
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS cid, v AS cv, norm AS cnorm FROM base
        WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15)
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
    dup AS (
        SELECT DISTINCT a.vec_id
        FROM assign a JOIN assign b
          ON a.cid = b.cid AND b.vec_id < a.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.3
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           (d.vec_id IS NOT NULL) AS is_dup
    FROM assign a LEFT JOIN dup d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id
    """,
    tags=("dedup", "embedding", "semantic", "llm-pipeline"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-style (Abbas et al., 2023): cluster the
    embedding space, then call a vector a duplicate iff a lower-id member of
    its *own cluster* sits above the cosine threshold — the trick that turns
    corpus-quadratic near-dup detection into per-cluster work. Clustering
    here is the deterministic fixed-centroid Voronoi assignment shared with
    `similarity_ivf_topk` (the 16 lowest-id vectors stand in for trained
    k-means, keeping the oracle SQL-expressible; swap in
    `kmeans_centroids` for the trained variant at no plan change).

    Scale shape: centroids broadcast (16 rows) → assignment is one corpus
    scan with a per-row argmax, no shuffle; the in-cluster pair join
    shuffles once on cid, and pair expansion is bounded per-cluster —
    cluster granularity (n_cells) is the knob that caps the quadratic term,
    exactly as in the SemDeDup paper. Survivor = min vec_id per duplicate
    neighborhood, matching every other dedup op's convention."""
    e = load_table(spark, sf_dir, "embeddings")
    base = with_norm(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    cents = base.filter(F.col("vec_id").isin(*range(16))).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    from pyspark.sql import Window

    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    # The assignment (broadcast ×16 expansion + per-vector argmax) feeds
    # three plan branches (both pair sides and the final projection);
    # persist so the expansion runs once.
    assign = (
        base.join(F.broadcast(cents))
        .withColumn("ccos", _sim_dot("v", "cv") / (F.col("norm") * F.col("cnorm")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "norm", "cid")
        .persist()
    )
    a = assign.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "cid",
    )
    b = assign.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        F.col("cid").alias("cid_b"),
    )
    dup = (
        a.join(b, (F.col("cid") == F.col("cid_b")) & (F.col("id_b") < F.col("id_a")))
        .filter(_sim_dot("va", "vb") / (F.col("na") * F.col("nb")) >= 0.3)
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assign.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("cid"),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


@query(
    "dedup_incremental_batch",
    f"""
    WITH {_SQL_SH},
    {_SQL_SIGS},
    bands AS ({_SQL_BANDS}),
    corpus AS (SELECT doc_id, sha256(text) AS digest FROM documents WHERE doc_id < 400),
    batch AS (SELECT doc_id, sha256(text) AS digest FROM documents WHERE doc_id >= 400),
    exact AS (
        SELECT b.doc_id, MIN(c.doc_id) AS exact_dup_of
        FROM batch b JOIN corpus c ON b.digest = c.digest
        GROUP BY b.doc_id
    ),
    cand AS (
        SELECT DISTINCT bb.doc_id AS id_b, cb.doc_id AS id_a
        FROM bands bb JOIN bands cb
          ON bb.band_id = cb.band_id AND bb.sig = cb.sig
        WHERE bb.doc_id >= 400 AND cb.doc_id < 400
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    jac AS (
        SELECT c.id_b, c.id_a,
               CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS j
        FROM cand c
        JOIN (
            SELECT c2.id_a, c2.id_b, COUNT(*) AS n_common
            FROM cand c2
            JOIN sh a ON a.doc_id = c2.id_a
            JOIN sh b ON b.doc_id = c2.id_b AND b.sh = a.sh
            GROUP BY c2.id_a, c2.id_b
        ) i ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
    ),
    near AS (
        SELECT id_b AS doc_id, MIN(id_a) AS near_dup_of
        FROM jac WHERE j >= 0.5 GROUP BY id_b
    )
    SELECT b.doc_id,
           e.exact_dup_of,
           n.near_dup_of,
           CASE WHEN e.doc_id IS NOT NULL OR n.doc_id IS NOT NULL
                THEN 'reject' ELSE 'keep' END AS verdict
    FROM batch b
    LEFT JOIN exact e ON e.doc_id = b.doc_id
    LEFT JOIN near n ON n.doc_id = b.doc_id
    ORDER BY b.doc_id
    """,
    tags=("dedup", "incremental", "minhash", "lsh", "llm-pipeline"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch dedup — the production admission gate: a NEW batch
    of documents (doc_id >= 400 stands in for today's crawl) is screened
    against the EXISTING corpus without ever re-pairing the corpus with
    itself. Exact path: digest join against the corpus digest index. Near
    path: the batch's MinHash band signatures equi-join the corpus's
    precomputed signature index (in production a stored table, refreshed
    by append) and only surviving candidates pay the exact-Jaccard
    verification at τ=0.5. Per-batch cost scales with the BATCH size and
    its candidate fan-out — the corpus contributes an index probe, not a
    rescan — which is what makes daily-crawl dedup tractable at a 100 TB
    accumulated corpus. Verdict column = keep/reject with the blamed
    corpus doc (min id) for both paths."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    c_dig = corpus.select(
        F.sha2("text", 256).alias("digest"), F.col("doc_id").alias("c_id")
    )
    b_dig = batch.select("doc_id", F.sha2("text", 256).alias("digest"))
    exact = (
        b_dig.join(c_dig, "digest")
        .groupBy("doc_id")
        .agg(F.min("c_id").alias("exact_dup_of"))
    )
    sh = doc_shingles(d).persist()
    sigs = minhash_signatures(sh)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "-",
                *[F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                  for r in range(ROWS_PER_BAND)],
            ).alias("sig"),
        )
        for b in range(N_BANDS)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.sig")
    bb = bands.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("id_b"), "band_id", "sig"
    )
    cb = bands.filter(F.col("doc_id") < 400).select(
        F.col("doc_id").alias("id_a"), "band_id", "sig"
    )
    cand = bb.join(cb, ["band_id", "sig"]).select("id_a", "id_b").distinct()
    jac = jaccard_pairs(sh, cand)
    near = (
        jac.filter(F.col("jaccard") >= 0.5)
        .groupBy(F.col("id_b").alias("doc_id"))
        .agg(F.min("id_a").alias("near_dup_of"))
    )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup_of",
            "near_dup_of",
            F.when(
                F.col("exact_dup_of").isNotNull()
                | F.col("near_dup_of").isNotNull(),
                F.lit("reject"),
            )
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )
