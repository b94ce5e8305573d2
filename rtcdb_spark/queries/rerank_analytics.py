"""Round-3 wave-4 surface: MMR diversified re-ranking, weighted percentiles,
empirical survival curves, URL parsing, and label-propagation communities.

All five are Tier-C north-star extensions (SURVEY §2 C-VI/C-VII/C-IX plus the
LLM-pipeline mandate); the reference implements none of them (its query engine
is a design sketch — reference README.md:51-62). Every operator here follows
the repo's scale discipline: candidate generation is the only corpus-sized
stage, re-ranking/greedy stages run on bounded broadcast pools, and all
aggregates that feed cross-engine hash comparison are exact (DECIMAL) or
IEEE-deterministic (single division / sequential fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtcdb_spark.functions.similarity import cosine_topk, with_norm
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table

# --- MMR diversified re-ranking -------------------------------------------

_MMR_QUERY_IDS = [3, 77, 211]
_MMR_POOL = 20  # relevance candidates per query (bounded re-rank pool)
_MMR_K = 5      # diversified picks per query
_MMR_LAMBDA = 0.7


def _sql_mmr_stages(k: int) -> str:
    """Unrolled greedy MMR stages s2..sk over the bounded candidate pool.

    Stage j: for every not-yet-selected candidate, penalty = max pairwise
    cosine to the selected set; pick argmax of lambda*rel - (1-lambda)*max_sim
    (ties by vec_id). The unrolled form is the SQL twin of the Spark driver
    loop — both operate on the tiny pool, never the corpus."""
    parts = []
    for j in range(2, k + 1):
        p = j - 1
        parts.append(f"""
    raw{j} AS (
        SELECT p.qid, p.aid AS vec_id, MIN(p.arel) AS rel, MAX(p.sim) AS mx
        FROM pairs p
        JOIN sel{p} sb ON sb.qid = p.qid AND sb.vec_id = p.bid
        LEFT JOIN sel{p} sa ON sa.qid = p.qid AND sa.vec_id = p.aid
        WHERE sa.vec_id IS NULL
        GROUP BY p.qid, p.aid
    ),
    s{j} AS (
        SELECT qid, vec_id, {j} AS pick, rel,
               CAST({_MMR_LAMBDA} AS DOUBLE) * rel
                 - CAST({1 - _MMR_LAMBDA:.1f} AS DOUBLE) * mx AS mmr
        FROM (
            SELECT qid, vec_id, rel, mx,
                   ROW_NUMBER() OVER (
                       PARTITION BY qid
                       ORDER BY CAST({_MMR_LAMBDA} AS DOUBLE) * rel
                                - CAST({1 - _MMR_LAMBDA:.1f} AS DOUBLE) * mx
                                DESC, vec_id
                   ) AS rn
            FROM raw{j}
        ) WHERE rn = 1
    ),
    sel{j} AS (
        SELECT qid, vec_id FROM sel{p}
        UNION ALL SELECT qid, vec_id FROM s{j}
    )""")
    return ",".join(parts)


_MMR_IDS_SQL = ", ".join(str(i) for i in _MMR_QUERY_IDS)

_MMR_ORACLE = f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, norm AS qn FROM b
          WHERE vec_id IN ({_MMR_IDS_SQL})),
    scored AS (
        SELECT q.qid, b.vec_id, b.v, b.norm,
               list_dot_product(b.v, q.qv) / (b.norm * q.qn) AS rel
        FROM b JOIN q ON b.vec_id != q.qid
    ),
    pool AS (
        SELECT qid, vec_id, v, norm, rel FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
            FROM scored
        ) WHERE rn <= {_MMR_POOL}
    ),
    pairs AS (
        SELECT a.qid, a.vec_id AS aid, c.vec_id AS bid, a.rel AS arel,
               list_dot_product(a.v, c.v) / (a.norm * c.norm) AS sim
        FROM pool a JOIN pool c
          ON a.qid = c.qid AND a.vec_id != c.vec_id
    ),
    s1 AS (
        SELECT qid, vec_id, 1 AS pick, rel,
               CAST({_MMR_LAMBDA} AS DOUBLE) * rel AS mmr
        FROM (
            SELECT qid, vec_id, rel, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
            FROM pool
        ) WHERE rn = 1
    ),
    sel1 AS (SELECT qid, vec_id FROM s1),
    {_sql_mmr_stages(_MMR_K)}
    SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
           CAST(pick AS BIGINT) AS pick, rel, mmr
    FROM ({" UNION ALL ".join(f"SELECT * FROM s{j}" for j in range(1, _MMR_K + 1))})
    ORDER BY qid, pick
"""


@query("similarity_mmr_rerank", _MMR_ORACLE, tags=("similarity", "rerank", "llm"))
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein
    SIGIR'98): pick the candidate maximizing lambda*relevance -
    (1-lambda)*max-similarity-to-already-picked, k times. The standard
    training-data / retrieval diversification step after ANN recall.

    Scale shape: the ONLY corpus-sized stage is the relevance scan inside
    ``cosine_topk`` (broadcast queries, one pass, window top-POOL). The
    greedy loop runs on the bounded pool (POOL rows per query), so pairwise
    similarity is POOL^2 per query — a broadcast-joined constant, never a
    corpus self-join. The driver loop unrolls K-1 tiny stages; at 100 TB the
    pool is still POOL rows per query and the loop cost is unchanged.

    Determinism: relevance is the sequential fold (`_dot`) matching
    DuckDB's list_dot_product; inside the per-query kernel, pairwise dot
    products accumulate dimension-by-dimension (``acc += A[:,d]*B[:,d]``) —
    elementwise double adds in the SAME order as the SQL fold, so every
    similarity, score, and tie-break is bit-identical to the oracle's
    unrolled greedy. The greedy itself runs in ONE applyInPandas pass per
    query group (pool rows ship as one Arrow batch) — a K-step DataFrame
    loop would serialize the job into K global barriers over tiny data,
    exactly the scheduler-bound shape to avoid."""
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    pool_ids = cosine_topk(e, _MMR_QUERY_IDS, k=_MMR_POOL).select(
        "qid", "vec_id", F.col("cos_sim").alias("rel")
    )
    base = with_norm(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    pool = pool_ids.join(base, "vec_id").select("qid", "vec_id", "rel", "v", "norm")

    lam, oml = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 1)
    k = _MMR_K

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        vecs = np.stack(pdf["v"].to_numpy())          # (n, dim) float64
        norms = pdf["norm"].to_numpy()
        rel = pdf["rel"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        # Sequential-fold pairwise dot products: accumulate one dimension at
        # a time so each (a,b) entry adds terms in index order — bit-equal
        # to aggregate()/list_dot_product, unlike BLAS matmul reassociation.
        acc = np.zeros((n, n))
        for d in range(vecs.shape[1]):
            acc = acc + np.outer(vecs[:, d], vecs[:, d])
        sims = acc / np.outer(norms, norms)

        first = min(range(n), key=lambda i: (-rel[i], ids[i]))
        sel = [first]
        picks = [(ids[first], 1, rel[first], lam * rel[first])]
        for pick in range(2, min(k, n) + 1):
            best = None
            for i in range(n):
                if i in sel:
                    continue
                score = lam * rel[i] - oml * max(sims[i, j] for j in sel)
                key = (-score, ids[i])
                if best is None or key < best[0]:
                    best = (key, i, score)
            sel.append(best[1])
            picks.append((ids[best[1]], pick, rel[best[1]], best[2]))
        return pd.DataFrame(
            {
                "qid": pdf["qid"].iloc[0],
                "vec_id": [p[0] for p in picks],
                "pick": [p[1] for p in picks],
                "rel": [p[2] for p in picks],
                "mmr": [p[3] for p in picks],
            }
        )

    return (
        pool.groupBy("qid")
        .applyInPandas(greedy, "qid long, vec_id long, pick long, rel double, mmr double")
        .orderBy("qid", "pick")
    )


# --- weighted percentiles --------------------------------------------------


@query(
    "agg_weighted_percentiles",
    """
    WITH c AS (
        SELECT l_returnflag AS rf, l_extendedprice AS price,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_returnflag) AS tw
        FROM lineitem
    )
    SELECT rf AS l_returnflag,
           MIN(price) FILTER (WHERE cw * 2 >= tw) AS wmedian_price,
           MIN(price) FILTER (WHERE cw * 10 >= tw * 9) AS wp90_price,
           CAST(MIN(tw) AS DOUBLE) AS total_weight
    FROM c GROUP BY rf ORDER BY rf
    """,
    tags=("agg", "percentile"),
)
def agg_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price percentiles per return flag: the weighted
    median is the smallest price whose cumulative weight reaches half the
    total (p90 analogous at 9/10). The classic inventory-valuation /
    data-mixture quantile where each row counts with its own mass.

    Determinism: weights go through DECIMAL(18,2) so cumulative and total
    sums are exact and associative in any aggregation order; the threshold
    compares scaled decimals (cw*2 >= tw) — no floating multiply. One
    shuffle on the group key for the windows; the final group-by reuses the
    same partitioning (Spark keeps the hash partitioning from the window
    exchange, so the agg is shuffle-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("decimal(18,2)")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    c = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("price"),
        F.sum(wq).over(w_cum).alias("cw"),
        F.sum(wq).over(w_all).alias("tw"),
    )
    return (
        c.groupBy("rf")
        .agg(
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("price"))).alias(
                "wmedian_price"
            ),
            F.min(
                F.when(F.col("cw") * 10 >= F.col("tw") * 9, F.col("price"))
            ).alias("wp90_price"),
            F.min("tw").cast("double").alias("total_weight"),
        )
        .select(
            F.col("rf").alias("l_returnflag"),
            "wmedian_price", "wp90_price", "total_weight",
        )
        .orderBy("l_returnflag")
    )


# --- empirical survival curve ----------------------------------------------


@query(
    "orders_survival_curve",
    """
    WITH g AS (
        SELECT date_diff('day',
                   lag(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
        FROM orders
    ),
    gaps AS (SELECT gap FROM g WHERE gap IS NOT NULL),
    t AS (SELECT COUNT(*) AS n FROM gaps),
    d AS (
        SELECT CAST(gap AS BIGINT) AS gap_days,
               CAST(COUNT(*) AS BIGINT) AS n_at_gap
        FROM gaps GROUP BY gap
    )
    SELECT gap_days, n_at_gap,
           CAST(SUM(n_at_gap) OVER (ORDER BY gap_days) AS BIGINT) AS n_cum,
           CAST(t.n - SUM(n_at_gap) OVER (ORDER BY gap_days) AS DOUBLE)
               / t.n AS survival
    FROM d, t
    ORDER BY gap_days
    """,
    tags=("orders", "survival", "timeseries"),
)
def orders_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical survival function of customer reorder gaps: S(g) = fraction
    of inter-order gaps strictly greater than g days — the no-censoring
    Kaplan-Meier curve that answers "what share of repeat purchases take
    longer than g days". Input stage is one per-customer lag window (shuffle
    on o_custkey); the distinct-gap distribution is tiny (bounded by the
    date span in days) so the cumulative window runs on a broadcast-sized
    frame. Survival is one division of exact integers — bit-identical."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap")
    ).filter(F.col("gap").isNotNull())
    d = g.groupBy(F.col("gap").cast("long").alias("gap_days")).agg(
        F.count(F.lit(1)).alias("n_at_gap")
    )
    total = g.agg(F.count(F.lit(1)).alias("n"))
    w_cum = Window.orderBy("gap_days")
    return (
        d.join(F.broadcast(total))
        .withColumn("n_cum", F.sum("n_at_gap").over(w_cum))
        .select(
            "gap_days",
            "n_at_gap",
            "n_cum",
            ((F.col("n") - F.col("n_cum")).cast("double") / F.col("n")).alias(
                "survival"
            ),
        )
        .orderBy("gap_days")
    )


# --- URL composition + parsing ---------------------------------------------


@query(
    "fn_url",
    """
    SELECT doc_id,
           'https://' || source || '.example.org/' || lang || '/doc-' || doc_id
               || '?id=' || doc_id || '&lang=' || lang AS url,
           'https' AS proto,
           source || '.example.org' AS host,
           '/' || lang || '/doc-' || doc_id AS path,
           'id=' || doc_id || '&lang=' || lang AS query_string,
           lang AS lang_param
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
    tags=("fn", "url"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar functions (SURVEY §2 C-VII string surface): compose a
    canonical URL per document, then decompose it with Spark's `parse_url`
    (PROTOCOL / HOST / PATH / QUERY and keyed query-parameter extraction).
    The oracle builds the same fields from the source columns directly, so
    the check verifies parse_url's extraction against ground truth. Pure
    map-side column expressions — no shuffle, predicate pushes to the
    scan."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id"),
        F.lit("?id="), F.col("doc_id"), F.lit("&lang="), F.col("lang"),
    )
    d = d.withColumn("url", url)
    return d.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


# --- label-propagation communities -----------------------------------------

_LPA_ITERS = 3


def _sql_lpa_iters(n: int) -> str:
    parts = ["lp0 AS (SELECT node, node AS label FROM nodes)"]
    for k in range(1, n + 1):
        parts.append(f"""
    lp{k} AS (
        SELECT node, label FROM (
            SELECT e.dst AS node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.dst
                       ORDER BY COUNT(*) DESC, l.label) AS rn
            FROM edges e JOIN lp{k - 1} l ON l.node = e.src
            GROUP BY e.dst, l.label
        ) WHERE rn = 1
    )""")
    return ",\n".join(parts)


@query(
    "graph_label_propagation",
    f"""
    WITH e0 AS (
        SELECT user_id AS src,
               lead(user_id) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    directed AS (
        SELECT DISTINCT src, nxt AS dst FROM e0
        WHERE nxt IS NOT NULL AND src != nxt
    ),
    edges AS (
        SELECT src, dst FROM directed
        UNION SELECT dst, src FROM directed
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    {_sql_lpa_iters(_LPA_ITERS)}
    SELECT CAST(label AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM lp{_LPA_ITERS}
    GROUP BY label
    ORDER BY n_members DESC, community
    """,
    tags=("graph", "community"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, deterministic
    variant): labels start as node ids; each iteration every node adopts its
    neighbors' most frequent label (ties -> smallest label). Three fixed
    iterations, then community-size histogram.

    Scale shape: per iteration one join (edges x labels, both hash-
    partitioned on the join key — the label side is nodes-sized, far
    smaller than edges) and one (dst,label)-count aggregate with map-side
    combine, then a per-dst window argmax on count-shaped data. Labels
    stay (node,label) pairs — state is O(nodes), never O(edges). The edge
    list is persisted across iterations so the lead-window derivation runs
    once. Same iteration discipline as PageRank (`functions/graph.py`)."""
    from rtcdb_spark.functions.graph import label_propagation
    from rtcdb_spark.queries.graph_queries import _event_edges

    edges = _event_edges(spark, sf_dir).persist()
    labels = label_propagation(edges, n_iter=_LPA_ITERS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
    )


_MOD_ITERS = 1  # modularity scores the round-1 partition (see docstring)


@query(
    "graph_modularity",
    f"""
    WITH e0 AS (
        SELECT user_id AS src,
               lead(user_id) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    directed AS (
        SELECT DISTINCT src, nxt AS dst FROM e0
        WHERE nxt IS NOT NULL AND src != nxt
    ),
    edges AS (
        SELECT src, dst FROM directed
        UNION SELECT dst, src FROM directed
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    {_sql_lpa_iters(_MOD_ITERS)},
    members AS (SELECT node, label FROM lp{_MOD_ITERS}),
    mm AS (SELECT COUNT(*) AS md FROM edges),
    intra AS (
        SELECT la.label, COUNT(*) AS e_dir
        FROM edges e
        JOIN members la ON la.node = e.src
        JOIN members lb ON lb.node = e.dst AND lb.label = la.label
        GROUP BY la.label
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    comm AS (
        SELECT m.label, COUNT(*) AS n_members, SUM(d.d) AS degree_sum
        FROM members m JOIN deg d ON d.node = m.node
        GROUP BY m.label
    )
    SELECT CAST(c.label AS BIGINT) AS community,
           CAST(c.n_members AS BIGINT) AS n_members,
           CAST(COALESCE(i.e_dir, 0) // 2 AS BIGINT) AS intra_edges,
           CAST(c.degree_sum AS BIGINT) AS degree_sum,
           ROUND((CAST(COALESCE(i.e_dir, 0) AS DOUBLE) * mm.md
                  - CAST(c.degree_sum AS DOUBLE) * c.degree_sum)
                 / (CAST(mm.md AS DOUBLE) * mm.md), 12) AS contribution
    FROM comm c LEFT JOIN intra i ON i.label = c.label CROSS JOIN mm
    ORDER BY community
    """,
    tags=("graph", "community", "modularity"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA partition, per community: contribution
    = e_c/m − (d_c/2m)² in its exactly-computable form (e_dir·m_dir −
    d_c²)/m_dir² — every operand is an exact integer (directed intra-edge
    count, community degree sum, directed edge count), so the only float
    work is one fixed mul/sub/div sequence per row, identical on both
    engines; Q is the column sum. This is the quality score community
    pipelines threshold on before trusting LPA output — tracked per LPA
    round, stopping when Q peaks. Here it scores the round-1 partition:
    on this dense co-activity graph LPA collapses to a single community
    by round 2 (Q = 0 by construction), and the round-1 numbers are the
    evidence of exactly that over-merging.

    Scale shape: on top of LPA's per-iteration join+aggregate, modularity
    adds two node-sized joins of the membership table against the edge
    list (hash-partitioned on node, label side is node-cardinality), a
    degree aggregate with map-side combine, and a community-sized
    broadcastable stitch. Nothing touches O(edges) state beyond the two
    memberships lookups."""
    from rtcdb_spark.functions.graph import label_propagation
    from rtcdb_spark.queries.graph_queries import _event_edges

    edges = _event_edges(spark, sf_dir).persist()
    members = label_propagation(edges, n_iter=_MOD_ITERS)
    md = edges.count()  # directed edge count (scalar; metadata-sized)
    la = members.select(F.col("node").alias("src"), F.col("label"))
    lb = members.select(F.col("node").alias("dst"), F.col("label").alias("label_b"))
    intra = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("label") == F.col("label_b"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("e_dir"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    comm = (
        members.join(deg, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("d").alias("degree_sum"),
        )
    )
    e_dir = F.coalesce(F.col("e_dir"), F.lit(0))
    return (
        comm.join(intra, "label", "left")
        .select(
            F.col("label").cast("bigint").alias("community"),
            F.col("n_members").cast("bigint").alias("n_members"),
            (e_dir / 2).cast("bigint").alias("intra_edges"),
            F.col("degree_sum").cast("bigint").alias("degree_sum"),
            F.round(
                (
                    e_dir.cast("double") * md
                    - F.col("degree_sum").cast("double") * F.col("degree_sum")
                )
                / (float(md) * md),
                12,
            ).alias("contribution"),
        )
        .orderBy("community")
    )
