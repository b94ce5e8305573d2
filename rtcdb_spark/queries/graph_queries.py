"""Graph analytics over an event-derived co-occurrence graph (SURVEY §2
C-IX adjunct): degree distribution and PageRank. The graph is deterministic
— an edge links consecutive users within each event_type's time-ordered
stream (a co-activity graph), symmetrized and deduplicated — so both engines
build the identical edge list and the oracle checks PageRank value-exact
(exact DECIMAL(38,15) contribution sums + per-iteration rounding pin the
float arithmetic while keeping map-side partial aggregation; scale 15 keeps
the double→decimal cast inside the 2^53-exact regime so the cast itself is
bit-identical cross-engine — at scale 18 it is only statistically so).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rtcdb_spark.functions.graph import degrees, pagerank, symmetrize
from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table

_D = 0.85
_ITERS = 3

_SQL_GRAPH = """
    raw AS (
        SELECT user_id,
               LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id)
                   AS nxt
        FROM events
    ),
    e0 AS (
        SELECT DISTINCT user_id AS src, nxt AS dst
        FROM raw WHERE nxt IS NOT NULL AND user_id <> nxt
    ),
    edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
        )
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src)
"""


def _sql_pagerank_iters(n_iter: int) -> str:
    parts = [f"r0 AS (SELECT node, CAST(1 AS DOUBLE) / n AS rank FROM nodes, nn)"]
    for k in range(1, n_iter + 1):
        parts.append(f"""
    c{k} AS (
        SELECT e.dst AS node, r.rank / d.deg AS c
        FROM edges e
        JOIN r{k - 1} r ON e.src = r.node
        JOIN deg d ON e.src = d.node
    ),
    s{k} AS (
        SELECT node,
               CAST(SUM(CAST(c AS DECIMAL(38,15))) AS DOUBLE) AS s
        FROM c{k} GROUP BY node
    ),
    r{k} AS (
        SELECT n.node,
               ROUND(CAST({1 - _D} AS DOUBLE) / nn.n
                     + CAST({_D} AS DOUBLE) * COALESCE(s.s, 0), 12) AS rank
        FROM nodes n LEFT JOIN s{k} s ON n.node = s.node, nn
    )""")
    return ",\n".join(parts)


def _event_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    raw = e.select("user_id", F.lead("user_id").over(w).alias("nxt"))
    directed = (
        raw.filter(F.col("nxt").isNotNull() & (F.col("user_id") != F.col("nxt")))
        .select(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .distinct()
    )
    return symmetrize(directed)


@query(
    "graph_degree_distribution",
    f"""
    WITH {_SQL_GRAPH}
    SELECT deg, COUNT(*) AS n_nodes
    FROM deg GROUP BY deg
    ORDER BY deg
    """,
    tags=("graph", "degree"),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-activity graph — the first diagnostic for
    any graph workload (skew detection: a power-law hub means the node's
    edge partition is hot). Two map-combined aggregates; the edge list never
    leaves its partitioning."""
    edges = _event_edges(spark, sf_dir)
    return (
        degrees(edges)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("deg")
    )


@query(
    "graph_pagerank",
    f"""
    WITH {_SQL_GRAPH},
    {_sql_pagerank_iters(_ITERS)}
    SELECT node AS user_id, rank FROM r{_ITERS}
    ORDER BY rank DESC, user_id
    LIMIT 25
    """,
    tags=("graph", "pagerank", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) over the undirected co-activity
    graph; top-25 most central users. Checked *value-exact* against a fully
    unrolled SQL twin: contributions sum as exact DECIMAL(38,15) — scale
    chosen so |v|*10^15 < 2^53 keeps the double→decimal cast bit-identical
    on both engines — and every iteration rounds to 12 decimals, so both
    engines produce identical doubles (`functions.graph.pagerank`). Per
    iteration the edge list joins the node-sized rank table with no forced
    broadcast (AQE picks broadcast only when it fits — node tables at web
    scale must not be pinned driver-side); rounds are checkpointed to
    truncate lineage. Undirected construction ⇒ no dangling
    nodes, matching the oracle's formulation."""
    edges = _event_edges(spark, sf_dir)
    ranks = pagerank(edges, n_iter=_ITERS, damping=_D)
    return (
        ranks.select(F.col("node").alias("user_id"), "rank")
        .orderBy(F.desc("rank"), F.asc("user_id"))
        .limit(25)
    )


@query(
    "graph_triangle_count",
    f"""
    WITH {_SQL_GRAPH},
    canon AS (SELECT src AS u, dst AS v FROM edges WHERE src < dst),
    tri AS (
        SELECT COUNT(*) AS t
        FROM canon e1
        JOIN canon e2 ON e2.u = e1.v
        JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    wed AS (
        SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS w FROM deg
    )
    SELECT CAST(t AS BIGINT) AS n_triangles,
           w AS n_wedges,
           3 * t / w AS clustering_coeff
    FROM tri, wed
    """,
    tags=("graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census + global clustering coefficient of the
    co-activity graph — the standard cohesion diagnostic (and the op whose
    naive wedge join is the textbook quadratic blowup). The Spark side uses
    degree-ordered orientation (`functions.graph.triangle_count`): wedges
    are generated only at each edge's lower-(degree, id) endpoint, capping
    fan-out at O(√m) per node, then closed with one equi-join against the
    oriented edge set. The oracle counts the same triangles by plain
    id-ordering (u<v<w) — orientation changes the join sizes, never the
    count — so the match proves the oriented enumeration exact."""
    edges = _event_edges(spark, sf_dir)
    from rtcdb_spark.functions.graph import triangle_count

    return triangle_count(edges)


_BFS_MAX_HOPS = 3
_BFS_SEED_LIMIT = 3  # seed set: the three smallest node ids in the graph


@query(
    "graph_bfs_hops",
    f"""
    WITH RECURSIVE {_SQL_GRAPH},
    seeds AS (SELECT node FROM nodes ORDER BY node LIMIT {_BFS_SEED_LIMIT}),
    walk(node, hops) AS (
        SELECT node, 0 FROM seeds
        UNION
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < {_BFS_MAX_HOPS}
    )
    SELECT node AS user_id, CAST(MIN(hops) AS BIGINT) AS hops
    FROM walk
    GROUP BY node
    ORDER BY hops, user_id
    """,
    tags=("graph", "bfs", "iterative"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: minimum hop distance (≤{_BFS_MAX_HOPS}) from a
    seed set to every reachable node of the co-activity graph — the
    recursive-CTE workload (reachability, blast-radius, n-degree network)
    Spark has no native recursion for. Implemented as layered frontier
    expansion: each round joins the CURRENT frontier (shrinking, never the
    visited set) against the edge list, anti-joins out already-visited
    nodes, and checkpoints — K rounds = K bounded joins, no exponential
    path blowup, no driver-side state. The oracle is DuckDB's genuinely
    recursive WITH RECURSIVE ... UNION walk, so the match proves the
    layered expansion equals true recursion."""
    edges = _event_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(_BFS_SEED_LIMIT)
    )
    frontier = seeds.withColumn("hops", F.lit(0)).localCheckpoint()
    visited = frontier
    for k in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(k))
            .localCheckpoint()
        )
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return (
        visited.select(F.col("node").alias("user_id"), F.col("hops").cast("bigint"))
        .orderBy("hops", "user_id")
    )


@query(
    "graph_degree_assortativity",
    f"""
    WITH {_SQL_GRAPH},
    ends AS (
        SELECT da.deg AS dx, db.deg AS dy
        FROM edges e
        JOIN deg da ON da.node = e.src
        JOIN deg db ON db.node = e.dst
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(dx AS DECIMAL(18,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(dy AS DECIMAL(18,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(dx * dx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(dy * dy AS DECIMAL(38,0))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(dx * dy AS DECIMAL(38,0))) AS DOUBLE) AS sxy
        FROM ends
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 9)
               AS assortativity
    FROM m
    """,
    tags=("graph", "assortativity", "statistics"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity — the Pearson correlation of endpoint degrees
    over every directed edge (Newman 2002): positive means hubs attach to
    hubs (social nets), negative means hubs fan out to leaves (infra /
    star topologies) — the one-number summary that predicts how the graph
    fragments under node loss and how skewed joins over it will be. The
    degree table joins both edge endpoints (two broadcastable joins of a
    node-sized table), then the correlation uses the same exact-decimal
    mergeable power sums as agg_moments_stats: integer degree products
    sum exactly, one shared formula computes r identically on both
    engines, rounded at 9 for the final sqrt composition."""
    edges = _event_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ends = (
        edges.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("dy")), "dst")
    )
    m = ends.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dx").cast("decimal(18,0)")).cast("double").alias("sx"),
        F.sum(F.col("dy").cast("decimal(18,0)")).cast("double").alias("sy"),
        F.sum((F.col("dx") * F.col("dx")).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast("decimal(38,0)")).cast("double").alias("syy"),
        F.sum((F.col("dx") * F.col("dy")).cast("decimal(38,0)")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_directed_edges"),
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            9,
        ).alias("assortativity"),
    )


@query(
    "graph_common_neighbors",
    f"""
    WITH {_SQL_GRAPH},
    wedge AS (
        SELECT a.dst AS u, b.dst AS v, COUNT(*) AS common
        FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
        GROUP BY a.dst, b.dst
    ),
    cand AS (
        SELECT w.u, w.v, w.common FROM wedge w
        WHERE NOT EXISTS (
            SELECT 1 FROM edges e WHERE e.src = w.u AND e.dst = w.v
        )
    )
    SELECT c.u AS user_a, c.v AS user_b,
           CAST(c.common AS BIGINT) AS n_common,
           ROUND(CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common), 9)
               AS jaccard
    FROM cand c
    JOIN deg da ON da.node = c.u
    JOIN deg db ON db.node = c.v
    ORDER BY jaccard DESC, user_a, user_b
    LIMIT 50
    """,
    tags=("graph", "link-prediction", "jaccard"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg,
    2003): for every non-adjacent user pair sharing at least one neighbor,
    score |N(u) ∩ N(v)| / |N(u) ∪ N(v)| and return the 50 most likely
    missing edges. Wedge enumeration is the same self-join-on-shared-
    neighbor shape as graph_triangle_count: cost Σ deg(n)², concentrated
    on hubs — at 100 TB the standard mitigations (cap or sample hub
    adjacency before the wedge join) bolt onto the same plan. The
    existing-edge exclusion is a left-anti join on the (already
    symmetrized) edge list; degrees join in as two node-sized broadcasts;
    the final double division is a single op rounded at 9 for cross-engine
    hash parity."""
    # The edge pipeline (event window + distinct + symmetrize) feeds four
    # plan branches (adjacency, degrees, anti-join); persist so it runs once.
    edges = _event_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # Wedges via the self-equi-join on the shared neighbor. (An
    # adjacency-array expansion — the LSH-bucket trick — was measured 5×
    # slower here: `slice` inside `transform` copies the array tail per
    # element, turning the uncapped per-node expansion cubic in degree.
    # The capped LSH variant is immune because max_clique bounds the
    # slices; a full wedge census has no such cap, so the join, whose
    # matching is linear in output pairs, wins.)
    a = edges.select(F.col("src").alias("n"), F.col("dst").alias("u"))
    b = edges.select(F.col("src").alias("n"), F.col("dst").alias("v"))
    wedge = (
        a.join(b, "n")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedge.join(
        edges,
        (wedge["u"] == edges["src"]) & (wedge["v"] == edges["dst"]),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    return (
        cand.join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
        .select(
            F.col("u").alias("user_a"),
            F.col("v").alias("user_b"),
            F.col("common").cast("bigint").alias("n_common"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                9,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "user_a", "user_b")
        .limit(50)
    )
