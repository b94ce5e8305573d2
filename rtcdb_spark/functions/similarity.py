"""Similarity search over embedding columns (SURVEY §2 C-IX).

Two paths, mirroring how a 100 TB vector corpus is actually served:

- **Brute-force cosine top-k** — exact; one broadcast of the (small) query
  set against a single scan of the corpus, top-k per query via window rank.
  Linear in corpus size, embarrassingly parallel, no shuffle of the corpus.
  The right baseline and the right tool when the query set is small.

- **Sign-LSH (random hyperplane) bucketing** — approximate; each vector maps
  to an `n_planes`-bit signature (sign of projection onto fixed hyperplanes).
  Bucket equality is a hash-join key: candidate generation becomes an
  equi-join on the signature instead of a corpus×query product. This is the
  scale path: signatures are computed once per vector in a single pass and
  cluster cosine-similar vectors with probability 1 - θ/π per plane.

All arithmetic is double-precision array folds (`F.aggregate`/`zip_with`) —
JVM-side, deterministic left-to-right, bit-identical to the DuckDB oracle's
`list_dot_product` loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rtcdb_spark.functions._planes import PLANES


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")


def _l2sq_unrolled(a: str, b: str, n: int) -> F.Column:
    """Sum of squared differences with statically-known length, unrolled to
    plain arithmetic for whole-stage codegen.

    Spark evaluates higher-order functions (zip_with/aggregate) in the
    interpreted evaluator, so the fold costs ~10x per element when it sits
    on a corpus×m×k scored stream (the PQ paths, subspace dim 8). Only
    worth it for SHORT static lengths on wide streams: unrolling the 64-dim
    kmeans/IVF distance measured a wash (iteration job floors dominate) and
    paid seconds of first-run codegen compilation, so those keep the fold.
    Bit-identical result: the explicit leading `0D +` reproduces the fold's
    seed so the add chain associates exactly as `((0D + t0) + t1) + ...`,
    and every square is non-negative so the seed add is exact."""
    terms = " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(n)
    )
    return F.expr(f"0D + {terms}")


def with_norm(df: DataFrame, vec_col: str = "v", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, cos_sim, rank), self-matches excluded.

    Plan: the filtered query set is broadcast; the corpus is scanned once;
    ranking is a window over qid (small partitions — one per query)."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    base = with_norm(base)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    scored = (
        base.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            id_col,
            (_dot("v", "qv") / (F.col("norm") * F.col("qnorm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_signature(vec_col: str = "v") -> F.Column:
    """n_planes-bit sign signature of a double-array column as a string like
    '10110010' (deterministic hyperplanes from functions._planes)."""
    bits = [
        F.when(_dot(vec_col, f"array({', '.join(f'{w}D' for w in plane)})") > 0, "1").otherwise("0")
        for plane in PLANES
    ]
    return F.concat(*bits)


def sql_lsh_signature(vec_expr: str) -> str:
    """DuckDB twin of :func:`lsh_signature`."""
    bits = " || ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {list(plane)}) > 0 THEN '1' ELSE '0' END)"
        for plane in PLANES
    )
    return f"({bits})"


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into `n_cells`
    Voronoi cells around deterministic centroids (the vectors with the
    `n_cells` lowest ids — a stand-in for trained k-means centroids, keeping
    the oracle reproducible), then probe only the `n_probe` cells nearest to
    each query and re-rank exactly inside them.

    Plan shape at scale: centroids are a broadcast (n_cells rows); cell
    assignment is one corpus scan + per-row argmax over the broadcast — no
    shuffle; the probe step joins candidates on the (low-cardinality) cell id,
    touching ~n_probe/n_cells of the corpus instead of all of it. Output
    (qid, vec_id, cos_sim, rank)."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    base = with_norm(base)
    # IN-list (not a range predicate) so the plan carries an explicit
    # cardinality bound — the broadcast build side is provably n_cells rows.
    cents = base.filter(F.col(id_col).isin(*range(n_cells))).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.desc(F.col("ccos")), F.asc("cid")
    )
    assign = (
        base.join(F.broadcast(cents))
        .withColumn("ccos", _dot("v", "cv") / (F.col("norm") * F.col("cnorm")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(id_col, "v", "norm", "cid")
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    w_probe = Window.partitionBy("qid").orderBy(F.desc(F.col("qcos")), F.asc("cid"))
    probe = (
        q.join(F.broadcast(cents))
        .withColumn("qcos", _dot("qv", "cv") / (F.col("qnorm") * F.col("cnorm")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "qv", "qnorm", "cid")
    )
    scored = (
        assign.join(
            F.broadcast(probe),
            (assign.cid == probe.cid) & (F.col(id_col) != F.col("qid")),
        )
        .select(
            "qid",
            id_col,
            (_dot("v", "qv") / (F.col("norm") * F.col("qnorm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, then exact cosine
    re-rank within the bucket. Output (qid, vec_id, cos_sim, rank)."""
    base = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .withColumn("sig", lsh_signature())
    )
    base = with_norm(base)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("sig").alias("qsig"),
    )
    cands = base.join(
        F.broadcast(q), (F.col("sig") == F.col("qsig")) & (F.col(id_col) != F.col("qid"))
    )
    scored = cands.select(
        "qid",
        id_col,
        (_dot("v", "qv") / (F.col("norm") * F.col("qnorm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column → (cid, cv)
    centroid table, for IVF cell assignment (`ivf_topk`'s trained upgrade).

    Initialization is deterministic (the ``n_cells`` lowest-id vectors), so
    runs are reproducible. Each iteration is the canonical two-step,
    expressed as DataFrame ops only:

    1. **assign** — broadcast the centroids, score every vector against all
       of them in one pass (per-row argmin over a broadcast; the corpus
       never shuffles);
    2. **recenter** — new centroid = element-wise mean of assigned vectors:
       `posexplode` each vector, partial-sum per (cid, dim) — the only
       shuffle, carrying n_cells × dim partial sums per partition, not
       vectors — then reassemble the mean arrays.

    Empty cells keep their previous centroid (standard Lloyd's fallback).
    Cost per iteration: one corpus scan + one (cid, dim)-key aggregate —
    at 100 TB the shuffle volume is O(n_cells × dim × n_partitions), corpus
    bytes never move.

    The recenter sum runs in DECIMAL(38,18) (the repo's standard exact-sum
    pattern, `queries/base.py`): a double sum's value depends on partition
    merge order, which would make the trained centroids run-to-run
    nondeterministic — the decimal sum makes training a bit-exact function
    of the corpus under ANY partitioning, which is what lets the
    sf0.01-trained PQ codebooks be PINNED as an oracle literal (round 7,
    the BPE-merge-table treatment)."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    cents = (
        base.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).cast("int").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        # argmin as MIN(struct(d2, cid, v)) — (d2, cid) is unique per
        # candidate so the struct order IS the (d2 asc, cid asc)
        # tie-break, and the partial aggregation collapses the k-way
        # score blowup map-side instead of shuffling it into a window
        # sort (round 7; the corpus×k rows never leave their partition)
        best = (
            base.join(F.broadcast(cents))
            .withColumn(
                "d2",
                F.expr("aggregate(zip_with(v, cv, (x, y) -> (x-y)*(x-y)), 0D, (a, x) -> a + x)"),
            )
            .groupBy(id_col)
            .agg(F.min(F.struct("d2", "cid", "v")).alias("m"))
            .select(F.col("m.cid").alias("cid"), F.col("m.v").alias("v"))
        )
        sums = (
            best.select("cid", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "sx", "n"))),
                    lambda s: (s["sx"] / s["n"]).cast("double"),
                ).alias("new_cv")
            )
        )
        cents = (
            cents.join(sums, "cid", "left")
            .select("cid", F.coalesce("new_cv", "cv").alias("cv"))
            .localCheckpoint()
        )
    return cents


def ivf_assign(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest trained centroid → (id, v, norm,
    cid). One broadcast + one corpus scan, no shuffle — the build side of a
    trained-IVF index."""
    base = with_norm(emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")))
    return (
        base.join(F.broadcast(with_norm(cents, "cv", "cnorm")))
        .withColumn("ccos", _dot("v", "cv") / (F.col("norm") * F.col("cnorm")))
        # argmax as MAX(struct(ccos, -cid, ...)): exact (ccos desc, cid
        # asc) tie-break via integer negation, collapsed map-side instead
        # of a window sort over the corpus×n_cells blowup (round 7)
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct("ccos", (-F.col("cid")).alias("ncid"), "v", "norm")
            ).alias("m")
        )
        .select(id_col, F.col("m.v").alias("v"), F.col("m.norm").alias("norm"),
                (-F.col("m.ncid")).cast("int").alias("cid"))
    )


# --- product quantization (PQ) -------------------------------------------—--


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train PQ codebooks: split each vector into ``m`` contiguous subspaces
    and run k-means (``kmeans_centroids``) independently in each →
    ``(sub, cid, cv)`` with ``m × k`` rows.

    Product quantization compresses a float vector to ``m`` small codes
    (here m bytes for k ≤ 256): at 100 TB this turns a 512-byte embedding
    column into a handful of bytes, letting the *entire* corpus index stay
    in memory while raw vectors stay in cold storage.

    All ``m`` subspaces train JOINTLY (round 7): one (id, sub, sv) explode,
    then each Lloyd iteration is ONE broadcast-argmin (restricted to the
    row's own subspace by the join key) plus ONE (sub, cid, dim)
    decimal partial-sum — 2 iterations total instead of m×n_iter
    sequential rounds of driver/job overhead. Per-subspace the math is
    bit-identical to independent runs (same lowest-id init, same
    (d2, cid) tie-break, same exact-decimal recenter), which the pinned
    sf0.01 codebook test asserts; the sequential form measured 12.4 s at
    sf0.1 against ~3 s joint. The corpus never shuffles; the only
    shuffled bytes are O(m × k × subdim) partial sums per partition."""
    dim = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    subs = base.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice("v", j * sd + 1, sd).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, "s.sub", "s.sv")
    cents = (
        subs.filter(F.col(id_col) < k)
        .select(
            "sub", F.col(id_col).cast("int").alias("cid"), F.col("sv").alias("cv")
        )
        .localCheckpoint()
    )
    for _ in range(n_iter):
        # same map-side MIN(struct) argmin as kmeans_centroids; distance
        # unrolled over the static subspace dim (codegen, not the
        # interpreted fold — this stream is corpus × m × k rows)
        best = (
            subs.join(F.broadcast(cents), "sub")
            .withColumn("d2", _l2sq_unrolled("sv", "cv", sd))
            .groupBy(id_col, "sub")
            .agg(F.min(F.struct("d2", "cid", "sv")).alias("m"))
            .select("sub", F.col("m.cid").alias("cid"), F.col("m.sv").alias("sv"))
        )
        sums = (
            best.select("sub", "cid", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "cid", "dim")
            .agg(
                F.sum(F.col("x").cast("decimal(38,18)")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "sx", "n"))),
                    lambda s: (s["sx"] / s["n"]).cast("double"),
                ).alias("new_cv")
            )
        )
        cents = (
            cents.join(sums, ["sub", "cid"], "left")
            .select("sub", "cid", F.coalesce("new_cv", "cv").alias("cv"))
            .localCheckpoint()
        )
    return cents


def pq_encode(
    emb: DataFrame,
    books: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-codeword ids →
    ``(id, codes array<int>)``. One corpus scan against the broadcast
    codebooks (m × k rows); the shuffle key is the vector id for the final
    code-array assembly only."""
    dim = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    sd = dim // m
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    subs = base.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"), F.slice("v", j * sd + 1, sd).alias("sv")
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, "s.sub", "s.sv")
    scored = (
        subs.join(F.broadcast(books), "sub")
        .withColumn("d2", _l2sq_unrolled("sv", "cv", sd))
        # map-side MIN(struct) argmin: the corpus×k scored rows collapse
        # to one row per (id, sub) inside their own partition instead of
        # shuffling into a window sort (round 7)
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(id_col, "sub", F.col("m.cid").alias("cid"))
    )
    return scored.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cid"))), lambda s: s["cid"]
        ).alias("codes")
    )


def pq_topk(
    codes: DataFrame,
    books: DataFrame,
    query_vec: list[float],
    m: int,
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes → (id, adc_d2).

    The query is NOT quantized: its exact distance to every codeword builds
    an m × k lookup table (tiny, broadcast), and each corpus vector's
    approximate distance is the sum of m table entries selected by its
    codes. Per corpus row that is m integer lookups — no float vector is
    read at query time. Distance assembly folds a sorted (sub, pd) list
    left-to-right so the double sum is order-deterministic."""
    sd = len(query_vec) // m
    dtable = books.withColumn(
        "qsv",
        F.array(*[F.lit(float(x)) for x in query_vec]),
    ).select(
        "sub",
        "cid",
        F.expr(
            f"aggregate(zip_with(slice(qsv, sub * {sd} + 1, {sd}), cv,"
            " (x, y) -> (x-y)*(x-y)), 0D, (a, x) -> a + x)"
        ).alias("pd"),
    )
    probed = (
        codes.select(id_col, F.posexplode("codes").alias("sub", "cid"))
        .join(F.broadcast(dtable), ["sub", "cid"])
        .groupBy(id_col)
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(sub, pd))), 0D,"
                " (a, s) -> a + s.pd)"
            ).alias("adc_d2")
        )
    )
    return probed.orderBy(F.asc("adc_d2"), F.asc(id_col)).limit(top_k)


def jl_signs(k: int = 16, d: int = 64) -> list[list[float]]:
    """Deterministic ±1 sign matrix for a Johnson–Lindenstrauss (Achlioptas
    2003 database-friendly) random projection: k output dims × d input dims,
    generated by a fixed 64-bit LCG (Knuth MMIX constants) so BOTH engines
    inline the exact same literals — no RNG at query time, no seed plumbing,
    re-runnable forever."""
    out: list[list[float]] = []
    state = 0x9E3779B97F4A7C15
    for _ in range(k):
        row: list[float] = []
        for _ in range(d):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if state >> 63 else -1.0)
        out.append(row)
    return out


def random_projection(
    df: DataFrame, vec_col: str = "v", k: int = 16, d: int = 64
) -> DataFrame:
    """Project a d-dim double array onto k ±1 sign vectors (scaled 1/√k):
    the JL dimensionality-reduction step a 100 TB embedding pipeline runs
    before clustering / coarse ANN to cut vector bytes (here 4×).

    Map-only: k inlined-literal dot products per row, all inside
    whole-stage codegen — no shuffle, no Python, no broadcast state. Each
    dot is the same left-to-right `aggregate(zip_with(...))` fold as
    `_dot`, bit-identical to DuckDB's `list_dot_product` loop; the 1/√k
    scale is a single exact-for-√16 division."""
    signs = jl_signs(k, d)
    scale = float(k) ** 0.5
    cols = [
        (
            _dot(vec_col, f"array({', '.join(f'{s}D' for s in row)})") / F.lit(scale)
        ).alias(f"p{j:02d}")
        for j, row in enumerate(signs)
    ]
    return df.select("*", *cols)


def sql_random_projection(vec_expr: str, k: int = 16, d: int = 64) -> list[str]:
    """DuckDB twin of :func:`random_projection`: one `list_dot_product(...,
    [±1.0, ...]) / sqrt(k) AS pNN` select-item per output dim."""
    signs = jl_signs(k, d)
    scale = float(k) ** 0.5
    return [
        f"list_dot_product({vec_expr}, [{', '.join(str(s) for s in row)}]) / {scale!r} AS p{j:02d}"
        for j, row in enumerate(signs)
    ]
