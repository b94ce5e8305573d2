"""Property-based tests (hypothesis) — the randomized layer SURVEY §5 calls
for on top of the fixture-pinned oracle tests. Each property checks an
algebraic invariant of an operator against an independent, trivially-correct
Python model on arbitrary generated inputs, so the operators' guarantees
don't silently narrow to "works on the driver fixtures".

Examples are kept small (Spark job per example); max_examples trades
coverage for wall-clock.
"""

from __future__ import annotations

import hashlib
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.text(alphabet="abcdefgh xyz0123", min_size=0, max_size=12)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            _token,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_db_roundtrip_multiset(spark, rows):
    """write_data → scan returns exactly the written multiset (the read-back
    assertion the reference never had, SURVEY §4.3 bug 2)."""
    from rtcdb_spark.db import Database, TableMeta

    path = tempfile.mkdtemp(prefix="rtcdb_prop_")
    try:
        meta = TableMeta("t", [("k", "uint64"), ("s", "string")])
        db = Database.init(spark, path, [meta])
        db.write_data("t", [[k, s] for k, s in rows])
        got = sorted((r["k"], r["s"]) for r in db.table("t").collect())
        assert got == sorted(rows)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(**SETTINGS)
@given(
    fact=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=30
    ),
    dim=st.lists(st.integers(0, 5), min_size=0, max_size=6),
)
def test_salted_join_equals_plain_join(spark, fact, dim):
    """salted_join must be result-identical to the plain equi-join — salting
    changes the physical shuffle, never the relation."""
    from rtcdb_spark.operators.relational import salted_join

    dim = sorted(set(dim))
    f = spark.createDataFrame(
        [(k, v) for k, v in fact] or [(None, None)], "k int, v int"
    ).filter("k is not null")
    d = spark.createDataFrame(
        [(k, f"d{k}") for k in dim] or [(None, None)], "dk int, label string"
    ).filter("dk is not null")
    salted = salted_join(f, d, "k", "dk", n_salts=4)
    plain = f.join(d, f["k"] == d["dk"])
    cols = ["k", "v", "dk", "label"]
    got = sorted(tuple(r[c] for c in cols) for r in salted.select(cols).collect())
    want = sorted(tuple(r[c] for c in cols) for r in plain.select(cols).collect())
    assert got == want


@settings(**SETTINGS)
@given(strings=st.lists(_token, min_size=1, max_size=25, unique=True))
def test_stable_hash_portable_three_engines(spark, strings):
    """stable_hash_mod (the foundation of every dedup/fingerprint operator)
    must agree bit-for-bit across Spark, DuckDB, and pure Python."""
    import duckdb

    from rtcdb_spark.functions.text import (
        MERSENNE_P,
        sql_stable_hash_mod,
        stable_hash_mod,
    )

    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got_spark = {
        r["s"]: r["h"]
        for r in sdf.select("s", stable_hash_mod("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    got_duck = dict(
        con.execute(f"SELECT s, {sql_stable_hash_mod('s')} FROM t").fetchall()
    )
    for s in strings:
        py = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE_P
        assert got_spark[s] == py, s
        assert got_duck[s] == py, s


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for n in nodes:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=25
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must produce exactly the same
    (node → min-id-of-component) map as a sequential union-find."""
    from rtcdb_spark.functions.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    nodes = sorted({n for e in edges for n in e})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["group_id"] for r in connected_components(df).collect()
    }
    assert got == _union_find_components(edges, nodes)


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=40
    ),
    perm=st.randoms(use_true_random=False),
)
def test_dsum_order_independent(spark, vals, perm):
    """dsum (exact DECIMAL accumulation) must be identical under any row
    order / partitioning — the invariant the whole oracle strategy rests on."""
    from rtcdb_spark.deterministic import dsum

    shuffled = list(vals)
    perm.shuffle(shuffled)

    def total(xs, parts):
        df = spark.createDataFrame([(x,) for x in xs], "v double").repartition(parts)
        return df.agg(dsum("v", alias="s")).collect()[0]["s"]

    assert total(vals, 1) == total(shuffled, 7)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    script=st.lists(
        st.tuples(
            st.booleans(),  # True = overwrite, False = append
            st.lists(st.integers(0, 1000), min_size=1, max_size=6),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_versioned_table_matches_model(spark, script):
    """VersionedTable vs a Python model: after any commit script, every
    version reads back exactly the model's multiset for that version, and
    vacuum(keep_last=1) preserves the latest while dropping history."""
    from rtcdb_spark.sources import VersionedTable

    path = tempfile.mkdtemp(prefix="rtcdb_vt_prop_")
    try:
        vt = VersionedTable(spark, path)
        model, snapshots = [], []
        for overwrite, batch in script:
            df = spark.createDataFrame([(v,) for v in batch], "v: long")
            vt.commit(df, mode="overwrite" if overwrite else "append")
            model = list(batch) if overwrite else model + list(batch)
            snapshots.append(sorted(model))
        for v, want in enumerate(snapshots):
            got = sorted(r["v"] for r in vt.read(v).collect())
            assert got == want, f"version {v}"
        vt.vacuum(keep_last=1, retention_seconds=0)
        got = sorted(r["v"] for r in vt.read().collect())
        assert got == snapshots[-1]
        assert vt.versions() == [len(snapshots) - 1]
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=30),
        min_size=2,
        max_size=10,
        unique=True,
    )
)
def test_simhash_probe_equals_brute_force(spark, texts):
    """The banded Hamming probe must return EXACTLY the pairs a brute-force
    all-pairs scan finds at radius <= 3 (pigeonhole recall is a theorem; this
    checks the implementation on arbitrary token streams), and every
    signature stays within two non-negative 32-bit words."""
    from rtcdb_spark.functions.dedup import simhash64, simhash_hamming_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sigs = {
        r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in simhash64(docs).collect()
    }
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in sigs.values())
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(simhash64(docs)).collect()
    }
    import itertools

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    want = {
        (i, j): ham(sigs[i], sigs[j])
        for i, j in itertools.combinations(sorted(sigs), 2)
        if ham(sigs[i], sigs[j]) <= 3
    }
    assert got == want


@settings(**SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
            ).filter(lambda x: abs(x) > 1e-6),
            min_size=2,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_int8_quantization_error_bound(spark, vecs):
    """Symmetric int8 quantization invariants on arbitrary vectors: codes
    stay in [-127, 127] and the reconstruction error never exceeds half a
    quantization step (scale/2, plus one ulp of slack)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    v = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    base = df.select("vec_id", v.alias("v"), scale.alias("scale"))
    qv = F.transform(F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)))
    rows = base.withColumn("qv", qv).collect()
    for r in rows:
        s = r["scale"]
        for q, x in zip(r["qv"], r["v"]):
            assert -127 <= q <= 127, (q, x, s)
            assert abs(q * s - x) <= s / 2 + 1e-12, (q, x, s)


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_star_cc_equals_union_find(spark, edges):
    """Alternating large-star/small-star must produce exactly the min-label
    components a sequential union-find computes, on arbitrary graphs —
    including the long-path shapes where plain label propagation needs
    O(diameter) rounds."""
    from rtcdb_spark.functions.dedup import connected_components_star

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted((n, find(n)) for n in parent)

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted(
        (r["node"], r["group_id"])
        for r in connected_components_star(df).collect()
    )
    assert got == want


def test_degenerate_bucket_cap_bounds_pairs_and_keeps_connectivity(spark):
    """Adversarial corpus: every doc identical -> every band bucket holds the
    whole corpus. The cap must (a) bound pair output to clique + star size
    instead of O(n^2), and (b) keep all docs in ONE connected component."""
    from pyspark.sql import functions as F

    from rtcdb_spark.functions.dedup import (
        connected_components_star,
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash64,
        simhash_hamming_pairs,
    )

    n, cap = 600, 256
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact document body repeated verbatim").alias("text"),
    )

    expected = cap * (cap - 1) // 2 + (n - cap)  # bounded clique + star links

    lsh = lsh_candidate_pairs(
        minhash_signatures(doc_shingles(docs)), max_clique=cap
    )
    assert lsh.count() == expected  # uncapped would be n*(n-1)/2 = 179700

    groups = connected_components_star(lsh).select("group_id").distinct()
    assert groups.count() == 1

    sim = simhash_hamming_pairs(simhash64(docs), max_clique=cap)
    assert sim.count() == expected
    assert sim.agg(F.max("hamming")).first()[0] == 0


def test_bucket_cap_noop_below_threshold(spark):
    """With buckets under the cap the output is bit-identical to uncapped."""
    from pyspark.sql import functions as F

    from rtcdb_spark.functions.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc body variant number "),
            (F.col("id") % 5).cast("string"),
            F.lit(" with shared filler words to collide bands"),
        ).alias("text"),
    )
    sigs = minhash_signatures(doc_shingles(docs))
    capped = {tuple(r) for r in lsh_candidate_pairs(sigs, max_clique=256).collect()}
    uncapped = {tuple(r) for r in lsh_candidate_pairs(sigs, max_clique=10**9).collect()}
    assert capped == uncapped and capped


@settings(**SETTINGS)
@given(
    ivals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=1, max_value=80),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_interval_union_matches_sweep_model(spark, ivals):
    """The windowed gaps-and-islands interval union equals a trivial sweep:
    block count and covered mass over arbitrary [s, s+len) intervals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, s, s + ln) for i, (s, ln) in enumerate(ivals)]
    df = spark.createDataFrame(rows, ["event_id", "s_us", "e_us"])
    wprev = Window.orderBy("s_us", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wnum = Window.orderBy("s_us", "event_id")
    flagged = df.select(
        "s_us",
        "e_us",
        "event_id",
        F.when(
            (F.col("s_us") > F.max("e_us").over(wprev))
            | (F.row_number().over(wnum) == 1),
            1,
        ).otherwise(0).alias("is_new"),
    )
    wblk = Window.orderBy("s_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    merged = (
        flagged.withColumn("blk", F.sum("is_new").over(wblk))
        .groupBy("blk")
        .agg(F.min("s_us").alias("bs"), F.max("e_us").alias("be"))
    )
    got = merged.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("be") - F.col("bs")).alias("cov")
    ).first()

    # independent model: sort by start, sweep
    blocks = []
    for s, e in sorted((s, s + ln) for s, ln in ivals):
        if blocks and s <= blocks[-1][1]:
            blocks[-1][1] = max(blocks[-1][1], e)
        else:
            blocks.append([s, e])
    assert got["n"] == len(blocks)
    assert got["cov"] == sum(e - s for s, e in blocks)


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_triangle_count_matches_brute_force(spark, edges):
    """Degree-ordered triangle enumeration equals brute-force counting on
    arbitrary small graphs (self-loops and duplicate edges tolerated)."""
    from rtcdb_spark.functions.graph import symmetrize, triangle_count

    df = spark.createDataFrame(edges, ["src", "dst"])
    und = {frozenset((a, b)) for a, b in edges if a != b}
    nodes = {n for e in und for n in e}
    adj = {n: set() for n in nodes}
    for e in und:
        a, b = tuple(e)
        adj[a].add(b)
        adj[b].add(a)
    expect = sum(
        1
        for a in nodes
        for b in adj[a]
        if b > a
        for c in adj[b]
        if c > b and c in adj[a]
    )
    if not und:
        return  # empty graph: query yields no rows to compare
    got = triangle_count(symmetrize(df)).first()
    assert got["n_triangles"] == expect
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert got["n_wedges"] == wedges


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    ),
    n_seeds=st.integers(min_value=1, max_value=3),
    k=st.integers(min_value=1, max_value=4),
)
def test_bfs_hops_matches_python_bfs(spark, edges, n_seeds, k):
    """Layered frontier expansion equals a plain Python BFS (min hops ≤ k
    from the n smallest nodes) on arbitrary graphs."""
    from collections import deque

    from pyspark.sql import functions as F
    from rtcdb_spark.functions.graph import symmetrize

    df = symmetrize(spark.createDataFrame(edges, ["src", "dst"]))
    und = {frozenset((a, b)) for a, b in edges if a != b}
    if not und:
        return
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for e in und:
        a, b = tuple(e)
        adj[a].add(b)
        adj[b].add(a)
    seeds = nodes[:n_seeds]
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] == k:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)

    frontier = spark.createDataFrame([(s, 0) for s in seeds], ["node", "hops"])
    visited = frontier
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(df, frontier["node"] == df["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint()
        )
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    got = {(r["node"], r["hops"]) for r in visited.collect()}
    assert got == set(dist.items())


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=30),
        min_size=2,
        max_size=8,
    )
)
def test_containment_bounds_and_subset_exactness(spark, texts):
    """containment ≥ jaccard always; containment = 1 exactly when one
    shingle set contains the other (checked against Python set algebra)."""
    from rtcdb_spark.functions.dedup import containment_pairs, doc_shingles
    from rtcdb_spark.functions.text import tokens  # noqa: F401 (module warm)
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    sh = doc_shingles(docs)
    ids = docs.select("doc_id")
    pairs = ids.select(F.col("doc_id").alias("id_a")).join(
        ids.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b")
    )
    got = containment_pairs(sh, pairs).collect()
    shmap = {
        i: {r["sh"] for r in sh.filter(F.col("doc_id") == i).collect()}
        for i in range(len(texts))
    }
    for r in got:
        a, b = shmap[r["id_a"]], shmap[r["id_b"]]
        inter = len(a & b)
        assert r["containment"] >= r["jaccard"] - 1e-12
        expect_c = inter / min(len(a), len(b))
        expect_j = inter / len(a | b)
        assert abs(r["containment"] - expect_c) < 1e-12
        assert abs(r["jaccard"] - expect_j) < 1e-12
        if a <= b or b <= a:
            assert r["containment"] == 1.0


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=35,
    )
)
def test_label_propagation_matches_sync_model(spark, edges):
    """Deterministic synchronous LPA equals a pure-Python model: every node
    simultaneously adopts its neighbors' most frequent label (ties -> the
    smallest label), starting from label = node id."""
    from rtcdb_spark.functions.graph import label_propagation, symmetrize

    und = {frozenset((a, b)) for a, b in edges if a != b}
    if not und:
        return
    adj: dict[int, set[int]] = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        labels = {
            n: min(
                (lbl for lbl in {labels[m] for m in adj[n]}),
                key=lambda l: (-sum(labels[m] == l for m in adj[n]), l),
            )
            for n in adj
        }
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(symmetrize(df), n_iter=3).collect()
    }
    assert got == labels


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=1, max_value=50),   # quantity
            st.integers(min_value=1, max_value=500),  # price cents / 100
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_percentiles_match_exact_model(spark, rows, tmp_path_factory):
    """The weighted median / p90 equal an exact integer-arithmetic model:
    the smallest price whose cumulative quantity mass reaches 1/2 (9/10) of
    the group total under (price, orderkey, linenumber) order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rtcdb_spark.queries.rerank_analytics import agg_weighted_percentiles

    d = tmp_path_factory.mktemp("wp")
    tbl = pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows]),
            "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
            "l_orderkey": pa.array(range(len(rows)), pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "lineitem.parquet"))

    expect = {}
    for rf in {r[0] for r in rows}:
        grp = sorted(
            (r[2] / 100.0, i, r[1])
            for i, r in enumerate(rows)
            if r[0] == rf
        )
        total = sum(q for _, _, q in grp)
        cum, med, p90 = 0, None, None
        for price, _, q in grp:
            cum += q
            if med is None and cum * 2 >= total:
                med = price
            if p90 is None and cum * 10 >= total * 9:
                p90 = price
        expect[rf] = (med, p90, float(total))

    got = {
        r["l_returnflag"]: (r["wmedian_price"], r["wp90_price"], r["total_weight"])
        for r in agg_weighted_percentiles(spark, str(d)).collect()
    }
    assert got == expect


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # custkey
            st.integers(min_value=0, max_value=300),  # day offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_survival_curve_matches_counting_model(spark, rows, tmp_path_factory):
    """S(g) equals the counted fraction of inter-order gaps strictly greater
    than g, with gaps taken per customer in (date, orderkey) order."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rtcdb_spark.queries.rerank_analytics import orders_survival_curve

    d = tmp_path_factory.mktemp("surv")
    base = dt.date(1995, 1, 1)
    tbl = pa.table(
        {
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderdate": pa.array(
                [base + dt.timedelta(days=r[1]) for r in rows], pa.date32()
            ),
            "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "orders.parquet"))

    gaps = []
    for ck in {r[0] for r in rows}:
        seq = sorted((r[1], i) for i, r in enumerate(rows) if r[0] == ck)
        gaps += [b[0] - a[0] for a, b in zip(seq, seq[1:])]
    if not gaps:
        assert orders_survival_curve(spark, str(d)).count() == 0
        return
    n = len(gaps)
    expect = {}
    for g in sorted(set(gaps)):
        at = gaps.count(g)
        cum = sum(1 for x in gaps if x <= g)
        expect[g] = (at, cum, (n - cum) / n)

    got = {
        r["gap_days"]: (r["n_at_gap"], r["n_cum"], r["survival"])
        for r in orders_survival_curve(spark, str(d)).collect()
    }
    assert got == expect


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_mmr_matches_greedy_model(spark, seed, tmp_path_factory):
    """MMR re-ranking equals a pure-Python greedy model that replicates the
    sequential-fold dot product bit-for-bit: pool = top-POOL by relevance,
    then K picks maximizing lam*rel - (1-lam)*max_sim_to_selected with
    vec_id tie-breaks."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rtcdb_spark.queries.rerank_analytics import (
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_POOL,
        _MMR_QUERY_IDS,
        similarity_mmr_rerank,
    )

    n, dim = 220, 4
    rng = np.random.RandomState(seed)
    vecs = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)

    d = tmp_path_factory.mktemp("mmr")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))

    def dot(a, b):  # sequential fold, same order as Spark's aggregate()
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    dv = [[float(x) for x in v] for v in vecs]
    norm = [math.sqrt(dot(v, v)) for v in dv]
    lam, oml = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 1)

    expect = []
    for qid in _MMR_QUERY_IDS:
        rel = {
            i: dot(dv[i], dv[qid]) / (norm[i] * norm[qid])
            for i in range(n)
            if i != qid
        }
        pool = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_POOL]
        sims = {
            (a, b): dot(dv[a], dv[b]) / (norm[a] * norm[b])
            for a in pool
            for b in pool
            if a != b
        }
        first = min(pool, key=lambda i: (-rel[i], i))
        sel = [first]
        expect.append((qid, first, 1, rel[first], lam * rel[first]))
        for pick in range(2, _MMR_K + 1):
            cand = [i for i in pool if i not in sel]
            score = {
                i: lam * rel[i] - oml * max(sims[(i, j)] for j in sel)
                for i in cand
            }
            nxt = min(cand, key=lambda i: (-score[i], i))
            sel.append(nxt)
            expect.append((qid, nxt, pick, rel[nxt], score[nxt]))

    got = [
        (r["qid"], r["vec_id"], r["pick"], r["rel"], r["mmr"])
        for r in similarity_mmr_rerank(spark, str(d)).collect()
    ]
    assert sorted(got) == sorted(expect)


@settings(**SETTINGS)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    n_parts=st.integers(min_value=1, max_value=8),
)
def test_skyline_2d_matches_brute_force(spark, pts, n_parts):
    """skyline_2d (distributed prefix-scan) ≡ the O(n²) domination model,
    for any partition count — including counts that leave partitions empty
    and force cross-partition stitching."""
    from rtcdb_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(pts, "price int, size int")
    got = sorted(
        (r.price, r.size)
        for r in skyline_2d(df, "price", "size", n_partitions=n_parts).collect()
    )
    want = sorted(
        p
        for p in pts
        if not any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )
    )
    assert got == want


def test_power_iteration_matches_numpy_model(spark):
    """The relational power iteration must reproduce an independent numpy
    emulation of the same 3 rounds (same init, same max-norm rescaling)
    essentially exactly — the model check that the exact-decimal matvecs
    implement real matrix algebra. (Convergence to the true eigenvector is
    NOT asserted: the fixture embeddings are near-isotropic — eigenvalue
    gap ratio ~1.02 — so no fixed round count converges on them; the
    operator's contract is the algorithm, whose convergence rate is
    data-dependent.)"""
    import numpy as np

    from rtcdb_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["embedding_power_iteration"].fn(spark, sf).collect()
    got = np.array([r.loading for r in sorted(out, key=lambda r: r.dim)])
    X = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
        ],
        dtype=np.float64,
    )
    G = X.T @ X
    v = np.full(64, 0.125)
    for _ in range(3):
        w = G @ v
        v = w / np.max(np.abs(w))
    want = v / np.linalg.norm(v)
    assert np.allclose(got, np.round(want, 9), atol=1e-8), (
        np.abs(got - np.round(want, 9)).max()
    )


def test_kcenter_coreset_matches_numpy_greedy(spark):
    """The relational farthest-point traversal must pick the same centers,
    in the same order, as an independent numpy implementation of Gonzalez's
    greedy (same seed, same cosine distance, same min-id tie-break)."""
    import numpy as np

    from rtcdb_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = sorted(
        REGISTRY["embedding_kcenter_coreset"].fn(spark, sf).collect(),
        key=lambda r: r.sel_order,
    )
    rows = sorted(
        spark.read.parquet(f"{sf}/embeddings.parquet").collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((X * X).sum(axis=1))
    chosen = [0]
    for _ in range(7):
        mask = ~np.isin(ids, chosen)
        C = X[np.isin(ids, chosen)]
        cn = norms[np.isin(ids, chosen)]
        cos = (X @ C.T) / (norms[:, None] * cn[None, :])
        dist = 1 - cos.max(axis=1)
        cand_ids, cand_d = ids[mask], dist[mask]
        best = np.lexsort((cand_ids, -cand_d))[0]
        chosen.append(int(cand_ids[best]))
    assert [r.vec_id for r in out] == chosen, ([r.vec_id for r in out], chosen)
    # the greedy radius sequence is non-increasing
    d = [r.dist_at_selection for r in out[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(d, d[1:])), d


@settings(**SETTINGS)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=25, unique=True,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=25, unique=True,
    ),
    tol=st.integers(min_value=1, max_value=200),
)
def test_asof_tolerance_matches_pandas_merge_asof(spark, lefts, rights, tol):
    """asof_join(tolerance_seconds=...) ≡ pandas merge_asof(tolerance=...) —
    the independent reference implementation of the same contract, for the
    backward AND nearest directions."""
    import pandas as pd

    from pyspark.sql import functions as F

    from rtcdb_spark.operators.relational import asof_join

    l = spark.createDataFrame(
        [(k, t * 1_000_000) for k, t in lefts], "k int, lt long"
    ).select("k", F.timestamp_micros(F.col("lt")).alias("lt"))
    r = spark.createDataFrame(
        [(k, t * 1_000_000, k * 10000 + t) for k, t in rights],
        "k int, rt long, payload long",
    ).select("k", F.timestamp_micros(F.col("rt")).alias("rt"), "payload")
    got = {
        (row.k, row.lt): row.right_payload
        for row in asof_join(
            l, r, on="k", left_time="lt", right_time="rt",
            right_cols=["payload"], direction="backward",
            tolerance_seconds=tol,
        ).collect()
    }
    lp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s")) for k, t in lefts], columns=["k", "lt"]
    ).sort_values(["lt", "k"]).reset_index(drop=True)
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s"), k * 10000 + t) for k, t in rights],
        columns=["k", "rt", "payload"],
    ).sort_values(["rt", "k"]).reset_index(drop=True)
    merged = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction="backward", tolerance=pd.Timedelta(seconds=tol),
    )
    for _, row in merged.iterrows():
        want = None if pd.isna(row["payload"]) else int(row["payload"])
        key = (int(row["k"]), row["lt"].to_pydatetime())
        assert got[key] == want, (key, got[key], want)
    # nearest direction with the same tolerance. pandas breaks exact-distance
    # ties toward backward, matching our documented tie rule, but only when
    # the timestamps differ; identical-distance cases with equal timestamps
    # are the t==rt exact match both resolve identically.
    got_n = {
        (row.k, row.lt): row.right_payload
        for row in asof_join(
            l, r, on="k", left_time="lt", right_time="rt",
            right_cols=["payload"], direction="nearest",
            tolerance_seconds=tol,
        ).collect()
    }
    merged_n = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction="nearest", tolerance=pd.Timedelta(seconds=tol),
    )
    for _, row in merged_n.iterrows():
        want = None if pd.isna(row["payload"]) else int(row["payload"])
        key = (int(row["k"]), row["lt"].to_pydatetime())
        assert got_n[key] == want, ("nearest", key, got_n[key], want)


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap-word aggregation must equal plain COUNT(DISTINCT) — the
    whole point of the exact-bitmap pattern."""
    from pyspark.sql import functions as F

    from rtcdb_spark.queries import REGISTRY
    from rtcdb_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: r.n_distinct_users
        for r in REGISTRY["agg_bitmap_distinct"].fn(spark, sf).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want, (got, want)


class TestVersionedMutationProperties:
    """Property tests for the copy-on-write mutations: whatever the key
    sets, merge/delete must equal the naive dataframe recompute."""

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        upd=st.lists(st.integers(0, 59), min_size=0, max_size=10, unique=True),
        ins=st.lists(st.integers(100, 140), min_size=0, max_size=5, unique=True),
    )
    def test_merge_upsert_equals_recompute(self, spark, tmp_path_factory, upd, ins):
        from pyspark.sql import functions as F

        from rtcdb_spark.sources.versioned import VersionedTable

        t = VersionedTable(spark, str(tmp_path_factory.mktemp("mu")))
        for lo in range(0, 60, 20):
            t.commit(spark.range(lo, lo + 20).selectExpr("id AS k", "id*2 AS v"))
        src_rows = [(k, k * 100) for k in upd] + [(k, k * 100) for k in ins]
        if not src_rows:
            return
        src = spark.createDataFrame(src_rows, "k long, v long")
        v = t.merge_upsert(src, ["k"])
        got = {r.k: r.v for r in t.read(v).collect()}
        want = {k: k * 2 for k in range(60)}
        want.update({k: k * 100 for k in upd})
        want.update({k: k * 100 for k in ins})
        assert got == want

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(lo=st.integers(0, 59), span=st.integers(0, 30))
    def test_delete_equals_filter(self, spark, tmp_path_factory, lo, span):
        from rtcdb_spark.sources.versioned import VersionedTable

        t = VersionedTable(spark, str(tmp_path_factory.mktemp("dl")))
        for b in range(0, 60, 20):
            t.commit(spark.range(b, b + 20).selectExpr("id AS k", "id*2 AS v"))
        hi = lo + span
        v = t.delete(f"k >= {lo} AND k < {hi}")
        got = sorted(r.k for r in t.read(v).collect())
        want = [k for k in range(60) if not (lo <= k < hi)]
        assert got == want


class TestBpeProperties:
    @settings(max_examples=6, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=8),
            min_size=1, max_size=30, unique=True,
        ),
        n_merges=st.integers(0, 20),
    )
    def test_apply_always_reconstructs_word(self, words, n_merges):
        """For ANY vocabulary and merge budget, applying the learned merges
        yields tokens that concatenate back to word + end marker, and
        training is deterministic."""
        from rtcdb_spark.functions.bpe import apply_merges, train_merges

        vocab = [(w, i + 1) for i, w in enumerate(words)]
        m1 = train_merges(vocab, n_merges)
        m2 = train_merges([(w, c) for w, c in vocab], n_merges)
        assert m1 == m2
        for w, _ in vocab:
            assert "".join(apply_merges(w, m1)) == w + "</w>"
        # unseen words still segment validly
        assert "".join(apply_merges("dcba", m1)) == "dcba</w>"


def test_connectivity_only_pairs_give_same_components(spark):
    """VERDICT r4 item 6: the star-link threshold switch for extreme
    duplicate multiplicity must preserve dedup GROUPING exactly — for
    both the MinHash-LSH and SimHash pair generators, connectivity_only
    mode yields the same connected components as the verified-clique
    default on seeded duplicate corpora, while emitting O(m) instead of
    O(m^2) pairs per multiplicity-m cluster."""
    from pyspark.sql import functions as F

    from rtcdb_spark.functions.dedup import (
        connected_components_star,
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash64,
        simhash_hamming_pairs,
    )

    # seeded corpus: 6 distinct base texts, multiplicities 1..40 (40 is
    # the degenerate-bucket regime relative to max_clique=8 below)
    bases = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long journey",
        "how vexingly quick daft zebras jump over the sleeping fence",
        "sphinx of black quartz judge my vow said the tired archivist",
        "a completely different document about distributed spark engines",
        "yet another unique text concerning columnar storage formats",
    ]
    mults = [1, 3, 5, 10, 25, 40]
    rows = []
    did = 0
    for text, m in zip(bases, mults):
        for _ in range(m):
            rows.append((did, text))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def components(pairs_df):
        cc = connected_components_star(pairs_df)
        groups = {}
        for r in cc.collect():
            groups.setdefault(r.group_id, set()).add(r[0])
        return {frozenset(v) for v in groups.values()}

    # MinHash-LSH path
    sigs = minhash_signatures(doc_shingles(docs))
    clique_pairs = lsh_candidate_pairs(sigs, max_clique=8)
    star_pairs = lsh_candidate_pairs(sigs, connectivity_only=True)
    assert components(star_pairs) == components(clique_pairs)
    # star mode emits O(m) pairs: for identical docs each band bucket is
    # one cluster -> at most (m-1) links per band vs m(m-1)/2 cliques
    n_star = star_pairs.count()
    n_clique_uncapped = lsh_candidate_pairs(sigs, max_clique=10**6).count()
    assert n_star < n_clique_uncapped
    assert n_star <= sum(m - 1 for m in mults) + len(mults) * 4  # per-band slack

    # SimHash path
    ssigs = simhash64(docs)
    s_clique = simhash_hamming_pairs(ssigs, max_clique=8)
    s_star = simhash_hamming_pairs(ssigs, connectivity_only=True)
    assert components(s_star) == components(s_clique)
    assert s_star.count() < simhash_hamming_pairs(ssigs, max_clique=10**6).count()


# -- predicate-routed reads: pruning must NEVER change results ------------

_pred_col = st.sampled_from(["k", "v"])
_pred_val = st.integers(min_value=-50, max_value=4200)


@st.composite
def _conjunction(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        col = draw(_pred_col)
        kind = draw(st.sampled_from(["=", ">=", "<=", ">", "<", "between"]))
        if kind == "between":
            a, b = draw(_pred_val), draw(_pred_val)
            parts.append(f"{col} BETWEEN {min(a, b)} AND {max(a, b)}")
        else:
            parts.append(f"{col} {kind} {draw(_pred_val)}")
    return " AND ".join(parts)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=_conjunction(), data=st.data())
def test_read_where_equals_full_scan_filter(spark, tmp_path_factory, pred, data):
    """SOUNDNESS of predicate-routed file skipping: for arbitrary
    conjunctions of range/equality/BETWEEN conjuncts over a multi-file
    bloom-indexed table, read_where must return exactly the rows a full
    scan + filter returns — pruning is a plan change, never a result
    change. (The one guarantee that makes data skipping deployable; a
    single false skip silently corrupts every downstream aggregate.)"""
    from pyspark.sql import functions as F

    from rtcdb_spark.sources.versioned import VersionedTable

    root = tempfile.mkdtemp(prefix="rtcdb_prop_route_")
    try:
        vt = VersionedTable(spark, root)
        # 4 files, interleaved k so stats overlap across files; v clustered
        df = spark.range(4000).select(
            F.col("id").alias("k"), (F.col("id") % 997).alias("v")
        )
        vt.commit(df.repartition(4, F.col("k") % 4), bloom_cols=["k"])
        want = sorted(
            (r["k"], r["v"]) for r in df.filter(F.expr(pred)).collect()
        )
        got = sorted(
            (r["k"], r["v"]) for r in vt.read_where(pred).collect()
        )
        assert got == want, pred
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(st.integers(0, 10**6), min_size=1, max_size=60),
       probe=st.integers(0, 10**6))
def test_bloom_never_false_negative(spark, keys, probe):
    """A bloom-indexed point plan must keep the file holding the probed
    key whenever the key was written (no false negatives, the soundness
    half of the bloom contract); read_point returns exactly the matching
    rows either way."""
    from rtcdb_spark.sources.versioned import VersionedTable

    root = tempfile.mkdtemp(prefix="rtcdb_prop_bloom_")
    try:
        vt = VersionedTable(spark, root)
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        vt.commit(df.coalesce(1), bloom_cols=["k"], bloom_bits=1024)
        got = sorted(r["k"] for r in vt.read_point("k", probe).collect())
        assert got == sorted(k for k in keys if k == probe)
        if probe in keys:
            keep, _ = vt.plan_files_point("k", probe)
            assert keep, "false negative: holder file was pruned"
    finally:
        shutil.rmtree(root, ignore_errors=True)
