"""Integer-channel PageRank: parity with an independent Python replica
of the documented recurrence, ranking sanity on known graph shapes, and
degree_stats."""

import random

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.graph import RANK_SCALE, degree_stats, pagerank


def _py_pagerank(edges, n_iter=5, dm=850):
    """Independent replica of the docstring recurrence (integer DIV)."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {v: RANK_SCALE // n for v in nodes}
    for _ in range(n_iter):
        dang = sum(r[v] for v in nodes if v not in deg)
        base = ((1000 - dm) * RANK_SCALE) // (1000 * n)
        share = (dm * dang) // (1000 * n)
        nxt = {v: base + share for v in nodes}
        for u, v in edges:
            nxt[v] += (dm * r[u]) // (1000 * deg[u])
        r = nxt
    return r


@pytest.fixture(scope="module")
def rand_edges():
    rng = random.Random(17)
    return list({(rng.randrange(40), rng.randrange(40))
                 for _ in range(160)})


def test_pagerank_matches_python_replica(spark, rand_edges):
    df = spark.createDataFrame(rand_edges, "src long, dst long")
    for n_iter in (0, 1, 4):
        got = {r.node: r.rank_ppt for r in pagerank(
            df, n_iter=n_iter).collect()}
        want = _py_pagerank(rand_edges, n_iter=n_iter)
        assert got == want, n_iter


def test_pagerank_star_graph_ranking(spark):
    """Everyone links to node 0: it must out-rank every spoke; spokes
    tie exactly (determinism)."""
    edges = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {x.node: x.rank_ppt for x in pagerank(df, n_iter=6).collect()}
    assert r[0] > max(r[i] for i in range(1, 9))
    assert len({r[i] for i in range(1, 9)}) == 1


def test_pagerank_parallel_edges_and_validation(spark):
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (3, 2), (1, 4)], "src long, dst long")
    d = {r.node: r.rank_ppt for r in pagerank(dup, n_iter=3).collect()}
    kept = {r.node: r.rank_ppt for r in pagerank(
        dup, n_iter=3, dedupe_edges=False).collect()}
    # weighted variant pushes more of node 1's mass toward 2
    assert kept[2] > d[2]
    with pytest.raises(ValueError, match="damping_m"):
        pagerank(dup, damping_m=1500)


def test_degree_stats(spark, rand_edges):
    df = spark.createDataFrame(rand_edges, "src long, dst long")
    got = {r.node: (r.out_degree, r.in_degree)
           for r in degree_stats(df).collect()}
    outs, ins = {}, {}
    for u, v in rand_edges:
        outs[u] = outs.get(u, 0) + 1
        ins[v] = ins.get(v, 0) + 1
    for n in set(outs) | set(ins):
        assert got[n] == (outs.get(n, 0), ins.get(n, 0))


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _ref_hits(edges, n_iter, sc=1_000_000):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    hub = {x: sc // n for x in nodes}
    auth = {x: 0 for x in nodes}
    for _ in range(n_iter):
        ar = {x: 0 for x in nodes}
        for u, v in edges:
            ar[v] += hub[u]
        at = sum(ar.values())
        auth = {x: (ar[x] * sc) // at if at > 0 else 0 for x in nodes}
        hr = {x: 0 for x in nodes}
        for u, v in edges:
            hr[u] += auth[v]
        ht = sum(hr.values())
        hub = {x: (hr[x] * sc) // ht if ht > 0 else 0 for x in nodes}
    return hub, auth


def test_hits_matches_reference(spark, rand_edges):
    from soda_spark_spark.operators.graph import hits

    dedup = sorted(set(rand_edges))
    df = spark.createDataFrame(dedup, "src long, dst long")
    got = {r.node: (r.hub_ppm, r.auth_ppm) for r in hits(df, n_iter=3).collect()}
    hub, auth = _ref_hits(dedup, 3)
    assert got == {n: (hub[n], auth[n]) for n in hub}


def test_hits_hub_authority_separation(spark):
    from soda_spark_spark.operators.graph import hits

    # 1,2,3 -> {10, 11}; 4 -> 11: 11 out-authorities 10, 1-3 out-hub 4
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 11), (4, 11)],
        "src long, dst long",
    )
    got = {r.node: (r.hub_ppm, r.auth_ppm) for r in hits(edges, n_iter=3).collect()}
    assert got[11][1] > got[10][1] > 0
    assert got[1][0] == got[2][0] == got[3][0] > got[4][0] > 0
    # bipartite: sources hold no authority, sinks no hubness
    assert got[1][1] == 0 and got[10][0] == 0


def test_hits_modes_bit_identical(spark, tmp_path, rand_edges):
    from soda_spark_spark.operators.graph import hits

    df = spark.createDataFrame(rand_edges, "src long, dst long")
    lazy = sorted(map(tuple, hits(df, n_iter=3, cache_iterations=False).collect()))
    ckpt = sorted(map(tuple, hits(df, n_iter=3).collect()))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    reliable = sorted(
        map(tuple, hits(df, n_iter=3, checkpoint_dir=str(tmp_path / "ck")).collect())
    )
    assert lazy == ckpt == reliable


def test_hits_init_and_validation(spark):
    from soda_spark_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    init = {r.node: (r.hub_ppm, r.auth_ppm) for r in hits(edges, n_iter=0).collect()}
    assert init == {1: (333333, 0), 2: (333333, 0), 3: (333333, 0)}
    with pytest.raises(ValueError, match="n_iter"):
        hits(edges, n_iter=-1)


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _ref_lpa(edges, n_iter):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n in adj:
            cnt = {}
            for m in adj[n]:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            new[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return lab


def test_lpa_matches_reference(spark, rand_edges):
    from soda_spark_spark.operators.graph import label_propagation

    dedup = sorted(set(rand_edges))
    df = spark.createDataFrame(dedup, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation(df, n_iter=3).collect()}
    assert got == _ref_lpa(dedup, 3)


def test_lpa_separates_bridged_communities(spark):
    from soda_spark_spark.operators.graph import label_propagation

    # two triangles + one bridge: CC merges them, LPA's majority does not
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation(df, n_iter=4).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_lpa_modes_and_validation(spark, tmp_path, rand_edges):
    import pytest as _pytest

    from soda_spark_spark.operators.graph import label_propagation

    df = spark.createDataFrame(rand_edges, "src long, dst long")
    lazy = sorted(map(tuple, label_propagation(
        df, n_iter=3, cache_iterations=False).collect()))
    ckpt = sorted(map(tuple, label_propagation(df, n_iter=3).collect()))
    assert lazy == ckpt
    with _pytest.raises(ValueError, match="n_iter"):
        label_propagation(df, n_iter=-1)
