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
