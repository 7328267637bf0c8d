"""Integer-exact PageRank (operators/graph.py): the Spark loop must equal
a literal Python simulation of the same integer recurrence, and the
determinism contract must hold under repartitioning.
"""

from __future__ import annotations

from parquet_merger_spark.operators.graph import SCALE, pagerank_int


def _simulate(edges, iterations=3, damping_pct=85):
    verts = sorted({v for e in edges for v in e})
    out = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    rank = {v: SCALE for v in verts}
    base = (100 - damping_pct) * SCALE // 100
    for _ in range(iterations):
        s = {v: 0 for v in verts}
        for u, v in set(edges):
            s[v] += rank[u] // out[u]
        rank = {v: base + (damping_pct * s[v]) // 100 for v in verts}
    return rank


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (2, 4),
]


def test_pagerank_matches_integer_simulation(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["vertex"]: r["rank_micro"] for r in pagerank_int(e, 3).collect()}
    assert got == _simulate(EDGES, 3)


def test_pagerank_partitioning_invariant(spark):
    """Integer sums are associative: any physical partitioning must give
    bit-identical ranks."""
    e1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
    e7 = spark.createDataFrame(EDGES, "src long, dst long").repartition(7)
    r1 = sorted(map(tuple, pagerank_int(e1, 3).collect()))
    r7 = sorted(map(tuple, pagerank_int(e7, 3).collect()))
    assert r1 == r7


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # vertex 9 has only in-edges elsewhere? make 9 a pure sink: 1->9
    edges = [(1, 9), (1, 2), (2, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"]: r["rank_micro"] for r in pagerank_int(e, 2).collect()}
    assert got == _simulate(edges, 2)
    # sink mass evaporates (simple variant): 9 never contributes, and its
    # own rank is base + damped share of 1's contributions only
    assert got[9] > 0
