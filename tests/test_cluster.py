"""Connected-components / dup-cluster tests vs a pure-Python
union-find oracle (no SQL twin needed here; the catalog query q30 has
a DuckDB recursive-CTE oracle on top)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from beats_spark.training import cluster


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    roots: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        roots[r] = min(roots.get(r, r), x)
    return {x: roots[find(x)] for x in parent}


def _spark_components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = cluster.connected_components(df).collect()
    return {r["id"]: r["cluster_id"] for r in out}


def test_pair_and_chain(spark):
    edges = [(3, 5), (10, 11), (11, 12), (12, 13)]
    got = _spark_components(spark, edges)
    assert got == {3: 3, 5: 3, 10: 10, 11: 10, 12: 10, 13: 10}


def test_long_path_converges_logarithmically(spark):
    # a 64-node path is the worst diameter case for naive propagation
    edges = [(i, i + 1) for i in range(64)]
    got = _spark_components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(45)
                )
                if a != b
            }
        )
        assert _spark_components(spark, edges) == _uf_components(edges)


def test_duplicate_and_reversed_edges(spark):
    edges = [(5, 3), (3, 5), (5, 3), (7, 3)]
    got = _spark_components(spark, edges)
    assert got == {3: 3, 5: 3, 7: 3}


def test_dup_clusters_sizes(spark):
    edges = [(1, 2), (2, 3), (9, 8)]
    out = cluster.dup_clusters(
        spark.createDataFrame(edges, ["id_a", "id_b"])
    ).collect()
    got = {r["id"]: (r["cluster_id"], r["n_members"]) for r in out}
    assert got == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        8: (8, 2),
        9: (8, 2),
    }


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError):
        cluster.connected_components(df, max_rounds=0)


def test_triangle_counts_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3), plus a pendant
    # node 5 and an isolated node 6; edges arrive directed, with
    # duplicates and a self-loop to exercise canonicalization
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 5)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["node"])
    out = {r.node: r.n_tri for r in cluster.triangle_counts(e, nodes).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}
    spark.catalog.clearCache()


def test_triangle_counts_matches_bruteforce(spark):
    # deterministic pseudo-random graph vs an itertools brute force
    import itertools

    n = 40
    edges = [((i * 7 + 1) % n, (i * 13 + 5) % n) for i in range(n)]
    edges += [((i * 3 + 2) % n, (i * 11 + 7) % n) for i in range(n)]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    expect = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    e = spark.createDataFrame(edges, ["src", "dst"])
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    out = {r.node: r.n_tri for r in cluster.triangle_counts(e, nodes).collect()}
    assert out == expect
    spark.catalog.clearCache()
