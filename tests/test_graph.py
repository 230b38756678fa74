"""Connected components (operators.graph): min-label propagation must
match a Python union-find reference on chains, cliques, and random
graphs, converge within the diameter bound, and resolve transitive
near-dup clusters to their min-id keeper."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import graph


def py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.id: r.component
            for r in graph.connected_components(df).collect()}


def test_chain_resolves_to_min(spark):
    # 0-1-2-3-4 chain plus an isolated pair (10, 11)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    got = _run(spark, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_clique_and_reversed_edges(spark):
    edges = [(5, 3), (3, 9), (9, 5), (7, 2)]  # direction must not matter
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 2: 2, 7: 2}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    want = py_components(edges)
    assert got == want


def test_long_chain_converges_logarithmically(spark):
    """Pointer doubling: a 64-node chain (diameter 64) must converge in
    far fewer than 64 supersteps — max_iter=10 suffices for O(log n)."""
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component
           for r in graph.connected_components(df, max_iter=10).collect()}
    assert got == {i: 0 for i in range(65)}


def test_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(64)]  # needs ~log2(64)+1 rounds
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, max_iter=2)


def test_dup_clusters_keeper_is_component_min(spark):
    pairs = [(100, 7), (7, 55), (200, 201)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.id: r.keeper for r in graph.dup_clusters(df).collect()}
    assert got == {7: 7, 55: 7, 100: 7, 200: 200, 201: 200}


def test_dup_clusters_resolve_embedding_near_dups(spark):
    """graph.dup_clusters is pair-source-agnostic: the embedding
    near-dup leg feeds it exactly like the text leg. A planted chain
    of near-identical vectors (A~B, B~C but NOT A~C at the threshold)
    must still collapse to ONE keeper — the transitive contract."""
    from snowflake_azure_etl_spark.operators import similarity

    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (10, base),
        (11, [1.0, 0.14, 0.0, 0.0]),     # ~0.990 to 10
        (12, [1.0, 0.28, 0.0, 0.0]),     # ~0.990 to 11, ~0.963 to 10
        (99, [0.0, 0.0, 1.0, 0.0]),      # unrelated
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = similarity.embedding_near_dups(emb, "vec_id", "embedding",
                                           threshold=0.97, bits=2)
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got_pairs == {(10, 11), (11, 12)}    # chain, no (10,12)
    clusters = {r.id: r.keeper
                for r in graph.dup_clusters(pairs).collect()}
    assert clusters == {10: 10, 11: 10, 12: 10}
