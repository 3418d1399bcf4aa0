"""k-truss vs an exact python support-peeling oracle."""

from __future__ import annotations

import pytest

from tests.conftest import K5, edges_df, random_graph


def truss_oracle(pairs, k):
    adj: dict[int, set[int]] = {}
    E = set()
    for s, d in pairs:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        E.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = {(a, b) for (a, b) in E if len(adj[a] & adj[b]) < k - 2}
        if not drop:
            return E
        E -= drop
        for a, b in drop:
            adj[a].discard(b)
            adj[b].discard(a)


def test_k_truss_k5_with_tail(spark):
    from gminer_spark.graph.ktruss import k_truss

    pairs = K5 + [(5, 100), (100, 101)]
    got = {(r["src"], r["dst"]) for r in k_truss(edges_df(spark, pairs), k=5).collect()}
    assert got == {(a, b) for a, b in K5}  # every K5 edge has support 3
    assert k_truss(edges_df(spark, pairs), k=6).count() == 0


@pytest.mark.parametrize("seed,k", [(3, 3), (3, 4), (11, 5)])
def test_k_truss_random_vs_oracle(spark, seed, k):
    from gminer_spark.graph.ktruss import k_truss

    pairs = random_graph(n=60, p=0.12, seed=seed, directed=False)
    want = truss_oracle(pairs, k)
    got = {(r["src"], r["dst"]) for r in k_truss(edges_df(spark, pairs), k=k).collect()}
    assert got == want


def test_k_truss_deterministic_and_guards(spark):
    from gminer_spark.graph.ktruss import k_truss

    pairs = random_graph(n=50, p=0.1, seed=5, directed=False)
    edges = edges_df(spark, pairs)
    a = {(r["src"], r["dst"]) for r in k_truss(edges.repartition(1), k=4).collect()}
    b = {(r["src"], r["dst"]) for r in k_truss(edges.repartition(32), k=4).collect()}
    assert a == b == truss_oracle(pairs, 4)
    with pytest.raises(ValueError):
        k_truss(edges, k=2)
