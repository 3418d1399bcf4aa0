"""Cross-parallelism determinism (FIXTURES.md §5 e2e requirement).

Same algorithm, same input, different physical partitioning → results
must match: labels/components exactly (deterministic tie-breaks),
PageRank to 1e-9 (float sum order tolerance far below the 1e-6 gate).
"""

from __future__ import annotations

import pytest

from tests.conftest import edges_df, random_graph


@pytest.fixture(scope="module")
def graph(spark):
    pairs = random_graph(n=150, p=0.03, seed=13)
    return edges_df(spark, pairs)


def _variants(edges):
    return [edges.repartition(2), edges.repartition(16, "src"), edges.coalesce(1)]


def test_lpa_partitioning_invariant(spark, graph):
    from gminer_spark.graph.lpa import label_propagation

    results = []
    for e in _variants(graph):
        res = label_propagation(e, num_iter=4)
        results.append({r["id"]: r["label"] for r in res.state.collect()})
    assert results[0] == results[1] == results[2]


def test_cc_partitioning_invariant(spark, graph):
    from gminer_spark.graph.cc import connected_components

    results = []
    for e in _variants(graph):
        res = connected_components(e)
        results.append({r["id"]: r["component"] for r in res.state.collect()})
    assert results[0] == results[1] == results[2]


def test_pagerank_partitioning_invariant(spark, graph):
    from gminer_spark.graph.pagerank import pagerank

    results = []
    for e in _variants(graph):
        res = pagerank(e, num_iter=8)
        results.append({r["id"]: r["rank"] for r in res.state.collect()})
    for v in results[0]:
        assert results[0][v] == pytest.approx(results[1][v], abs=1e-9)
        assert results[0][v] == pytest.approx(results[2][v], abs=1e-9)


def test_triangles_partitioning_invariant(spark, graph):
    from gminer_spark.graph.triangles import triangle_count

    counts = {triangle_count(e) for e in _variants(graph)}
    assert len(counts) == 1
