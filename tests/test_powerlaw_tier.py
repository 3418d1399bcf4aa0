"""FIXTURES.md §3 randomized tier: powerlaw graph parity at 10k vertices.

PageRank parity is checked at a FIXED superstep count (oracle runs the
identical recurrence) — equally strong as convergence parity without
paying ~100 supersteps for tol=1e-8 in the test suite.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import edges_df
from tests.oracle import graph_oracle as oracle


@pytest.fixture(scope="module")
def powerlaw(spark):
    from gminer_spark.web.fixtures import powerlaw_edges

    pairs = powerlaw_edges(10_000, m=5, seed=42)
    return pairs, edges_df(spark, pairs).persist()


def test_powerlaw_pagerank_parity(spark, powerlaw):
    from gminer_spark.graph.pagerank import pagerank

    pairs, edges = powerlaw
    res = pagerank(edges, num_iter=25)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = oracle.pagerank(pairs, num_iter=25)
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_powerlaw_cc_exact(spark, powerlaw):
    from gminer_spark.graph.cc import connected_components

    pairs, edges = powerlaw
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).state.collect()
    }
    assert got == oracle.cc(pairs)


def test_powerlaw_lpa_exact(spark, powerlaw):
    from gminer_spark.graph.lpa import label_propagation

    pairs, edges = powerlaw
    res = label_propagation(edges, num_iter=3)
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got == oracle.lpa_sync(pairs, num_iter=3)


def test_lpa_until_stable_mode(spark):
    """Odd cliques converge under sync LPA (bipartite shapes oscillate —
    that's why fixed-round is the default contract)."""
    from gminer_spark.graph.lpa import label_propagation

    k3 = [(1, 2), (1, 3), (2, 3)]
    k4 = [(i, j) for i in range(10, 14) for j in range(10, 14) if i < j]
    res = label_propagation(
        edges_df(spark, k3 + k4), until_stable=True, max_iter=30
    )
    assert res.converged
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert len(set(labels.values())) == 2


def test_powerlaw_triangles_exact(spark, powerlaw):
    from gminer_spark.graph.triangles import triangle_count

    pairs, edges = powerlaw
    assert triangle_count(edges) == oracle.triangles(pairs)


def test_powerlaw_sssp_exact(spark, powerlaw):
    from gminer_spark.graph.sssp import shortest_paths

    pairs, edges = powerlaw
    sources = [0, 17, 4096]
    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    got = {
        r["id"]: r["dist"]
        for r in shortest_paths(edges, src_df).state.collect()
    }
    assert got == oracle.sssp(pairs, sources)


def test_powerlaw_mis_exact(spark, powerlaw):
    from tests.test_graph_algos import _mis_greedy_oracle

    from gminer_spark.graph.mis import maximal_independent_set

    pairs, edges = powerlaw
    got = {r["id"] for r in maximal_independent_set(edges).collect()}
    assert got == _mis_greedy_oracle(pairs)


def test_powerlaw_walks_deterministic(spark, powerlaw):
    """Hub-heavy topology: walks must stay identical across
    partitioning — the md5 transition cannot depend on shuffle order."""
    from gminer_spark.graph.walks import random_walks

    _, edges = powerlaw
    starts = spark.createDataFrame([(i,) for i in range(0, 200)], "id long")
    a = sorted(
        map(tuple, random_walks(edges.repartition(2), walk_len=2, starts=starts).collect())
    )
    b = sorted(
        map(tuple, random_walks(edges.repartition(32), walk_len=2, starts=starts).collect())
    )
    assert a == b and len(a) > 0
