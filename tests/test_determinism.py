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


def test_round5_micro_ops_partitioning_invariant(spark, graph):
    """Katz / hitting-time / SALSA / temporal arrivals / linkpred AUC
    / community metrics under three physical partitionings — all
    exact-integer (or micro-rounded via exact sums), so equality is
    EXACT."""
    from pyspark.sql import functions as F

    from gminer_spark.graph import tables as gt
    from gminer_spark.graph.community_metrics import community_quality
    from gminer_spark.graph.hitting import hitting_time
    from gminer_spark.graph.katz import katz
    from gminer_spark.graph.linkpred import linkpred_auc
    from gminer_spark.graph.lpa import label_propagation
    from gminer_spark.graph.salsa import salsa
    from gminer_spark.graph.temporal import earliest_arrival

    def run(e):
        out = {}
        out["katz"] = {
            r["id"]: r["katz_micro"] for r in katz(e, horizon=4).collect()
        }
        tgt = gt.vertices(e).where(F.col("id") % 7 == 0)
        out["hit"] = {
            r["id"]: r["hit_micro"]
            for r in hitting_time(e, tgt, horizon=4).collect()
        }
        out["salsa"] = {
            r["id"]: (round(r["hub"], 9), round(r["auth"], 9))
            for r in salsa(e, num_iter=4).collect()
        }
        te = e.select("src", "dst", (F.col("src") * 7 % 50).alias("t"))
        srcs = gt.vertices(e).where(F.col("id") % 7 == 0)
        out["temporal"] = {
            r["id"]: r["arrival"]
            for r in earliest_arrival(te, srcs, num_iter=3).collect()
        }
        out["auc"] = linkpred_auc(e, test_mod=4).collect()[0].asDict()
        labels = label_propagation(e, num_iter=3).state
        out["cq"] = {
            r["label"]: (
                r["n_nodes"], r["volume"], r["internal2"],
                r["cut"], r["q_micro"], r["conductance_micro"],
            )
            for r in community_quality(gt.symmetrize(e), labels).collect()
        }
        return out

    a, b = (run(e) for e in _variants(graph)[:2])
    for k in a:
        assert a[k] == b[k], k


def test_round5_session2_ops_partitioning_invariant(spark, graph):
    """Densest peel / DAG layers / k-center / widest paths / Boruvka
    MSF / Louvain moves under different physical partitionings —
    exact-integer trajectories, so equality is EXACT."""
    from pyspark.sql import functions as F

    from gminer_spark.graph.dag import dag_layers
    from gminer_spark.graph.densest import densest_subgraph
    from gminer_spark.graph.kcenter import k_center
    from gminer_spark.graph.louvain import louvain_moves
    from gminer_spark.graph.msf import minimum_spanning_forest
    from gminer_spark.graph.sssp import widest_paths

    def run(e):
        out = {}
        out["densest"] = {
            r["id"]: (r["removal_round"], r["in_densest"])
            for r in densest_subgraph(e, thr_num=2).collect()
        }
        dag = e.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).where(F.col("src") != F.col("dst"))
        out["layers"] = {
            r["id"]: r["layer"] for r in dag_layers(dag).collect()
        }
        out["kcenter"] = {
            r["id"]: (r["center"], r["dist"])
            for r in k_center(e, k=3, max_depth=8).collect()
        }
        we = e.select("src", "dst", (F.col("src") % 5 + 1).alias("w"))
        srcs = e.select(F.col("src").alias("id")).distinct().where(
            F.col("id") % 7 == 0
        )
        out["widest"] = {
            r["id"]: r["bottleneck"]
            for r in widest_paths(we, srcs).collect()
        }
        out["msf"] = {
            (r["src"], r["dst"], r["w"])
            for r in minimum_spanning_forest(we).collect()
        }
        out["louvain"] = {
            r["id"]: r["community"]
            for r in louvain_moves(e, num_rounds=3).collect()
        }
        return out

    a, b = (run(e) for e in _variants(graph)[:2])
    for k in a:
        assert a[k] == b[k], k
