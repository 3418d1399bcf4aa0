"""Motif API: join-chain compilation vs hand-counted oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import K5, PATH5, edges_df, random_graph


def test_motif_triangle_equals_triangle_count(spark):
    from gminer_spark.graph.motif import find
    from gminer_spark.graph.triangles import triangle_count

    pairs = random_graph(n=60, p=0.12, seed=9, directed=False)
    edges = edges_df(spark, pairs)
    tri = (
        find(edges, "(a)-(b); (b)-(c); (a)-(c)")
        .where((F.col("a") < F.col("b")) & (F.col("b") < F.col("c")))
        .count()
    )
    assert tri == triangle_count(edges)


def test_motif_open_wedge_negation(spark):
    from gminer_spark.graph.motif import find

    # path 1-2-3 (open) plus triangle 4-5-6 (closed)
    edges = edges_df(spark, [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)])
    rows = (
        find(edges, "(a)-(b); (b)-(c); !(a)-(c)")
        .where(F.col("a") < F.col("c"))
        .collect()
    )
    assert {(r["a"], r["b"], r["c"]) for r in rows} == {(1, 2, 3)}


def test_motif_directed_two_path(spark):
    from gminer_spark.graph.motif import find

    edges = edges_df(spark, [(1, 2), (2, 3), (3, 2)])
    rows = find(edges, "(x)->(y); (y)->(z)").collect()
    got = {(r["x"], r["y"], r["z"]) for r in rows}
    assert got == {(1, 2, 3), (2, 3, 2), (3, 2, 3)}


def test_motif_square_on_k5(spark):
    from gminer_spark.graph.motif import find

    squares = (
        find(edges_df(spark, K5), "(a)-(b); (b)-(c); (c)-(d); (d)-(a)")
        .where(
            (F.col("a") < F.col("b"))
            & (F.col("a") < F.col("c"))
            & (F.col("a") < F.col("d"))
            & (F.col("b") < F.col("d"))
            & (F.col("b") != F.col("c"))
        )
        .count()
    )
    # K5 has C(5,4) * 3 = 15 four-cycles
    assert squares == 15


def test_motif_rejects_bad_patterns(spark):
    from gminer_spark.graph.motif import find

    edges = edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        find(edges, "(a)-(a)")
    with pytest.raises(ValueError):
        find(edges, "(a)-(b); (c)-(d)")  # disconnected
    with pytest.raises(ValueError):
        find(edges, "(a)-(b); !(y)-(z)")  # negation with no bound var
    with pytest.raises(ValueError):
        find(edges, "(a)-[e]-(b); (b)-[e]-(c)")  # duplicate edge var
    with pytest.raises(ValueError):
        find(edges, "!(a)-[e]-(b)")  # edge var on a negated term
    with pytest.raises(ValueError):
        find(edges, "nonsense")


def test_motif_edge_variable_binds_attributes(spark):
    """(a)-[e]-(b) exposes the edge's extra columns as e_<col>, carried
    to both directions of the undirected view."""
    from gminer_spark.graph.motif import find

    edges = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 7.0)], "src long, dst long, w double"
    )
    res = find(edges, "(a)-[e1]-(b); (b)-[e2]-(c)").where("a < c")
    rows = {(r["a"], r["b"], r["c"]): (r["e1_w"], r["e2_w"]) for r in res.collect()}
    assert rows == {(1, 2, 3): (5.0, 7.0)}
    heavy = find(edges, "(a)-[e]-(b)").where("e_w >= 6.0 AND a < b")
    assert [(r["a"], r["b"]) for r in heavy.collect()] == [(2, 3)]


def test_motif_anti_vertex_directed_sink(spark):
    """!(b)->(c) with c unbound keeps only bindings where b has no
    out-edge (a sink in the directed view)."""
    from gminer_spark.graph.motif import find

    edges = edges_df(spark, [(1, 2), (2, 3), (1, 4)])  # sinks: 3, 4
    res = find(edges, "(a)->(b); !(b)->(c)")
    got = sorted((r["a"], r["b"]) for r in res.collect())
    assert got == [(1, 4), (2, 3)]


def test_motif_anti_vertex_source(spark):
    """!(c)->(b) with c unbound: b has no in-edge (a source)."""
    from gminer_spark.graph.motif import find

    edges = edges_df(spark, [(1, 2), (2, 3)])
    res = find(edges, "(b)->(a); !(c)->(b)")
    assert [r["b"] for r in res.collect()] == [1]


def test_motif_anti_vertex_isolated_direction_undirected(spark):
    """Undirected anti-vertex over a path: no vertex is edge-free, so
    the match set is empty."""
    from gminer_spark.graph.motif import find

    edges = edges_df(spark, PATH5)
    assert find(edges, "(a)-(b); !(b)-(c)").count() == 0


def test_motif_plans_stay_join_shaped(spark):
    """The compiler must emit hash/sort-merge joins — no cartesian
    product and no broadcast-nested-loop from any grammar feature."""
    from gminer_spark.graph.motif import find

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0)], "src long, dst long, w double"
    )
    for pattern in (
        "(a)-(b); (b)-(c); !(a)-(c)",
        "(a)-[e1]-(b); (b)-[e2]-(c)",
        "(a)->(b); !(b)->(c)",
    ):
        plan = find(edges, pattern)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, pattern
        assert "BroadcastNestedLoopJoin" not in plan, pattern


def test_motif_duplicate_attr_edges_do_not_multiply(spark):
    """Edge tables with duplicate (src, dst) rows differing only in
    attribute columns: terms WITHOUT an edge variable are purely
    topological and must count each binding once."""
    from gminer_spark.graph.motif import find

    edges = spark.createDataFrame(
        [(1, 2, "x"), (1, 2, "y"), (2, 3, "x"), (1, 3, "x")],
        "src long, dst long, label string",
    )
    tri = (
        find(edges, "(a)-(b); (b)-(c); (a)-(c)")
        .where((F.col("a") < F.col("b")) & (F.col("b") < F.col("c")))
        .count()
    )
    assert tri == 1
    # negated-term path deduped too: wedge (2)-(1)-(3) is CLOSED by
    # 2-3, so zero open wedges survive despite the duplicate 1-2 rows
    open_w = (
        find(edges, "(a)-(b); (a)-(c); !(b)-(c)")
        .where(F.col("b") < F.col("c"))
        .count()
    )
    assert open_w == 0
    # an edge variable still exposes every attribute row
    assert find(edges, "(a)-[e]->(b)").count() == 4
