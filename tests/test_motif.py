"""Motif API: join-chain compilation vs hand-counted oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import K5, edges_df, random_graph


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
        find(edges, "(a)-(b); !(a)-(z)")  # negation on unbound var
    with pytest.raises(ValueError):
        find(edges, "nonsense")
