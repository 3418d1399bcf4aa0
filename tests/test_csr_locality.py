"""Blocked PageRank over data-driven locality blocks: same fixpoint as
the hash-blocked and plain paths; the block source is a routing choice."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df, random_graph
from tests.test_partitioning import caveman


def test_blocked_pagerank_with_voronoi_blocks_matches_plain(spark):
    from gminer_spark.graph.csr import dense_block_map, pagerank_blocked
    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.graph.partitioning import voronoi_blocks

    pairs = caveman(n_cliques=6, size=6)
    edges = edges_df(spark, pairs)
    want = {r["id"]: r["rank"] for r in pagerank(edges, num_iter=8).state.collect()}

    bm = dense_block_map(voronoi_blocks(edges, max_vc_size=10, stop_ratio=1.0))
    got = {
        r["id"]: r["rank"]
        for r in pagerank_blocked(edges, num_iter=8, block_map=bm).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_dense_block_map_is_dense_and_deterministic(spark):
    from gminer_spark.graph.csr import dense_block_map

    bm = spark.createDataFrame(
        [(1, 2**40 + 7), (2, 5), (3, 2**40 + 7), (4, 9)], "id long, block long"
    )
    rows = {r["id"]: r["block"] for r in dense_block_map(bm).collect()}
    assert sorted(set(rows.values())) == [0, 1, 2]
    assert rows[1] == rows[3]  # same label, same dense id


def test_blocked_pagerank_random_graph_custom_map(spark):
    from gminer_spark.graph.csr import pagerank_blocked
    from gminer_spark.graph.pagerank import pagerank

    pairs = random_graph(n=80, p=0.05, seed=4)
    edges = edges_df(spark, pairs)
    # arbitrary (but total) 5-way split keyed oddly: id mod 5 via a map
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    bm = verts.select("id", F.pmod(F.col("id") * 7 + 3, F.lit(5)).cast("int").alias("block"))
    want = {r["id"]: r["rank"] for r in pagerank(edges, num_iter=6).state.collect()}
    got = {
        r["id"]: r["rank"]
        for r in pagerank_blocked(edges, num_iter=6, block_map=bm).collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
