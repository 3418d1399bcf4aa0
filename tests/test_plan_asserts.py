"""Physical-plan asserts for the centrality family (VERDICT r2 #8).

The iterative BFS/Brandes/SSSP plans must stay equi-join shaped: no
cartesian products, no broadcast-nested-loop joins, and no O(|E|)
broadcast above the gate.  These are the 100-TB posture guarantees —
a plan regression here survives value checks (results stay right)
but melts at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import edges_df, random_graph


def _final_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_join_shaped(plan: str, label: str) -> None:
    assert "CartesianProduct" not in plan, label
    assert "BroadcastNestedLoopJoin" not in plan, label


def test_betweenness_plan_join_shaped(spark):
    from gminer_spark.graph import tables
    from gminer_spark.graph.betweenness import betweenness_sampled

    edges = edges_df(spark, random_graph(n=60, p=0.08, seed=31, directed=False))
    srcs = tables.vertices(edges).where(F.col("id") % 7 == 0)
    res = betweenness_sampled(edges, srcs, max_depth=4)
    _assert_join_shaped(_final_plan(res), "betweenness")


def test_harmonic_and_eccentricity_plans_join_shaped(spark):
    from gminer_spark.graph import tables
    from gminer_spark.graph.betweenness import (
        eccentricity_sampled,
        harmonic_sampled,
    )

    edges = edges_df(spark, random_graph(n=60, p=0.08, seed=32, directed=False))
    srcs = tables.vertices(edges).where(F.col("id") % 7 == 0)
    _assert_join_shaped(
        _final_plan(harmonic_sampled(edges, srcs, max_depth=4)), "harmonic"
    )
    _assert_join_shaped(
        _final_plan(eccentricity_sampled(edges, srcs, max_depth=4)),
        "eccentricity",
    )


def test_sssp_plan_join_shaped_and_no_ungated_broadcast(spark):
    """SSSP per-superstep joins: equi-join shaped, and with the
    broadcast threshold forced off the plan must contain NO
    BroadcastExchange (the shuffle fallback is the at-scale path)."""
    from gminer_spark.graph import tables
    from gminer_spark.graph.sssp import shortest_paths

    edges = edges_df(spark, random_graph(n=60, p=0.08, seed=33, directed=False))
    srcs = tables.vertices(edges).where(F.col("id") % 11 == 0)
    res = shortest_paths(edges, srcs).state
    _assert_join_shaped(_final_plan(res), "sssp")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res2 = shortest_paths(edges, srcs).state
        plan = _final_plan(res2)
        _assert_join_shaped(plan, "sssp-shuffle")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_node2vec_step_plan_join_shaped(spark):
    from gminer_spark.graph.walks import random_walks_node2vec

    edges = edges_df(spark, random_graph(n=50, p=0.1, seed=34, directed=False))
    res = random_walks_node2vec(edges, walk_len=2, ret_bias=3, in_bias=2)
    _assert_join_shaped(_final_plan(res), "node2vec")
