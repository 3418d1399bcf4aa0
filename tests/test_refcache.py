"""Hot-vertex pull cache (RefCache analog): pure routing — the split
pull must equal the plain join exactly, and the hub slice must enter
the plan as a broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

from gminer_spark.graph.refcache import (
    cached_pull,
    hot_vertex_ids,
    split_adjacency,
)


def _powerlaw_adj(spark, n=3000, m=4, seed=7):
    from gminer_spark.web.fixtures import powerlaw_edges

    e = spark.createDataFrame(powerlaw_edges(n, m=m, seed=seed), "src long, dst long")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return sym.groupBy(F.col("src").alias("id")).agg(
        F.collect_list("dst").alias("adj")
    )


def test_cached_pull_equals_plain_join(spark):
    adj = _powerlaw_adj(spark).persist()
    # frontier-ish requests: every edge endpoint request (degree-biased)
    requests = adj.select(
        F.lit(0).alias("task_id"), F.explode("adj").alias("id")
    ).distinct()
    hot, cold, hot_ids = split_adjacency(adj, hot_k=64)
    assert hot is not None and len(hot_ids) > 0
    got = cached_pull(requests, hot, cold, hot_ids)
    want = requests.join(adj, on="id")
    norm = lambda df: {
        (r["id"], tuple(sorted(r["adj"]))) for r in df.collect()
    }
    assert norm(got) == norm(want)
    adj.unpersist()


def test_hot_slice_is_broadcast_and_budget_capped(spark):
    adj = _powerlaw_adj(spark).persist()
    requests = adj.select(F.col("id"))
    hot, cold, hot_ids = split_adjacency(adj, hot_k=64)
    plan = (
        cached_pull(requests, hot, cold, hot_ids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan

    # the entry budget caps the cache like RefCache::init(maxsize)
    degs = {r["id"]: r["deg"] for r in adj.select("id", F.size("adj").alias("deg")).collect()}
    top_deg = max(degs.values())
    capped = hot_vertex_ids(adj, hot_k=64, entry_budget=top_deg)
    assert len(capped) >= 1
    assert sum(degs[v] for v in capped) <= max(top_deg, degs[capped[0]])

    # hot_k=0 disables the cache: plain join, no broadcast requirement
    none_hot, all_cold, ids0 = split_adjacency(adj, hot_k=0)
    assert none_hot is None and ids0 == []
    assert cached_pull(requests, none_hot, all_cold, ids0).count() == adj.count()
    adj.unpersist()


def test_minhash_task_order_preserves_rows(spark):
    """Task signing is pure routing: same rows, similar request sets
    get identical signatures (so they co-locate under range
    partitioning), disjoint sets get different ones."""
    from gminer_spark.graph.refcache import minhash_task_order

    tasks = spark.createDataFrame(
        [
            (1, [10, 11, 12, 13]),
            (2, [10, 11, 12, 13]),  # identical request set as task 1
            (3, [900, 901, 902]),
        ],
        "task_id long, req array<long>",
    )
    out = minhash_task_order(tasks, "req", num_hashes=4)
    rows = {r["task_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
