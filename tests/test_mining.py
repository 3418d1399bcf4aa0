"""Mining kernels vs independent oracles (Bron–Kerbosch for cliques)."""

from __future__ import annotations

import pytest

from tests.conftest import K5, TWOCOMP, edges_df, random_graph


def bron_kerbosch_max(pairs):
    """Independent exact max-clique oracle (different algorithm family
    than the engine's Tomita B&B)."""
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    best: list[int] = []

    def bk(r, p, x):
        nonlocal best
        if not p and not x:
            if len(r) > len(best) or (
                len(r) == len(best) and sorted(r) < sorted(best)
            ):
                best = list(r)
            return
        pivot = max(p | x, key=lambda v: len(adj[v] & p), default=None)
        for v in list(p - (adj[pivot] if pivot is not None else set())):
            bk(r | {v}, p & adj[v], x & adj[v])
            p.remove(v)
            x.add(v)

    bk(set(), set(adj), set())
    return len(best), sorted(best)


def test_max_clique_k5(spark):
    from gminer_spark.graph.mining import max_clique

    size, members = max_clique(edges_df(spark, K5 + [(100, 101)]))
    assert size == 5
    assert members == [1, 2, 3, 4, 5]


def test_max_clique_twocomp(spark):
    from gminer_spark.graph.mining import max_clique

    size, members = max_clique(edges_df(spark, TWOCOMP))
    assert (size, members) == (3, [1, 2, 3])


@pytest.mark.parametrize("seed,p", [(42, 0.15), (7, 0.25), (11, 0.1)])
def test_max_clique_random(spark, seed, p):
    from gminer_spark.graph.mining import max_clique

    pairs = random_graph(n=40, p=p, seed=seed, directed=False)
    want_size, _ = bron_kerbosch_max(pairs)
    got_size, got_members = max_clique(edges_df(spark, pairs))
    assert got_size == want_size
    # verify it IS a clique
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    for i, a in enumerate(got_members):
        for b in got_members[i + 1 :]:
            assert (a, b) in es


def test_attributed_communities(spark):
    from gminer_spark.graph.mining import attributed_communities

    # K4 sharing attr "x" + K3 with mixed attrs + isolated edge
    k4 = [(i, j) for i in range(1, 5) for j in range(1, 5) if i < j]
    k3 = [(10, 11), (10, 12), (11, 12)]
    edges = edges_df(spark, k4 + k3 + [(20, 21)])
    attrs = spark.createDataFrame(
        [(i, "x") for i in range(1, 5)]
        + [(10, "y"), (11, "y"), (12, "z"), (20, "w"), (21, "w")],
        "id long, attr string",
    )
    res = attributed_communities(edges, attrs, k=3)
    rows = {tuple(r["community"]): r["shared_attr"] for r in res.collect()}
    assert (1, 2, 3, 4) in rows and rows[(1, 2, 3, 4)] == "x"
    # K3 has only {10,11} sharing 'y' — size 2 < k, excluded
    assert all(len(c) >= 3 for c in rows)


def test_seed_egonets_shuffle_path_above_gate(spark):
    """Above the broadcast gate the egonet builder must NOT broadcast
    the O(|E|) key/closer tables (driver OOM at web scale): with the
    gate forced to 0 the initial physical plan has no BroadcastExchange
    and kernel results are identical to the broadcast path."""
    from gminer_spark.graph.mining import _seed_egonets

    edges = edges_df(spark, random_graph(120, 0.08, seed=3))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled = _seed_egonets(edges, broadcast_limit=0)
        plan = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        broadcasted = _seed_egonets(edges, broadcast_limit=10**9)
        norm = lambda rows: {
            (
                r["u"],
                tuple(sorted(r["cands"] or [])),
                tuple(sorted(zip(r["eg_src"] or [], r["eg_dst"] or []))),
            )
            for r in rows
        }
        assert norm(shuffled.collect()) == norm(broadcasted.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
