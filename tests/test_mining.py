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


def test_attributed_communities_greedy_trap(spark):
    """The exact B&B must NOT fall for the greedy trap: seed 1's
    highest-degree compatible neighbor (2, attr x+y, degree 4) leads
    to a size-3 x-clique, while the maximum attributed clique through
    1 is the size-4 y-clique {1,3,4,5}.  A one-shot greedy extension
    keyed on degree picks 2 first and narrows to x."""
    from gminer_spark.graph.mining import attributed_communities

    y4 = [(i, j) for i in (1, 3, 4, 5) for j in (1, 3, 4, 5) if i < j]
    x3 = [(1, 2), (2, 6), (1, 6), (2, 7), (2, 8)]
    attrs = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (6, "x")]
        + [(v, "y") for v in (3, 4, 5)]
        + [(7, "z"), (8, "z")],
        "id long, attr string",
    )
    res = attributed_communities(edges_df(spark, y4 + x3), attrs, k=3)
    rows = {tuple(r["community"]) for r in res.collect()}
    assert (1, 3, 4, 5) in rows


def _bk_max_attr_clique(pairs, attr_rows, k):
    """Brute-force oracle: the GLOBAL max attributed-clique size =
    max over attribute values a of the max clique in G[{v: a in
    attrs(v)}] (any clique sharing >= 1 attribute is a clique of some
    attribute-induced subgraph)."""
    from collections import defaultdict

    attrs = defaultdict(set)
    for v, a in attr_rows:
        attrs[v].add(a)
    best = 0
    for a in {x for s in attrs.values() for x in s}:
        keep = {v for v in attrs if a in attrs[v]}
        sub = [(s, d) for s, d in pairs if s in keep and d in keep]
        if sub:
            size, _ = bron_kerbosch_max(sub)
            best = max(best, size)
    return best if best >= k else 0


@pytest.mark.parametrize("seed", [3, 17])
def test_attributed_communities_exact_vs_bruteforce(spark, seed):
    """Random attributed graphs: every engine community is a valid
    attribute-sharing clique, and the engine's max community size
    equals the brute-force global max attributed-clique size."""
    import random

    rng = random.Random(seed)
    pairs = random_graph(n=30, p=0.25, seed=seed, directed=False)
    verts = sorted({v for e in pairs for v in e})
    attr_rows = [
        (v, a) for v in verts for a in "pqr" if rng.random() < 0.55
    ]
    from gminer_spark.graph.mining import attributed_communities

    k = 3
    res = attributed_communities(
        edges_df(spark, pairs),
        spark.createDataFrame(attr_rows, "id long, attr string"),
        k=k,
    ).collect()
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    from collections import defaultdict

    attrs = defaultdict(set)
    for v, a in attr_rows:
        attrs[v].add(a)
    got_max = 0
    for r in res:
        c = list(r["community"])
        got_max = max(got_max, len(c))
        assert len(c) >= k
        # valid clique
        for i, a in enumerate(c):
            for b in c[i + 1 :]:
                assert (a, b) in es
        # genuinely shares >= 1 attribute, and shared_attr is one of them
        common = set.intersection(*(attrs[v] for v in c))
        assert common and r["shared_attr"] in common
    assert got_max == _bk_max_attr_clique(pairs, attr_rows, k)


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


# -- K4 counting -------------------------------------------------------------


def test_k4_counts_match_brute_force(spark):
    from itertools import combinations

    from tests.conftest import edges_df, random_graph

    from gminer_spark.graph.cliques4 import k4_counts, k4_total

    pairs = random_graph(n=30, p=0.25, seed=41, directed=False)
    eset = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    verts = sorted({x for p in eset for x in p})
    per = {}
    total = 0
    for quad in combinations(verts, 4):
        if all(tuple(sorted(e)) in eset for e in combinations(quad, 2)):
            total += 1
            for v in quad:
                per[v] = per.get(v, 0) + 1
    e = edges_df(spark, pairs)
    got = {r.id: r.k4 for r in k4_counts(e).collect()}
    assert got == per
    assert k4_total(e).first().n_k4 == total


def test_k4_k5_closed_form(spark):
    from tests.conftest import K5, edges_df

    from gminer_spark.graph.cliques4 import k4_counts, k4_total

    # K5 contains C(5,4) = 5 K4s; each vertex is in C(4,3) = 4 of them
    e = edges_df(spark, K5)
    assert k4_total(e).first().n_k4 == 5
    got = {r.id: r.k4 for r in k4_counts(e).collect()}
    assert got == {v: 4 for v in range(1, 6)}


def test_k4_base_support_cap(spark):
    from tests.conftest import K5, edges_df

    from gminer_spark.graph.cliques4 import k4_total

    # K5 lex-base multiplicities: (1,2)->3, (1,3)/(2,3)->2,
    # (1,4)/(2,4)/(3,4)->1.  Cap 1 leaves only singleton bases -> 0
    # quads; cap 2 re-admits the two pair-capable bases -> 2 quads.
    assert k4_total(edges_df(spark, K5), max_support=1).first().n_k4 == 0
    assert k4_total(edges_df(spark, K5), max_support=2).first().n_k4 == 2
