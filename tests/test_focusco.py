"""FocusCO parity: the task-parallel engine vs a literal, naive
transcription of /root/reference/apps/focusCO.cpp.

The oracle below recomputes get_phi from scratch for every tentative
expansion/contraction (exactly the C++ structure, focusCO.cpp:162-343);
the engine computes the same quantities incrementally and runs all
tasks batched through Spark rounds.  Integer edge weights keep every
float sum exact, so oracle and engine must agree bit-for-bit on every
branch decision.
"""

from __future__ import annotations

import pytest

from gminer_spark.graph.focusco import FocusCOParams, focused_clusters


# ---------------------------------------------------------------------------
# naive single-task oracle (literal focusCO.cpp transcription)
# ---------------------------------------------------------------------------


def _phi(subg, adj, use_weight):
    wcut = wvol = 0.0
    for u in subg:
        for nb, w in adj.get(u, ()):
            if w < 0:
                continue
            x = w if use_weight else 1.0
            if nb not in subg:
                wcut += x
            elif u < nb:
                wvol += x
    return wcut / wvol if wvol != 0 else -1.0


def _is_sim(a, b, r):
    if a == 0:
        return False
    return (b / a) <= (r + 1.0)


def _top_cands(subg, adj, limit):
    best = {}
    for u in subg:
        for nb, w in adj.get(u, ()):
            if nb not in subg and w > 0 and w > best.get(nb, float("-inf")):
                best[nb] = w
    ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))
    k = int(limit)
    return [c for c, _ in (ranked[:k] if len(ranked) > k else ranked)]


def focusco_oracle(adj, seed, p, trace=None):
    """Runs ONE task to completion; returns (cluster, outlier, phi) or
    None when the create_task gate rejects the seed."""
    core = {seed} | {nb for nb, w in adj.get(seed, ()) if w >= p.min_weight}
    if len(core) < p.min_core_size:
        return None
    subg = set(core)
    cand: list[int] = []
    outlier: set[int] = set()
    iter_round = 0
    init_phi = 0.0
    comp_round = 0
    while True:
        comp_round += 1
        assert comp_round < 1000, "runaway oracle"
        if comp_round == 1:
            cand = _top_cands(subg, adj, p.cand_max_time * len(subg))
            continue
        cur_w = _phi(subg, adj, True)
        if cur_w < 0:
            return [], set(), -1.0
        if comp_round == 2:
            init_phi = cur_w
        cur_s = _phi(subg, adj, False)
        bw_node = bs_node = -1
        bw_diff = bs_diff = 0.0
        for c in sorted(cand):  # naive: full recompute per tentative add
            trial = subg | {c}
            nw = _phi(trial, adj, True)
            ns = _phi(trial, adj, False)
            if nw < 0 or ns < 0:
                continue
            if nw - cur_w < bw_diff:
                bw_diff = nw - cur_w
                bw_node = c
            if ns - cur_s < bs_diff:
                bs_diff = ns - cur_s
                bs_node = c
        if _is_sim(cur_w + bw_diff, cur_w, p.diff_ratio):
            bw_node = bs_node = -1
        if bs_node != -1:
            outlier.add(bs_node)
        if bw_node != -1:
            subg.add(bw_node)
            if trace is not None:
                trace.append(("expand", bw_node, bs_node))
            cand = _top_cands(subg, adj, p.cand_max_time * len(subg))
            continue
        deleted = []
        cur = cur_w
        while True:  # naive contraction: full recompute per tentative removal
            removed = False
            for x in sorted(subg):
                trial = subg - {x}
                np_ = _phi(trial, adj, True)
                if np_ < 0:
                    continue
                if np_ - cur <= 0:
                    subg.discard(x)
                    deleted.append(x)
                    cur = np_
                    removed = True
            if not removed:
                break
        cur_w = cur
        if deleted:
            if trace is not None:
                trace.append(("contract", tuple(deleted)))
            cand = _top_cands(subg, adj, p.cand_max_time * len(subg))
            outlier -= subg
        if (not _is_sim(cur_w, init_phi, p.diff_ratio)) and iter_round < p.iter_round_max:
            init_phi = cur_w
            iter_round += 1
            continue
        if len(subg) >= p.min_result_size:
            return sorted(subg), outlier, cur_w
        return [], set(), cur_w


def _build_adj(wedges):
    best = {}
    for s, d, w in wedges:
        if s == d:
            continue
        for a, b in ((s, d), (d, s)):
            if w > best.get((a, b), float("-inf")):
                best[(a, b)] = w
    adj = {}
    for (a, b), w in best.items():
        adj.setdefault(a, []).append((b, w))
    return adj


def _oracle_all_seeds(wedges, p):
    """CountAgg over every seed: dedup by cluster, min outlier/phi."""
    adj = _build_adj(wedges)
    out = {}
    for seed in sorted(adj):
        r = focusco_oracle(adj, seed, p)
        if r is None or not r[0]:
            continue
        cluster, outlier, fphi = r
        key = tuple(cluster)
        val = (sorted(outlier), fphi)
        if key not in out or val < out[key]:
            out[key] = val
    return {
        (k, tuple(v[0]), round(v[1], 9)) for k, v in out.items()
    }


def _engine_rows(df):
    return {
        (tuple(r["cluster"]), tuple(r["outlier"]), round(r["phi"], 9))
        for r in df.collect()
    }


def _wdf(spark, wedges):
    return spark.createDataFrame(wedges, "src long, dst long, weight double")


# Fixture graph (deterministic, found by scanning small random graphs
# for a run that exercises expansion AND contraction AND outliers).
# Hand-verified trace for seed 8 with min_weight=4, min_core_size=3:
#   core = {8} ∪ {nb : w(8,nb) >= 4} = {3, 6, 8}
#   internal edges 3-8 (w4), 6-8 (w4) -> wVol = 8; boundary weight:
#   3:(1+1+1+6+3+2)=14, 6:(2+4+2+3+1)=12, 8:(1+2+1+1+2)=7 -> wCut = 33
#   phi = 33/8 = 4.125; expand admits 4 (also the struct-best ->
#   outlier), then 11 (struct-best 0 -> outlier), then contraction
#   evicts 6 and BSN\Cluster drops 4 -> cluster {3,4,8,11}, outlier {0},
#   phi = 8/7.
TRACE_EDGES = [
    (0, 1, 1.0), (0, 3, 1.0), (0, 4, 1.0), (0, 7, 6.0), (0, 8, 1.0),
    (0, 9, 5.0), (1, 2, 5.0), (1, 3, 1.0), (1, 6, 2.0), (1, 7, 3.0),
    (1, 9, 6.0), (1, 10, 5.0), (2, 3, 1.0), (2, 5, 2.0), (2, 6, 4.0),
    (2, 7, 6.0), (2, 9, 2.0), (2, 10, 4.0), (3, 4, 6.0), (3, 7, 3.0),
    (3, 8, 4.0), (3, 11, 2.0), (4, 8, 2.0), (5, 6, 2.0), (5, 7, 5.0),
    (5, 8, 1.0), (5, 10, 3.0), (6, 8, 4.0), (6, 9, 3.0), (6, 10, 1.0),
    (7, 8, 1.0), (8, 9, 2.0),
]
TRACE_PARAMS = FocusCOParams(min_weight=4.0, min_core_size=3)


def test_focusco_hand_trace_single_seed(spark):
    """Seed 8 of the fixture graph: expand x2 -> contract -> outlier."""
    trace = []
    cluster, outlier, fphi = focusco_oracle(
        _build_adj(TRACE_EDGES), 8, TRACE_PARAMS, trace=trace
    )
    assert trace == [("expand", 4, 4), ("expand", 11, 0), ("contract", (6,))]
    assert (cluster, sorted(outlier)) == ([3, 4, 8, 11], [0])
    assert fphi == pytest.approx(8 / 7)

    res = focused_clusters(_wdf(spark, TRACE_EDGES), TRACE_PARAMS, seeds=[8])
    rows = res.collect()
    assert len(rows) == 1
    assert list(rows[0]["cluster"]) == [3, 4, 8, 11]
    assert list(rows[0]["outlier"]) == [0]
    assert rows[0]["phi"] == pytest.approx(8 / 7)


def test_focusco_all_seeds_matches_oracle(spark):
    res = focused_clusters(_wdf(spark, TRACE_EDGES), TRACE_PARAMS)
    assert _engine_rows(res) == _oracle_all_seeds(TRACE_EDGES, TRACE_PARAMS)


@pytest.mark.parametrize("gseed,n,q", [(1, 18, 0.3), (9, 25, 0.2)])
def test_focusco_random_graphs_match_oracle(spark, gseed, n, q):
    """Random integer-weight graphs, every qualifying seed: the
    incremental distributed engine equals the naive oracle exactly."""
    import random

    rng = random.Random(gseed)
    wedges = [
        (i, j, float(rng.randint(1, 6)))
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < q
    ]
    p = FocusCOParams(min_weight=3.0, min_core_size=3, min_result_size=3)
    res = focused_clusters(_wdf(spark, wedges), p)
    assert _engine_rows(res) == _oracle_all_seeds(wedges, p)


def test_focusco_two_cliques_bridge(spark):
    """Weighted-conductance sanity: a task seeded in a heavy clique
    stays inside it across a light bridge."""
    a = [(i, j, 5.0) for i in range(1, 5) for j in range(1, 5) if i < j]
    b = [(i, j, 5.0) for i in range(10, 14) for j in range(10, 14) if i < j]
    bridge = [(4, 10, 1.0)]
    p = FocusCOParams(min_weight=5.0, min_core_size=4, min_result_size=3)
    res = focused_clusters(_wdf(spark, a + b + bridge), p, seeds=[1])
    rows = res.collect()
    assert len(rows) == 1
    assert list(rows[0]["cluster"]) == [1, 2, 3, 4]
    assert rows[0]["phi"] < 0.05  # 1.0 cut / 30 vol


def test_focusco_deterministic_under_partitioning(spark):
    p = FocusCOParams(min_weight=3.0, min_core_size=3)
    base = _wdf(spark, TRACE_EDGES)
    r1 = _engine_rows(focused_clusters(base.repartition(1), p))
    r32 = _engine_rows(focused_clusters(base.repartition(32), p))
    assert r1 == r32 and r1


def test_focusco_core_gate_rejects_small_seeds(spark):
    # every vertex has < 9 heavy neighbors: no task anywhere
    p = FocusCOParams(min_weight=1.0, min_core_size=10)
    res = focused_clusters(_wdf(spark, [(1, 2, 3.0), (2, 3, 3.0)]), p)
    assert res.count() == 0


@pytest.mark.parametrize("gseed", [4, 29])
def test_focusco_full_graph_path_equals_pull_loop(spark, gseed):
    """The gated full-graph broadcast fast path must be bit-identical
    to the generic batched pull loop (same kernel, same elision)."""
    import random

    rng = random.Random(gseed)
    n = 40
    wedges = [
        (a, b, float(rng.randint(1, 9)))
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < 0.15
    ]
    p = FocusCOParams(min_weight=5.0, min_core_size=3, min_result_size=2)
    fast = _engine_rows(
        focused_clusters(_wdf(spark, wedges), p, full_graph_entries=10**9)
    )
    pull = _engine_rows(
        focused_clusters(_wdf(spark, wedges), p, full_graph_entries=0)
    )
    # the straggler ball broadcast (tail_broadcast, on by default in
    # `pull` above) must be bit-identical to the plain pull loop
    no_ball = _engine_rows(
        focused_clusters(
            _wdf(spark, wedges), p, full_graph_entries=0, tail_broadcast=0
        )
    )
    # ... and to a gate that always FAILS the entries check (probe +
    # cooldown path: probes happen but every one falls back to pulls)
    tiny_gate = _engine_rows(
        focused_clusters(
            _wdf(spark, wedges),
            p,
            full_graph_entries=0,
            tail_entries=1,
        )
    )
    assert fast == pull == no_ball == tiny_gate and fast
