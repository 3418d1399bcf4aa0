"""BDG-style partitioning: completeness, determinism, locality win."""

from __future__ import annotations

from tests.conftest import edges_df


def caveman(n_cliques=8, size=8):
    """Ring of cliques — strong community structure."""
    pairs = []
    for c in range(n_cliques):
        base = c * size
        pairs += [
            (base + i, base + j) for i in range(size) for j in range(size) if i < j
        ]
        pairs.append((base, ((c + 1) % n_cliques) * size))  # ring bridge
    return pairs


def test_partition_complete_and_balanced(spark):
    from gminer_spark.graph.partitioning import partition_graph

    edges = edges_df(spark, caveman())
    # stop_ratio=1.0: on this 64-vertex toy the reference default (0.9)
    # legitimately abandons sampling after round 1 (dissolved oversized
    # cells leave >90% uncolored) and hash-min yields ONE connected
    # block — balance needs the multi-round sampling path.
    asg = partition_graph(edges, n_workers=4, max_vc_size=20, stop_ratio=1.0)
    rows = asg.collect()
    assert len(rows) == 64  # every vertex assigned exactly once
    assert len({r["id"] for r in rows}) == 64
    per_w = {}
    for r in rows:
        per_w[r["wid"]] = per_w.get(r["wid"], 0) + 1
    # capacity bound: (1+0.1)*64/4 ≈ 17.6 → no worker above 24 in practice
    assert max(per_w.values()) <= 24


def test_bdg_beats_hash_on_community_graph(spark):
    from gminer_spark.graph.partitioning import (
        cross_edge_ratio,
        hash_partitioning,
        partition_graph,
    )

    edges = edges_df(spark, caveman())
    hash_ratio = cross_edge_ratio(edges, hash_partitioning(edges, 4))
    bdg_ratio = cross_edge_ratio(
        edges, partition_graph(edges, 4, max_vc_size=20, stop_ratio=1.0)
    )
    # hash scatters cliques (~75% cross); locality blocks keep them together
    assert bdg_ratio < hash_ratio
    assert bdg_ratio < 0.3


def test_partitioning_deterministic(spark):
    from gminer_spark.graph.partitioning import partition_graph

    edges = edges_df(spark, caveman())
    a = {r["id"]: r["wid"] for r in partition_graph(edges, 4, max_vc_size=20, stop_ratio=1.0).collect()}
    b = {
        r["id"]: r["wid"]
        for r in partition_graph(
            edges.repartition(7), 4, max_vc_size=20, stop_ratio=1.0
        ).collect()
    }
    assert a == b

def test_voronoi_stop_ratio_knob(spark):
    """stop_ratio parity (BGlobal.cpp:27-31): a stop_ratio of 0 stops
    Voronoi sampling after the first round (any nonzero leftover fails
    ratio > 0), so the remainder lands in the hash-min CC namespace
    (block >= 2^40); the permissive default keeps sampling and colors
    strictly more vertices in Voronoi cells."""
    from gminer_spark.graph.partitioning import voronoi_blocks

    edges = edges_df(spark, caveman())

    def cc_namespace_count(stop_ratio):
        rows = voronoi_blocks(
            edges,
            sample_rate=0.02,  # ~1 seed: round 1 leaves most uncolored
            max_hop=1,
            max_vc_size=20,
            stop_ratio=stop_ratio,
        ).collect()
        assert len(rows) == 64  # complete either way
        return sum(1 for r in rows if r["block"] >= 2**40)

    eager_stop = cc_namespace_count(0.0)
    keep_going = cc_namespace_count(1.0)
    assert eager_stop > keep_going


def test_block_pair_stats_collect_is_capped(spark):
    """Many tiny blocks: the driver-collected neighbor-stat table must
    stay O(blocks * top_nbrs), not O(blocks^2)."""
    from tests.conftest import edges_df

    from gminer_spark.graph import tables
    from gminer_spark.graph.partitioning import _block_pair_stats, assign_blocks

    # 40 singleton blocks over a complete-ish graph -> raw pair table
    # would be ~40*39 rows
    pairs = [(a, b) for a in range(40) for b in range(a + 1, 40)]
    edges = edges_df(spark, pairs)
    blocks = spark.createDataFrame(
        [(v, v % 40) for v in range(40)], "id long, block long"
    )
    sym = tables.symmetrize(edges)
    k = 5
    capped = _block_pair_stats(sym, blocks, top_nbrs=k).collect()
    # union of both directions: the GLOBAL collect stays O(blocks * k)
    # (a popular block may appear in many others' top-k, so per-block
    # fan-in is unbounded — the driver-OOM guard is the global total)
    assert len(capped) <= 2 * 40 * k
    kept = set()
    for r in capped:
        kept.add((r["b_src"], r["b_dst"]))
    # ADVICE r3: a kept pair must be visible from BOTH endpoints, so a
    # block placed later always sees its heaviest already-placed
    # neighbor in its own outgoing map
    assert all((b, a) in kept for (a, b) in kept)
    # the greedy still produces a full deterministic assignment
    asg = assign_blocks(edges, blocks, n_workers=4, top_nbrs=k)
    rows = {r["block"]: r["wid"] for r in asg.collect()}
    assert len(rows) == 40 and set(rows.values()) <= set(range(4))
