"""Locality-aware graph partitioning — the reference's BDG pipeline.

GMiner's partitioner (entry B, /root/reference/partition/partition.cpp)
builds locality blocks before hashing ever happens:

 1. Voronoi sampling: random seeds, colors flood ≤ max_hop supersteps;
    oversized cells reset and re-seed at rate×=factor
    (BPartitioner.tpp:361-424, 66-88)
 2. leftover uncolored vertices → hash-min CC blocks (:91-165)
 3. nb_info_exchange: neighbor → block map (BDGPartitioner.tpp:352-409)
 4. block_assign: greedy streaming bin-packing on the master,
    maximizing Σ co-location × (1 - fill/capacity), capacity=(1+ε)·avg
    (BDGPartitioner.tpp:5-235, KDD'13 "strategy 4")
 5. block_sync: ship vertices to their assigned worker (:186-216)

Spark re-expression: the floods are superstep joins (min-color
combiner = partial agg), block stats are one groupBy, and the greedy
assignment runs driver-side over the tiny aggregated block table —
exactly where the reference runs it (its master).  Hash partitioning
stays the v1 default (SURVEY.md §3.2); this pass is the optional
locality optimization, and its value is measured by
:func:`cross_edge_ratio`.

Determinism: seeds come from md5-derived per-vertex hashes, floods
adopt the MIN neighbor color — identical output at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gminer_spark.functions import h32
from gminer_spark.graph import tables


def voronoi_blocks(
    edges: DataFrame,
    sample_rate: float = 0.05,
    max_hop: int = 5,
    max_vc_size: int | None = None,
    factor: float = 2.0,
    max_rate: float = 0.5,
    stop_ratio: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """(id, block) — Voronoi cells + hash-min CC for the remainder.

    Colors flood from sampled seeds for ``max_hop`` supersteps; cells
    larger than ``max_vc_size`` are dissolved and the next round
    re-seeds the uncolored region at ``rate × factor`` (capped at
    ``max_rate``); sampling also gives up early when a round shrinks
    the uncolored set by too little —
    ``#{uncolored this round}/#{uncolored last round} > stop_ratio``
    (the reference's global_stop_ratio, default 0.9:
    partition/BGlobal.cpp:27-31, check at round entry
    BPartitioner.tpp:378-386).  Whatever remains uncolored becomes
    hash-min CC blocks (block id offset so the two namespaces cannot
    collide).
    """
    sym = tables.symmetrize(edges).persist()
    verts = tables.vertices(sym)
    n = verts.count()
    if max_vc_size is None:
        max_vc_size = max(16, n // 4)

    # colored: (id, block) — grows across rounds; uncolored: (id)
    colored = None
    uncolored = verts
    last_uncolored = n  # reference inits lastNum = |V| (BPartitioner.tpp:353)
    rate = sample_rate
    round_no = 0
    while rate <= max_rate:
        round_no += 1
        threshold = int(rate * 2**32)
        seeds = uncolored.where(
            h32(F.concat(F.lit(f"{seed}:{round_no}:"), F.col("id"))) < threshold
        ).select("id", F.col("id").alias("block"))
        state = uncolored.join(seeds, on="id", how="left")  # (id, block?)
        for _hop in range(max_hop):
            msgs = (
                sym.join(state.where(F.col("block").isNotNull()), sym.src == F.col("id"))
                .select(F.col("dst"), "block")
                .groupBy("dst")
                .agg(F.min("block").alias("nb_block"))
            )
            state = (
                state.join(msgs, state.id == msgs.dst, "left")
                .select(
                    "id",
                    F.coalesce("block", "nb_block").alias("block"),
                )
                .localCheckpoint()
            )
        # dissolve oversized cells (BPartitioner.tpp:66-88)
        sizes = state.where(F.col("block").isNotNull()).groupBy("block").agg(
            F.count("*").alias("sz")
        )
        ok = sizes.where(F.col("sz") <= max_vc_size).select("block")
        newly = state.join(ok, on="block").select("id", "block")
        colored = newly if colored is None else colored.unionByName(newly)
        colored = colored.localCheckpoint()
        uncolored = verts.join(colored.select("id"), on="id", how="left_anti")
        n_uncolored = uncolored.count()
        if n_uncolored == 0:
            break
        # insufficient shrinkage: hand the rest to hash-min now
        # (BPartitioner.tpp:378-386, ratio > global_stop_ratio)
        if n_uncolored / last_uncolored > stop_ratio:
            break
        last_uncolored = n_uncolored
        rate *= factor

    leftover = uncolored
    if not leftover.isEmpty():
        # hash-min CC on the leftover-induced subgraph (:91-165)
        from gminer_spark.graph.cc import connected_components

        sub = (
            sym.join(leftover.withColumnRenamed("id", "src"), on="src")
            .join(leftover.withColumnRenamed("id", "dst"), on="dst")
            .select("src", "dst")
        )
        if sub.isEmpty():
            cc_blocks = leftover.select(
                "id", (F.col("id") + F.lit(2**40)).alias("block")
            )
        else:
            cc_state = connected_components(sub).state
            cc_blocks = (
                leftover.join(cc_state, on="id", how="left")
                .select(
                    "id",
                    (F.coalesce("component", "id") + F.lit(2**40)).alias("block"),
                )
            )
        colored = (
            cc_blocks if colored is None else colored.unionByName(cc_blocks)
        )
    sym.unpersist()
    return colored


def _block_pair_stats(
    sym: DataFrame, blocks: DataFrame, top_nbrs: int
) -> DataFrame:
    """Inter-block adjacency counts, capped to pairs that rank in
    EITHER endpoint's ``top_nbrs`` heaviest neighbors (count desc,
    block id asc — deterministic).

    The cap bounds what the driver collects to O(blocks × top_nbrs)
    (≤2× with the union of directions): with many small Voronoi cells
    (max_vc_size ≪ |V|) the raw block-pair table grows quadratic-ish,
    and an ungated ``collect`` of it is the same driver-OOM shape the
    broadcast gate guards against elsewhere.  The union matters
    because the greedy scorer reads only the *placing* block's
    outgoing map: a one-sided cap could drop (B,A) while keeping
    (A,B), so a block placed later would not see its heaviest
    already-placed neighbor (ADVICE r3).  ``sym`` is symmetric, so
    the union is just "top rows ∪ their mirrors".
    """
    b_src = blocks.withColumnRenamed("id", "src").withColumnRenamed(
        "block", "b_src"
    )
    b_dst = blocks.withColumnRenamed("id", "dst").withColumnRenamed(
        "block", "b_dst"
    )
    pairs = (
        sym.join(b_src, on="src")
        .join(b_dst, on="dst")
        .where(F.col("b_src") != F.col("b_dst"))
        .groupBy("b_src", "b_dst")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("b_src").orderBy(F.desc("cnt"), F.asc("b_dst"))
    top = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(top_nbrs))
        .drop("rk")
    )
    # pairs is symmetric (cnt(A,B) == cnt(B,A)), so "in either
    # endpoint's top-k" = top ∪ mirror(top), deduped.
    mirror = top.select(
        F.col("b_dst").alias("b_src"),
        F.col("b_src").alias("b_dst"),
        "cnt",
    )
    return top.unionByName(mirror).distinct()


def assign_blocks(
    edges: DataFrame,
    blocks: DataFrame,
    n_workers: int,
    eps: float = 0.1,
    top_nbrs: int = 64,
) -> DataFrame:
    """(block, wid) — greedy streaming bin-packing (KDD'13 strategy 4).

    Block stats (size + inter-block adjacency counts) are one
    aggregation; the greedy loop runs on the driver over that tiny
    table, as the reference's master does (BDGPartitioner.tpp:139-235):
    blocks in non-increasing size order, each placed on the worker
    maximizing (edges to already-placed neighbor blocks) ×
    (1 - fill/capacity), capacity = (1+eps) · total/n_workers.
    The collected neighbor stats are capped to ``top_nbrs`` neighbor
    blocks per block (see :func:`_block_pair_stats`).
    """
    spark = edges.sparkSession
    sym = tables.symmetrize(edges)
    pair_counts = {
        (r["b_src"], r["b_dst"]): r["cnt"]
        for r in _block_pair_stats(sym, blocks, top_nbrs).collect()
    }
    sizes = {
        r["block"]: r["sz"]
        for r in blocks.groupBy("block").agg(F.count("*").alias("sz")).collect()
    }
    total = sum(sizes.values())
    capacity = (1.0 + eps) * total / n_workers

    nbrs: dict[int, dict[int, int]] = {}
    for (a, b), c in pair_counts.items():
        nbrs.setdefault(a, {})[b] = nbrs.setdefault(a, {}).get(b, 0) + c

    assignment: dict[int, int] = {}
    fill = [0.0] * n_workers
    # non-increasing size, deterministic tie-break on block id (:156-157)
    for blk in sorted(sizes, key=lambda b: (-sizes[b], b)):
        best_w, best_score = 0, float("-inf")
        for w in range(n_workers):
            if fill[w] + sizes[blk] > capacity and fill[w] > 0:
                continue
            co = sum(
                c
                for nb, c in nbrs.get(blk, {}).items()
                if assignment.get(nb) == w
            )
            score = co * (1.0 - fill[w] / capacity)
            if score > best_score or (
                score == best_score and fill[w] < fill[best_w]
            ):
                best_w, best_score = w, score
        assignment[blk] = best_w
        fill[best_w] += sizes[blk]

    return spark.createDataFrame(
        [(int(b), int(w)) for b, w in assignment.items()], "block long, wid int"
    )


def partition_graph(
    edges: DataFrame, n_workers: int, **voronoi_kwargs
) -> DataFrame:
    """Full BDG pass: (id, wid) vertex → worker assignment."""
    blocks = voronoi_blocks(edges, **voronoi_kwargs)
    asg = assign_blocks(edges, blocks, n_workers)
    return blocks.join(F.broadcast(asg), on="block").select("id", "wid")


def hash_partitioning(edges: DataFrame, n_workers: int) -> DataFrame:
    """The v1 default: ownership = pmod(id, n) (HashPartitioner path)."""
    return tables.vertices(edges).select(
        "id", F.pmod(F.col("id"), F.lit(n_workers)).cast("int").alias("wid")
    )


def cross_edge_ratio(edges: DataFrame, assignment: DataFrame) -> float:
    """Fraction of edges with endpoints on different workers — the
    partitioner's printed quality stat (BPartitioner.tpp:454-486)."""
    a_src = assignment.withColumnRenamed("id", "src").withColumnRenamed(
        "wid", "w_src"
    )
    a_dst = assignment.withColumnRenamed("id", "dst").withColumnRenamed(
        "wid", "w_dst"
    )
    joined = edges.join(a_src, on="src").join(a_dst, on="dst")
    row = joined.agg(
        F.count("*").alias("n"),
        F.sum((F.col("w_src") != F.col("w_dst")).cast("long")).alias("x"),
    ).first()
    return float(row["x"]) / max(1, row["n"])
