"""Measure what locality blocks buy blocked PageRank's combiner.

The blocked scatter pre-aggregates contributions per (block, dst) —
the map-side combine.  Under pmod(hash) blocks a popular dst receives
one partial row from nearly EVERY block; under BDG locality blocks
most of a vertex's in-edges live in its own block, so the combine
collapses them to one row and the shuffle carries only true boundary
traffic.  This tool counts the combined partial rows (the shuffled
volume) and times a fixed-iteration run for both block sources on a
community-structured graph.

Prints one JSON line; the verdict lands in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIQUES = int(os.environ.get("LOC_BENCH_CLIQUES", "120"))
CLIQUE = int(os.environ.get("LOC_BENCH_SIZE", "40"))
ITERS = 5


def caveman(n_cliques: int, size: int):
    pairs = []
    for c in range(n_cliques):
        base = c * size
        pairs += [
            (base + i, base + j)
            for i in range(size)
            for j in range(size)
            if i < j
        ]
        pairs.append((base, ((c + 1) % n_cliques) * size))
    return pairs


def main() -> None:
    from pyspark.sql import functions as F

    from gminer_spark.graph.csr import (
        build_csr_blocks,
        dense_block_map,
        pagerank_blocked,
    )
    from gminer_spark.graph.partitioning import voronoi_blocks
    from gminer_spark.session import get_spark

    spark = get_spark(
        app_name="blocked_locality_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    pairs = caveman(N_CLIQUES, CLIQUE)
    edges = spark.createDataFrame(pairs, "src long, dst long").persist()
    n_edges = edges.count()
    n_blocks = N_CLIQUES  # one hash block per clique-sized slot

    loc_map = dense_block_map(
        voronoi_blocks(
            edges, sample_rate=0.02, max_vc_size=2 * CLIQUE, stop_ratio=1.0
        )
    ).persist()
    loc_map.count()

    def partial_rows(block_map):
        """Combined partial rows of ONE scatter (the per-superstep
        shuffle volume), via the same kernel pagerank_blocked uses."""
        import numpy as np
        import pandas as pd

        blocks = build_csr_blocks(edges, n_blocks=n_blocks, block_map=block_map)

        def scatter(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for _, row in pdf.iterrows():
                indices = np.asarray(row["indices"], dtype=np.int64)
                dsts = np.unique(indices)
                outs.append(pd.DataFrame({"dst": dsts}))
            return (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({"dst": []})
            )

        return (
            blocks.groupBy("block_id")
            .applyInPandas(scatter, "dst long")
            .count()
        )

    def timed_run(block_map):
        t0 = time.time()
        pagerank_blocked(edges, n_blocks=n_blocks, num_iter=ITERS, block_map=block_map)
        return round(time.time() - t0, 3)

    hash_rows = partial_rows(None)
    loc_rows = partial_rows(loc_map)
    hash_s = timed_run(None)
    loc_s = timed_run(loc_map)

    out = {
        "metric": "blocked_locality_shuffle_reduction",
        "value": round(hash_rows / max(1, loc_rows), 3),
        "unit": "x",
        "n_edges": n_edges,
        "n_blocks": n_blocks,
        "partial_rows_hash": hash_rows,
        "partial_rows_locality": loc_rows,
        "pagerank5_hash_sec": hash_s,
        "pagerank5_locality_sec": loc_s,
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
