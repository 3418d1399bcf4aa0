"""Round-6 isolation bench — NOT the driver bench (bench.py is frozen).

Times individual operators with the noop sink (guide §1.4) and labeled
jobs (§1.5) so per-change deltas are attributable.  Usage:

    python bench_extra.py [name ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_REPS (default 2, min is reported).
Prints one JSON line {"queries": {...}, "sf": ..., "cpus": ...}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from gminer_spark.graph import tables as gt
    from gminer_spark.session import get_spark

    spark = get_spark(
        app_name="gminer_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    edges = gt.copurchase_edges(spark, SF_DIR).persist()
    edges.count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def t_coreness():
        from gminer_spark.graph.kcore import coreness_hindex

        noop(coreness_hindex(edges))

    def t_betweenness():
        from gminer_spark.graph.betweenness import betweenness_sampled

        seeds = gt.vertices(edges).where(F.col("id") % 499 == 0)
        noop(betweenness_sampled(edges, seeds, max_depth=8))

    def t_mis():
        from gminer_spark.graph.mis import maximal_independent_set

        noop(maximal_independent_set(edges))

    def t_pagerank10():
        from gminer_spark.graph.pagerank import pagerank

        noop(pagerank(edges, num_iter=10).state)

    def t_ppr10():
        from gminer_spark.graph.pagerank import pagerank

        seeds = edges.select(F.col("src").alias("id")).distinct().where(
            F.col("id") % 97 == 0
        )
        noop(pagerank(edges, num_iter=10, reset=seeds).state)

    def t_pagerank_weighted10():
        from gminer_spark.graph.pagerank import pagerank

        wedges = gt.copurchase_weighted_edges(spark, SF_DIR)
        noop(pagerank(wedges, num_iter=10, weight_col="w").state)

    def t_cc():
        from gminer_spark.graph.cc import connected_components

        noop(connected_components(edges).state)

    def t_lpa3():
        from gminer_spark.graph.lpa import label_propagation

        noop(label_propagation(edges, num_iter=3).state)

    def t_sssp_hops():
        from gminer_spark.graph.sssp import shortest_paths

        seeds = gt.vertices(edges).where(F.col("id") % 97 == 0)
        noop(shortest_paths(edges, seeds).state)

    def t_random_walks3():
        from gminer_spark.graph.walks import random_walks

        noop(random_walks(edges, walk_len=3, walks_per_vertex=1))

    def t_node2vec3():
        from gminer_spark.graph.walks import random_walks_node2vec

        noop(
            random_walks_node2vec(
                edges, walk_len=3, walks_per_vertex=1, ret_bias=4, in_bias=2
            )
        )

    def t_triangles():
        from gminer_spark.graph.triangles import triangle_count

        triangle_count(edges)

    def t_pattern_match():
        from gminer_spark.contract import build_queries

        noop(build_queries()["pattern_match"](spark, SF_DIR))

    def t_max_clique():
        from gminer_spark.contract import build_queries

        noop(build_queries()["max_clique"](spark, SF_DIR))

    def t_communities():
        from gminer_spark.contract import build_queries

        noop(build_queries()["communities"](spark, SF_DIR))

    def t_focusco():
        from gminer_spark.contract import build_queries

        noop(build_queries()["focusco"](spark, SF_DIR))

    def t_vocab_growth():
        from gminer_spark.textops.analysis import vocab_growth

        noop(vocab_growth(docs))

    def t_minhash_lsh():
        from gminer_spark.textops.dedup import minhash_lsh_pairs

        noop(minhash_lsh_pairs(docs, num_hashes=16, bands=4))

    def t_cc_incremental():
        from gminer_spark.graph.cc import connected_components, incremental_cc

        half_a = edges.where((F.col("src") + F.col("dst")) % 2 == 0)
        half_b = edges.where((F.col("src") + F.col("dst")) % 2 == 1)
        noop(incremental_cc(connected_components(half_a).state, half_b))

    targets = {
        "coreness_hindex": t_coreness,
        "betweenness": t_betweenness,
        "mis": t_mis,
        "pagerank10": t_pagerank10,
        "ppr10": t_ppr10,
        "pagerank_weighted10": t_pagerank_weighted10,
        "cc": t_cc,
        "lpa3": t_lpa3,
        "sssp_hops": t_sssp_hops,
        "random_walks3": t_random_walks3,
        "node2vec3": t_node2vec3,
        "triangles": t_triangles,
        "pattern_match": t_pattern_match,
        "max_clique": t_max_clique,
        "communities": t_communities,
        "focusco": t_focusco,
        "vocab_growth": t_vocab_growth,
        "minhash_lsh": t_minhash_lsh,
        "cc_incremental": t_cc_incremental,
    }
    names = sys.argv[1:] or list(targets)
    # warm python workers at full parallelism before timing (CLAUDE.md)
    edges.groupBy((F.col("src") % 1024).alias("b")).count().count()
    out: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        fn = targets[name]
        reps = []
        for _ in range(REPS):
            gc.collect()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = min(reps)
        spread[name] = reps
    print(json.dumps({"queries": out, "spread": spread, "sf": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
