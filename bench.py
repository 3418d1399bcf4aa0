"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline (BASELINE.json metric): PageRank supersteps/hour and
edges/sec on the co-purchase edge table at $SPARK_GRAFT_SF_DIR
(default sf0.1: ~20k vertices / ~1.2M edges), plus triangle count,
CC, LPA, MinHash-LSH dedup and cosine top-k.

Scaling evidence (two-cluster-size criterion, sandbox proxy) lives in
tools/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import gc
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_ITERS = 10
# single-JVM local mode: ONE heap holds all 32 executor threads'
# working memory; 8g is undersized for the mining kernels at sf0.1
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def main() -> None:
    from pyspark.sql import functions as F

    from gminer_spark.checkpoint import CheckpointStore
    from gminer_spark.graph.cc import connected_components
    from gminer_spark.graph.lpa import label_propagation
    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.graph.tables import copurchase_edges
    from gminer_spark.graph.triangles import triangle_count
    from gminer_spark.session import get_spark
    from gminer_spark.sim.ann import cosine_topk
    from gminer_spark.textops.dedup import minhash_lsh_pairs

    from gminer_spark.web.edges import pages_to_edges
    from gminer_spark.web.fixtures import pages_df_distributed, powerlaw_edges

    spark = get_spark(
        app_name="gminer_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    queries: dict[str, float] = {}

    # extraction spine: deterministic 100k-page powerlaw web, rendered
    # distributed, then pages → links → edges (the north-star stage 1)
    pages_path = "/tmp/bench_pages_100k.parquet"
    if not os.path.exists(pages_path):
        topo = spark.createDataFrame(
            powerlaw_edges(100_000, m=5, seed=42), "src long, dst long"
        )
        pages_df_distributed(spark, topo, namespace="bench").write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    pages_to_edges(pages).count()  # warm python workers
    gc.collect()
    t0 = time.time()
    n_links = pages_to_edges(pages).count()
    queries["extract_100k_pages"] = round(time.time() - t0, 3)

    edges = copurchase_edges(spark, SF_DIR).persist()
    n_edges = edges.count()

    gc.collect()
    t0 = time.time()
    pagerank(edges, num_iter=PR_ITERS)
    queries["pagerank10"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    store = CheckpointStore(spark, tempfile.mkdtemp(prefix="bench_ck_"))
    pagerank(edges, num_iter=5, store=store)
    queries["pagerank5_ckpt"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    n_tri = triangle_count(edges)
    queries["triangles"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    connected_components(edges)
    queries["cc"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    label_propagation(edges, num_iter=3)
    queries["lpa3"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    minhash_lsh_pairs(docs, num_hashes=16, bands=4).count()
    queries["minhash_lsh"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cosine_topk(emb, list(range(10)), k=5).count()
    queries["ann_cosine"] = round(time.time() - t0, 3)

    # task-kernel path (mining): time the exact contract queries so
    # round-over-round regressions in the egonet builder / B&B kernels
    # are visible (VERDICT r1 #9)
    from gminer_spark.contract import build_queries

    cq = build_queries()
    mining = {}
    for name in ("max_clique", "communities", "pattern_match", "focusco"):
        gc.collect()
        t0 = time.time()
        cq[name](spark, SF_DIR).count()
        mining[name] = round(time.time() - t0, 3)

    # round-2 variants: PPR / weighted PR / h-index coreness /
    # incremental CC — timed separately, headline unchanged
    from gminer_spark.graph.cc import incremental_cc
    from gminer_spark.graph.kcore import coreness_hindex
    from gminer_spark.graph.tables import copurchase_weighted_edges

    variants = {}
    gc.collect()
    t0 = time.time()
    seeds = edges.select(F.col("src").alias("id")).distinct().where(
        F.col("id") % 97 == 0
    )
    pagerank(edges, num_iter=PR_ITERS, reset=seeds)
    variants["ppr10"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    pagerank(
        copurchase_weighted_edges(spark, SF_DIR),
        num_iter=PR_ITERS,
        weight_col="w",
    )
    variants["pagerank_weighted10"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    coreness_hindex(edges)
    variants["coreness_hindex"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    half_a = edges.where((F.col("src") + F.col("dst")) % 2 == 0)
    half_b = edges.where((F.col("src") + F.col("dst")) % 2 == 1)
    incremental_cc(connected_components(half_a).state, half_b).count()
    variants["cc_incremental"] = round(time.time() - t0, 3)

    from gminer_spark.graph.betweenness import betweenness_sampled
    from gminer_spark.graph.sssp import shortest_paths
    from gminer_spark.graph.tables import vertices as _verts
    from gminer_spark.graph.walks import random_walks

    gc.collect()
    t0 = time.time()
    seeds97 = _verts(edges).where(F.col("id") % 97 == 0)
    shortest_paths(edges, seeds97).state.count()
    variants["sssp_hops"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    random_walks(edges, walk_len=3, walks_per_vertex=1).count()
    variants["random_walks3"] = round(time.time() - t0, 3)

    gc.collect()
    t0 = time.time()
    # ~40 sources at sf0.1 — keeps the per-round bench snappy while
    # still exercising the simultaneous multi-source BFS path
    seeds499 = _verts(edges).where(F.col("id") % 499 == 0)
    betweenness_sampled(edges, seeds499, max_depth=8).count()
    variants["betweenness"] = round(time.time() - t0, 3)

    from gminer_spark.graph.mis import maximal_independent_set

    gc.collect()
    t0 = time.time()
    maximal_independent_set(edges).count()
    variants["mis"] = round(time.time() - t0, 3)

    from gminer_spark.graph.walks import random_walks_node2vec

    gc.collect()
    t0 = time.time()
    random_walks_node2vec(
        edges, walk_len=3, walks_per_vertex=1, ret_bias=4, in_bias=2
    ).count()
    variants["node2vec3"] = round(time.time() - t0, 3)

    # "value" stays the round-1 8-query headline total so rounds are
    # comparable; the task-kernel queries are timed separately
    total = round(sum(queries.values()), 3)
    pr_sec = queries["pagerank10"]
    queries.update(mining)
    queries.update(variants)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "mining_total": round(sum(mining.values()), 3),
        "variants_total": round(sum(variants.values()), 3),
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_edges": n_edges,
        "n_links_extracted": n_links,
        "n_triangles": n_tri,
        "pagerank_edges_per_sec": round(n_edges * PR_ITERS / pr_sec, 1),
        "pagerank_supersteps_per_hour": round(PR_ITERS / pr_sec * 3600, 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
