"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline (BASELINE.json metric): PageRank supersteps/hour and
edges/sec on the co-purchase edge table at $SPARK_GRAFT_SF_DIR
(default sf0.1: ~20k vertices / ~1.2M edges), plus triangle count,
CC, LPA, MinHash-LSH dedup and cosine top-k.

Noise protocol (VERDICT r3 #1): this VM's per-query wall-times swing
up to ~4x across identical runs (pattern_match observed 8.5-37.7 s).
Every query therefore runs SPARK_GRAFT_BENCH_REPS times (default 2)
and the reported number is the MIN; the full per-rep list is emitted
under "spread" so the driver/judge can see the noise envelope.

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
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
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
    spread: dict[str, list[float]] = {}
    side: dict[str, int] = {}

    # VERDICT r4 #8: the five heaviest queries' committed spreads span
    # ±2x on this VM — a third rep only on those makes round-over-round
    # deltas readable for ~2 min extra
    HEAVY = {"betweenness", "coreness_hindex", "communities", "pattern_match", "max_clique"}

    def timed(name: str, fn, bucket: dict[str, float]) -> None:
        n_reps = max(REPS, 3) if name in HEAVY else REPS
        reps = []
        for _ in range(n_reps):
            gc.collect()
            t0 = time.time()
            out = fn()
            reps.append(round(time.time() - t0, 3))
            if out is not None:
                side[name] = out
        bucket[name] = min(reps)
        spread[name] = reps

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
    pages_to_edges(pages).count()  # warm python workers at full parallelism
    timed("extract_100k_pages", lambda: pages_to_edges(pages).count(), queries)

    edges = copurchase_edges(spark, SF_DIR).persist()
    n_edges = edges.count()

    timed("pagerank10", lambda: pagerank(edges, num_iter=PR_ITERS) and None, queries)

    def _pr_ckpt():
        store = CheckpointStore(spark, tempfile.mkdtemp(prefix="bench_ck_"))
        pagerank(edges, num_iter=5, store=store)

    timed("pagerank5_ckpt", _pr_ckpt, queries)
    timed("triangles", lambda: triangle_count(edges), queries)
    timed("cc", lambda: connected_components(edges) and None, queries)
    timed("lpa3", lambda: label_propagation(edges, num_iter=3) and None, queries)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed(
        "minhash_lsh",
        lambda: minhash_lsh_pairs(docs, num_hashes=16, bands=4).count() and None,
        queries,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed(
        "ann_cosine",
        lambda: cosine_topk(emb, list(range(10)), k=5).count() and None,
        queries,
    )

    # task-kernel path (mining): time the exact contract queries so
    # round-over-round regressions in the egonet builder / B&B kernels
    # are visible (VERDICT r1 #9)
    from gminer_spark.contract import build_queries

    cq = build_queries()
    mining: dict[str, float] = {}
    for name in ("max_clique", "communities", "pattern_match", "focusco"):
        timed(name, lambda n=name: cq[n](spark, SF_DIR).count() and None, mining)

    # round-2+ variants: PPR / weighted PR / h-index coreness /
    # incremental CC / SSSP / walks / betweenness / MIS / node2vec —
    # timed separately, headline unchanged
    from gminer_spark.graph.cc import incremental_cc
    from gminer_spark.graph.kcore import coreness_hindex
    from gminer_spark.graph.tables import copurchase_weighted_edges

    variants: dict[str, float] = {}
    seeds = edges.select(F.col("src").alias("id")).distinct().where(
        F.col("id") % 97 == 0
    )
    timed(
        "ppr10",
        lambda: pagerank(edges, num_iter=PR_ITERS, reset=seeds) and None,
        variants,
    )

    wedges = copurchase_weighted_edges(spark, SF_DIR)
    timed(
        "pagerank_weighted10",
        lambda: pagerank(wedges, num_iter=PR_ITERS, weight_col="w") and None,
        variants,
    )
    timed("coreness_hindex", lambda: coreness_hindex(edges) and None, variants)

    def _cc_inc():
        half_a = edges.where((F.col("src") + F.col("dst")) % 2 == 0)
        half_b = edges.where((F.col("src") + F.col("dst")) % 2 == 1)
        incremental_cc(connected_components(half_a).state, half_b).count()

    timed("cc_incremental", _cc_inc, variants)

    from gminer_spark.graph.betweenness import betweenness_sampled
    from gminer_spark.graph.sssp import shortest_paths
    from gminer_spark.graph.tables import vertices as _verts
    from gminer_spark.graph.walks import random_walks

    seeds97 = _verts(edges).where(F.col("id") % 97 == 0)
    timed(
        "sssp_hops",
        lambda: shortest_paths(edges, seeds97).state.count() and None,
        variants,
    )
    timed(
        "random_walks3",
        lambda: random_walks(edges, walk_len=3, walks_per_vertex=1).count() and None,
        variants,
    )

    # ~40 sources at sf0.1 — keeps the per-round bench snappy while
    # still exercising the simultaneous multi-source BFS path
    seeds499 = _verts(edges).where(F.col("id") % 499 == 0)
    timed(
        "betweenness",
        lambda: betweenness_sampled(edges, seeds499, max_depth=8).count() and None,
        variants,
    )

    from gminer_spark.graph.mis import maximal_independent_set

    timed(
        "mis",
        lambda: maximal_independent_set(edges).count() and None,
        variants,
    )

    from gminer_spark.textops.retrieval import bm25_topk

    timed(
        "corpus_retrieval",
        lambda: bm25_topk(
            docs, ["spark", "vector", "stream", "join"], k=50
        ).count()
        and None,
        variants,
    )

    from gminer_spark.graph.walks import random_walks_node2vec

    timed(
        "node2vec3",
        lambda: random_walks_node2vec(
            edges, walk_len=3, walks_per_vertex=1, ret_bias=4, in_bias=2
        ).count()
        and None,
        variants,
    )

    # "value" stays the round-1 8-query headline total so rounds are
    # comparable; the task-kernel queries are timed separately
    total = round(sum(queries.values()), 3)
    pr_sec = queries["pagerank10"]
    n_tri = side.get("triangles", 0)
    queries.update(mining)
    queries.update(variants)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "spread": spread,
        "reps": REPS,
        "mining_total": round(sum(mining.values()), 3),
        "variants_total": round(sum(variants.values()), 3),
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_edges": n_edges,
        "n_links_extracted": side.get("extract_100k_pages", 0),
        "n_triangles": n_tri,
        "pagerank_edges_per_sec": round(n_edges * PR_ITERS / pr_sec, 1),
        "pagerank_supersteps_per_hour": round(PR_ITERS / pr_sec * 3600, 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
