"""One scaling-bench run in a fresh JVM: a named job at a given core
count.  Prints one JSON line.  Warm-up runs the SAME job once at full
parallelism first (python workers, JIT, shuffle service), so the
measurement is steady-state.

Usage: python tools/scaling_run.py <job> <cores> <input_path> [iters]
jobs: pagerank | extract | tc | tc_kernel | sssp
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    job = sys.argv[1]
    cores = int(sys.argv[2])
    path = sys.argv[3]
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from gminer_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{job}_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )

    REPS = 3  # min-of-reps: steady-state under VM noise / GC jitter (spread
    # observed on this VM: identical pagerank runs span 11-19 s)

    if job == "pagerank":
        from gminer_spark.graph.pagerank import pagerank

        edges = spark.read.parquet(path)
        n_items = edges.count()
        pagerank(edges, num_iter=1)  # warm-up
        secs = []
        for _ in range(REPS):
            t0 = time.time()
            pagerank(edges, num_iter=iters)
            secs.append(time.time() - t0)
        sec = min(secs)
        throughput = n_items * iters / sec
        extra = {"supersteps_per_hour": round(iters / sec * 3600, 1),
                 "reps_sec": [round(s, 1) for s in secs]}
    elif job == "extract":
        from gminer_spark.web.edges import pages_to_edges

        pages = spark.read.parquet(path)
        n_items = pages_to_edges(pages).count()  # full-parallelism warm-up
        secs = []
        for _ in range(REPS):
            t0 = time.time()
            pages_to_edges(pages).count()
            secs.append(time.time() - t0)
        sec = min(secs)
        throughput = n_items / sec
        extra = {"reps_sec": [round(s, 1) for s in secs]}
    elif job == "tc":
        from gminer_spark.graph.triangles import triangle_count

        edges = spark.read.parquet(path).persist()
        n_items = edges.count()
        triangle_count(edges)  # warm-up
        secs = []
        n_tri = 0
        for _ in range(REPS):
            t0 = time.time()
            n_tri = triangle_count(edges)
            secs.append(time.time() - t0)
        sec = min(secs)
        throughput = n_items / sec
        extra = {"triangles": n_tri, "reps_sec": [round(s, 1) for s in secs]}
    elif job == "sssp":
        from pyspark.sql import functions as F

        from gminer_spark.graph.sssp import shortest_paths
        from gminer_spark.graph.tables import vertices

        edges = spark.read.parquet(path).persist()
        n_items = edges.count()
        srcs = vertices(edges).where(F.col("id") % 9973 == 0).localCheckpoint()
        shortest_paths(edges, srcs)  # warm-up
        secs = []
        reached = 0
        for _ in range(REPS):
            t0 = time.time()
            res = shortest_paths(edges, srcs)
            reached = res.state.count()
            secs.append(time.time() - t0)
        sec = min(secs)
        throughput = n_items / sec
        extra = {"reached": reached, "reps_sec": [round(s, 1) for s in secs]}
    elif job == "tc_kernel":
        from gminer_spark.graph.triangles import triangle_count_kernel

        edges = spark.read.parquet(path).persist()
        n_items = edges.count()
        triangle_count_kernel(edges)  # warm-up (python workers + JIT)
        secs = []
        n_tri = 0
        for _ in range(REPS):
            t0 = time.time()
            n_tri = triangle_count_kernel(edges)
            secs.append(time.time() - t0)
        sec = min(secs)
        throughput = n_items / sec
        extra = {"triangles": n_tri, "reps_sec": [round(s, 1) for s in secs]}
    else:
        raise SystemExit(f"unknown job {job}")

    spark.stop()
    print(
        json.dumps(
            {
                "job": job,
                "cores": cores,
                "n_items": n_items,
                "iters": iters,
                "sec": round(sec, 3),
                "items_per_sec": round(throughput, 1),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
