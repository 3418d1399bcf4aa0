"""Measure the hot-vertex pull cache (RefCache analog) on a powerlaw
frontier pull — the skew shape it exists for.

Workload: 100k-vertex Barabasi-style web graph (m=5); one task per
vertex requesting its full neighborhood (task_id, id) — exactly the
degree-biased request distribution of a mining/FocusCO pull round
(hubs are requested by thousands of tasks).  Compare the plain
``requests ⋈ adjacency`` shuffle join against cached_pull (hub slice
broadcast, long tail shuffled), identical downstream aggregation.

Prints one JSON line; the verdict lands in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("REFCACHE_BENCH_N", "100000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = 2


def main() -> None:
    from pyspark.sql import functions as F

    from gminer_spark.graph.refcache import cached_pull, split_adjacency
    from gminer_spark.session import get_spark
    from gminer_spark.web.fixtures import powerlaw_edges

    spark = get_spark(
        app_name="refcache_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    e = spark.createDataFrame(powerlaw_edges(N, m=5, seed=42), "src long, dst long")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    adj = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.collect_list("dst").alias("adj"))
        .repartition(CPUS, "id")
        .persist()
    )
    adj.count()
    requests = sym.select(
        F.col("src").alias("task_id"), F.col("dst").alias("id")
    ).persist()
    n_req = requests.count()

    def agg(pulled):
        # the downstream shape of a pull round: per-task payload size
        return (
            pulled.groupBy("task_id")
            .agg(F.sum(F.size("adj")).alias("entries"))
            .agg(F.sum("entries"))
            .first()[0]
        )

    def timed(fn):
        best = float("inf")
        val = None
        for _ in range(REPS):
            t0 = time.time()
            val = fn()
            best = min(best, time.time() - t0)
        return round(best, 3), val

    plain_s, plain_val = timed(lambda: agg(requests.join(adj, on="id")))

    hot, cold, hot_ids = split_adjacency(adj, hot_k=1024)
    cached_s, cached_val = timed(
        lambda: agg(cached_pull(requests, hot, cold, hot_ids))
    )
    assert plain_val == cached_val, (plain_val, cached_val)

    out = {
        "metric": "refcache_pull_speedup",
        "value": round(plain_s / cached_s, 3) if cached_s else None,
        "unit": "x",
        "n_vertices": N,
        "n_requests": n_req,
        "n_hot": len(hot_ids),
        "plain_join_sec": plain_s,
        "cached_pull_sec": cached_s,
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
