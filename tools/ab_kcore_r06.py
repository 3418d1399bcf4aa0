"""Same-session A/B probe: k_core peel rounds, eager-localCheckpoint
(old, 2 jobs/round) vs lazy plan_barrier + fused count (new, 1 job/round).

Alternates impls inside ONE session (the only trustworthy protocol on
this noisy box) and prints per-rep times + mins.  Not a deliverable
bench; evidence for OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def main() -> None:
    from pyspark.sql import functions as F

    from gminer_spark.graph import tables
    from gminer_spark.graph.kcore import _survivor_degrees, k_core
    from gminer_spark.session import get_spark

    spark = get_spark(
        app_name="ab_kcore_r06",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    edges = tables.copurchase_edges(spark, SF_DIR)
    k = 80

    def old_k_core(edges, k, max_iter=50):
        sym = (
            tables.symmetrize(edges)
            .repartition(tables.shuffle_partitions(spark), "src")
            .persist()
        )
        core = tables.vertices(sym).localCheckpoint()
        n = core.count()
        for _ in range(max_iter):
            deg = _survivor_degrees(sym, core, n)
            new_core = (
                deg.where(F.col("deg") >= k)
                .select(F.col("src").alias("id"))
                .localCheckpoint()
            )
            n_new = new_core.count()
            core = new_core
            if n_new == n:
                break
            n = n_new
            if n == 0:
                break
        sym.unpersist()
        return core

    # warm python workers at full parallelism
    tables.symmetrize(edges).groupBy("src").count().count()

    results = {"old": [], "new": []}
    for rep in range(3):
        for name, fn in (("old", old_k_core), ("new", k_core)):
            spark.sparkContext.setJobDescription(f"kcore_{name}_rep{rep}")
            t0 = time.time()
            out = fn(edges, k)
            cnt = out.count()
            results[name].append(round(time.time() - t0, 3))
            print(f"rep{rep} {name}: {results[name][-1]}s  ({cnt} survivors)", flush=True)
    print({k2: (min(v), v) for k2, v in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
