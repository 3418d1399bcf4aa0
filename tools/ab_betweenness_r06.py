"""Same-session A/B probe: betweenness backward pass, per-level eager
checkpoints (old, ~1 job/level) vs pairwise lazy/eager (new, ~1 job per
2 levels).  Alternates impls in ONE session; checks value identity.
Evidence for OPTIMIZATION_r06.md; not a deliverable bench.
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
    from gminer_spark.graph.betweenness import _bfs_levels, betweenness_sampled
    from gminer_spark.session import get_spark

    spark = get_spark(
        app_name="ab_betweenness_r06",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    edges = tables.copurchase_edges(spark, SF_DIR)
    seeds = tables.vertices(tables.symmetrize(edges)).where(F.col("id") % 499 == 0)
    seeds = seeds.localCheckpoint()
    print("sources:", seeds.count(), flush=True)

    def old_bc(edges, sources, max_depth=8):
        spark = edges.sparkSession
        sym = (
            tables.symmetrize(edges)
            .repartition(tables.shuffle_partitions(spark), "src")
            .persist()
        )
        sym.count()
        levels = _bfs_levels(sym, sources, max_depth)
        delta = levels[-1].select("s", "v", F.lit(0.0).alias("delta"))
        acc = delta
        for d in range(len(levels) - 2, -1, -1):
            succ = delta
            w_sig = levels[d + 1].select(
                "s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w")
            )
            succ = succ.select("s", F.col("v").alias("w"), "delta").join(
                w_sig, on=["s", "w"]
            )
            contrib = (
                levels[d]
                .join(sym, levels[d].v == sym.src)
                .select("s", "v", "sigma", F.col("dst").alias("w"))
                .join(succ, on=["s", "w"])
                .select(
                    "s",
                    "v",
                    (
                        F.col("sigma")
                        / F.col("sigma_w")
                        * (F.lit(1.0) + F.col("delta"))
                    ).alias("part"),
                )
                .groupBy("s", "v")
                .agg(F.sum("part").alias("contrib"))
            )
            delta = (
                levels[d]
                .select("s", "v")
                .join(contrib, on=["s", "v"], how="left")
                .select(
                    "s", "v", F.coalesce("contrib", F.lit(0.0)).alias("delta")
                )
                .localCheckpoint()
            )
            acc = acc.unionByName(delta)
        result = (
            acc.where(F.col("s") != F.col("v"))
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("delta").alias("bc"))
        )
        sym.unpersist()
        return result

    # warm workers
    tables.symmetrize(edges).groupBy("src").count().count()

    sums = {}
    results = {"old": [], "new": []}
    for rep in range(3):
        for name, fn in (("old", old_bc), ("new", betweenness_sampled)):
            spark.sparkContext.setJobDescription(f"bc_{name}_rep{rep}")
            t0 = time.time()
            agg = (
                fn(edges, seeds, max_depth=8)
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.round("bc", 4)).alias("s"),
                )
                .first()
            )
            results[name].append(round(time.time() - t0, 3))
            sums[name] = (agg["n"], round(float(agg["s"]), 3))
            print(
                f"rep{rep} {name}: {results[name][-1]}s  n={agg['n']}",
                flush=True,
            )
    print({k: (min(v), v) for k, v in results.items()})
    print("values:", sums, "identical:", sums["old"] == sums["new"])
    spark.stop()


if __name__ == "__main__":
    main()
