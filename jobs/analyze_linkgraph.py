"""spark-submit entry: one-pass link-graph structure report.

    spark-submit --driver-memory 6g \
        --py-files dist/gminer_spark.zip jobs/analyze_linkgraph.py \
        --edges /data/edges.parquet --output /data/linkstats \
        [--pr-iters 10] [--landmarks 8] [--hubs 20] [--sample-mod 1]

(--driver-memory: the stock 1g spark-submit default is too small for
any driver that persists several O(|V|) result tables at once.)

The web-structure bundle an operator runs on every fresh crawl's edge
table — each output a parquet table under --output:

* ``pagerank/``        — per-vertex PageRank (damping 0.85)
* ``components/``      — hash-min connected components
* ``scc/``             — full SCC decomposition (directed)
* ``coreness/``        — iterated-h-index coreness
* ``landmarks/``       — top-K hub landmark distance sketch
* ``knn_profile/``     — avg-neighbor-degree degree-correlation curve
* ``robustness/``      — hub-removal component histogram
* ``communities/``     — two-level Louvain labels (exact-int gains)
* ``community_map/``   — quotient graph over those labels
* ``summary.json``     — scalar stats (driver-side, one small file;
  includes the exact global modularity of the Louvain labeling)

``--sample-mod N`` applies the deterministic h32 edge sample (keep
edge iff h32('sub:'||src||':'||dst) % N == 0) before everything —
the standard way to get a cheap structural preview of a 100 TB edge
table before committing the full run.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--pr-iters", type=int, default=10)
    ap.add_argument("--landmarks", type=int, default=8)
    ap.add_argument("--hubs", type=int, default=20)
    ap.add_argument("--sample-mod", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gminer_spark.functions import h32
    from gminer_spark.graph.cc import connected_components
    from gminer_spark.graph.kcore import coreness_hindex
    from gminer_spark.graph.landmarks import landmark_sketch
    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.graph.scc import strongly_connected_components
    from gminer_spark.graph.community_metrics import global_modularity
    from gminer_spark.graph.louvain import louvain_two_level
    from gminer_spark.graph.quotient import quotient_graph
    from gminer_spark.graph.snapshot import hub_removal_robustness
    from gminer_spark.graph.tables import symmetrize
    from gminer_spark.graph.structure import avg_neighbor_degree
    from gminer_spark.session import get_spark

    spark = get_spark(app_name="gminer_analyze_linkgraph")
    edges = spark.read.parquet(args.edges).select("src", "dst")
    if args.sample_mod > 1:
        edges = edges.where(
            h32(
                F.concat_ws(
                    ":", F.lit("sub"), F.col("src"), F.col("dst")
                )
            )
            % args.sample_mod
            == 0
        )
    edges = edges.persist()
    n_edges = edges.count()

    out = args.output.rstrip("/")
    pr = pagerank(edges, num_iter=args.pr_iters).state
    pr.write.mode("overwrite").parquet(f"{out}/pagerank")
    cc = connected_components(edges).state
    cc.write.mode("overwrite").parquet(f"{out}/components")
    scc = strongly_connected_components(edges)
    scc.write.mode("overwrite").parquet(f"{out}/scc")
    core = coreness_hindex(edges)
    core.write.mode("overwrite").parquet(f"{out}/coreness")
    lm = landmark_sketch(edges, k=args.landmarks)
    lm.write.mode("overwrite").parquet(f"{out}/landmarks")
    knn = avg_neighbor_degree(edges)
    knn.write.mode("overwrite").parquet(f"{out}/knn_profile")
    rob = hub_removal_robustness(edges, k_hubs=args.hubs)
    rob.write.mode("overwrite").parquet(f"{out}/robustness")
    comm = louvain_two_level(edges).persist()
    comm.write.mode("overwrite").parquet(f"{out}/communities")
    quotient_graph(
        edges, comm.withColumnRenamed("community", "label")
    ).write.mode("overwrite").parquet(f"{out}/community_map")
    mod_row = global_modularity(
        symmetrize(edges), comm.withColumnRenamed("community", "label")
    ).first()

    summary = {
        "n_edges": n_edges,
        "n_vertices": cc.count(),
        "n_components": cc.select("component").distinct().count(),
        "n_scc": scc.select("scc_id").distinct().count(),
        # None when the edge sample is empty — schema inference needs an int
        "max_coreness": core.agg(F.max("coreness")).first()[0] or 0,
        "n_communities": int(mod_row["n_communities"]) if mod_row else 0,
        "modularity_micro": int(mod_row["modularity_micro"]) if mod_row else 0,
        "sample_mod": args.sample_mod,
    }
    spark.createDataFrame([summary]).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{out}/summary.json")
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
