"""spark-submit entry: PageRank over an edge parquet with checkpoints.

    spark-submit --py-files dist/gminer_spark.zip jobs/run_pagerank.py \
        --edges /data/edges.parquet --checkpoint /data/ck \
        [--pages /data/pages.parquet] [--tol 1e-6] [--max-iter 100] \
        [--output /data/ranks.parquet]

With --pages instead of --edges, the job runs the full spine
(extract → normalize → mint → PageRank).  Resumes automatically from
the checkpoint dir if a previous run was killed.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges")
    ap.add_argument("--pages")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--output")
    args = ap.parse_args()
    if not (args.edges or args.pages):
        ap.error("one of --edges / --pages is required")

    from gminer_spark.checkpoint import CheckpointStore
    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.session import get_spark

    spark = get_spark(app_name="gminer_pagerank")
    if args.pages:
        from gminer_spark.web.edges import pages_to_edges

        edges = pages_to_edges(spark.read.parquet(args.pages))
    else:
        edges = spark.read.parquet(args.edges)

    store = CheckpointStore(spark, args.checkpoint)
    res = pagerank(
        edges,
        damping=args.damping,
        tol=args.tol,
        max_iter=args.max_iter,
        store=store,
    )
    if args.output:
        res.state.write.mode("overwrite").parquet(args.output)
    print(
        json.dumps(
            {
                "converged": res.converged,
                "supersteps": res.last_superstep,
                "output": args.output,
                "checkpoint": args.checkpoint,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
