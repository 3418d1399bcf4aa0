"""spark-submit entry: end-to-end training-corpus build.

    spark-submit --py-files dist/gminer_spark.zip jobs/build_corpus.py \
        --documents /data/documents.parquet --output /data/shards \
        [--min-quality 0.5] [--chunk-tokens 512] [--overlap 32] \
        [--weights 96,2,2] [--benchmark /data/eval_docs.parquet] \
        [--max-contamination 0.05]

Runs :func:`gminer_spark.textops.corpus.build_training_corpus`
(quality filter → exact-dup canonicals → near-dup cluster canonicals
→ split tag → token chunks) and writes shard rows partitioned by
split.  With --benchmark, documents whose exact n-gram overlap with
the benchmark corpus exceeds --max-contamination are dropped FIRST
(the eval-contamination gate).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--chunk-tokens", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--weights", default="96,2,2")
    ap.add_argument("--benchmark")
    ap.add_argument("--max-contamination", type=float, default=0.05)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gminer_spark.session import get_spark
    from gminer_spark.textops.corpus import build_training_corpus, contamination

    spark = get_spark(app_name="gminer_build_corpus")
    docs = spark.read.parquet(args.documents)

    n_in = docs.count()
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        scores = contamination(docs, bench)
        clean = scores.where(
            F.col("contam_micro") <= int(args.max_contamination * 1e6)
        ).select("doc_id")
        docs = docs.join(clean, on="doc_id", how="left_semi")

    weights = tuple(int(w) for w in args.weights.split(","))
    shards = build_training_corpus(
        docs,
        min_quality=args.min_quality,
        chunk_tokens=args.chunk_tokens,
        overlap=args.overlap,
        weights=weights,  # type: ignore[arg-type]
    )
    shards.write.mode("overwrite").partitionBy("split").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = {
        "documents_in": n_in,
        "documents_kept": out.select("doc_id").distinct().count(),
        "chunks": out.count(),
        "by_split": {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
