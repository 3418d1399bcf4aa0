"""spark-submit entry: basket-mining bundle over an order-lines table.

    spark-submit --py-files dist/gminer_spark.zip jobs/mine_baskets.py \
        --lines /data/lineitem.parquet --orders /data/orders.parquet \
        --output /data/baskets \
        [--min-support 2] [--min-confidence-micro 100000] [--top-k 5] \
        [--max-basket 10000]

Each output a parquet table under --output:

* ``itemsets/``         — A-Priori frequent pairs + triples
* ``rules/``            — association rules (confidence + lift, micro)
* ``recommendations/``  — top-k "customers also bought" per customer
* ``summary.json``      — scalar stats (one small driver-side file)

``--orders`` is optional: without it the recommendation stage is
skipped (no basket→customer mapping).  ``--max-basket`` drops
oversized baskets loudly (the only squaring quantity; crawler-
artifact protection at scale).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", required=True)
    ap.add_argument("--orders", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-support", type=int, default=2)
    ap.add_argument("--min-confidence-micro", type=int, default=100_000)
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--max-basket", type=int, default=10_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gminer_spark.itemsets import (
        association_rules,
        frequent_itemsets,
        recommend_items,
    )
    from gminer_spark.session import get_spark

    spark = get_spark(app_name="gminer_mine_baskets")
    li = spark.read.parquet(args.lines)
    baskets = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    ).persist()

    out = args.output.rstrip("/")
    fi = frequent_itemsets(
        baskets,
        min_support=args.min_support,
        max_k=3,
        max_basket=args.max_basket,
    ).persist()
    fi.write.mode("overwrite").parquet(f"{out}/itemsets")
    rules = association_rules(
        baskets,
        min_support=args.min_support,
        min_confidence_micro=args.min_confidence_micro,
        max_basket=args.max_basket,
    ).persist()
    rules.write.mode("overwrite").parquet(f"{out}/rules")

    n_recs = 0
    if args.orders:
        od = spark.read.parquet(args.orders)
        ui = li.join(od, li.l_orderkey == od.o_orderkey).select(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        recs = recommend_items(ui, rules, k=args.top_k)
        recs.write.mode("overwrite").parquet(f"{out}/recommendations")
        n_recs = recs.count()

    summary = {
        "n_baskets": baskets.select("basket").distinct().count(),
        "n_frequent_pairs": fi.where(F.col("k") == 2).count(),
        "n_frequent_triples": fi.where(F.col("k") == 3).count(),
        "n_rules": rules.count(),
        "n_recommendations": n_recs,
        "min_support": args.min_support,
    }
    spark.createDataFrame([summary]).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{out}/summary.json")
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
