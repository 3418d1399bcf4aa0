"""Bucketed tables make the edges⋈state join shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import edges_df, random_graph


def test_bucketed_join_skips_exchange(spark):
    from gminer_spark.sources.bucketed import (
        join_is_shuffle_free,
        read_bucketed,
        save_bucketed_edges,
    )

    import shutil

    # clear any stale managed-table locations from a previous run
    for t in ("bkt_edges", "bkt_state"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    pairs = random_graph(n=100, p=0.05, seed=21)
    edges = edges_df(spark, pairs)
    state = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "rank", F.lit(1.0)
    )
    save_bucketed_edges(edges, "bkt_edges", n_buckets=4, key="src")
    save_bucketed_edges(state, "bkt_state", n_buckets=4, key="id")

    be = read_bucketed(spark, "bkt_edges")
    bs = read_bucketed(spark, "bkt_state")
    # co-bucketed equi-join: no Exchange anywhere in the plan
    assert join_is_shuffle_free(be, bs, "src", "id")

    # sanity: the same join on plain parquet-backed frames DOES shuffle
    assert not join_is_shuffle_free(edges, state, "src", "id")

    # results identical either way
    a = be.join(bs, be.src == bs.id).count()
    b = edges.join(state, edges.src == state.id).count()
    assert a == b

    spark.sql("DROP TABLE IF EXISTS bkt_edges")
    spark.sql("DROP TABLE IF EXISTS bkt_state")
