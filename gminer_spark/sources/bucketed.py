"""Bucketed edge storage — shuffle-free co-located joins.

The reference eliminates the join shuffle statically: its partitioner
writes each worker's vertices into that worker's file, and every
adjacency entry carries the owner id
(/root/reference/partition/BDGPartitioner.tpp:339-350).  The Spark
idiom for "the data is already where the join needs it" is bucketing:
``bucketBy(n, key)`` + ``saveAsTable`` persists the hash partitioning
in the table metadata, so any later equi-join/agg on the key skips
its Exchange entirely — across jobs and sessions, which a transient
``repartition`` cannot do.

At 100 TB this is the difference between re-shuffling the edge table
every superstep/query and shuffling it exactly once at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_edges(
    edges: DataFrame, table: str, n_buckets: int = 32, key: str = "src"
) -> None:
    (
        edges.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def join_is_shuffle_free(
    left: DataFrame, right: DataFrame, on_left: str, on_right: str
) -> bool:
    """True if a sort-merge equi-join needs no shuffle Exchange (i.e.
    bucketing satisfied the join's required distribution).  The merge
    hint stops the planner from broadcasting the small side — at real
    scale neither side broadcasts, which is exactly when bucketing
    pays."""
    joined = left.hint("merge").join(right, left[on_left] == right[on_right])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
