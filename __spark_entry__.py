"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` / ``oracle_sql()`` — operator registry + DuckDB oracles;
implementations live in :mod:`gminer_spark.contract`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the sf0.001 co-purchase graph (micro units)."""
    from pyspark.sql import functions as F

    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.graph.tables import copurchase_edges

    edges = copurchase_edges(spark, SF_SMOKE)
    res = pagerank(edges, num_iter=10)
    return res.state.select(
        "id", F.round(F.col("rank") * 1e6, 0).cast("long").alias("rank_micro")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gminer_spark.contract import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from gminer_spark.contract import build_oracles

    return build_oracles()
