"""Hub-vertex salting — explicit skew handling for power-law graphs.

The reference handles load skew dynamically: oversized tasks are
declared non-movable (/root/reference/core/task.tpp:22-34) and the
master steals movable ones from the busiest worker
(/root/reference/core/master.tpp:140-177).  Spark's AQE skew-join
split covers the join side; for aggregations over hub keys (a
Common-Crawl host with millions of in-links) we salt explicitly:
two-stage aggregation through a composite ``(key, salt)`` key, per
BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    agg: str = "sum",
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Two-stage aggregation: groupBy(key, salt) → groupBy(key).

    ``agg`` ∈ {sum, min, max, count} — the algebraic aggregates whose
    two-stage split is exact (the same property GMiner's combiner
    relies on, /root/reference/util/combiner.hpp:8-13).  The salt is a
    deterministic spread of rows (pmod of a row hash), so hub keys'
    partial states are built on ``n_salts`` reducers before the final
    (tiny) merge.
    """
    out_col = out_col or f"{agg}_{value_col}"
    fns = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count}
    fn = fns[agg]
    # Salt = pure function of row CONTENT, never of physical position:
    # a position-derived salt (monotonically_increasing_id) changes when
    # a lost map output is recomputed on task retry, migrating rows
    # between (key, salt) groups mid-shuffle — double-counted or
    # dropped partials.  Content hashing is retry-stable; identical
    # rows landing on one reducer is a correct partial for every
    # algebraic agg here.
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(fn(value_col).alias("_partial"))
    final_fn = F.sum if agg in ("sum", "count") else fn
    return partial.groupBy(key).agg(final_fn("_partial").alias(out_col))


def split_hubs(
    edges: DataFrame, degree_threshold: int = 100_000, n_splits: int = 16
) -> DataFrame:
    """Replicate high-out-degree sources into ``(src, salt)`` shards.

    Returns edges with an extra ``src_salt`` column: 0 for normal
    vertices, pmod(dst, n_splits) for hubs — so a downstream
    ``repartition(src, src_salt)`` spreads a hub's adjacency across
    ``n_splits`` partitions instead of one.  Aggregate back by
    dropping the salt.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    return (
        edges.join(deg, on="src")
        .withColumn(
            "src_salt",
            F.when(
                F.col("out_deg") >= degree_threshold,
                F.pmod(F.col("dst"), F.lit(n_splits)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("out_deg")
    )


def hub_broadcast_threshold(col: Column, threshold: int) -> Column:
    """Predicate marking hub rows (degree >= threshold)."""
    return col >= threshold
