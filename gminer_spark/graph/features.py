"""k-hop neighborhood feature aggregation (GNN preprocessing).

Training-data op: SGC / GraphSAGE-style pipelines precompute
aggregated neighborhood features (A^k·X) so the trainer sees plain
rows — the graph analog of the text pipeline's quality/fingerprint
columns.  Each hop is the engine's standard one-shuffle superstep
(edges ⋈ state → groupBy, partial aggregation as the combiner);
integer features with sum/min/max aggregation stay exact across
engines, which is what makes the driver oracle a full value check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables

_AGGS = {"sum": F.sum, "min": F.min, "max": F.max}


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 2,
    agg: str = "sum",
    feature_col: str = "f",
) -> DataFrame:
    """(id, f) — ``feature_col`` aggregated over the k-hop
    neighborhood: ``f_k(v) = agg({f_{k-1}(u) : u ∈ N(v)})`` on the
    undirected view.  Vertices whose neighbors all lack a feature
    drop out of that hop (inner join semantics), mirroring message
    passing over present values."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    sym = tables.symmetrize(edges).repartition(n_shuffle, "dst").persist()
    sym.count()
    state = features.select(
        F.col("id").cast("long").alias("id"),
        F.col(feature_col).cast("long").alias("f"),
    )
    for _ in range(hops):
        state = (
            sym.join(state, sym.dst == state.id)
            .groupBy(F.col("src").alias("id"))
            .agg(_AGGS[agg]("f").cast("long").alias("f"))
            .localCheckpoint()
        )
    sym.unpersist()
    return state


def feature_propagation_oracle_sql(
    edges_cte: str, feature_expr: str, hops: int, agg: str = "SUM"
) -> str:
    """Unrolled hops; ``feature_expr`` is a SQL expression over
    ``verts(id)`` giving the hop-0 integer feature."""
    ctes = [
        f"{edges_cte.strip()}",
        """sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION SELECT dst AS src, src AS dst FROM edges)""",
        f"""f0 AS MATERIALIZED (
    SELECT id, CAST({feature_expr} AS BIGINT) AS f
    FROM (SELECT DISTINCT src AS id FROM sym))""",
    ]
    for k in range(1, hops + 1):
        ctes.append(
            f"""f{k} AS MATERIALIZED (
    SELECT s.src AS id, CAST({agg}(p.f) AS BIGINT) AS f
    FROM sym s JOIN f{k - 1} p ON s.dst = p.id
    GROUP BY s.src)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, f FROM f{hops}"


def feature_minmax_oracle_sql(
    edges_cte: str, feature_expr: str, hops: int
) -> str:
    """Joint MIN/MAX-pooling witness: one CTE chain carrying both
    aggregates per hop, joined on id at the end."""
    ctes = [
        f"{edges_cte.strip()}",
        """sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION SELECT dst AS src, src AS dst FROM edges)""",
        f"""mm0 AS MATERIALIZED (
    SELECT id, CAST({feature_expr} AS BIGINT) AS f_min,
           CAST({feature_expr} AS BIGINT) AS f_max
    FROM (SELECT DISTINCT src AS id FROM sym))""",
    ]
    for k in range(1, hops + 1):
        ctes.append(
            f"""mm{k} AS MATERIALIZED (
    SELECT s.src AS id,
           CAST(MIN(p.f_min) AS BIGINT) AS f_min,
           CAST(MAX(p.f_max) AS BIGINT) AS f_max
    FROM sym s JOIN mm{k - 1} p ON s.dst = p.id
    GROUP BY s.src)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, f_min, f_max FROM mm{hops}"
    )
