"""Link-prediction features and local clustering coefficients.

Training-data ops for graph ML: per-edge neighborhood-overlap scores
(common neighbors, Jaccard, resource-allocation — Zhou, Lü & Zhang,
Eur. Phys. J. B 71, 2009) and the per-vertex local clustering
coefficient.  Resource allocation (Σ 1/deg(w) over common neighbors)
is used instead of Adamic-Adar because it avoids a transcendental —
ratios of integers survive micro-rounding bit-identically across
engines, while `ln` may differ in the last ulp between libm and the
JVM.

Plan shape: both features reduce to the TC wedge join — edge (u, v)
⋈ sym(u, w) ⋈ sym(v, w) — the same shuffle the triangle counter
does, with the closing-edge check replaced by aggregation over w.
Degree-ordered orientation (graph.triangles) is the skew fix when the
candidate set is the edge table itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def link_features(edges: DataFrame) -> DataFrame:
    """(src, dst, cn, jaccard_micro, ra_micro) for every canonical
    edge: common-neighbor count, Jaccard overlap of neighborhoods,
    resource-allocation index — micro-rounded ints.

    Common neighbors of edge (u, v) are exactly the triangles through
    that edge, so the enumeration rides the degree-ORIENTED wedge join
    (graph.triangles._wedge_closed): per-vertex fan-out is bounded
    ~√|E| instead of the hub-degree² blow-up a naive
    neighbors-of-u ⋈ neighbors-of-v join pays.  Each oriented triangle
    (u,v,w) then credits all three of its edges — cn += 1 and
    ra += 1/deg(third vertex) — one union + one aggregate.
    """
    from gminer_spark.graph.triangles import _wedge_closed

    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    sym = tables.symmetrize(edges).repartition(n_shuffle, "src").persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    ).persist()
    e = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # materialize the triangle list once — it is projected three times
    closed = _wedge_closed(e, "degree").localCheckpoint()
    tri_pairs = (
        closed.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("other"))
        .unionAll(closed.select(F.col("u").alias("a"), F.col("w").alias("b"), F.col("v").alias("other")))
        .unionAll(closed.select(F.col("v").alias("a"), F.col("w").alias("b"), F.col("u").alias("other")))
        .select(
            F.least("a", "b").alias("src"),
            F.greatest("a", "b").alias("dst"),
            "other",
        )
    )
    common = (
        tri_pairs.join(
            deg.withColumnRenamed("id", "other").withColumnRenamed("deg", "deg_o"),
            on="other",
        )
        .groupBy("src", "dst")
        .agg(
            F.count("*").cast("long").alias("cn"),
            F.sum(F.lit(1.0) / F.col("deg_o")).alias("ra"),
        )
    )
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_v"))
    out = (
        e.join(common, on=["src", "dst"], how="left")
        .join(du, on="src")
        .join(dv, on="dst")
        .select(
            "src",
            "dst",
            F.coalesce("cn", F.lit(0)).alias("cn"),
            F.round(
                F.coalesce("cn", F.lit(0))
                / (F.col("deg_u") + F.col("deg_v") - F.coalesce("cn", F.lit(0)))
                * 1e6,
                0,
            )
            .cast("long")
            .alias("jaccard_micro"),
            F.round(F.coalesce("ra", F.lit(0.0)) * 1e6, 0)
            .cast("long")
            .alias("ra_micro"),
        )
    )
    return out


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, lcc_micro) — local clustering coefficient
    2·T(v) / (deg(v)·(deg(v)−1)), zero for degree < 2."""
    from gminer_spark.graph.triangles import triangles_per_vertex

    spark = edges.sparkSession
    sym = tables.symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    tri = triangles_per_vertex(edges)
    return (
        deg.join(tri, on="id", how="left")
        .select(
            "id",
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1))
                    * 1e6,
                    0,
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("long")
            .alias("lcc_micro"),
        )
    )
