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
    resource-allocation index — micro-rounded ints."""
    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    sym = tables.symmetrize(edges).repartition(n_shuffle, "src").persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    ).persist()
    e = edges.select("src", "dst").distinct()
    au = sym.select(F.col("src").alias("src"), F.col("dst").alias("w"))
    av = sym.select(F.col("src").alias("dst"), F.col("dst").alias("w"))
    common = (
        e.join(au, on="src")
        .join(av, on=["dst", "w"])
        .join(deg.withColumnRenamed("id", "w").withColumnRenamed("deg", "deg_w"), on="w")
        .groupBy("src", "dst")
        .agg(
            F.count("*").cast("long").alias("cn"),
            F.sum(F.lit(1.0) / F.col("deg_w")).alias("ra"),
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
