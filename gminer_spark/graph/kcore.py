"""k-core / coreness by iterative degree peeling.

The reference has no standalone k-core app, but degree thresholds are
its seed gates (e.g. /root/reference/apps/trianglecount.cpp:139-140
skips adjlist.size() <= 1 seeds; community.cpp:375-387 gates tasks on
candidate counts) and degree sorting is its task order
(core/task_sorter.tpp).  k-core generalizes those filters into a
fixpoint: repeatedly drop vertices whose degree *within the survivor
set* is < k.  Standard link-graph analytics over the same edge table
(SURVEY.md §2.10 analog set).

Spark shape: the survivor set is a small (id) table; each peel round
is two survivor joins + one count aggregate — all shuffle-bounded on
the edge table's keys, lineage truncated per round.  Convergence is
detected by an unchanged survivor count; peeling is idempotent past
the fixpoint, so a run capped at N >= convergence rounds equals the
N-times-unrolled SQL oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def k_core(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """(id) — vertices of the k-core of the undirected graph."""
    sym = tables.symmetrize(edges).persist()
    core = tables.vertices(sym).localCheckpoint()
    n = core.count()
    for _ in range(max_iter):
        deg = (
            sym.join(core.withColumnRenamed("id", "src"), on="src")
            .join(core.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.count("*").alias("deg"))
        )
        new_core = (
            deg.where(F.col("deg") >= k)
            .select(F.col("src").alias("id"))
            .localCheckpoint()
        )
        n_new = new_core.count()
        core = new_core
        if n_new == n:
            break
        n = n_new
        if n == 0:
            break
    sym.unpersist()
    return core


def coreness(edges: DataFrame, max_k: int | None = None) -> DataFrame:
    """(id, coreness) — max k such that the vertex is in the k-core.

    Peels k = 1, 2, ... from the previous core (k-cores are nested, so
    each level starts from the prior survivor set); stops when the
    core empties or ``max_k`` is reached.  Cost is one k_core-style
    loop per level — fine for the moderate degeneracy of web-ish
    graphs; for huge k_max switch to h-index iteration.
    """
    spark = edges.sparkSession
    sym = tables.symmetrize(edges).persist()
    verts = tables.vertices(sym).localCheckpoint()
    result = verts.select("id", F.lit(0).alias("coreness"))
    core = verts
    k = 0
    while True:
        k += 1
        if max_k is not None and k > max_k:
            break
        # peel the (k)-core out of the previous survivor set
        while True:
            deg = (
                sym.join(core.withColumnRenamed("id", "src"), on="src")
                .join(core.withColumnRenamed("id", "dst"), on="dst")
                .groupBy("src")
                .agg(F.count("*").alias("deg"))
            )
            new_core = (
                deg.where(F.col("deg") >= k)
                .select(F.col("src").alias("id"))
                .localCheckpoint()
            )
            if new_core.count() == core.count():
                core = new_core
                break
            core = new_core
            if core.isEmpty():
                break
        if core.isEmpty():
            break
        result = (
            result.join(
                core.withColumn("in_core", F.lit(True)), on="id", how="left"
            )
            .select(
                "id",
                F.when(F.col("in_core"), F.lit(k))
                .otherwise(F.col("coreness"))
                .alias("coreness"),
            )
            .localCheckpoint()
        )
    sym.unpersist()
    return result


def kcore_oracle_sql(edges_cte: str, k: int, iters: int) -> str:
    """Unrolled peeling as a MATERIALIZED CTE chain (the contract's
    iterative-oracle idiom): c0 = all vertices; c{i} = vertices with
    >= k surviving neighbors in c{i-1}.  Any ``iters`` >= the
    convergence round count yields the fixpoint (idempotent)."""
    ctes = [
        f"{edges_cte.strip()}",
        """sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION SELECT dst AS src, src AS dst FROM edges)""",
        """c0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym)""",
    ]
    for i in range(1, iters + 1):
        p = f"c{i - 1}"
        ctes.append(
            f"""c{i} AS MATERIALIZED (
    SELECT s.src AS id
    FROM sym s
    JOIN {p} a ON s.src = a.id
    JOIN {p} b ON s.dst = b.id
    GROUP BY s.src
    HAVING COUNT(*) >= {k})"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id FROM c{iters}"
