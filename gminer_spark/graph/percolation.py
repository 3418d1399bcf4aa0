"""Bond-percolation robustness curve: keep each edge independently
with probability p (an md5 coin — deterministic, partitioning-
independent), and report the component structure per p — the standard
"how much random link loss fragments this network" curve
(complement of the targeted hub_removal / random_robustness rows:
those delete VERTICES by rank, this deletes EDGES by coin).

One row per probe probability: number of kept edges, number of
components (isolated vertices count — a vertex that lost every edge
is its own component), and the giant-component size.  The phase
transition shows as giant_size collapsing between successive p rows.

Scale shape: per probe, one filtered pass over the edge table and one
hash-min CC (the value-green superstep engine); the curve is |probes|
independent runs — embarrassingly parallel across probes on a real
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32


def bond_percolation(
    edges: DataFrame,
    probs_pct: list[int] = (20, 50, 80),
    salt: str = "perc",
) -> DataFrame:
    """(p_pct, n_kept_edges, n_components, giant_size) — one row per
    keep-probability, coin = h32(salt:p:src:dst) % 100 < p over the
    canonical (src < dst) edge."""
    from gminer_spark.graph.cc import connected_components

    spark = edges.sparkSession
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    verts = canon.select(F.col("src").alias("id")).union(
        canon.select(F.col("dst").alias("id"))
    ).distinct()
    rows = []
    for p in probs_pct:
        kept = canon.where(
            h32(
                F.concat_ws(
                    ":", F.lit(salt), F.lit(str(p)), "src", "dst"
                )
            )
            % 100
            < p
        )
        n_kept = kept.count()
        labels = connected_components(kept).state
        full = verts.join(labels, on="id", how="left").select(
            F.coalesce("component", F.col("id")).alias("component")
        )
        agg = (
            full.groupBy("component")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.count("*").cast("long").alias("n_components"),
                F.max("sz").cast("long").alias("giant_size"),
            )
            .first()
        )
        rows.append(
            (int(p), int(n_kept), int(agg["n_components"]),
             int(agg["giant_size"]))
        )
    canon.unpersist()
    return spark.createDataFrame(
        rows,
        "p_pct long, n_kept_edges long, n_components long, giant_size long",
    )


def bond_percolation_oracle_sql(
    edges_cte: str,
    probs_pct: list[int] = (20, 50, 80),
    salt: str = "perc",
) -> str:
    """One recursive-CC chain per probe probability with the identical
    md5 coin, UNION ALL'd into the curve."""
    from gminer_spark.functions import h32_sql

    pc_edges = edges_cte.strip().replace("edges AS ", "pc_edges AS ", 1)
    ctes = [
        pc_edges,
        """pc_canon AS (
    SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
    FROM pc_edges WHERE src <> dst
    GROUP BY 1, 2)""",
        """pc_verts AS (
    SELECT DISTINCT src AS id FROM pc_canon
    UNION SELECT DISTINCT dst FROM pc_canon)""",
    ]
    selects = []
    for p in probs_pct:
        coin = h32_sql(
            f"'{salt}:{p}:' || CAST(src AS VARCHAR) || ':' "
            f"|| CAST(dst AS VARCHAR)"
        )
        ctes.append(
            f"""k{p} AS (
    SELECT src, dst FROM pc_canon WHERE {coin} % 100 < {p})"""
        )
        ctes.append(
            f"""s{p} AS (
    SELECT src, dst FROM k{p}
    UNION SELECT dst AS src, src AS dst FROM k{p})"""
        )
        ctes.append(
            f"""r{p}(id, label) AS (
    SELECT id, id FROM pc_verts
    UNION
    SELECT s.dst, r.label FROM r{p} r JOIN s{p} s ON s.src = r.id)"""
        )
        ctes.append(
            f"""c{p} AS (
    SELECT id, MIN(label) AS component FROM r{p} GROUP BY id)"""
        )
        selects.append(
            f"""SELECT CAST({p} AS BIGINT) AS p_pct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM k{p}) AS n_kept_edges,
       CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
       CAST(MAX(csz) AS BIGINT) AS giant_size
FROM (SELECT component, COUNT(*) AS csz FROM c{p} GROUP BY component) t"""
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )
