"""Graph snapshot diffing — what changed between two crawls.

A production link graph is re-derived per crawl; the first questions
an operator asks of a new snapshot are *which edges appeared or
vanished* and *whose connectivity moved* — the inputs to recrawl
scheduling and spam-burst detection (a host whose in-degree jumps
overnight).  Both are pure co-partitioned joins on the canonical edge
/ vertex keys:

* :func:`snapshot_diff` — full-outer join of the two edge sets on
  (src, dst): rows only for edges present in exactly one snapshot,
  tagged ``added`` / ``removed``.  Unchanged edges (the vast
  majority) never leave the join's matched branch, so output is
  bounded by the churn, not the graph.
* :func:`degree_delta` — per-vertex total degree in each snapshot
  plus the delta, full-outer on the vertex id (vertices present in
  either snapshot).

Reference analog: GMiner recomputes from scratch per input graph;
snapshot diffing is the incremental-maintenance view of the same
data, in the spirit of this engine's CCMaintainer / PageRankMaintainer
(stronger-than-reference resume family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def snapshot_diff(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """(src, dst, status) — canonical edges in exactly one snapshot;
    status = 'added' (new only) or 'removed' (old only)."""
    old = _canon(edges_old).withColumn("_o", F.lit(True))
    new = _canon(edges_new).withColumn("_n", F.lit(True))
    return (
        old.join(new, on=["src", "dst"], how="full")
        .where(F.col("_o").isNull() | F.col("_n").isNull())
        .select(
            "src",
            "dst",
            F.when(F.col("_o").isNull(), F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("status"),
        )
    )


def degree_delta(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """(id, deg_old, deg_new, delta) — undirected degree per snapshot
    (0 when absent) for vertices of either snapshot."""
    def deg(edges: DataFrame) -> DataFrame:
        return (
            tables.symmetrize(edges)
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("d"))
        )

    o = deg(edges_old).withColumnRenamed("d", "deg_old")
    n = deg(edges_new).withColumnRenamed("d", "deg_new")
    return (
        o.join(n, on="id", how="full")
        .select(
            "id",
            F.coalesce("deg_old", F.lit(0)).alias("deg_old"),
            F.coalesce("deg_new", F.lit(0)).alias("deg_new"),
            (
                F.coalesce("deg_new", F.lit(0)) - F.coalesce("deg_old", F.lit(0))
            ).alias("delta"),
        )
        .where(F.col("delta") != 0)
    )


def snapshot_diff_oracle_sql(old_cte: str, new_cte: str) -> str:
    """``old_cte`` / ``new_cte`` must define ``eold(src, dst)`` /
    ``enew(src, dst)`` (already canonical src < dst, distinct)."""
    return f"""
WITH {old_cte.strip()},
{new_cte.strip()}
SELECT COALESCE(o.src, n.src) AS src, COALESCE(o.dst, n.dst) AS dst,
       CASE WHEN o.src IS NULL THEN 'added' ELSE 'removed' END AS status
FROM eold o FULL OUTER JOIN enew n
  ON o.src = n.src AND o.dst = n.dst
WHERE o.src IS NULL OR n.src IS NULL"""


def degree_delta_oracle_sql(old_cte: str, new_cte: str) -> str:
    return f"""
WITH {old_cte.strip()},
{new_cte.strip()},
dold AS MATERIALIZED (
    SELECT id, COUNT(*) AS d FROM (
        SELECT src AS id FROM eold UNION ALL SELECT dst FROM eold)
    GROUP BY id),
dnew AS MATERIALIZED (
    SELECT id, COUNT(*) AS d FROM (
        SELECT src AS id FROM enew UNION ALL SELECT dst FROM enew)
    GROUP BY id)
SELECT COALESCE(o.id, n.id) AS id,
       CAST(COALESCE(o.d, 0) AS BIGINT) AS deg_old,
       CAST(COALESCE(n.d, 0) AS BIGINT) AS deg_new,
       CAST(COALESCE(n.d, 0) - COALESCE(o.d, 0) AS BIGINT) AS delta
FROM dold o FULL OUTER JOIN dnew n ON o.id = n.id
WHERE COALESCE(n.d, 0) <> COALESCE(o.d, 0)"""


def hub_removal_robustness(
    edges: DataFrame, k_hubs: int = 20, drop: DataFrame | None = None
) -> DataFrame:
    """(comp_size, n_components) — component-size histogram after
    removing the top-``k_hubs`` degree vertices (ties by min id, the
    landmark total order), or an explicit ``drop(id)`` set.

    The classic scale-free robustness probe (Albert-Jeong-Barabási):
    a crawl graph survives RANDOM vertex failure but shatters under
    targeted hub removal — pass a deterministic random ``drop`` set of
    the same size to measure the contrast on the same graph.  Vertices
    isolated by the removal drop out (component membership is derived
    from the remaining edge table, the CC convention here).

    One degree table + two anti-joins + the standard hash-min CC +
    two tiny aggregations; nothing new to scale — it rides CC.
    """
    from gminer_spark.graph.cc import connected_components
    from gminer_spark.graph.landmarks import select_landmarks

    hubs = (
        drop if drop is not None else select_landmarks(edges, k_hubs)
    ).localCheckpoint()
    sub = edges.join(
        hubs.withColumnRenamed("id", "src"), on="src", how="left_anti"
    ).join(hubs.withColumnRenamed("id", "dst"), on="dst", how="left_anti")
    comp = connected_components(sub).state
    sizes = comp.groupBy("component").agg(F.count("*").alias("comp_size"))
    return sizes.groupBy("comp_size").agg(
        F.count("*").cast("long").alias("n_components")
    )


def hub_removal_oracle_sql(
    edges_cte: str, sym_cte: str, k_hubs: int = 20, hubs_cte: str | None = None
) -> str:
    """Top-k hub cut + recursive-CTE CC + size histogram.

    ``hubs_cte`` overrides the hub pick (must define ``hubs(id)``) —
    used by random_robustness to swap top-degree for an h32-random
    sample of the same size without text-rewriting this template."""
    hubs = hubs_cte.strip() if hubs_cte is not None else f"""hubs AS MATERIALIZED (
    SELECT id FROM hdeg ORDER BY deg DESC, id ASC LIMIT {k_hubs})"""
    return f"""
WITH RECURSIVE {edges_cte.strip()},
{sym_cte.strip()},
hdeg AS MATERIALIZED (
    SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
{hubs},
rsym AS MATERIALIZED (
    SELECT src, dst FROM sym
    WHERE src NOT IN (SELECT id FROM hubs)
      AND dst NOT IN (SELECT id FROM hubs)),
rverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM rsym),
reach(id, label) AS (
    SELECT id, id FROM rverts
    UNION
    SELECT s.dst, r.label FROM reach r JOIN rsym s ON s.src = r.id),
comp AS MATERIALIZED (
    SELECT id, MIN(label) AS component FROM reach GROUP BY id),
sizes AS MATERIALIZED (
    SELECT component, COUNT(*) AS comp_size FROM comp GROUP BY component)
SELECT CAST(comp_size AS BIGINT) AS comp_size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY comp_size"""
