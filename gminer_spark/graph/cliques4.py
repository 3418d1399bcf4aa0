"""K4 (4-clique) counting — one motif up from triangles.

Clique counting beyond the triangle is the standard cohesion
spectrum on a link graph (quasi-clique seeding, spam-farm detection:
link farms show up as K4-dense blocks).  Enumeration rides the
already-canonical triangle table twice:

    K4(a<b<c<d)  =  tri(a,b,c) ⋈ tri(a,b,d) [c < d]  ⋉ edge(c,d)

— two triangles sharing the base edge (a, b) whose apexes are
adjacent.  Each K4 is produced exactly once (its lexicographic base
edge (a, b) is unique, apexes ordered), so counts are exact with no
multiplicity division.

Scale posture: the join is keyed on the shared base edge; its fan-out
is the edge's BASE MULTIPLICITY (number of triangles listing it as
the lexicographic base pair), so the intermediate is Σ_e basemult(e)²
— the same arboricity-style bound as the wedge join one level down.
On a hub-dense graph, ``max_support`` caps exactly that base
multiplicity (the quantity that squares) — the max_df discipline;
exact on the capped motif set, identically in both engines.

Reference analog: the reference's clique machinery
(/root/reference/apps/maxclique.cpp) searches per-task candidate
sets for the MAXIMUM clique; this is the declarative counting twin
over the same oriented-intersection primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph.ktruss import _canonical
from gminer_spark.graph.trussness import _triangles_canonical


def k4_counts(edges: DataFrame, max_support: int | None = None) -> DataFrame:
    """(id, k4) — 4-cliques containing each vertex (vertices in >= 1
    K4 only).  ``max_support`` caps the base edge's lex-base triangle
    multiplicity pre-join — the join fan-out that squares (None = no
    cap)."""
    quads = _k4_quads(edges, max_support)
    parts = [
        quads.select(F.col(c).alias("id")) for c in ("a", "b", "c", "d")
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("id").agg(F.count("*").cast("long").alias("k4"))


def k4_total(edges: DataFrame, max_support: int | None = None) -> DataFrame:
    """One row (n_k4) — the global 4-clique count."""
    return _k4_quads(edges, max_support).agg(
        F.count("*").cast("long").alias("n_k4")
    )


def _k4_quads(edges: DataFrame, max_support: int | None) -> DataFrame:
    canon = _canonical(edges).localCheckpoint()
    tri = _triangles_canonical(canon).localCheckpoint()
    base = tri
    if max_support is not None:
        sup = tri.groupBy("a", "b").agg(F.count("*").alias("sup"))
        keep = sup.where(F.col("sup") <= max_support).select("a", "b")
        base = tri.join(keep, on=["a", "b"], how="left_semi")
    t1 = base.select("a", "b", F.col("c").alias("c1"))
    t2 = base.select("a", "b", F.col("c").alias("c2"))
    pairs = t1.join(t2, on=["a", "b"]).where(F.col("c1") < F.col("c2"))
    closer = canon.select(F.col("src").alias("c1"), F.col("dst").alias("c2"))
    return pairs.join(closer, on=["c1", "c2"], how="left_semi").select(
        "a", "b", F.col("c1").alias("c"), F.col("c2").alias("d")
    )


def k4_oracle_sql(edges_cte: str, max_support: int | None = None) -> str:
    """Per-vertex K4 participation over the same quad enumeration."""
    cap = (
        f"""base AS MATERIALIZED (
    SELECT t.a, t.b, t.c FROM tri t
    JOIN (SELECT a, b FROM tri GROUP BY a, b
          HAVING COUNT(*) <= {max_support}) s
    ON s.a = t.a AND s.b = t.b)"""
        if max_support is not None
        else "base AS MATERIALIZED (SELECT a, b, c FROM tri)"
    )
    return f"""
WITH {edges_cte.strip()},
ce AS MATERIALIZED (
    SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
    FROM edges WHERE src <> dst GROUP BY 1, 2),
tri AS MATERIALIZED (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM ce e1
    JOIN ce e2 ON e2.src = e1.src AND e2.dst > e1.dst
    JOIN ce e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
{cap},
quads AS MATERIALIZED (
    SELECT t1.a, t1.b, t1.c AS c, t2.c AS d
    FROM base t1
    JOIN base t2 ON t2.a = t1.a AND t2.b = t1.b AND t2.c > t1.c
    JOIN ce e ON e.src = t1.c AND e.dst = t2.c)
SELECT id, CAST(COUNT(*) AS BIGINT) AS k4 FROM (
    SELECT a AS id FROM quads
    UNION ALL SELECT b FROM quads
    UNION ALL SELECT c FROM quads
    UNION ALL SELECT d FROM quads)
GROUP BY id"""
