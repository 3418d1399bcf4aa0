"""Butterfly (K2,2) counting on a bipartite incidence table.

The butterfly — two left vertices sharing two right vertices — is the
bipartite analog of the triangle: the smallest cohesion motif on
user-item / order-part / host-resource graphs, and the base quantity
for bipartite clustering coefficients and (k, 2)-bitruss peeling.

    bfly(a)  =  Σ_b  C(codeg(a, b), 2)        per left vertex
    total    =  Σ_{a<b}  C(codeg(a, b), 2)

where codeg(a, b) = |N(a) ∩ N(b)| over shared right neighbors.

Spark shape: one wedge self-join on the RIGHT vertex (the same
pair-generation as co-citation, `graph/cocitation.py`), partial-
aggregated pair counts, then an integer C(cnt, 2) fold — all JVM-side.
Right-side hubs blow the wedge join up quadratically, so right
vertices above ``max_right_deg`` are dropped pre-join (the max_df
cut); the count is then exact on the capped graph, identically in
both engines.

Reference analog: the same adjacency-intersection kernel as triangle
counting (/root/reference/apps/trianglecount.cpp:150-170) applied to
a bipartite incidence list; GMiner's degree-ordered orientation trick
corresponds to the right-hub cap here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def butterfly_counts(
    incid: DataFrame, max_right_deg: int = 1024
) -> DataFrame:
    """(id, bfly) per LEFT vertex with bfly > 0.

    ``incid`` has columns ``(left, right)``; duplicates are ignored.
    """
    pairs = _codeg_pairs(incid, max_right_deg)
    half = pairs.select(
        "a", "b", (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("bf")
    ).where(F.col("bf") > 0)
    per_a = half.groupBy(F.col("a").alias("id")).agg(F.sum("bf").alias("bfly"))
    per_b = half.groupBy(F.col("b").alias("id")).agg(F.sum("bf").alias("bfly"))
    return (
        per_a.unionByName(per_b)
        .groupBy("id")
        .agg(F.sum("bfly").cast("long").alias("bfly"))
    )


def butterfly_total(incid: DataFrame, max_right_deg: int = 1024) -> DataFrame:
    """One row (n_butterflies) — the global K2,2 count."""
    pairs = _codeg_pairs(incid, max_right_deg)
    return pairs.agg(
        F.coalesce(
            F.sum((F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long")), F.lit(0)
        ).alias("n_butterflies")
    )


def _codeg_pairs(incid: DataFrame, max_right_deg: int) -> DataFrame:
    dd = incid.select(
        F.col("left").alias("member"), F.col("right").alias("center")
    ).distinct()
    deg = dd.groupBy("center").agg(F.count("*").alias("cdeg"))
    kept = dd.join(
        deg.where(F.col("cdeg") <= max_right_deg).select("center"),
        on="center",
        how="left_semi",
    )
    l = kept.select("center", F.col("member").alias("a"))
    r = kept.select("center", F.col("member").alias("b"))
    return (
        l.join(r, on="center")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )


def butterfly_oracle_sql(incid_cte: str, max_right_deg: int = 1024) -> str:
    """Per-left-vertex butterfly counts.  ``incid_cte`` must define
    ``incid(left, right)`` (the CTE may quote the column names if they
    collide with keywords)."""
    return f"""
WITH {incid_cte.strip()},
dd AS MATERIALIZED (
    SELECT DISTINCT "left" AS member, "right" AS center FROM incid),
kept AS MATERIALIZED (
    SELECT i.center, i.member FROM dd i
    JOIN (SELECT center FROM dd GROUP BY center
          HAVING COUNT(*) <= {max_right_deg}) c
    ON i.center = c.center),
pairs AS MATERIALIZED (
    SELECT l.member AS a, r.member AS b, COUNT(*) AS cnt
    FROM kept l JOIN kept r ON l.center = r.center AND l.member < r.member
    GROUP BY l.member, r.member),
half AS MATERIALIZED (
    SELECT a, b, CAST(cnt * (cnt - 1) / 2 AS BIGINT) AS bf
    FROM pairs WHERE cnt >= 2)
SELECT id, CAST(SUM(bf) AS BIGINT) AS bfly FROM (
    SELECT a AS id, bf FROM half
    UNION ALL SELECT b AS id, bf FROM half)
GROUP BY id"""
