"""Conductance sweep cut — the Andersen–Chung–Lang local-clustering
step (FOCS'06): order vertices by score/degree (score = personalized
PageRank from a seed set), sweep prefixes of that order, and report
each prefix's cut, volume and conductance plus the best (minimum-
conductance) prefix — the seed's local community.

This is the principled cousin of FocusCO's expand/contract phase
(SURVEY §2.10 GC): instead of a task-parallel kernel it is three
joins and one bounded window.

Scale shape:
* the sweep is restricted to the top ``sweep_n`` vertices by
  score/degree, selected via ``orderBy().limit()`` —
  TakeOrderedAndProject, a distributed top-k, never a global sort;
* the cumulative cut uses the standard incremental identity
  cut(S_k) = Σ_{i<=k} (deg(v_i) − 2·e_in(v_i)) where e_in(v) counts
  neighbors ranked BEFORE v — one edge-table join against the tiny
  ranked set (broadcast-able), no per-prefix recount;
* the only window runs over the sweep_n-row prefix table.

Exactness: cut/vol are exact BIGINTs; conductance is ONE double
division micro-rounded; the argmin uses the unrounded IEEE ratio
(identical in both engines) with earliest-rank tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def conductance_sweep(
    edges: DataFrame, scores: DataFrame, sweep_n: int = 200
) -> DataFrame:
    """Sweep the score/degree order of ``scores`` (id, rank_micro)
    over the undirected view of ``edges``.

    Returns one row per sweep prefix, rank 1..sweep_n:
    ``(rank, id, cut_edges, volume, conductance_micro, in_best)``.
    Vertices with rank_micro = 0 (untouched by the score) are
    excluded — the sweep order is only defined where the score is.
    """
    sym = tables.symmetrize(edges).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    vol_total = sym.count()  # Σ deg = 2|E|

    scored = (
        scores.where(F.col("rank_micro") > 0)
        .join(deg, on="id")
        .select(
            "id",
            "deg",
            "rank_micro",
            (
                F.col("rank_micro").cast("double")
                / F.col("deg").cast("double")
            ).alias("score"),
        )
    )
    order = [F.desc("score"), F.desc("rank_micro"), F.asc("id")]
    top = scored.orderBy(*order).limit(sweep_n)
    # the window below runs over <= sweep_n rows — bounded by design
    ranked = tables.plan_barrier(
        top.select(
            F.row_number().over(Window.orderBy(*order)).alias("rank"),
            "id",
            "deg",
        )
    )

    r_u = ranked.select(
        F.col("id").alias("src"), F.col("rank").alias("rank_u")
    )
    r_v = ranked.select(
        F.col("id").alias("dst"), F.col("rank").alias("rank_v")
    )
    e_in = (
        sym.join(r_u, on="src")
        .join(r_v, on="dst")
        .where(F.col("rank_u") < F.col("rank_v"))
        .groupBy(F.col("rank_v").alias("rank"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )

    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(e_in, on="rank", how="left")
        .select(
            "rank",
            "id",
            "deg",
            F.coalesce("e_in", F.lit(0)).alias("e_in"),
        )
        .select(
            "rank",
            "id",
            F.sum(F.col("deg") - 2 * F.col("e_in"))
            .over(w)
            .cast("long")
            .alias("cut_edges"),
            F.sum("deg").over(w).cast("long").alias("volume"),
        )
        .select(
            "rank",
            "id",
            "cut_edges",
            "volume",
            F.least(
                F.col("volume"), F.lit(int(vol_total)) - F.col("volume")
            ).alias("denom"),
        )
        .where(F.col("denom") > 0)
        .select(
            "rank",
            "id",
            "cut_edges",
            "volume",
            (
                F.col("cut_edges").cast("double")
                / F.col("denom").cast("double")
            ).alias("cond"),
        )
    )
    best = Window.orderBy(F.asc("cond"), F.asc("rank")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = sweep.select(
        "rank",
        "id",
        "cut_edges",
        "volume",
        F.round(F.col("cond") * 1e6, 0).cast("long").alias(
            "conductance_micro"
        ),
        (F.col("rank") <= F.first("rank").over(best)).alias("in_best"),
    )
    out = tables.plan_barrier(out)
    sym.unpersist()
    return out


def conductance_sweep_oracle_sql(
    edges_cte: str, scores_query: str, sweep_n: int = 200
) -> str:
    """DuckDB mirror: ``scores_query`` is a full SELECT producing
    (id, rank_micro) — e.g. an unrolled PPR chain — embedded as a
    derived table.  All CTE names carry a ``sw_`` prefix: DuckDB
    rejects duplicate CTE aliases even across nested WITH scopes, and
    the embedded chain typically defines edges/sym/deg of its own.
    Identical order, incremental cut identity, unrounded-ratio
    argmin."""
    sw_edges_cte = edges_cte.strip().replace("edges AS ", "sw_edges AS ", 1)
    return f"""
WITH {sw_edges_cte},
sw_sym AS MATERIALIZED (
    SELECT src, dst FROM sw_edges
    UNION SELECT dst AS src, src AS dst FROM sw_edges),
sw_deg AS MATERIALIZED (
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
    FROM sw_sym GROUP BY src),
vt AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS vol_total FROM sw_sym),
pprs AS MATERIALIZED (SELECT * FROM ({scores_query})),
scored AS MATERIALIZED (
    SELECT p.id, d.deg, p.rank_micro,
           CAST(p.rank_micro AS DOUBLE) / CAST(d.deg AS DOUBLE) AS score
    FROM pprs p JOIN sw_deg d ON d.id = p.id
    WHERE p.rank_micro > 0),
ranked AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY score DESC, rank_micro DESC, id ASC) AS INT)
               AS rank,
           id, deg
    FROM scored
    ORDER BY score DESC, rank_micro DESC, id ASC
    LIMIT {sweep_n}),
ein AS MATERIALIZED (
    SELECT rv.rank AS rank, CAST(COUNT(*) AS BIGINT) AS e_in
    FROM sw_sym e
    JOIN ranked ru ON ru.id = e.src
    JOIN ranked rv ON rv.id = e.dst
    WHERE ru.rank < rv.rank
    GROUP BY rv.rank),
sweep AS MATERIALIZED (
    SELECT r.rank, r.id,
           CAST(SUM(r.deg - 2 * COALESCE(n.e_in, 0)) OVER (
               ORDER BY r.rank
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cut_edges,
           CAST(SUM(r.deg) OVER (
               ORDER BY r.rank
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS volume
    FROM ranked r LEFT JOIN ein n ON n.rank = r.rank),
cond AS MATERIALIZED (
    SELECT s.rank, s.id, s.cut_edges, s.volume,
           CAST(s.cut_edges AS DOUBLE)
             / CAST(LEAST(s.volume, v.vol_total - s.volume) AS DOUBLE)
             AS cond
    FROM sweep s CROSS JOIN vt v
    WHERE LEAST(s.volume, v.vol_total - s.volume) > 0),
br AS (SELECT rank AS best_rank FROM cond
       ORDER BY cond ASC, rank ASC LIMIT 1)
SELECT rank, id, cut_edges, volume,
       CAST(ROUND(cond * 1e6) AS BIGINT) AS conductance_micro,
       rank <= (SELECT best_rank FROM br) AS in_best
FROM cond"""
