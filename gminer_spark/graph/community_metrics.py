"""Partition quality metrics: per-community modularity terms and
conductance over any vertex labeling (LPA, CC, focusco cores, ...).

For an undirected graph given as a SYMMETRIC directed edge table
``sym(src, dst)`` (both orientations present, no self loops) with
``m2 = |sym| = 2m``, and a labeling ``labels(id, label)``:

    vol_c       = sum of degrees inside c            (exact BIGINT)
    internal2_c = directed intra-community edges     (= 2 * m_c)
    cut_c       = vol_c - internal2_c                (boundary edges)
    Q_c         = m_c/m - (vol_c / 2m)^2
                = (internal2_c * m2 - vol_c^2) / m2^2
    phi_c       = cut_c / min(vol_c, m2 - vol_c)     (conductance)

Global modularity Q = sum_c Q_c; the per-community rows are returned
so callers see WHICH communities are well-separated, and the judge's
oracle compares every term.

Cross-engine discipline: every count is an exact BIGINT; the only
floats are ONE division per metric per community (the CLAUDE.md
single-division rule), with the products promoted to DOUBLE *before*
multiplying (the cooccur.py BIGINT-overflow advice — Spark wraps
silently where DuckDB raises).  Products are integer-exact in double
up to 2^53, far above contract scale; micro-rounding absorbs the
tail beyond that.  phi_c is 0 by convention when the community is
the whole graph (min(vol, m2-vol) = 0).

Spark shape: two label equi-joins against the edge table + one
groupBy — three shuffles total, label-partitioned, no iteration; at
cluster scale both joins broadcast the (small) label table or
co-partition on id.  Reference analog: the per-community aggregation
step of apps/community.cpp (CD scores candidate communities by an
internal-vs-boundary weight ratio; modularity/conductance are the
standard global analogs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def community_quality(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, n_nodes, volume, internal2, cut, q_micro,
    conductance_micro) per community.

    ``sym``: symmetric directed edge table (src, dst).
    ``labels``: (id, label).
    """
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    lab = labels.select("id", "label")
    per_c = (
        deg.join(lab, on="id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("deg").alias("volume"),
        )
    )
    internal = (
        sym.join(lab.select(F.col("id").alias("src"), "label"), on="src")
        .join(
            lab.select(
                F.col("id").alias("dst"), F.col("label").alias("_lb")
            ),
            on="dst",
        )
        .where(F.col("label") == F.col("_lb"))
        .groupBy("label")
        .agg(F.count("*").alias("internal2"))
    )
    m2 = sym.agg(F.count("*").cast("long").alias("m2"))
    return (
        per_c.join(internal, on="label", how="left")
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            "n_nodes",
            "volume",
            F.coalesce("internal2", F.lit(0)).cast("long").alias("internal2"),
            (
                F.col("volume")
                - F.coalesce("internal2", F.lit(0))
            ).cast("long").alias("cut"),
            F.round(
                (
                    F.coalesce("internal2", F.lit(0)).cast("double")
                    * F.col("m2").cast("double")
                    - F.col("volume").cast("double")
                    * F.col("volume").cast("double")
                )
                / (F.col("m2").cast("double") * F.col("m2").cast("double"))
                * 1e6,
                0,
            ).cast("long").alias("q_micro"),
            F.when(
                F.least(F.col("volume"), F.col("m2") - F.col("volume")) == 0,
                F.lit(0).cast("long"),
            )
            .otherwise(
                F.round(
                    (
                        F.col("volume")
                        - F.coalesce("internal2", F.lit(0))
                    ).cast("double")
                    / F.least(
                        F.col("volume"), F.col("m2") - F.col("volume")
                    ).cast("double")
                    * 1e6,
                    0,
                ).cast("long")
            )
            .alias("conductance_micro"),
        )
    )


def community_quality_oracle_sql(labels_sql: str, sym_cte_name: str = "sym") -> str:
    """Metrics SQL over a nested labeling query.  ``labels_sql`` is a
    complete SELECT (typically an unrolled LPA chain) returning
    (id, label); it runs as a subquery so its internal CTE names
    cannot clash with the outer ones.  The caller prepends the edge +
    sym CTEs and passes their names."""
    return f"""labels AS MATERIALIZED (
    SELECT id, label FROM ({labels_sql}) _l),
cdeg AS MATERIALIZED (
    SELECT src AS id, COUNT(*) AS deg FROM {sym_cte_name} GROUP BY src),
per_c AS MATERIALIZED (
    SELECT l.label, COUNT(*) AS n_nodes, SUM(d.deg) AS volume
    FROM cdeg d JOIN labels l ON d.id = l.id
    GROUP BY l.label),
cint AS MATERIALIZED (
    SELECT la.label, COUNT(*) AS internal2
    FROM {sym_cte_name} s
    JOIN labels la ON s.src = la.id
    JOIN labels lb ON s.dst = lb.id AND la.label = lb.label
    GROUP BY la.label),
m2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM {sym_cte_name})
SELECT p.label,
       CAST(p.n_nodes AS BIGINT) AS n_nodes,
       CAST(p.volume AS BIGINT) AS volume,
       CAST(COALESCE(i.internal2, 0) AS BIGINT) AS internal2,
       CAST(p.volume - COALESCE(i.internal2, 0) AS BIGINT) AS cut,
       CAST(ROUND((CAST(COALESCE(i.internal2, 0) AS DOUBLE) * m.m2
                   - CAST(p.volume AS DOUBLE) * CAST(p.volume AS DOUBLE))
                  / (CAST(m.m2 AS DOUBLE) * CAST(m.m2 AS DOUBLE))
                  * 1e6) AS BIGINT) AS q_micro,
       CAST(CASE WHEN LEAST(p.volume, m.m2 - p.volume) = 0 THEN 0
            ELSE ROUND(CAST(p.volume - COALESCE(i.internal2, 0) AS DOUBLE)
                       / CAST(LEAST(p.volume, m.m2 - p.volume) AS DOUBLE)
                       * 1e6)
            END AS BIGINT) AS conductance_micro
FROM per_c p LEFT JOIN cint i ON p.label = i.label
CROSS JOIN m2t m"""


def label_assortativity(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One-row Newman categorical assortativity over a symmetric edge
    table and a vertex labeling -> (m2, same2, r_micro).

    With E the joint distribution of endpoint labels over directed
    symmetric edges and vol_i the label-i degree volume,

        r = (tr(E) - sum_i a_i b_i) / (1 - sum_i a_i b_i)
          = (same2 * m2 - sum_i vol_i^2) / (m2^2 - sum_i vol_i^2)

    the homophily coefficient (+1 fully assortative, 0 random, <0
    disassortative).  Both numerator and denominator are EXACT
    integers (same2/m2/vol_i are counts); vol_i^2 is accumulated in
    DECIMAL(38,0) (the structure.py moment-product discipline --
    BIGINT would wrap at ~3e9-degree volumes where DuckDB errors),
    and ONE final division produces ``r_micro``; 0 by convention when
    the denominator is 0 (every vertex one label).

    Plan: two broadcastable label joins + two scalar aggregates --
    no iteration, label-keyed partial aggregation throughout.
    """
    la = labels.select(F.col("id").alias("src"), "label")
    lb = labels.select(
        F.col("id").alias("dst"), F.col("label").alias("_lb")
    )
    tagged = sym.join(la, on="src").join(lb, on="dst")
    tot = tagged.agg(
        F.count("*").cast("long").alias("m2"),
        F.sum(
            F.when(F.col("label") == F.col("_lb"), 1).otherwise(0)
        ).cast("long").alias("same2"),
    )
    vols = (
        tagged.groupBy("label")
        .agg(F.count("*").cast("decimal(38,0)").alias("vol"))
        .agg(F.sum(F.col("vol") * F.col("vol")).alias("sum_vol2"))
    )
    return tot.crossJoin(F.broadcast(vols)).select(
        "m2",
        "same2",
        F.when(
            F.col("m2").cast("decimal(38,0)") * F.col("m2")
            == F.col("sum_vol2"),
            F.lit(0).cast("long"),
        )
        .otherwise(
            F.round(
                (
                    F.col("same2").cast("double") * F.col("m2").cast("double")
                    - F.col("sum_vol2").cast("double")
                )
                / (
                    F.col("m2").cast("double") * F.col("m2").cast("double")
                    - F.col("sum_vol2").cast("double")
                )
                * 1e6,
                0,
            ).cast("long")
        )
        .alias("r_micro"),
    )


def label_assortativity_oracle_sql(
    sym_cte_name: str, labels_sql: str
) -> str:
    """Witness fragment (caller prepends edge/sym CTEs): same exact
    integer accumulation, HUGEINT vol^2 (DuckDB's native SUM width),
    one DOUBLE division."""
    return f"""lab AS MATERIALIZED (
    SELECT id, label FROM ({labels_sql}) _l),
tagged AS MATERIALIZED (
    SELECT la.label AS l1, lb.label AS l2
    FROM {sym_cte_name} s
    JOIN lab la ON s.src = la.id
    JOIN lab lb ON s.dst = lb.id),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m2,
           CAST(SUM(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) AS BIGINT) AS same2
    FROM tagged),
vols AS (
    SELECT SUM(v * v) AS sum_vol2 FROM (
        SELECT CAST(COUNT(*) AS HUGEINT) AS v FROM tagged GROUP BY l1) _v)
SELECT t.m2, t.same2,
       CAST(CASE WHEN CAST(t.m2 AS HUGEINT) * t.m2 = v.sum_vol2 THEN 0
            ELSE ROUND((CAST(t.same2 AS DOUBLE) * t.m2
                        - CAST(v.sum_vol2 AS DOUBLE))
                       / (CAST(t.m2 AS DOUBLE) * t.m2
                          - CAST(v.sum_vol2 AS DOUBLE)) * 1e6)
            END AS BIGINT) AS r_micro
FROM tot t CROSS JOIN vols v"""


def global_modularity(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """1-row ``(n_communities, modularity_micro)`` — Newman global Q
    of a labeling, assembled EXACTLY: Qnum = Σ_c (internal2_c·m2 −
    vol_c²) in BIGINT, then ONE double division by m2² (the per-
    community q_micro rows of :func:`community_quality` sum the
    ROUNDED terms; this is the exact global).  ``labels``: (id, label).
    """
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    lab = labels.select("id", "label")
    vol = (
        deg.join(lab, on="id")
        .groupBy("label")
        .agg(F.sum("deg").cast("long").alias("vol"))
    )
    internal = (
        sym.join(lab.select(F.col("id").alias("src"), "label"), on="src")
        .join(
            lab.select(
                F.col("id").alias("dst"), F.col("label").alias("_lb")
            ),
            on="dst",
        )
        .where(F.col("label") == F.col("_lb"))
        .groupBy("label")
        .agg(F.count("*").cast("long").alias("i2"))
    )
    m2 = sym.agg(F.count("*").cast("long").alias("m2"))
    per = (
        vol.join(internal, on="label", how="left")
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            (
                F.coalesce("i2", F.lit(0)) * F.col("m2")
                - F.col("vol") * F.col("vol")
            ).alias("qterm"),
            "m2",
        )
    )
    return per.groupBy("m2").agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum("qterm").cast("long").alias("qnum"),
    ).select(
        "n_communities",
        F.round(
            F.col("qnum").cast("double")
            / (F.col("m2").cast("double") * F.col("m2").cast("double"))
            * 1e6,
            0,
        )
        .cast("long")
        .alias("modularity_micro"),
    )
