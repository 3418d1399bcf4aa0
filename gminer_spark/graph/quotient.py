"""Quotient (coarsened) graph over a vertex labeling: collapse every
label class to a supernode and count the edges between classes — the
multilevel-processing primitive (community-level link map, partition
quality inspection, multigrid coarsening for iterative solvers).

The reference's BDG partitioning builds exactly this object for its
locality blocks (SURVEY §2.4 block info aggregate: per-block vertex
counts + cross-block edge counts drive the greedy bin-pack); here the
labeling is a parameter, so the same operator coarsens by LPA
community, connected component, Voronoi cell, or host.

One labeled join per endpoint + one count shuffle keyed by the label
pair; self rows (src_label = dst_label) carry the intra-class edge
counts.  All counts exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quotient_graph(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(src_label, dst_label, n_edges) with src_label <= dst_label,
    counting distinct canonical undirected edges of ``edges`` between
    (or inside, on the diagonal) the classes of ``labels`` (id,
    label).  Vertices missing from ``labels`` drop with a loud count
    requirement left to the caller — the contract pairing always
    labels every vertex."""
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    lab = labels.select("id", "label")
    return (
        canon.join(
            lab.select(F.col("id").alias("src"), F.col("label").alias("lu")),
            on="src",
        )
        .join(
            lab.select(F.col("id").alias("dst"), F.col("label").alias("lv")),
            on="dst",
        )
        .groupBy(
            F.least("lu", "lv").alias("src_label"),
            F.greatest("lu", "lv").alias("dst_label"),
        )
        .agg(F.count("*").cast("long").alias("n_edges"))
    )


def quotient_graph_oracle_sql(edges_cte: str, labels_query: str) -> str:
    """DuckDB mirror: ``labels_query`` is a full SELECT producing
    (id, label) — e.g. an unrolled LPA chain — embedded as a derived
    table (qt_-prefixed CTEs: DuckDB rejects duplicate CTE aliases
    across nested WITH scopes)."""
    qt_edges_cte = edges_cte.strip().replace("edges AS ", "qt_edges AS ", 1)
    return f"""
WITH {qt_edges_cte},
qt_canon AS MATERIALIZED (
    SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
    FROM qt_edges WHERE src <> dst
    GROUP BY 1, 2),
qt_labels AS MATERIALIZED (SELECT * FROM ({labels_query}))
SELECT LEAST(lu.label, lv.label) AS src_label,
       GREATEST(lu.label, lv.label) AS dst_label,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM qt_canon c
JOIN qt_labels lu ON lu.id = c.src
JOIN qt_labels lv ON lv.id = c.dst
GROUP BY 1, 2"""
