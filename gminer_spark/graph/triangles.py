"""Exact triangle counting with degree-ordered edge orientation.

The reference TC app (/root/reference/apps/trianglecount.cpp) seeds a
task per vertex with its higher-id neighbors (:135-159), ships only
the truncated adjacency on pull (:119-133), and merge-intersects
sorted adjacency lists (:84-111); the global count is a partial+final
sum aggregator (:45-77).

Spark-first re-expression: orient every undirected edge from the
lower-ranked endpoint to the higher-ranked one, then

    triangles = |{(u,v), (u,w), (v,w)} ⊆ E_oriented, rank v < rank w|

i.e. a wedge self-join plus one semi-join — all shuffle-bounded,
no iteration.  Orientation by id matches the reference exactly;
orientation by (degree, id) is the skew-robust variant (hub fan-out
bounded by arboricity — SURVEY.md §4 row 3): each vertex's out-degree
in the oriented graph is O(sqrt(|E|)) for any graph.

Rank keys are packed into one bigint ``(deg << 32) | id`` so the
orientation and wedge conditions stay single-column comparisons that
Catalyst pushes into the joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables

# Broadcast ceiling for edge-derived lookup tables (~rows of two longs
# ≈ 500 MB at the limit).  Aggressive for a laptop, conservative for
# the 100-TB target's executor memory; revisit per cluster config.
BROADCAST_ROW_LIMIT = 20_000_000


def gated_broadcast(df: DataFrame, n_rows: int, limit: int = BROADCAST_ROW_LIMIT):
    """Broadcast ``df`` only when ``n_rows`` is under the gate; above it
    return ``df`` unchanged so the join falls back to a shuffle.  An
    UNgated broadcast of an O(|E|)/O(|V|) table is a guaranteed
    driver/executor OOM at web scale — the reference's pull is likewise
    a shuffled lookup, never a replication
    (/root/reference/core/slave.tpp:307-401)."""
    return F.broadcast(df) if n_rows <= limit else df


def oriented_edges(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """Orient the undirected closure of ``edges`` low-rank → high-rank.

    ``orient="id"``: rank = vertex id (reference semantics,
    apps/trianglecount.cpp:144-148).  ``orient="degree"``: rank =
    (undirected degree, id) — the load-balance orientation.
    Output columns ``(src, dst)`` with rank(src) < rank(dst) plus the
    packed rank keys ``(src_key, dst_key)``.
    """
    sym = tables.symmetrize(edges)
    if orient == "id":
        return (
            sym.where(F.col("src") < F.col("dst"))
            .select(
                "src",
                "dst",
                F.col("src").alias("src_key"),
                F.col("dst").alias("dst_key"),
            )
        )
    # undirected degree = out-degree over the symmetric view (every
    # vertex appears as src), so ONE aggregation suffices — the
    # generic degrees() helper would add an in-degree groupBy plus a
    # full outer join for values that are identical here (r6: two
    # shuffles removed from every oriented_edges caller)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    keyed = (
        sym.join(deg.withColumnRenamed("id", "src"), on="src")
        .withColumnRenamed("deg", "src_deg")
        .join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dst_deg"),
            on="dst",
        )
        .select(
            "src",
            "dst",
            (F.shiftleft(F.col("src_deg"), 32) + F.col("src")).alias("src_key"),
            (F.shiftleft(F.col("dst_deg"), 32) + F.col("dst")).alias("dst_key"),
        )
    )
    return keyed.where(F.col("src_key") < F.col("dst_key"))


def triangle_count(edges: DataFrame, orient: str = "degree") -> int:
    """Global exact triangle count (wedge join formulation)."""
    return int(_wedge_closed(edges, orient).agg(F.count("*")).first()[0])


def triangles_per_vertex(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """Per-vertex triangle participation counts ``(id, triangles)``.

    Each closed wedge (u, v, w) contributes to all three corners —
    the per-task counts the reference folds into its aggregator.
    """
    closed = _wedge_closed(edges, orient)
    corners = (
        closed.select(F.col("u").alias("id"))
        .unionAll(closed.select(F.col("v").alias("id")))
        .unionAll(closed.select(F.col("w").alias("id")))
    )
    return corners.groupBy("id").agg(F.count("*").alias("triangles"))


def _wedge_closed(edges: DataFrame, orient: str) -> DataFrame:
    """Closed wedges (u, v, w): u→v, u→w, v→w all oriented edges.

    The oriented table is materialized once (localCheckpoint) — it is
    referenced three times in the wedge join and would otherwise be
    recomputed (symmetrize + degree join) per reference, turning one
    wide CPU-bound stage into a deep serial chain.
    """
    e = oriented_edges(edges, orient=orient).localCheckpoint()
    e1 = e.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("dst_key").alias("v_key"),
    )
    e2 = e.select(
        F.col("src").alias("u"),
        F.col("dst").alias("w"),
        F.col("dst_key").alias("w_key"),
    )
    wedges = e1.join(e2, on="u").where(F.col("v_key") < F.col("w_key"))
    closer = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    # The wedge set is O(Σ outdeg²) ≫ |E| — never shuffle it.  When the
    # oriented edge table fits an executor (common: orientation bounds
    # it to |E| rows of two longs), broadcast the closing side so the
    # wedge join is a map-side hash probe; beyond that fall back to a
    # shuffle join, where wedges re-use the e1/e2 partitioning on u.
    closer = gated_broadcast(closer, e.count())
    return wedges.join(closer, on=["v", "w"]).select("u", "v", "w")


def triangle_count_kernel(edges: DataFrame, orient: str = "degree") -> int:
    """Kernel variant: vectorized sorted-adjacency intersection.

    Mirrors the reference's merge-intersection compute
    (apps/trianglecount.cpp:84-111): group the oriented graph into
    per-vertex sorted adjacency arrays, join each oriented edge (u,v)
    with adj(u) and adj(v), and intersect with ``np.intersect1d``
    inside an Arrow-batched pandas UDF (both arrays pre-sorted — the
    invariant the reference maintains at parse time, :176).
    """
    e = oriented_edges(edges, orient=orient).select("src", "dst")
    adj = e.groupBy(F.col("src").alias("id")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )

    @F.pandas_udf("long")
    def intersect_size(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.int64)
        for i in range(len(a)):
            av, bv = a.iloc[i], b.iloc[i]
            if av is None or bv is None:
                out[i] = 0
            else:
                out[i] = np.intersect1d(
                    np.asarray(av, dtype=np.int64),
                    np.asarray(bv, dtype=np.int64),
                    assume_unique=True,
                ).size
        return pd.Series(out)

    joined = (
        e.join(adj.withColumnRenamed("id", "src").withColumnRenamed("nbrs", "src_nbrs"), on="src", how="left")
        .join(adj.withColumnRenamed("id", "dst").withColumnRenamed("nbrs", "dst_nbrs"), on="dst", how="left")
        .select(intersect_size("src_nbrs", "dst_nbrs").alias("tris"))
    )
    res = joined.agg(F.coalesce(F.sum("tris"), F.lit(0))).first()[0]
    return int(res)


def triad_census(edges: DataFrame, coin_salt: str = "dir") -> DataFrame:
    """1-row ``(n_triangles, n_cyclic, n_transitive)`` — the directed
    triangle census over the deterministic md5-coin orientation of the
    undirected edge table (each undirected pair gets exactly one
    direction: ``h32(salt:min:max) % 2 == 0`` means min→max — the same
    coin as the bow-tie/SCC contract views).

    Of the 8 orientations of a triangle, 2 are cycles (030C in the
    Holland–Leinhardt taxonomy) and 6 are transitive (030T); a real
    web graph is overwhelmingly transitive — the cyclic fraction is a
    cheap anomaly signal for link-exchange rings.

    Scale shape: rides the degree-oriented wedge join (the skew-robust
    enumeration), then classifies each triangle with three JVM-side
    hash bits — no extra join against a direction table, no shuffle
    beyond the triangle count itself.
    """
    from gminer_spark.functions import h32

    closed = _wedge_closed(edges, orient="degree")
    a = F.least("u", "v", "w")
    c = F.greatest("u", "v", "w")
    b = F.col("u") + F.col("v") + F.col("w") - a - c

    def fwd(x, y):  # coin says lower-id endpoint → higher-id endpoint
        return (
            h32(F.concat_ws(":", F.lit(coin_salt), x.cast("string"), y.cast("string")))
            % 2
            == 0
        )

    f_ab = fwd(a, b)
    f_ac = fwd(a, c)
    f_bc = fwd(b, c)
    cyclic = (f_ab == f_bc) & (f_ab != f_ac)
    return closed.agg(
        F.count("*").cast("long").alias("n_triangles"),
        F.sum(cyclic.cast("long")).cast("long").alias("n_cyclic"),
        F.sum((~cyclic).cast("long")).cast("long").alias("n_transitive"),
    )


def triad_census_oracle_sql(edges_cte: str, coin_salt: str = "dir") -> str:
    """DuckDB mirror: canonical triangle join + the identical coin."""
    from gminer_spark.functions import h32_sql

    def fwd(x, y):
        return (
            h32_sql(f"'{coin_salt}:' || CAST({x} AS VARCHAR) || ':' || "
                    f"CAST({y} AS VARCHAR)")
            + " % 2 = 0"
        )

    return f"""
WITH {edges_cte.strip()},
tri AS MATERIALIZED (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM edges e1
    JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
    JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
bits AS (
    SELECT ({fwd('a', 'b')}) AS f_ab,
           ({fwd('a', 'c')}) AS f_ac,
           ({fwd('b', 'c')}) AS f_bc
    FROM tri)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST(COALESCE(SUM(CASE WHEN f_ab = f_bc AND f_ab <> f_ac
                              THEN 1 END), 0) AS BIGINT) AS n_cyclic,
       CAST(COALESCE(SUM(CASE WHEN NOT (f_ab = f_bc AND f_ab <> f_ac)
                              THEN 1 END), 0) AS BIGINT) AS n_transitive
FROM bits"""
