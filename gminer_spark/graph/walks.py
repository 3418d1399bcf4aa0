"""Deterministic random-walk sampling (DeepWalk-style corpus).

Training-data op: random-walk corpora feed graph-embedding trainers
(DeepWalk / node2vec), the graph analog of the text pipeline's token
streams.  The walk transition reuses the engine's cross-engine hash
idiom (gminer_spark.functions.h32, the md5-derived analog of the
reference's modular hashing, /root/reference/util/minhash.cpp:30-45):
at step t the walk at vertex v moves to neighbor with index

    h32("{seed}:{start}:{walk}:{t}:{v}") mod deg(v)

over the dst-sorted adjacency — fully deterministic, identical across
engines and partitionings, yet hash-uniform like a seeded RNG.

Spark shape: the indexed adjacency (src, dst, rn, deg) is built once
(one window over the neighbor sort) and persisted; each step is ONE
equi-join on the current vertex with the rn filter applied inside the
join — walk state never leaves the cluster, lineage truncated per
step.  At 100 TB the walk table is (|V| × walks) rows per step,
hash-partitioned on the current vertex like every other frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gminer_spark.functions import h32
from gminer_spark.graph import tables


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_vertex: int = 1,
    seed: str = "w",
    starts: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(start, walk, step, vertex) — deterministic walks over the
    undirected view; one walk row per step 0..walk_len.

    ``starts`` optionally restricts the start set (default: every
    vertex).  Walks never terminate early (the symmetrized view has
    no degree-0 vertices).

    ``weight_col`` names a POSITIVE INTEGER edge weight: transition
    probability becomes ∝ w.  The draw stays exact — the hash value
    is reduced modulo the vertex's total strength and the neighbor
    whose cumulative-weight interval [lo, hi) contains it is taken —
    so weighted walks keep the bit-identical cross-engine oracle
    (floating cumulative thresholds would not).
    """
    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    if weight_col is not None:
        fwd = edges.select(
            "src", "dst", F.col(weight_col).cast("long").alias("w")
        )
        rev = fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
        sym = fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()
        w_ord = Window.partitionBy("src").orderBy("dst")
        cum = (
            F.sum("w")
            .over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
        )
        adj = (
            sym.select(
                "src",
                "dst",
                F.coalesce(cum, F.lit(0)).alias("lo"),
                "w",
                F.sum("w").over(Window.partitionBy("src")).alias("deg"),
            )
            .select("src", "dst", "lo", (F.col("lo") + F.col("w")).alias("hi"), "deg")
            .repartition(n_shuffle, "src")
            .persist()
        )
    else:
        sym = tables.symmetrize(edges)
        w = Window.partitionBy("src").orderBy("dst")
        adj = (
            sym.select(
                "src",
                "dst",
                (F.row_number().over(w) - 1).alias("rn"),
                F.count("*").over(Window.partitionBy("src")).alias("deg"),
            )
            .repartition(n_shuffle, "src")
            .persist()
        )
    adj.count()

    verts = tables.vertices(sym)
    if starts is not None:
        verts = verts.join(
            starts.select(F.col("id").cast("long").alias("id")).distinct(), on="id"
        )
    pos = verts.select(
        F.col("id").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
        F.col("id").alias("vertex"),
    ).localCheckpoint()
    out = [pos.select("start", "walk", F.lit(0).alias("step"), "vertex")]
    for t in range(1, walk_len + 1):
        key = F.concat_ws(
            ":",
            F.lit(seed),
            F.col("start"),
            F.col("walk"),
            F.lit(t),
            F.col("vertex"),
        )
        if weight_col is not None:
            draw = h32(key) % adj.deg
            cond = (
                (pos.vertex == adj.src)
                & (draw >= F.col("lo"))
                & (draw < F.col("hi"))
            )
        else:
            cond = (pos.vertex == adj.src) & (adj.rn == h32(key) % adj.deg)
        stepped = (
            pos.join(adj, cond)
            .select("start", "walk", F.col("dst").alias("vertex"))
            .localCheckpoint()
        )
        out.append(stepped.select("start", "walk", F.lit(t).alias("step"), "vertex"))
        pos = stepped
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    adj.unpersist()
    return result


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) training pairs from a walk corpus — the
    DeepWalk skip-gram window, as one self-join per corpus.

    Pairs are emitted for 0 < |Δstep| <= window within the same
    (start, walk); both directions (skip-gram is symmetric).  The join
    key is the walk id, so the shuffle is corpus-partitioned and the
    per-key fan-out is bounded by walk_len² — constant, not data-skew
    prone.
    """
    a = walks.select(
        F.col("start"), F.col("walk"), F.col("step").alias("sa"),
        F.col("vertex").alias("center"),
    )
    b = walks.select(
        F.col("start"), F.col("walk"), F.col("step").alias("sb"),
        F.col("vertex").alias("context"),
    )
    return (
        a.join(b, on=["start", "walk"])
        .where(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .select("center", "context")
    )


def random_walks_oracle_sql(
    edges_cte: str,
    walk_len: int,
    walks_per_vertex: int,
    seed: str = "w",
) -> str:
    """Unrolled walk steps as a CTE chain; the per-step transition is
    the same md5-derived index both engines compute bit-identically."""
    from gminer_spark.functions import h32_sql

    ctes = [
        f"{edges_cte.strip()}",
        """sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION SELECT dst AS src, src AS dst FROM edges)""",
        """adj AS MATERIALIZED (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn,
           COUNT(*) OVER (PARTITION BY src) AS deg
    FROM sym)""",
        f"""w0 AS MATERIALIZED (
    SELECT id AS start, wk AS walk, id AS vertex
    FROM (SELECT DISTINCT src AS id FROM sym)
    CROSS JOIN (SELECT UNNEST(range({walks_per_vertex})) AS wk))""",
    ]
    for t in range(1, walk_len + 1):
        key = (
            f"'{seed}:' || CAST(p.start AS VARCHAR) || ':' || "
            f"CAST(p.walk AS VARCHAR) || ':{t}:' || CAST(p.vertex AS VARCHAR)"
        )
        ctes.append(
            f"""w{t} AS MATERIALIZED (
    SELECT p.start, p.walk, a.dst AS vertex
    FROM w{t - 1} p JOIN adj a
      ON a.src = p.vertex
     AND a.rn = {h32_sql(key)} % a.deg)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT start, walk, CAST({t} AS BIGINT) AS step, vertex FROM w{t}"
        for t in range(walk_len + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def weighted_walks_oracle_sql(
    wedges_cte: str,
    walk_len: int,
    walks_per_vertex: int,
    seed: str = "w",
) -> str:
    """Unrolled WEIGHTED walks: ``wedges_cte`` defines
    ``wedges(src, dst, w)`` with positive integer weights; the draw is
    ``h32(key) mod strength`` landing in a cumulative-weight interval
    — all-integer, bit-identical across engines."""
    from gminer_spark.functions import h32_sql

    ctes = [
        f"{wedges_cte.strip()}",
        """wsym AS MATERIALIZED (
    SELECT src, dst, w FROM wedges
    UNION SELECT dst AS src, src AS dst, w FROM wedges)""",
        """adj AS MATERIALIZED (
    SELECT src, dst,
           COALESCE(SUM(w) OVER (PARTITION BY src ORDER BY dst
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
           COALESCE(SUM(w) OVER (PARTITION BY src ORDER BY dst
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w AS hi,
           SUM(w) OVER (PARTITION BY src) AS deg
    FROM wsym)""",
        f"""w0 AS MATERIALIZED (
    SELECT id AS start, wk AS walk, id AS vertex
    FROM (SELECT DISTINCT src AS id FROM wsym)
    CROSS JOIN (SELECT UNNEST(range({walks_per_vertex})) AS wk))""",
    ]
    for t in range(1, walk_len + 1):
        key = (
            f"'{seed}:' || CAST(p.start AS VARCHAR) || ':' || "
            f"CAST(p.walk AS VARCHAR) || ':{t}:' || CAST(p.vertex AS VARCHAR)"
        )
        draw = f"({h32_sql(key)} % a.deg)"
        ctes.append(
            f"""w{t} AS MATERIALIZED (
    SELECT p.start, p.walk, a.dst AS vertex
    FROM w{t - 1} p JOIN adj a
      ON a.src = p.vertex
     AND {draw} >= a.lo AND {draw} < a.hi)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT start, walk, CAST({t} AS BIGINT) AS step, vertex FROM w{t}"
        for t in range(walk_len + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def skipgram_pairs_oracle_sql(
    edges_cte: str,
    walk_len: int,
    walks_per_vertex: int,
    window: int = 2,
    seed: str = "w",
) -> str:
    """Skip-gram pair counts over the unrolled walk corpus."""
    base = random_walks_oracle_sql(edges_cte, walk_len, walks_per_vertex, seed)
    ctes, _, selects = base.partition("\nSELECT start")
    selects = "SELECT start" + selects
    return f"""{ctes},
corpus AS MATERIALIZED (
{selects}
)
SELECT a.vertex AS center, b.vertex AS context,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM corpus a JOIN corpus b
  ON a.start = b.start AND a.walk = b.walk
WHERE a.step <> b.step AND ABS(a.step - b.step) <= {window}
GROUP BY 1, 2"""
