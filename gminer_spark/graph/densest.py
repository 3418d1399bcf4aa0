"""Parallel densest-subgraph peeling — Bahmani, Kumar & Vassilvitskii,
"Densest Subgraph in Streaming and MapReduce" (PVLDB 2012).

Charikar's greedy removes ONE min-degree vertex per round (O(n)
rounds — a non-starter distributed); the parallel variant removes
EVERY vertex whose degree is at most ``thr_num`` times the current
average directed degree, which shrinks the vertex set by a constant
factor per round — O(log n) rounds — and still guarantees a
``2(1+eps)`` approximation of the maximum average-degree subgraph
(``thr_num = 2`` is eps = 1; ``thr_num = 1`` is the Charikar-exact
at-most-average threshold, more rounds).

Peel semantics (IDENTICAL in engine and oracle — every clause below
is value-checked):

  round k over survivors s_k (isolated vertices INCLUDED, degree 0):
    n_k = |s_k|, m2_k = sum of live degrees (= 2·edges inside s_k)
    if m2_k = 0: STOP — everyone left gets removal_round = k
    else remove {v : deg(v) * n_k <= thr_num * m2_k}  (exact BIGINT;
         nonempty for thr_num >= 1 — min degree <= average)
  best prefix = round r maximizing m2_r / n_r, ties to the EARLIEST
  round, compared by exact cross-products (m2_r * n_s vs m2_s * n_r).

``in_densest`` marks vertices that survived INTO the best round
(removal_round >= best round).  Products are bounded by |V|·|E| —
promote to DECIMAL(38,0) past ~1e9 vertices (structure.py
discipline; not needed at contract scale).

Spark shape: each round is one degree aggregation + one anti-join
over the flat persisted base (constant-depth plans — the SCC
trim-loop lesson: never derive round k+1's persisted table from
round k's), ONE stats action per round.  Reference analog: the
k-core peel loop (SURVEY §2.10 CD seeding, apps/community.cpp
candidate pruning) with the constant k swapped for the live average
degree.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def densest_subgraph(
    edges: DataFrame, thr_num: int = 2, max_rounds: int = 64
) -> DataFrame:
    """(id, removal_round, in_densest) over the undirected view of
    ``edges`` (module docstring for the exact peel semantics)."""
    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    base = (
        tables.symmetrize(edges).repartition(n_shuffle, "src").persist()
    )
    removed_parts: list[DataFrame] = []
    survivors = tables.plan_barrier(
        base.select(F.col("src").alias("id")).distinct()
    )
    history: list[tuple[int, int, int]] = []
    stop_round = max_rounds
    for rnd in range(max_rounds):
        live_e = base.join(
            survivors.select(F.col("id").alias("src")), on="src"
        ).join(survivors.select(F.col("id").alias("dst")), on="dst")
        deg = tables.plan_barrier(
            survivors.join(
                live_e.groupBy(F.col("src").alias("id")).agg(
                    F.count("*").cast("long").alias("d")
                ),
                on="id",
                how="left",
            ).select("id", F.coalesce("d", F.lit(0)).cast("long").alias("deg"))
        ).persist()
        stats = deg.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("deg").cast("long").alias("m2"),
        ).first()
        n_t = int(stats["n"] or 0)
        m2_t = int(stats["m2"] or 0)
        if n_t == 0:
            deg.unpersist()
            stop_round = rnd
            break
        if m2_t == 0:
            deg.unpersist()
            stop_round = rnd
            break
        history.append((rnd, n_t, m2_t))
        doomed = tables.plan_barrier(
            deg.where(
                F.col("deg") * F.lit(n_t) <= F.lit(thr_num) * F.lit(m2_t)
            ).select("id")
        ).persist()
        removed_parts.append(
            doomed.select(
                "id", F.lit(rnd).cast("long").alias("removal_round")
            )
        )
        survivors = tables.plan_barrier(
            survivors.join(doomed, on="id", how="left_anti")
        )
        deg.unpersist()
        doomed.unpersist()
    else:
        warnings.warn(
            f"densest_subgraph: max_rounds={max_rounds} hit with edges "
            "remaining — removal_round of the leftover set is a cap "
            "artifact, not a peel round",
            stacklevel=2,
        )
    best = 0
    for i in range(1, len(history)):
        _, bn, bm2 = history[best]
        _, n_t, m2_t = history[i]
        if m2_t * bn > bm2 * n_t:
            best = i
    best_round = history[best][0] if history else 0
    allv = survivors.select(
        "id", F.lit(stop_round).cast("long").alias("removal_round")
    )
    for part in removed_parts:
        allv = allv.unionByName(part)
    base.unpersist()
    return allv.select(
        "id",
        "removal_round",
        (F.col("removal_round") >= F.lit(best_round)).alias("in_densest"),
    )


def densest_subgraph_oracle_sql(
    edges_cte: str, thr_num: int = 2, rounds: int = 16, prefix: str = ""
) -> str:
    """Unrolled peel rounds over a CTE ``{prefix}edges(src, dst)``.
    ``rounds`` must cover the engine's natural stop at the contract
    scale (each round removes at least the at-most-average half, so
    depth grows ~log n; the compare fails loudly if short).  Best
    round by the same exact cross-product rule, ties earliest.
    ``prefix`` namespaces every generated CTE (and the edges
    reference) so several chains can share one WITH scope — the
    top-K iterated extraction."""
    p = prefix
    ctes = [
        f"{edges_cte.strip()}",
        f"""{p}dsym AS MATERIALIZED (
    SELECT src, dst FROM {p}edges WHERE src <> dst
    UNION
    SELECT dst, src FROM {p}edges WHERE src <> dst)""",
        f"{p}s0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM {p}dsym)",
    ]
    stat_rows = []
    rem_rows = []
    for k in range(rounds):
        ctes.append(
            f"""{p}d{k} AS MATERIALIZED (
    SELECT s.id, CAST(COALESCE(c.d, 0) AS BIGINT) AS deg
    FROM {p}s{k} s LEFT JOIN (
        SELECT e.src AS id, COUNT(*) AS d
        FROM {p}dsym e
        JOIN {p}s{k} a ON e.src = a.id
        JOIN {p}s{k} b ON e.dst = b.id
        GROUP BY e.src) c
    ON s.id = c.id)"""
        )
        ctes.append(
            f"""{p}st{k} AS MATERIALIZED (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(deg), 0) AS BIGINT) AS m2
    FROM {p}d{k})"""
        )
        ctes.append(
            f"""{p}r{k} AS MATERIALIZED (
    SELECT d.id FROM {p}d{k} d, {p}st{k} t
    WHERE t.m2 > 0 AND d.deg * t.n <= {thr_num} * t.m2)"""
        )
        ctes.append(
            f"""{p}s{k + 1} AS MATERIALIZED (
    SELECT a.id FROM {p}s{k} a
    WHERE NOT EXISTS (SELECT 1 FROM {p}r{k} r WHERE r.id = a.id))"""
        )
        stat_rows.append(
            f"SELECT {k} AS rnd, n, m2 FROM {p}st{k} WHERE m2 > 0"
        )
        rem_rows.append(
            f"SELECT id, CAST({k} AS BIGINT) AS removal_round FROM {p}r{k}"
        )
    ctes.append(
        f"{p}hist AS MATERIALIZED ("
        + "\nUNION ALL\n".join(stat_rows)
        + ")"
    )
    # natural stop round = last m2>0 round + 1 (0 when no edges at all)
    ctes.append(
        f"{p}lastr AS (SELECT COALESCE(MAX(rnd) + 1, 0) AS stopr "
        f"FROM {p}hist)"
    )
    ctes.append(
        f"""{p}bestr AS (
    SELECT COALESCE((
        SELECT rnd FROM {p}hist h
        WHERE NOT EXISTS (
            SELECT 1 FROM {p}hist o
            WHERE o.m2 * h.n > h.m2 * o.n
               OR (o.m2 * h.n = h.m2 * o.n AND o.rnd < h.rnd))
        LIMIT 1), 0) AS br)"""
    )
    ctes.append(
        f"{p}remall AS MATERIALIZED ("
        + "\nUNION ALL\n".join(rem_rows)
        + f"""
UNION ALL
SELECT s.id, CAST((SELECT stopr FROM {p}lastr) AS BIGINT) AS removal_round
FROM {p}s{rounds} s)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, removal_round,
       removal_round >= (SELECT br FROM {p}bestr) AS in_densest
FROM {p}remall"""
    )
