"""Deterministic degree-preserving rewiring + normalized rich club.

The raw rich-club curve φ(k) (structure.py) rises on ANY graph with a
heavy degree tail — the publishable diagnostic is the NORMALIZED
curve ρ(k) = φ(k)/φ_null(k), where φ_null comes from a
degree-preserving null model (double-edge swaps; Colizza et al.,
"Detecting rich-club ordering in complex networks", Nat. Phys. 2006).

The null model here is a *derandomized* parallel double-edge swap in
the repo's md5 idiom (the same trick as the derandomized Luby MIS):

per round r over the canonical (src<dst) simple edge set
  1. key every edge with h32('swap:r:src:dst'); bucket by key % B
  2. rank within bucket by (key, src, dst); pair rank 2i−1 with 2i
  3. a pair ((a,b),(c,d)) proposes (a,d) and (c,b) (canonicalized);
     the swap is accepted atomically iff neither proposal is a
     self-loop, the two proposals differ, neither already exists in
     the edge set, and neither collides with ANY other pair's
     proposal this round (global proposal count = 1)
  4. E ← E − {(a,b),(c,d)} ∪ {(a,d),(c,b)} over accepted pairs

Every step is a pure function of (edge table, round index), so the
whole chain unrolls into DuckDB CTEs for an exact value oracle, and
each per-vertex degree is preserved EXACTLY (swap trades neighbor b↔d
between a and c) — pytest-asserted.

Scale posture: the ranking window is PARTITIONED BY BUCKET (never a
global row_number); membership and collision checks are equi-joins on
(src, dst); each round is a constant number of shuffles on the edge
key.  Skew-free by construction — bucket populations are md5-uniform.

Reference anchor: GMiner has no null-model generator; this extends
the φ(k) analysis (structure.py cites /root/reference/core/task.hpp
aggregation) with the statistical control its output needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gminer_spark.functions import h32, h32_sql
from gminer_spark.graph import tables


def _canonical_simple(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def degree_preserving_rewire(
    edges: DataFrame, rounds: int = 3, n_buckets: int = 64
) -> DataFrame:
    """Canonical (src<dst) rewired edge set after ``rounds`` parallel
    double-edge-swap rounds; per-vertex degrees preserved exactly."""
    spark = edges.sparkSession
    nshuf = tables.shuffle_partitions(spark)
    cur = tables.plan_barrier(
        _canonical_simple(edges).repartition(nshuf, "src", "dst")
    )
    for r in range(rounds):
        key = h32(
            F.concat_ws(
                ":", F.lit("swap"), F.lit(str(r)), F.col("src"), F.col("dst")
            )
        )
        keyed = cur.select("src", "dst", key.alias("hk")).withColumn(
            "bkt", F.col("hk") % n_buckets
        )
        w = Window.partitionBy("bkt").orderBy("hk", "src", "dst")
        ranked = keyed.withColumn("rn", F.row_number().over(w))
        pairs = (
            ranked.groupBy(
                "bkt", ((F.col("rn") - 1) - (F.col("rn") - 1) % 2).alias("pid")
            )
            .agg(
                F.count("*").alias("cnt"),
                F.max(F.when(F.col("rn") % 2 == 1, F.col("src"))).alias("a"),
                F.max(F.when(F.col("rn") % 2 == 1, F.col("dst"))).alias("b"),
                F.max(F.when(F.col("rn") % 2 == 0, F.col("src"))).alias("c"),
                F.max(F.when(F.col("rn") % 2 == 0, F.col("dst"))).alias("d"),
            )
            .where(F.col("cnt") == 2)
        )
        prop = pairs.select(
            "bkt",
            "pid",
            "a",
            "b",
            "c",
            "d",
            F.least("a", "d").alias("n1s"),
            F.greatest("a", "d").alias("n1d"),
            F.least("c", "b").alias("n2s"),
            F.greatest("c", "b").alias("n2d"),
        ).where(
            (F.col("a") != F.col("d"))
            & (F.col("c") != F.col("b"))
            & ~(
                (F.col("n1s") == F.col("n2s")) & (F.col("n1d") == F.col("n2d"))
            )
        )
        pe = prop.select(
            F.col("n1s").alias("src"), F.col("n1d").alias("dst")
        ).unionAll(prop.select(F.col("n2s").alias("src"), F.col("n2d").alias("dst")))
        pc = pe.groupBy("src", "dst").agg(F.count("*").alias("pcnt"))
        uniq = pc.where(F.col("pcnt") == 1).select("src", "dst")
        # a proposal survives iff globally unique AND absent from E_r
        free = uniq.join(cur, on=["src", "dst"], how="left_anti")
        acc = (
            prop.join(
                free.select(
                    F.col("src").alias("n1s"), F.col("dst").alias("n1d")
                ),
                on=["n1s", "n1d"],
                how="left_semi",
            )
            .join(
                free.select(
                    F.col("src").alias("n2s"), F.col("dst").alias("n2d")
                ),
                on=["n2s", "n2d"],
                how="left_semi",
            )
        )
        removed = acc.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
            acc.select(F.col("c").alias("src"), F.col("d").alias("dst"))
        )
        added = acc.select(F.col("n1s").alias("src"), F.col("n1d").alias("dst")).unionAll(
            acc.select(F.col("n2s").alias("src"), F.col("n2d").alias("dst"))
        )
        nxt = cur.join(removed, on=["src", "dst"], how="left_anti").unionByName(
            added
        )
        # multi-ref state (cur appears in pairs, membership, and the
        # rebuild) — plan_barrier per round, the Spark-4 origin-chain rule
        cur = tables.plan_barrier(nxt.repartition(nshuf, "src", "dst"))
    return cur


def rewire_cte_chain(edges_cte: str, rounds: int, n_buckets: int) -> str:
    """Unrolled DuckDB CTE chain: ``{edges_cte}`` → final CTE ``rew``
    (canonical rewired edges).  Pure function of the edge table —
    bit-identical to :func:`degree_preserving_rewire`."""
    ctes = [
        edges_cte.strip(),
        """e0 AS MATERIALIZED (
    SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
    FROM edges WHERE src <> dst GROUP BY 1, 2)""",
    ]
    for r in range(rounds):
        hk = h32_sql(
            f"'swap:{r}:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)"
        )
        ctes.append(
            f"""rn{r} AS MATERIALIZED (
    SELECT src, dst, hk, bkt,
           ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY hk, src, dst) AS rn
    FROM (SELECT src, dst, {hk} AS hk, {hk} % {n_buckets} AS bkt FROM e{r})),
pr{r} AS MATERIALIZED (
    SELECT bkt, (rn - 1) - (rn - 1) % 2 AS pid, COUNT(*) AS cnt,
           MAX(CASE WHEN rn % 2 = 1 THEN src END) AS a,
           MAX(CASE WHEN rn % 2 = 1 THEN dst END) AS b,
           MAX(CASE WHEN rn % 2 = 0 THEN src END) AS c,
           MAX(CASE WHEN rn % 2 = 0 THEN dst END) AS d
    FROM rn{r} GROUP BY 1, 2),
prop{r} AS MATERIALIZED (
    SELECT bkt, pid, a, b, c, d,
           LEAST(a, d) AS n1s, GREATEST(a, d) AS n1d,
           LEAST(c, b) AS n2s, GREATEST(c, b) AS n2d
    FROM pr{r}
    WHERE cnt = 2 AND a <> d AND c <> b
      AND NOT (LEAST(a, d) = LEAST(c, b) AND GREATEST(a, d) = GREATEST(c, b))),
pc{r} AS MATERIALIZED (
    SELECT src, dst, COUNT(*) AS pcnt FROM (
        SELECT n1s AS src, n1d AS dst FROM prop{r}
        UNION ALL SELECT n2s, n2d FROM prop{r})
    GROUP BY 1, 2),
free{r} AS MATERIALIZED (
    SELECT p.src, p.dst FROM pc{r} p
    WHERE p.pcnt = 1
      AND NOT EXISTS (SELECT 1 FROM e{r} x
                      WHERE x.src = p.src AND x.dst = p.dst)),
acc{r} AS MATERIALIZED (
    SELECT p.* FROM prop{r} p
    WHERE EXISTS (SELECT 1 FROM free{r} f
                  WHERE f.src = p.n1s AND f.dst = p.n1d)
      AND EXISTS (SELECT 1 FROM free{r} f
                  WHERE f.src = p.n2s AND f.dst = p.n2d)),
e{r + 1} AS MATERIALIZED (
    SELECT src, dst FROM e{r}
    ANTI JOIN (SELECT a AS src, b AS dst FROM acc{r}
               UNION ALL SELECT c, d FROM acc{r}) USING (src, dst)
    UNION ALL
    SELECT n1s, n1d FROM acc{r}
    UNION ALL SELECT n2s, n2d FROM acc{r})"""
        )
    ctes.append(f"rew AS MATERIALIZED (SELECT src, dst FROM e{rounds})")
    return ",\n".join(ctes)


def rich_club_normalized(
    edges: DataFrame, rounds: int = 3, n_buckets: int = 64
) -> DataFrame:
    """(k, n_nodes, n_edges, null_edges, phi_micro, phi_null_micro,
    rho_milli): ρ(k) = φ(k)/φ_null(k), milli-rounded (ratio of two
    micro-rounded doubles would compound rounding; instead both φ are
    micro-rounded for display and ρ is computed from the EXACT integer
    edge counts — the node counts cancel since the degree sequence is
    preserved, so ρ(k) = E(k)/E_null(k) exactly)."""
    from gminer_spark.graph.structure import rich_club

    real = rich_club(edges)
    null = rich_club(degree_preserving_rewire(edges, rounds, n_buckets)).select(
        "k",
        F.col("n_edges").alias("null_edges"),
        F.col("phi_micro").alias("phi_null_micro"),
    )
    return (
        real.join(null, on="k")
        .where(F.col("null_edges") > 0)
        .select(
            "k",
            "n_nodes",
            "n_edges",
            "null_edges",
            "phi_micro",
            "phi_null_micro",
            F.round(
                F.col("n_edges").cast("double")
                / F.col("null_edges").cast("double")
                * 1e3,
                0,
            )
            .cast("long")
            .alias("rho_milli"),
        )
    )


def rich_club_normalized_oracle_sql(
    edges_cte: str, rounds: int = 3, n_buckets: int = 64
) -> str:
    """Unrolled swap chain + two suffix-window curves (real over
    ``edges``, null over ``rew``) sharing the degree histogram (the
    degree sequence is swap-invariant)."""
    chain = rewire_cte_chain(edges_cte, rounds, n_buckets)
    return f"""
WITH {chain},
sym AS MATERIALIZED (
    SELECT src, dst FROM edges WHERE src <> dst
    UNION SELECT dst, src FROM edges WHERE src <> dst),
deg AS MATERIALIZED (
    SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
dh AS MATERIALIZED (SELECT deg, COUNT(*) AS n FROM deg GROUP BY deg),
nodes AS MATERIALIZED (
    SELECT deg,
           SUM(n) OVER (ORDER BY deg DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n AS n_above
    FROM dh),
ehr AS MATERIALIZED (
    SELECT LEAST(da.deg, db.deg) AS mdeg, COUNT(*) AS m
    FROM (SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
          FROM sym WHERE src < dst) e
    JOIN deg da ON da.id = e.src JOIN deg db ON db.id = e.dst
    GROUP BY 1),
symn AS MATERIALIZED (
    SELECT src, dst FROM rew UNION SELECT dst, src FROM rew),
degn AS MATERIALIZED (
    SELECT src AS id, COUNT(*) AS deg FROM symn GROUP BY src),
dhn AS MATERIALIZED (SELECT deg, COUNT(*) AS n FROM degn GROUP BY deg),
nodesn AS MATERIALIZED (
    SELECT deg,
           SUM(n) OVER (ORDER BY deg DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n AS n_above
    FROM dhn),
ehn AS MATERIALIZED (
    SELECT LEAST(da.deg, db.deg) AS mdeg, COUNT(*) AS m
    FROM rew e JOIN degn da ON da.id = e.src JOIN degn db ON db.id = e.dst
    GROUP BY 1),
ear AS MATERIALIZED (
    SELECT k, SUM(m) OVER (ORDER BY k DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - m AS e_above
    FROM (SELECT d.deg AS k, COALESCE(e.m, 0) AS m
          FROM dh d LEFT JOIN ehr e ON e.mdeg = d.deg)),
ean AS MATERIALIZED (
    SELECT k, SUM(m) OVER (ORDER BY k DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - m AS e_above
    FROM (SELECT d.deg AS k, COALESCE(e.m, 0) AS m
          FROM dh d LEFT JOIN ehn e ON e.mdeg = d.deg))
SELECT n.deg AS k, CAST(n.n_above AS BIGINT) AS n_nodes,
       CAST(COALESCE(r.e_above, 0) AS BIGINT) AS n_edges,
       CAST(COALESCE(u.e_above, 0) AS BIGINT) AS null_edges,
       CAST(ROUND(CAST(2 AS DOUBLE) * COALESCE(r.e_above, 0)
                  / (n.n_above * (n.n_above - 1)) * 1e6) AS BIGINT) AS phi_micro,
       CAST(ROUND(CAST(2 AS DOUBLE) * COALESCE(u.e_above, 0)
                  / (n.n_above * (n.n_above - 1)) * 1e6) AS BIGINT) AS phi_null_micro,
       CAST(ROUND(CAST(COALESCE(r.e_above, 0) AS DOUBLE)
                  / CAST(u.e_above AS DOUBLE) * 1e3) AS BIGINT) AS rho_milli
FROM nodes n
LEFT JOIN ear r ON r.k = n.deg
LEFT JOIN ean u ON u.k = n.deg
WHERE n.n_above >= 2 AND COALESCE(u.e_above, 0) > 0"""
