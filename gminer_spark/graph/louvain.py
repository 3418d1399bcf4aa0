"""Parallel modularity moves — the local-move phase of Louvain
(Blondel et al. 2008), derandomized for exact cross-engine replay.

Each round, every ACTIVE vertex evaluates moving to a neighboring
community and takes the best strictly-improving move.  Determinism
contract (every clause value-checked):

* gains are compared in EXACT integers: with m2 = Σ deg (= 2m),
  moving v (degree k) into community c scores
      score(c) = m2·e(v,c) − k·vol(c)          for c ≠ A(v)
      score(A) = m2·e(v,A) − k·(vol(A) − k)    for staying
  (the standard ΔQ multiplied through by 2m² — same argmax, no
  floats; promote to DECIMAL(38,0) past ~1e9 edges, the structure.py
  discipline);
* v moves only if the best neighboring score STRICTLY beats staying;
  ties among communities break to the smaller community label;
* parallel moves oscillate (two vertices swapping communities
  forever), so rounds alternate an md5-coin ACTIVATION PARITY —
  h32('lv:'·id) % 2 == round % 2 — the repo's derandomized-Luby
  idiom: only half the vertices may move per round, which breaks
  symmetric swaps while keeping the trajectory a pure function of
  the edge table;
* fixed round count (like the LPA contract: fixed-round is the
  reproducible semantics; convergence is a quality knob, not a
  correctness one).

Scale shape per round: one neighbor-community count (groupBy on
(v, comm)), one volume aggregate (comm-keyed), broadcast-able 1-row
m2, one max-struct argmax per vertex — all map-side combinable; state
behind plan_barrier (multi-reference rounds, the Spark-4 origin-chain
pitfall).  Reference analog: SURVEY §2.10 CD semantics with the
mode-of-labels vote swapped for a modularity-gain vote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32
from gminer_spark.graph import tables


def louvain_moves(edges: DataFrame, num_rounds: int = 4) -> DataFrame:
    """(id, community) after ``num_rounds`` parity-activated parallel
    modularity moves, starting from singletons."""
    n_shuffle = tables.shuffle_partitions(edges.sparkSession)
    sym = (
        tables.symmetrize(edges).repartition(n_shuffle, "src").persist()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("k")
    )
    m2 = int(sym.count())
    comm = tables.plan_barrier(
        deg.select("id", F.col("id").alias("community"))
    )
    for r in range(num_rounds):
        cd = comm.join(deg, on="id")
        vol = cd.groupBy("community").agg(
            F.sum("k").cast("long").alias("vol")
        )
        # e(v, c): edges from v into community c
        evc = (
            sym.join(
                comm.select(
                    F.col("id").alias("dst"), F.col("community").alias("c")
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.count("*").cast("long").alias("e"))
        )
        base = cd.select(
            "id", "k", F.col("community").alias("a")
        )
        # stay score: m2*e(v,A) - k*(vol(A)-k); e(v,A) may be 0
        stay = (
            base.join(
                evc.select(
                    "id", F.col("c").alias("a"), F.col("e").alias("ea")
                ),
                on=["id", "a"],
                how="left",
            )
            .join(
                vol.select(
                    F.col("community").alias("a"), F.col("vol").alias("va")
                ),
                on="a",
            )
            .select(
                "id",
                "k",
                "a",
                (
                    F.lit(m2) * F.coalesce("ea", F.lit(0))
                    - F.col("k") * (F.col("va") - F.col("k"))
                ).alias("stay_score"),
            )
        )
        cand = (
            evc.join(base, on="id")
            .where(F.col("c") != F.col("a"))
            .join(
                vol.select(
                    F.col("community").alias("c"), F.col("vol").alias("vc")
                ),
                on="c",
            )
            .select(
                "id",
                "c",
                (
                    F.lit(m2) * F.col("e") - F.col("k") * F.col("vc")
                ).alias("score"),
            )
        )
        # argmax by (score desc, community asc): max of (score, -c)
        best = cand.groupBy("id").agg(
            F.max(F.struct(F.col("score"), (-F.col("c")).alias("negc"))).alias(
                "b"
            )
        ).select(
            "id",
            F.col("b.score").alias("best_score"),
            (-F.col("b.negc")).alias("best_c"),
        )
        active = h32(F.concat_ws(":", F.lit("lv"), F.col("id"))) % 2 == r % 2
        comm = tables.plan_barrier(
            stay.join(best, on="id", how="left")
            .select(
                "id",
                F.when(
                    active
                    & F.col("best_score").isNotNull()
                    & (F.col("best_score") > F.col("stay_score")),
                    F.col("best_c"),
                )
                .otherwise(F.col("a"))
                .cast("long")
                .alias("community"),
            )
        )
    sym.unpersist()
    return comm


def louvain_moves_oracle_sql(edges_cte: str, num_rounds: int = 4) -> str:
    """Unrolled parity-activated modularity-move rounds — identical
    integer scores, tie rule, and md5 activation coin."""
    from gminer_spark.functions import h32_sql

    ctes = [
        edges_cte.strip(),
        """lv_sym AS MATERIALIZED (
    SELECT src, dst FROM edges WHERE src <> dst
    UNION SELECT dst AS src, src AS dst FROM edges WHERE src <> dst)""",
        """lv_deg AS MATERIALIZED (
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS k
    FROM lv_sym GROUP BY src)""",
        "lv_m2 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM lv_sym)",
        "cm0 AS MATERIALIZED (SELECT id, id AS community FROM lv_deg)",
    ]
    for r in range(num_rounds):
        coin = h32_sql("'lv:' || CAST(s.id AS VARCHAR)")
        ctes.append(
            f"""vol{r} AS MATERIALIZED (
    SELECT c.community, CAST(SUM(d.k) AS BIGINT) AS vol
    FROM cm{r} c JOIN lv_deg d ON d.id = c.id
    GROUP BY c.community)"""
        )
        ctes.append(
            f"""evc{r} AS MATERIALIZED (
    SELECT e.src AS id, c.community AS c, CAST(COUNT(*) AS BIGINT) AS e
    FROM lv_sym e JOIN cm{r} c ON c.id = e.dst
    GROUP BY e.src, c.community)"""
        )
        ctes.append(
            f"""stay{r} AS MATERIALIZED (
    SELECT b.id, d.k, b.community AS a,
           (SELECT m2 FROM lv_m2) * COALESCE(ev.e, 0)
             - d.k * (v.vol - d.k) AS stay_score
    FROM cm{r} b
    JOIN lv_deg d ON d.id = b.id
    LEFT JOIN evc{r} ev ON ev.id = b.id AND ev.c = b.community
    JOIN vol{r} v ON v.community = b.community)"""
        )
        ctes.append(
            f"""best{r} AS MATERIALIZED (
    SELECT id, score AS best_score, c AS best_c FROM (
        SELECT ev.id, ev.c,
               (SELECT m2 FROM lv_m2) * ev.e - d.k * v.vol AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY ev.id
                   ORDER BY (SELECT m2 FROM lv_m2) * ev.e - d.k * v.vol
                            DESC, ev.c ASC) AS rn
        FROM evc{r} ev
        JOIN cm{r} b ON b.id = ev.id AND ev.c <> b.community
        JOIN lv_deg d ON d.id = ev.id
        JOIN vol{r} v ON v.community = ev.c)
    WHERE rn = 1)"""
        )
        ctes.append(
            f"""cm{r + 1} AS MATERIALIZED (
    SELECT s.id,
           CASE WHEN ({coin}) % 2 = {r % 2}
                 AND b.best_score IS NOT NULL
                 AND b.best_score > s.stay_score
                THEN b.best_c ELSE s.a END AS community
    FROM stay{r} s LEFT JOIN best{r} b ON b.id = s.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, CAST(community AS BIGINT) AS community FROM cm{num_rounds}"
    )
