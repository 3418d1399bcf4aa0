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


def louvain_moves_weighted(
    wedges: DataFrame, num_rounds: int = 4, salt: str = "lv"
) -> DataFrame:
    """Weighted variant of :func:`louvain_moves` over
    ``wedges(src, dst, w)`` — canonical rows, SELF-LOOPS allowed
    (src = dst): a self-loop of weight w adds 2w to its vertex's
    degree and volume but never to any e(v, c) — exactly the shape
    the Louvain aggregation phase produces (intra-community mass
    becomes a supernode self-loop).  Same integer scores, tie rule,
    and parity coin (salted by ``salt`` so each level draws an
    independent activation sequence)."""
    n_shuffle = tables.shuffle_partitions(wedges.sparkSession)
    base = wedges.select(
        "src", "dst", F.col("w").cast("long").alias("w")
    )
    nonself = base.where(F.col("src") != F.col("dst"))
    sym = (
        nonself.unionByName(
            nonself.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("w"))
        .repartition(n_shuffle, "src")
        .persist()
    )
    selfw = (
        base.where(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").cast("long").alias("sw"))
    )
    verts = (
        base.select(F.col("src").alias("id"))
        .union(base.select(F.col("dst").alias("id")))
        .distinct()
    )
    nsdeg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").cast("long").alias("nk")
    )
    deg = (
        verts.join(nsdeg, on="id", how="left")
        .join(selfw, on="id", how="left")
        .select(
            "id",
            (
                F.coalesce("nk", F.lit(0))
                + 2 * F.coalesce("sw", F.lit(0))
            ).cast("long").alias("k"),
        )
    )
    m2 = int(deg.agg(F.sum("k")).first()[0] or 0)
    comm = tables.plan_barrier(
        deg.select("id", F.col("id").alias("community"))
    )
    for r in range(num_rounds):
        cd = comm.join(deg, on="id")
        vol = cd.groupBy("community").agg(
            F.sum("k").cast("long").alias("vol")
        )
        evc = (
            sym.join(
                comm.select(
                    F.col("id").alias("dst"), F.col("community").alias("c")
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("w").cast("long").alias("e"))
        )
        base_r = cd.select("id", "k", F.col("community").alias("a"))
        stay = (
            base_r.join(
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
            evc.join(base_r, on="id")
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
        best = cand.groupBy("id").agg(
            F.max(
                F.struct(F.col("score"), (-F.col("c")).alias("negc"))
            ).alias("b")
        ).select(
            "id",
            F.col("b.score").alias("best_score"),
            (-F.col("b.negc")).alias("best_c"),
        )
        active = (
            h32(F.concat_ws(":", F.lit(salt), F.col("id"))) % 2 == r % 2
        )
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


def louvain_two_level(
    edges: DataFrame, rounds1: int = 4, rounds2: int = 4
) -> DataFrame:
    """FULL two-phase Louvain: level-1 local moves from singletons,
    aggregation into the weighted quotient (intra-community edges →
    supernode self-loops), level-2 weighted moves on the quotient
    (independent parity salt 'lv2'), labels projected back —
    (id, community) with community a level-2 label.

    Composes three value-green pieces: :func:`louvain_moves`, the
    quotient construction of :mod:`gminer_spark.graph.quotient`, and
    :func:`louvain_moves_weighted` — the aggregation phase that makes
    Louvain *Louvain* rather than a single local-move sweep."""
    l1 = louvain_moves(edges, num_rounds=rounds1)
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    q = (
        canon.join(
            l1.select(F.col("id").alias("src"), F.col("community").alias("lu")),
            on="src",
        )
        .join(
            l1.select(F.col("id").alias("dst"), F.col("community").alias("lv")),
            on="dst",
        )
        .groupBy(
            F.least("lu", "lv").alias("src"),
            F.greatest("lu", "lv").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    l2 = louvain_moves_weighted(q, num_rounds=rounds2, salt="lv2")
    return l1.select(
        "id", F.col("community").alias("c1")
    ).join(
        l2.select(F.col("id").alias("c1"), F.col("community").alias("community")),
        on="c1",
    ).select("id", "community")


def louvain_two_level_oracle_sql(
    edges_cte: str, rounds1: int = 4, rounds2: int = 4
) -> str:
    """Composed oracle: the unrolled level-1 rounds (reused from
    :func:`louvain_moves_oracle_sql`), the weighted quotient with
    supernode self-loops, unrolled weighted level-2 rounds (salt
    'lv2'), and the label projection."""
    from gminer_spark.functions import h32_sql

    l1 = louvain_moves_oracle_sql(edges_cte, num_rounds=rounds1)
    body, sep, _tail = l1.rpartition("\nSELECT id, CAST(community")
    assert sep, "unexpected level-1 oracle shape"
    l1_ctes = body[len("WITH "):]

    ctes = [
        l1_ctes,
        """w_qcanon AS MATERIALIZED (
    SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
    FROM edges WHERE src <> dst
    GROUP BY 1, 2)""",
        f"""w_canon AS MATERIALIZED (
    SELECT LEAST(lu.community, lv.community) AS src,
           GREATEST(lu.community, lv.community) AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM w_qcanon c
    JOIN cm{rounds1} lu ON lu.id = c.src
    JOIN cm{rounds1} lv ON lv.id = c.dst
    GROUP BY 1, 2)""",
        """w_sym AS MATERIALIZED (
    SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT src, dst, w FROM w_canon WHERE src <> dst
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM w_canon WHERE src <> dst)
    GROUP BY 1, 2)""",
        """w_self AS MATERIALIZED (
    SELECT src AS id, CAST(SUM(w) AS BIGINT) AS sw
    FROM w_canon WHERE src = dst GROUP BY 1)""",
        """w_verts AS MATERIALIZED (
    SELECT DISTINCT src AS id FROM w_canon
    UNION SELECT dst FROM w_canon)""",
        """w_deg AS MATERIALIZED (
    SELECT v.id,
           CAST(COALESCE(n.nk, 0) + 2 * COALESCE(s.sw, 0) AS BIGINT) AS k
    FROM w_verts v
    LEFT JOIN (SELECT src AS id, SUM(w) AS nk FROM w_sym GROUP BY 1) n
        ON n.id = v.id
    LEFT JOIN w_self s ON s.id = v.id)""",
        "w_m2 AS MATERIALIZED (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM w_deg)",
        "wm0 AS MATERIALIZED (SELECT id, id AS community FROM w_deg)",
    ]
    for r in range(rounds2):
        coin = h32_sql("'lv2:' || CAST(s.id AS VARCHAR)")
        ctes.append(
            f"""wvol{r} AS MATERIALIZED (
    SELECT c.community, CAST(SUM(d.k) AS BIGINT) AS vol
    FROM wm{r} c JOIN w_deg d ON d.id = c.id
    GROUP BY c.community)"""
        )
        ctes.append(
            f"""wevc{r} AS MATERIALIZED (
    SELECT e.src AS id, c.community AS c, CAST(SUM(e.w) AS BIGINT) AS e
    FROM w_sym e JOIN wm{r} c ON c.id = e.dst
    GROUP BY e.src, c.community)"""
        )
        ctes.append(
            f"""wstay{r} AS MATERIALIZED (
    SELECT b.id, d.k, b.community AS a,
           (SELECT m2 FROM w_m2) * COALESCE(ev.e, 0)
             - d.k * (v.vol - d.k) AS stay_score
    FROM wm{r} b
    JOIN w_deg d ON d.id = b.id
    LEFT JOIN wevc{r} ev ON ev.id = b.id AND ev.c = b.community
    JOIN wvol{r} v ON v.community = b.community)"""
        )
        ctes.append(
            f"""wbest{r} AS MATERIALIZED (
    SELECT id, score AS best_score, c AS best_c FROM (
        SELECT ev.id, ev.c,
               (SELECT m2 FROM w_m2) * ev.e - d.k * v.vol AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY ev.id
                   ORDER BY (SELECT m2 FROM w_m2) * ev.e - d.k * v.vol
                            DESC, ev.c ASC) AS rn
        FROM wevc{r} ev
        JOIN wm{r} b ON b.id = ev.id AND ev.c <> b.community
        JOIN w_deg d ON d.id = ev.id
        JOIN wvol{r} v ON v.community = ev.c)
    WHERE rn = 1)"""
        )
        ctes.append(
            f"""wm{r + 1} AS MATERIALIZED (
    SELECT s.id,
           CASE WHEN ({coin}) % 2 = {r % 2}
                 AND b.best_score IS NOT NULL
                 AND b.best_score > s.stay_score
                THEN b.best_c ELSE s.a END AS community
    FROM wstay{r} s LEFT JOIN wbest{r} b ON b.id = s.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT c1.id, CAST(l2.community AS BIGINT) AS community
FROM cm{rounds1} c1 JOIN wm{rounds2} l2 ON l2.id = c1.community"""
    )
