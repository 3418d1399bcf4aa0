"""SALSA hubs & authorities (Lempel & Moran 2000) — power iteration.

The third classic link-analysis fixpoint next to PageRank and HITS:
the stationary distribution of a two-step random walk on the
hub/authority bipartite view of the directed edge table,

    auth(j) = Σ_{i→j} hub(i)  / out_deg(i)
    hub(i)  = Σ_{i→j} auth(j) / in_deg(j)

i.e. HITS with DEGREE-NORMALIZED contributions (the mutual-
reinforcement matrix becomes stochastic, which is what makes SALSA
robust to the tightly-knit-community effect that inflates HITS
scores).  Each vector is L1-normalized per half-step exactly like
:mod:`gminer_spark.graph.hits`, so dangling mass (hubs with no
out-edges / authorities with no in-edges) is redistributed
proportionally instead of leaking.

Spark shape — identical scale posture to HITS/PageRank: the degree
table is computed ONCE and joined into each half-step; every
half-step is one equi-join of the persisted edge table against the
state (map-side partial sums), the L1 normalizer rides the plan as a
broadcast 1-row aggregate, and the iteration ends in ONE
``plan_barrier`` action (the multi-reference state shape that melts
``localCheckpoint`` into a 2^rounds origin tree, see
tables.plan_barrier).

Reference analog: the BVertex::compute superstep loop
(core/bvertex.hpp, apps/pagerank.cpp:18-52) — per-superstep keyed
message sum + combiner; SALSA swaps the rank expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def salsa(edges: DataFrame, num_iter: int = 10) -> DataFrame:
    """(id, hub, auth) after ``num_iter`` degree-normalized,
    L1-renormalized iterations over the directed edge table."""
    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(n_shuffle, "src")
        .persist()
    )
    verts = tables.vertices(e)
    out_deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("out_deg")
    )
    in_deg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").cast("double").alias("in_deg")
    )
    deg = tables.plan_barrier(
        verts.join(out_deg, on="id", how="left")
        .join(in_deg, on="id", how="left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0.0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0.0)).alias("in_deg"),
        )
    ).persist()
    state = tables.plan_barrier(
        verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    )
    for _ in range(num_iter):
        auth_raw = (
            e.join(
                state.join(deg.select("id", "out_deg"), on="id").select(
                    F.col("id").alias("src"),
                    (F.col("hub") / F.col("out_deg")).alias("contrib"),
                ),
                on="src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("a_raw"))
        )
        a_sum = auth_raw.agg(
            F.coalesce(F.nullif(F.sum("a_raw"), F.lit(0.0)), F.lit(1.0)).alias(
                "_asum"
            )
        )
        a_state = (
            state.select("id", "hub")
            .join(auth_raw, on="id", how="left")
            .crossJoin(F.broadcast(a_sum))
            .select(
                "id",
                "hub",
                (F.coalesce("a_raw", F.lit(0.0)) / F.col("_asum")).alias(
                    "auth"
                ),
            )
        )
        hub_raw = (
            e.join(
                a_state.join(deg.select("id", "in_deg"), on="id").select(
                    F.col("id").alias("dst"),
                    (F.col("auth") / F.col("in_deg")).alias("contrib"),
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("contrib").alias("h_raw"))
        )
        h_sum = hub_raw.agg(
            F.coalesce(F.nullif(F.sum("h_raw"), F.lit(0.0)), F.lit(1.0)).alias(
                "_hsum"
            )
        )
        state = tables.plan_barrier(
            a_state.select("id", "auth")
            .join(hub_raw, on="id", how="left")
            .crossJoin(F.broadcast(h_sum))
            .select(
                "id",
                (F.coalesce("h_raw", F.lit(0.0)) / F.col("_hsum")).alias(
                    "hub"
                ),
                "auth",
            )
        )
    e.unpersist()
    deg.unpersist()
    return state.select("id", "hub", "auth")


def salsa_oracle_sql(edges_cte: str, iters: int = 10) -> str:
    """Unrolled SALSA iterations — same mirrored sum/normalize shape
    as ``hits_oracle_sql`` plus the shared degree CTE; match at micro
    rounding (engine-order double-sum drift ~1 ulp << 1e-6).  Note
    CAST(... AS DOUBLE) everywhere a division appears (the DuckDB
    bare-decimal-literal pitfall)."""
    ctes = [
        f"{edges_cte.strip()}",
        """verts AS MATERIALIZED (
    SELECT DISTINCT src AS id FROM edges
    UNION SELECT DISTINCT dst FROM edges)""",
        """sdeg AS MATERIALIZED (
    SELECT v.id,
           CAST(COALESCE(o.c, 0) AS DOUBLE) AS out_deg,
           CAST(COALESCE(i.c, 0) AS DOUBLE) AS in_deg
    FROM verts v
    LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o
        ON v.id = o.src
    LEFT JOIN (SELECT dst, COUNT(*) AS c FROM edges GROUP BY dst) i
        ON v.id = i.dst)""",
        """s0 AS MATERIALIZED (
    SELECT id, CAST(1.0 AS DOUBLE) AS hub, CAST(1.0 AS DOUBLE) AS auth
    FROM verts)""",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        ctes += [
            f"""ar{k} AS MATERIALIZED (
    SELECT v.id, v.hub, COALESCE(c.a, CAST(0.0 AS DOUBLE)) AS a_raw
    FROM {p} v LEFT JOIN (
        SELECT e.dst, SUM(s.hub / d.out_deg) AS a
        FROM edges e
        JOIN {p} s ON e.src = s.id
        JOIN sdeg d ON e.src = d.id
        GROUP BY e.dst) c
    ON v.id = c.dst)""",
            f"""an{k} AS MATERIALIZED (
    SELECT id, hub, a_raw / (SELECT SUM(a_raw) FROM ar{k}) AS auth
    FROM ar{k})""",
            f"""hr{k} AS MATERIALIZED (
    SELECT v.id, v.auth, COALESCE(c.h, CAST(0.0 AS DOUBLE)) AS h_raw
    FROM an{k} v LEFT JOIN (
        SELECT e.src, SUM(s.auth / d.in_deg) AS h
        FROM edges e
        JOIN an{k} s ON e.dst = s.id
        JOIN sdeg d ON e.dst = d.id
        GROUP BY e.src) c
    ON v.id = c.src)""",
            f"""s{k} AS MATERIALIZED (
    SELECT id, h_raw / (SELECT SUM(h_raw) FROM hr{k}) AS hub, auth
    FROM hr{k})""",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, CAST(ROUND(hub * 1e6) AS BIGINT) AS hub_micro,
       CAST(ROUND(auth * 1e6) AS BIGINT) AS auth_micro
FROM s{iters}"""
    )
