"""HITS hubs & authorities (Kleinberg 1999) — power iteration.

Rounds out the link-analysis family next to PageRank: over the
DIRECTED edge table, each iteration computes

    auth(v) = Σ_{u→v} hub(u)      then L1-normalizes auth,
    hub(u)  = Σ_{u→v} auth(v)     then L1-normalizes hub.

Spark shape — identical scale posture to the PageRank superstep
(gminer_spark.graph.pagerank): each half-step is ONE equi-join of the
persisted edge table against the state (hash-partitioned on the join
key, map-side partial sums as the combiner), the normalizer is a
driver-side 1-row aggregate, and lineage is truncated per iteration.
L1 normalization (not the classic L2) keeps the arithmetic a mirrored
sum/divide in both engines; the fixpoint direction is identical and
the unrolled DuckDB oracle matches at micro rounding exactly like
``pagerank_micro``.

Vertices with no out-edges keep hub 0; no in-edges keep auth 0 (they
stay in the output — full vertex coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def hits(edges: DataFrame, num_iter: int = 10) -> DataFrame:
    """(id, hub, auth) after ``num_iter`` iterations over the directed
    edge table."""
    spark = edges.sparkSession
    n_shuffle = tables.shuffle_partitions(spark)
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(n_shuffle, "src")
        .persist()
    )
    verts = tables.vertices(e)
    state = verts.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    ).localCheckpoint()
    for _ in range(num_iter):
        auth_raw = (
            e.join(
                state.select(F.col("id").alias("src"), "hub"), on="src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_state = (
            state.select("id", "hub")
            .join(auth_raw, on="id", how="left")
            .select("id", "hub", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"))
            .localCheckpoint()
        )
        a_sum = a_state.agg(F.sum("a_raw")).first()[0] or 1.0
        a_state = a_state.select(
            "id", "hub", (F.col("a_raw") / F.lit(float(a_sum))).alias("auth")
        )
        hub_raw = (
            e.join(
                a_state.select(F.col("id").alias("dst"), "auth"), on="dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        h_state = (
            a_state.select("id", "auth")
            .join(hub_raw, on="id", how="left")
            .select(
                "id", "auth", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")
            )
            .localCheckpoint()
        )
        h_sum = h_state.agg(F.sum("h_raw")).first()[0] or 1.0
        state = h_state.select(
            "id",
            (F.col("h_raw") / F.lit(float(h_sum))).alias("hub"),
            "auth",
        ).localCheckpoint()
    e.unpersist()
    return state.select("id", "hub", "auth")


def hits_oracle_sql(edges_cte: str, iters: int = 10) -> str:
    """Unrolled HITS iterations — mirrored sum/normalize arithmetic;
    match at micro rounding (same tolerance argument as the PageRank
    oracle: engine-order double-sum drift is ~1 ulp, far below 1e-6)."""
    ctes = [
        f"{edges_cte.strip()}",
        """verts AS MATERIALIZED (
    SELECT DISTINCT src AS id FROM edges
    UNION SELECT DISTINCT dst FROM edges)""",
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
        SELECT e.dst, SUM(s.hub) AS a
        FROM edges e JOIN {p} s ON e.src = s.id
        GROUP BY e.dst) c
    ON v.id = c.dst)""",
            f"""an{k} AS MATERIALIZED (
    SELECT id, hub, a_raw / (SELECT SUM(a_raw) FROM ar{k}) AS auth
    FROM ar{k})""",
            f"""hr{k} AS MATERIALIZED (
    SELECT v.id, v.auth, COALESCE(c.h, CAST(0.0 AS DOUBLE)) AS h_raw
    FROM an{k} v LEFT JOIN (
        SELECT e.src, SUM(s.auth) AS h
        FROM edges e JOIN an{k} s ON e.dst = s.id
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
