"""Deterministic Lloyd k-means over an embedding column.

The corpus-curation clustering primitive (semantic bucketing,
diversity sampling, per-cluster quota selection) the same way
:mod:`gminer_spark.sim.ann` is the retrieval primitive.  Reference
analog: GMiner's aggregator-driven iterative refinement loop
(core/aggregator.hpp:24-58 — per-round partial aggregate, global
merge, broadcast back), which is exactly one Lloyd iteration's
shape: per-point assignment (map), per-cluster sums (partial+final
agg), centroid broadcast (context sync).

Cross-engine-exact by construction (the repo's derandomized idiom):

* vectors are quantized ONCE to micro ints (``round(x*1e6)`` as
  BIGINT); every later step is integer arithmetic;
* squared L2 distances are exact BIGINTs (64 dims x (1.2e6)^2 ~ 1e14
  << 2^53, so even a double-valued ``list_dot_product`` in the
  DuckDB oracle is exact and summation-order-free);
* argmin ties break on the smaller centroid id (total order);
* centroid update is one exact integer sum per (cluster, dim) and
  ONE final division, rounded back to micro (the single-division
  rule from CLAUDE.md);
* empty clusters keep their previous centroid;
* init = embeddings of the k vectors with the smallest
  ``(h32(vec_id), vec_id)`` key — md5-derived, engine-independent.

Scale posture: the per-iteration plan is a broadcast crossJoin of n
points x k tiny centroids (JVM ``zip_with``/``aggregate``, no
Python) followed by a posexplode'd (cluster, dim) sum — n*k distance
rows and n*dims partial-agg rows, both shuffle-bounded and
skew-free (cluster count is k).  Centroids are the only driver-side
collect: O(k*dims) per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32, h32_sql

MICRO = 1_000_000


def _quantize(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * MICRO, 0).cast("long"),
        ).alias("q"),
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    num_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """(vec_id, cluster, sqdist) — Lloyd assignments after
    ``num_iter`` update rounds (assignment recomputed against the
    final centroids, so the output is consistent with them).  With
    ``return_centroids=True`` returns ``(assignments, centroids)``."""
    spark = embeddings.sparkSession
    q = _quantize(embeddings, id_col, vec_col).persist()

    # init: k md5-smallest vectors, cluster id = that order
    seed_rows = (
        q.withColumn("hk", h32(F.col("vec_id").cast("string")))
        .orderBy("hk", "vec_id")
        .limit(k)
        .collect()
    )
    cents = [(i, list(r["q"])) for i, r in enumerate(sorted(
        seed_rows, key=lambda r: (r["hk"], r["vec_id"])))]

    def assign(cdf: DataFrame) -> DataFrame:
        pairs = q.crossJoin(F.broadcast(cdf)).select(
            "vec_id",
            "cid",
            _sqdist(F.col("q"), F.col("cv")).alias("sqdist"),
        )
        best = pairs.groupBy("vec_id").agg(
            F.min(F.struct("sqdist", "cid")).alias("b")
        )
        return best.select(
            "vec_id",
            F.col("b.cid").alias("cluster"),
            F.col("b.sqdist").alias("sqdist"),
        )

    for _ in range(num_iter):
        cdf = spark.createDataFrame(cents, "cid int, cv array<bigint>")
        asg = assign(cdf)
        # per-(cluster, dim) exact integer sums -> ONE division each
        upd = (
            asg.join(q, on="vec_id")
            .select("cluster", F.posexplode("q").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .withColumn(
                "dim",
                F.round(F.col("s").cast("double") / F.col("c"), 0).cast(
                    "long"
                ),
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "dim"))),
                    lambda x: x["dim"],
                ).alias("cv")
            )
            .collect()
        )
        new = {int(r["cluster"]): list(r["cv"]) for r in upd}
        # empty clusters keep their previous centroid
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]

    cdf_final = spark.createDataFrame(cents, "cid int, cv array<bigint>")
    final = assign(cdf_final)
    q.unpersist()
    if return_centroids:
        return final, cdf_final
    return final


def kmeans_representatives(
    embeddings: DataFrame,
    k: int = 8,
    num_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, size, rep_id, rep_sqdist) — one representative per
    cluster: the member closest to the final centroid (tie: smaller
    vec_id).  The diversity-sampling primitive: k spread-out
    exemplars of the corpus."""
    asg = kmeans(embeddings, k=k, num_iter=num_iter, id_col=id_col,
                 vec_col=vec_col)
    return asg.groupBy("cluster").agg(
        F.count("*").cast("long").alias("size"),
        F.min(F.struct("sqdist", "vec_id")).alias("b"),
    ).select(
        "cluster",
        "size",
        F.col("b.vec_id").alias("rep_id"),
        F.col("b.sqdist").alias("rep_sqdist"),
    )


def _oracle_ctes(k: int, num_iter: int, table: str = "embeddings") -> list[str]:
    """Unrolled Lloyd chain as DuckDB CTEs (MATERIALIZED per the
    fd-limit pitfall).  Mirrors :func:`kmeans` step for step; every
    number is an exact integer in both engines (module docstring)."""
    hk = h32_sql("vec_id")
    ctes = [
        f"""q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
             x -> CAST(ROUND(x * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS qv
  FROM {table})""",
        f"""c0 AS MATERIALIZED (
  SELECT rn - 1 AS cid, qv AS cv FROM (
    SELECT qv, ROW_NUMBER() OVER (ORDER BY {hk}, vec_id) AS rn FROM q)
  WHERE rn <= {k})""",
    ]
    dist = (
        "CAST(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))"
        " - 2 * list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))"
        " + list_dot_product(CAST(c.cv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))"
        " AS BIGINT)"
    )
    for t in range(1, num_iter + 1):
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT vec_id, cid, sqdist FROM (
    SELECT q.vec_id, c.cid, {dist} AS sqdist,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM q CROSS JOIN c{t - 1} c)
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""c{t} AS MATERIALIZED (
  SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
  FROM c{t - 1} p LEFT JOIN (
    SELECT cid, list(dim ORDER BY pos) AS cv FROM (
      SELECT a.cid, u.pos,
             CAST(ROUND(CAST(SUM(u.val) AS DOUBLE) / COUNT(*)) AS BIGINT)
                 AS dim
      FROM a{t} a JOIN (
        SELECT vec_id, unnest(qv) AS val,
               unnest(range(1, len(qv) + 1)) AS pos FROM q) u
      USING (vec_id)
      GROUP BY a.cid, u.pos)
    GROUP BY cid) n ON n.cid = p.cid)"""
        )
    ctes.append(
        f"""afinal AS MATERIALIZED (
  SELECT vec_id, cid, sqdist FROM (
    SELECT q.vec_id, c.cid, {dist} AS sqdist,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM q CROSS JOIN c{num_iter} c)
  WHERE rn = 1)"""
    )
    return ctes


def kmeans_oracle_sql(
    k: int = 8, num_iter: int = 3, table: str = "embeddings"
) -> str:
    ctes = _oracle_ctes(k, num_iter, table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, cid AS cluster, sqdist FROM afinal"
    )


def kmeans_representatives_oracle_sql(
    k: int = 8, num_iter: int = 3, table: str = "embeddings"
) -> str:
    ctes = _oracle_ctes(k, num_iter, table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT cluster, size, rep_id, rep_sqdist FROM (
  SELECT cid AS cluster,
         CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS size,
         vec_id AS rep_id, sqdist AS rep_sqdist,
         ROW_NUMBER() OVER (PARTITION BY cid
                            ORDER BY sqdist, vec_id) AS rn
  FROM afinal)
WHERE rn = 1"""
    )


def kmeans_purity(
    embeddings: DataFrame, k: int = 8, num_iter: int = 3
) -> DataFrame:
    """(cluster, n_points, majority_label, n_majority) — cluster
    purity of the deterministic Lloyd assignment against the
    embeddings table's ground-truth ``label`` column: the standard
    external-validation row (overall purity = Σ n_majority / Σ
    n_points, assembled by the caller from exact integers).

    Majority ties break to the smaller label (max over
    (count, −label) structs — total order both engines).  One count
    shuffle on (cluster, label) over the value-green assignment.
    """
    assign = kmeans(embeddings, k=k, num_iter=num_iter)
    joined = assign.join(
        embeddings.select("vec_id", F.col("label").cast("long").alias("label")),
        on="vec_id",
    )
    per = joined.groupBy("cluster", "label").agg(
        F.count("*").cast("long").alias("cnt")
    )
    best = per.groupBy("cluster").agg(
        F.sum("cnt").cast("long").alias("n_points"),
        F.max(
            F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
        ).alias("b"),
    )
    return best.select(
        "cluster",
        "n_points",
        (-F.col("b.neg")).cast("long").alias("majority_label"),
        F.col("b.cnt").cast("long").alias("n_majority"),
    )


def kmeans_purity_oracle_sql(
    k: int = 8, num_iter: int = 3, table: str = "embeddings"
) -> str:
    """Reuses the unrolled Lloyd chain (``_oracle_ctes`` → afinal)
    and mirrors the majority aggregation."""
    ctes = _oracle_ctes(k, num_iter, table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
pl AS MATERIALIZED (
    SELECT a.cid AS cluster, CAST(e.label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM afinal a JOIN {table} e ON e.vec_id = a.vec_id
    GROUP BY a.cid, e.label)
SELECT cluster,
       CAST(SUM(cnt) AS BIGINT) AS n_points,
       CAST(MIN(label) FILTER (WHERE rn = 1) AS BIGINT) AS majority_label,
       CAST(MAX(cnt) FILTER (WHERE rn = 1) AS BIGINT) AS n_majority
FROM (
    SELECT cluster, label, cnt,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM pl)
GROUP BY cluster"""
    )


def kmeans_silhouette(
    embeddings: DataFrame, k: int = 8, num_iter: int = 3
) -> DataFrame:
    """(cluster, n_points, sil_sum_micro, sil_mean_micro) — the
    SIMPLIFIED (centroid-based, squared-distance) silhouette per
    cluster: per point s = (b − a)·1e6 / max(a, b) with a = sqdist to
    the own centroid and b = sqdist to the nearest OTHER centroid —
    linear in |points|·k (the classic pairwise silhouette is
    quadratic and dead at scale; this is the standard sklearn-style
    compromise, on SQUARED distances so every input is an exact
    BIGINT from the micro-quantized vectors).

    Per-point scores are micro-rounded once (one double division);
    the per-cluster sum is exact BIGINT and the mean is one further
    division.  Internal-validation complement to the external
    :func:`kmeans_purity`.
    """
    final, cdf = kmeans(
        embeddings, k=k, num_iter=num_iter, return_centroids=True
    )
    q = _quantize(embeddings, "vec_id", "embedding")
    pairs = q.crossJoin(F.broadcast(cdf)).select(
        "vec_id", "cid", _sqdist(F.col("q"), F.col("cv")).alias("d2")
    )
    second = (
        pairs.join(
            final.select("vec_id", F.col("cluster").alias("own")),
            on="vec_id",
        )
        .where(F.col("cid") != F.col("own"))
        .groupBy("vec_id")
        .agg(F.min("d2").alias("b2"))
    )
    per_point = final.join(second, on="vec_id").select(
        "cluster",
        F.when(
            F.greatest(F.col("sqdist"), F.col("b2")) == 0, F.lit(0)
        )
        .otherwise(
            F.round(
                (F.col("b2") - F.col("sqdist")).cast("double")
                / F.greatest(F.col("sqdist"), F.col("b2")).cast("double")
                * 1e6,
                0,
            ).cast("long")
        )
        .alias("s_micro"),
    )
    return per_point.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("s_micro").cast("long").alias("sil_sum_micro"),
        F.round(
            F.sum("s_micro").cast("double") / F.count("*"), 0
        ).cast("long").alias("sil_mean_micro"),
    )


def kmeans_silhouette_oracle_sql(
    k: int = 8, num_iter: int = 3, table: str = "embeddings"
) -> str:
    """Reuses the unrolled Lloyd chain; recomputes the all-centroid
    distance pairs against the FINAL centroid CTE for the second-best
    distance, then mirrors the micro assembly."""
    ctes = _oracle_ctes(k, num_iter, table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
sil_pairs AS MATERIALIZED (
    SELECT q.vec_id, c.cid,
           CAST(list_dot_product(CAST(q.qv AS DOUBLE[]),
                                 CAST(q.qv AS DOUBLE[]))
                - 2 * list_dot_product(CAST(q.qv AS DOUBLE[]),
                                       CAST(c.cv AS DOUBLE[]))
                + list_dot_product(CAST(c.cv AS DOUBLE[]),
                                   CAST(c.cv AS DOUBLE[]))
                AS BIGINT) AS d2
    FROM q CROSS JOIN c{num_iter} c),
sil_second AS MATERIALIZED (
    SELECT p.vec_id, MIN(p.d2) AS b2
    FROM sil_pairs p JOIN afinal a ON a.vec_id = p.vec_id
    WHERE p.cid <> a.cid
    GROUP BY p.vec_id),
sil_pp AS MATERIALIZED (
    SELECT a.cid AS cluster,
           CASE WHEN GREATEST(a.sqdist, s.b2) = 0 THEN 0
                ELSE CAST(ROUND(CAST(s.b2 - a.sqdist AS DOUBLE)
                     / CAST(GREATEST(a.sqdist, s.b2) AS DOUBLE)
                     * 1e6) AS BIGINT) END AS s_micro
    FROM afinal a JOIN sil_second s ON s.vec_id = a.vec_id)
SELECT cluster,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(s_micro) AS BIGINT) AS sil_sum_micro,
       CAST(ROUND(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS sil_mean_micro
FROM sil_pp
GROUP BY cluster"""
    )
