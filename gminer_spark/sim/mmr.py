"""Maximal Marginal Relevance selection (Carbonell & Goldstein,
SIGIR'98) over an embedding table: pick k items that are RELEVANT to
a query vector but DIVERSE among themselves —

    pick_r = argmax_d [ λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s) ]

the retrieval-side dedup step of a RAG / few-shot-selection pipeline
(pure top-k returns k near-copies of the best hit; MMR spreads the
selection).

Determinism contract: λ = 1/2, so the argmax order equals the order
of ``rel_micro − max_sim_micro`` — pure BIGINT arithmetic on
1e-6-rounded cosines (the value-green ann_cosine idiom: both engines
fold the dot product left-to-right in IEEE double and round once);
ties break on min vec_id.  Round 1 has no selected set — its score is
the relevance alone.

Spark shape: k sequential rounds; each is one broadcast join of the
candidate table against the ≤k-row selected set, a max-aggregate, and
a 1-row TakeOrderedAndProject collect — O(k) driver rows total, the
candidate table never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.sim.ann import _cos


def _micro(col):
    return F.round(col * 1e6, 0).cast("long")


def mmr_select(
    embeddings: DataFrame, query_id: int = 0, k: int = 6
) -> DataFrame:
    """(rank, vec_id, rel_micro, score2_micro) — the k MMR picks in
    selection order.  ``score2_micro`` is the doubled λ=1/2 objective
    ``rel_micro − max_sim_micro`` (rank 1: the relevance itself)."""
    spark = embeddings.sparkSession
    e = embeddings.select("vec_id", "embedding")
    qv = e.where(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qv")
    )
    cand = (
        e.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "embedding",
            _micro(_cos(F.col("qv"), F.col("embedding"))).alias(
                "rel_micro"
            ),
        )
        .persist()
    )
    picks: list[tuple[int, int, int, int]] = []
    for r in range(1, k + 1):
        remaining = cand.where(
            ~F.col("vec_id").isin([p[1] for p in picks])
            if picks
            else F.lit(True)
        )
        if not picks:
            scored = remaining.select(
                "vec_id",
                "rel_micro",
                F.col("rel_micro").alias("score2_micro"),
            )
        else:
            sel = F.broadcast(
                e.where(F.col("vec_id").isin([p[1] for p in picks])).select(
                    F.col("embedding").alias("sv")
                )
            )
            ms = (
                remaining.crossJoin(sel)
                .select(
                    "vec_id",
                    "rel_micro",
                    _micro(_cos(F.col("sv"), F.col("embedding"))).alias(
                        "sim_micro"
                    ),
                )
                .groupBy("vec_id", "rel_micro")
                .agg(F.max("sim_micro").alias("ms"))
            )
            scored = ms.select(
                "vec_id",
                "rel_micro",
                (F.col("rel_micro") - F.col("ms")).alias("score2_micro"),
            )
        row = (
            scored.orderBy(F.desc("score2_micro"), F.asc("vec_id"))
            .limit(1)
            .first()
        )
        if row is None:
            break
        picks.append(
            (r, int(row["vec_id"]), int(row["rel_micro"]),
             int(row["score2_micro"]))
        )
    cand.unpersist()
    return spark.createDataFrame(
        picks, "rank long, vec_id long, rel_micro long, score2_micro long"
    )


def mmr_oracle_sql(query_id: int = 0, k: int = 6) -> str:
    """Unrolled MMR rounds over the ``embeddings`` view — identical
    cosine tree (list_dot_product / sqrt·sqrt, one 1e6 rounding),
    BIGINT objective, min-id ties."""

    def simm(a, b):
        return (
            f"CAST(ROUND(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))) * 1e6) AS BIGINT)"
        )

    ctes = [
        """e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
        f"""qv AS MATERIALIZED (
    SELECT v AS q FROM e WHERE vec_id = {query_id})""",
        f"""rel AS MATERIALIZED (
    SELECT e.vec_id, e.v, {simm('q.q', 'e.v')} AS rel_micro
    FROM e CROSS JOIN qv q WHERE e.vec_id <> {query_id})""",
        """s1 AS MATERIALIZED (
    SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel_micro,
           rel_micro AS score2_micro
    FROM rel ORDER BY rel_micro DESC, vec_id ASC LIMIT 1)""",
    ]
    prev_union = "SELECT rank, vec_id, rel_micro, score2_micro FROM s1"
    for r in range(2, k + 1):
        ctes.append(
            f"""sel{r - 1} AS MATERIALIZED ({prev_union})"""
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
    SELECT CAST({r} AS BIGINT) AS rank, c.vec_id, c.rel_micro,
           c.rel_micro - MAX({simm('s.v', 'c.v')}) AS score2_micro
    FROM rel c
    JOIN sel{r - 1} p ON TRUE
    JOIN e s ON s.vec_id = p.vec_id
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
    GROUP BY c.vec_id, c.rel_micro, c.v
    ORDER BY score2_micro DESC, c.vec_id ASC LIMIT 1)"""
        )
        prev_union += (
            f"\nUNION ALL SELECT rank, vec_id, rel_micro, score2_micro"
            f" FROM s{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + prev_union


def rknn_counts(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """(vec_id, rknn) — how many OTHER vectors have this one in their
    cosine top-``k`` (the reverse-k-nearest-neighbor count): the
    embedding-space hub/influence signal — a vector with high rknn is
    a semantic attractor (cluster medoid, near-dup magnet), one with
    rknn 0 is an outlier no one points at.

    Exactness: per-query neighbor ranking by (1e-6-rounded cosine
    DESC, vec_id ASC) — the ann_cosine contract order; counts are
    exact BIGINTs, vectors with zero reverse neighbors included via a
    left join (rknn = 0).

    Scale: all-queries top-k is the N×N cosine join — fine gated at
    contract scale (the ann_ivf/LSH variants are the documented scale
    path for candidate generation; rknn then rides their output)."""
    from pyspark.sql import Window as W

    from gminer_spark.sim.ann import _cos

    e = embeddings.select("vec_id", "embedding")
    pairs = (
        e.select(F.col("vec_id").alias("q"), F.col("embedding").alias("qv"))
        .crossJoin(
            e.select(
                F.col("vec_id").alias("n"), F.col("embedding").alias("nv")
            )
        )
        .where(F.col("q") != F.col("n"))
        .select(
            "q",
            "n",
            F.round(_cos(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("q").orderBy(F.desc("cos"), F.asc("n"))
    topk = pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    counts = topk.groupBy(F.col("n").alias("vec_id")).agg(
        F.count("*").cast("long").alias("rknn")
    )
    return e.select("vec_id").join(counts, on="vec_id", how="left").select(
        "vec_id", F.coalesce("rknn", F.lit(0)).cast("long").alias("rknn")
    )


def rknn_oracle_sql(k: int = 5) -> str:
    """DuckDB mirror over the ``embeddings`` view — identical cosine
    rounding, rank order, and zero-fill."""
    return f"""
WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS MATERIALIZED (
    SELECT a.vec_id AS q, b.vec_id AS n,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
    FROM e a JOIN e b ON a.vec_id <> b.vec_id),
topk AS MATERIALIZED (
    SELECT q, n FROM (
        SELECT q, n,
               ROW_NUMBER() OVER (PARTITION BY q
                                  ORDER BY cos DESC, n ASC) AS rn
        FROM pairs)
    WHERE rn <= {k}),
cnt AS MATERIALIZED (
    SELECT n AS vec_id, CAST(COUNT(*) AS BIGINT) AS rknn
    FROM topk GROUP BY n)
SELECT e.vec_id, COALESCE(c.rknn, 0) AS rknn
FROM e LEFT JOIN cnt c ON c.vec_id = e.vec_id"""
