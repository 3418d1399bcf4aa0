"""Windowed token co-occurrence + PMI lift — embedding-training stats.

The (word, context) co-occurrence table within a +-W token window is
the input to every count-based embedding (GloVe/PPMI-SVD) and the
standard collocation detector.  Emitted per unordered pair:

* ``cnt``        — co-occurrence count (every positioned pair i < j,
                   j - i <= W, across all documents);
* ``lift_micro`` — round(cnt * N / (c1 * c2) * 1e6), the PMI *ratio*
                   exp(PMI).  Log-free on purpose: ln differs in ulps
                   across engines (the repo avoids Adamic-Adar for the
                   same reason), while the lift is one double
                   expression both engines evaluate identically.

Spark shape: ONE positional explode, then W equi-joins on
``(doc_id, pos + d)`` for d = 1..W, unioned — never a per-document
range join, so a long document costs W·L pairs, not L².  Counts are
map-side partial-aggregated; the top-k is TakeOrderedAndProject (no
global sort); the unigram normalizer joins on the word key and the
corpus total rides a 1-row broadcast.

Reference analog: co-occurrence is the text-side wedge count — the
same shared-center pair aggregation as GMiner's adjacency
intersection (SURVEY §2.6) with the token window as the center.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "\\s+"


def _positioned_tokens(
    documents: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )
    return documents.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "word")
    )


def cooccurrence_topk(
    documents: DataFrame,
    window: int = 3,
    k: int = 100,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rk, w1, w2, cnt, lift_micro) — top-k co-occurring unordered
    token pairs within a ``window``-token forward window, ranked by
    (cnt DESC, w1 ASC, w2 ASC)."""
    from gminer_spark.graph.tables import shuffle_partitions

    words = (
        _positioned_tokens(documents, id_col, text_col)
        .repartition(shuffle_partitions(documents.sparkSession), "doc_id")
        .persist()
    )
    words.count()
    right = words.select(
        "doc_id", F.col("pos").alias("rpos"), F.col("word").alias("rword")
    )
    offsets = [
        words.join(
            right,
            (words.doc_id == right.doc_id)
            & (right.rpos == words.pos + F.lit(d)),
        ).select(
            F.least("word", "rword").alias("w1"),
            F.greatest("word", "rword").alias("w2"),
        )
        for d in range(1, window + 1)
    ]
    pairs = reduce(lambda a, b: a.unionByName(b), offsets)
    counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    uni = words.groupBy("word").agg(F.count("*").alias("c"))
    tot = words.agg(F.count("*").alias("n_total"))
    topk = counts.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2")).limit(k)
    enriched = (
        topk.join(uni.select(F.col("word").alias("w1"), F.col("c").alias("c1")), on="w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("c").alias("c2")), on="w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "cnt",
            F.round(
                F.col("cnt").cast("double")
                * F.col("n_total")
                / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("lift_micro"),
        )
    )
    words.unpersist()
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
    return enriched.withColumn("rk", F.row_number().over(w)).select(
        "rk", "w1", "w2", "cnt", "lift_micro"
    )


def cooccurrence_oracle_sql(
    words_cte: str, window: int = 3, k: int = 100, min_count: int = 2
) -> str:
    """DuckDB mirror over the shared ``words(doc_id, word, pos)`` CTE
    (1-based pos; the window predicate is position-difference-based so
    the base does not matter)."""
    return f"""
WITH {words_cte.strip()},
pairs AS MATERIALIZED (
    SELECT LEAST(a.word, b.word) AS w1, GREATEST(a.word, b.word) AS w2,
           COUNT(*) AS cnt
    FROM words a JOIN words b
      ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND {window}
    GROUP BY 1, 2
    HAVING COUNT(*) >= {min_count}),
uni AS MATERIALIZED (SELECT word, COUNT(*) AS c FROM words GROUP BY word),
tot AS MATERIALIZED (SELECT COUNT(*) AS n_total FROM words),
topk AS MATERIALIZED (
    SELECT * FROM pairs ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT {k})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY t.cnt DESC, t.w1 ASC, t.w2 ASC) AS INT) AS rk,
       t.w1, t.w2, CAST(t.cnt AS BIGINT) AS cnt,
       CAST(ROUND(CAST(t.cnt AS DOUBLE) * tot.n_total
                  / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) * 1e6)
            AS BIGINT) AS lift_micro
FROM topk t
JOIN uni u1 ON u1.word = t.w1
JOIN uni u2 ON u2.word = t.w2
CROSS JOIN tot"""
