"""Query-relevance retrieval: log-free BM25 over the token table.

Targeted corpus selection — "find documents like this seed query" —
is the missing step between the intrinsic quality filters
(`analysis.py`, `boilerplate.py`) and corpus assembly (`corpus.py`):
a domain-specific training-data pipeline scores the crawl against a
seed term set and keeps the top slice.

Log-free discipline (the `cooccur.py` lift idiom): the BM25 idf is
used as the raw RATIO (N − df + ½)/(df + ½) — no ln(), which is not
cross-engine bit-stable — and every constant is dyadic (k1 = 1.5,
b = 0.75, k1+1 = 2.5) so scaling by them is exact in IEEE double.
Per-(doc, term) contributions are micro-rounded to BIGINT *before*
the per-doc sum (the ANF idiom: float appears once per term, the
cross-term reduction is exact integer arithmetic).

Scale posture: the query term set is tiny (an `isin` literal list —
Catalyst pushes it into the scan); tf is computed only for query
terms; doc length is one map-side-combined full pass; top-k is
TakeOrderedAndProject (never a global sort).  The only wide exchange
is the per-doc score sum, keyed by doc_id.

Reference anchor: GMiner's seed-filter + aggregation pattern
(/root/reference/core/task.hpp create_task seed filters feeding a
partial+final aggregator); the "query" here is the seed predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.5  # dyadic BM25 constants: exact scaling in IEEE double
B = 0.75


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, score_micro) for every doc matching ≥1 term.

    score_micro = Σ_t ROUND(idf_ratio(t) · tfnorm(t, d) · 1e6) with
    idf_ratio = (N − df + 0.5)/(df + 0.5) and
    tfnorm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != ""
    )
    words = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("word")
    )
    dl = words.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    hits = words.where(F.col("word").isin(list(query_terms)))
    tf = hits.groupBy("doc_id", "word").agg(F.count("*").cast("long").alias("tf"))
    df_t = tf.groupBy("word").agg(F.count("*").cast("long").alias("df"))

    n_docs = F.col("n_docs").cast("double")
    avgdl = F.col("total_tokens").cast("double") / n_docs
    idf = (n_docs - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tfd = F.col("tf").cast("double")
    tfnorm = (tfd * F.lit(K1 + 1.0)) / (
        tfd
        + F.lit(K1)
        * (F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
    )
    contrib = (
        tf.join(F.broadcast(df_t), on="word")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tfnorm * F.lit(1e6), 0).cast("long").alias("c_micro"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.sum("c_micro").cast("long").alias("score_micro"),
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rk, doc_id, n_hits, score_micro) — top-k by (score DESC,
    doc_id ASC), total-order tie-break; TakeOrderedAndProject plan."""
    from pyspark.sql import Window

    scored = bm25_scores(documents, query_terms, id_col, text_col)
    topk = scored.orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    ).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return topk.withColumn("rk", F.row_number().over(w)).select(
        "rk", "doc_id", "n_hits", "score_micro"
    )


def bm25_oracle_sql(words_cte: str, query_terms: list[str], k: int = 50) -> str:
    """DuckDB mirror over the shared ``words(doc_id, word, pos)`` CTE —
    identical expression tree, CAST-to-DOUBLE everywhere (DuckDB bare
    decimal literals do DECIMAL arithmetic, the documented pitfall)."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
WITH {words_cte.strip()},
dl AS MATERIALIZED (
    SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
stats AS MATERIALIZED (
    SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl),
tf AS MATERIALIZED (
    SELECT doc_id, word, COUNT(*) AS tf FROM words
    WHERE word IN ({terms}) GROUP BY doc_id, word),
dft AS MATERIALIZED (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
contrib AS MATERIALIZED (
    SELECT t.doc_id,
           CAST(ROUND(
             (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / (CAST(f.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
             * ((CAST(t.tf AS DOUBLE) * CAST(2.5 AS DOUBLE))
                / (CAST(t.tf AS DOUBLE)
                   + CAST(1.5 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE)
                          / (CAST(s.total_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))
             * 1e6) AS BIGINT) AS c_micro
    FROM tf t JOIN dft f USING (word) JOIN dl d USING (doc_id)
    CROSS JOIN stats s),
scored AS MATERIALIZED (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(SUM(c_micro) AS BIGINT) AS score_micro
    FROM contrib GROUP BY doc_id),
topk AS (SELECT * FROM scored
         ORDER BY score_micro DESC, doc_id ASC LIMIT {k})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rk,
       doc_id, n_hits, score_micro
FROM topk"""


def doc_keywords(
    documents: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords
    ``(doc_id, rk, word, tf, score_micro)`` — the document-side dual
    of :func:`bm25_scores`: instead of scoring docs against a query,
    surface each doc's most distinctive terms (index summaries, topic
    tags, cluster labels).

    Log-free discipline: score = tf · N / (df · dl) as the raw ratio
    (the lift idiom) — exact-integer numerator and denominator
    promoted to double (overflow-safe at tf·N ~ 1e18 on a trillion
    docs), ONE rounding per (doc, word).  Top-k per doc is a window
    over doc_id — bounded by the doc's distinct-word count, never a
    global sort; df is one map-side-combined aggregate over the
    distinct (word, doc) pairs.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != ""
    )
    words = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = words.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    dft = tf.groupBy("word").agg(F.count("*").cast("long").alias("df"))
    # N over docs with >=1 token (an all-whitespace doc has no tf rows
    # and must not inflate every other doc's idf ratio)
    n_docs = words.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    scored = (
        tf.join(dft, on="word")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.col("n_docs").cast("double")
                / (F.col("df").cast("double") * F.col("dl").cast("double"))
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("word")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("doc_id", "rk", "word", "tf", "score_micro")
    )


def doc_keywords_oracle_sql(words_cte: str, k: int = 5) -> str:
    """DuckDB mirror over ``words(doc_id, word, pos)`` — identical
    ratio tree, CAST-to-DOUBLE per the decimal-literal pitfall."""
    return f"""
WITH {words_cte.strip()},
w2 AS MATERIALIZED (SELECT doc_id, word FROM words WHERE word <> ''),
tf AS MATERIALIZED (
    SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
    FROM w2 GROUP BY doc_id, word),
dl AS MATERIALIZED (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM w2 GROUP BY doc_id),
dft AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
stats AS MATERIALIZED (
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM w2),
scored AS MATERIALIZED (
    SELECT t.doc_id, t.word, t.tf,
           CAST(ROUND(CAST(t.tf AS DOUBLE) * CAST(s.n_docs AS DOUBLE)
                      / (CAST(f.df AS DOUBLE) * CAST(d.dl AS DOUBLE))
                      * 1e6) AS BIGINT) AS score_micro
    FROM tf t JOIN dft f USING (word) JOIN dl d USING (doc_id)
    CROSS JOIN stats s)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, word ASC)
            AS INT) AS rk,
       word, tf, score_micro
FROM scored
QUALIFY rk <= {k}"""


RRF_K = 60  # the standard Cormack/Clarke/Buettcher constant


def hybrid_rrf(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k_each: int = 50,
    k_out: int = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09)
    of the lexical (BM25) and vector (cosine) retrievers — the
    standard hybrid-search combiner: per retriever contribution
    1/(60 + rank), summed per document.

    Exactness: each contribution is micro-rounded ONCE
    (round(1e6/(60+rank)) — a pure function of the integer rank) and
    the fusion is an exact BIGINT sum, so the fused ranking is
    deterministic wherever the two input rankings are (both are
    value-green: bm25_topk / cosine_topk total orders).  Assumes the
    embeddings row ``vec_id = doc_id`` (the testdata convention).

    Returns (rk, doc_id, rrf_micro, bm25_rank, cos_rank) — top
    ``k_out`` by (rrf DESC, doc_id ASC); absent-from-one-list ranks
    are 0 (contribution 0).
    """
    from pyspark.sql import Window

    from gminer_spark.sim.ann import cosine_topk

    lex = bm25_topk(documents, query_terms, k=k_each).select(
        "doc_id", F.col("rk").alias("bm25_rank")
    )
    w = Window.orderBy(F.desc("cos"), F.asc("neighbor_id"))
    vec = (
        cosine_topk(embeddings, [query_vec_id], k=k_each)
        .withColumn("cos_rank", F.row_number().over(w))
        .select(F.col("neighbor_id").alias("doc_id"), "cos_rank")
    )
    contrib = (
        lex.join(vec, on="doc_id", how="full")
        .select(
            "doc_id",
            F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
            F.coalesce("cos_rank", F.lit(0)).cast("long").alias("cos_rank"),
        )
        .select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            (
                F.when(
                    F.col("bm25_rank") > 0,
                    F.round(F.lit(1e6) / (F.lit(RRF_K) + F.col("bm25_rank")), 0),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("cos_rank") > 0,
                    F.round(F.lit(1e6) / (F.lit(RRF_K) + F.col("cos_rank")), 0),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("rrf_micro"),
        )
    )
    topw = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        contrib.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
        .limit(k_out)
        .withColumn("rk", F.row_number().over(topw).cast("int"))
        .select("rk", "doc_id", "rrf_micro", "bm25_rank", "cos_rank")
    )


def hybrid_rrf_oracle_sql(
    words_cte: str,
    query_terms: list[str],
    query_vec_id: int = 0,
    k_each: int = 50,
    k_out: int = 20,
) -> str:
    """DuckDB mirror: the BM25 chain embedded as a derived table (its
    own WITH scope), the cosine ranks computed inline, identical
    1/(60+rank) micro contributions and BIGINT fusion."""
    bm25 = bm25_oracle_sql(words_cte, query_terms, k=k_each)
    return f"""
WITH rrf_lex AS MATERIALIZED (
    SELECT doc_id, CAST(rk AS BIGINT) AS bm25_rank FROM ({bm25})),
rrf_q AS MATERIALIZED (
    SELECT CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id = {query_vec_id}),
rrf_cos AS MATERIALIZED (
    SELECT e.vec_id AS doc_id,
           ROUND(list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))),
                 6) AS cos
    FROM embeddings e CROSS JOIN rrf_q q
    WHERE e.vec_id <> {query_vec_id}),
rrf_vec AS MATERIALIZED (
    SELECT doc_id, CAST(rn AS BIGINT) AS cos_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS rn
        FROM rrf_cos) WHERE rn <= {k_each}),
fused AS MATERIALIZED (
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           COALESCE(l.bm25_rank, 0) AS bm25_rank,
           COALESCE(v.cos_rank, 0) AS cos_rank,
           CAST(CASE WHEN l.bm25_rank IS NOT NULL
                     THEN ROUND(1e6 / ({RRF_K} + l.bm25_rank)) ELSE 0 END
                + CASE WHEN v.cos_rank IS NOT NULL
                       THEN ROUND(1e6 / ({RRF_K} + v.cos_rank)) ELSE 0 END
                AS BIGINT) AS rrf_micro
    FROM rrf_lex l FULL JOIN rrf_vec v ON v.doc_id = l.doc_id)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id ASC)
            AS INT) AS rk,
       doc_id, rrf_micro, bm25_rank, cos_rank
FROM fused
ORDER BY rrf_micro DESC, doc_id ASC
LIMIT {k_out}"""
