"""Boilerplate shingle detection — per-source template stripping.

Web pages from one host share navigation chrome, footers, and cookie
banners; a training corpus that keeps them learns the template, not
the content.  The standard detector: a shingle occurring in a large
FRACTION of a source's documents is boilerplate *for that source*
(cross-source shingles are fine — common phrases are content).

Two operators:

* :func:`boilerplate_shingles` — (source, shingle, df, n_docs) for
  shingles with document frequency >= min_df and 100·df >= frac_pct·
  n_docs within their source (integer threshold — float ceil() of a
  decimal fraction rounds differently across engines);
* :func:`boilerplate_ratio` — per document, the fraction of its
  distinct shingles that are boilerplate for its source (micro-
  rounded) — the quality signal a cleaning pass filters on.

Spark shape: one distinct (doc, shingle) explode (shared with the
dedup family, `textops/dedup.py:_word_shingles`), one groupBy on
(source, shingle) with a map-side-combined distinct count, one
semi-join back per document.  The shingle key is naturally spread
(source × 3-gram), no hub cap needed; everything is built-in SQL,
no UDF.

Reference analog: GMiner has no text spine — this extends the
engine's web-ingestion family (SURVEY §2.1 "ours") the way
`web/extract.py` does, with the same exactness discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.textops.dedup import _word_shingles


def _source_shingle_df(
    documents: DataFrame, shingle_n: int
) -> tuple[DataFrame, DataFrame]:
    """((source, shingle, df), (source, n_docs)) over distinct
    per-doc shingles."""
    sh = _word_shingles(documents, shingle_n).join(
        documents.select("doc_id", "source"), on="doc_id"
    )
    df_tab = sh.groupBy("source", "shingle").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_tab = documents.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return df_tab, n_tab


def boilerplate_shingles(
    documents: DataFrame,
    shingle_n: int = 3,
    frac_pct: int = 50,
    min_df: int = 2,
) -> DataFrame:
    """(source, shingle, df, n_docs) — shingles boilerplate within
    their source: df >= min_df AND 100*df >= frac_pct*n_docs (all
    integer — bit-identical across engines)."""
    df_tab, n_tab = _source_shingle_df(documents, shingle_n)
    return (
        df_tab.join(n_tab, on="source")
        .where(
            (F.col("df") >= min_df)
            & (F.col("df") * 100 >= F.col("n_docs") * frac_pct)
        )
        .select("source", "shingle", "df", "n_docs")
    )


def boilerplate_ratio(
    documents: DataFrame,
    shingle_n: int = 3,
    frac_pct: int = 50,
    min_df: int = 2,
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, ratio_micro) per document with
    at least one shingle — the per-doc template-contamination signal."""
    bp = boilerplate_shingles(documents, shingle_n, frac_pct, min_df).select(
        "source", "shingle", F.lit(True).alias("is_bp")
    )
    sh = _word_shingles(documents, shingle_n).join(
        documents.select("doc_id", "source"), on="doc_id"
    )
    marked = sh.join(bp, on=["source", "shingle"], how="left")
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.coalesce(F.sum(F.col("is_bp").cast("long")), F.lit(0)).alias(
            "n_boiler"
        ),
        F.round(
            F.coalesce(F.sum(F.col("is_bp").cast("long")), F.lit(0))
            / F.count("*")
            * 1e6,
            0,
        )
        .cast("long")
        .alias("ratio_micro"),
    )


def boilerplate_shingles_oracle_sql(
    shingles_cte: str, frac_pct: int = 50, min_df: int = 2
) -> str:
    """``shingles_cte`` must define ``shingles(doc_id, shingle)``
    (distinct per doc — the contract's SHINGLES_CTE)."""
    return f"""
WITH {shingles_cte.strip()},
ssh AS MATERIALIZED (
    SELECT d.source, s.doc_id, s.shingle
    FROM shingles s JOIN documents d ON d.doc_id = s.doc_id),
dftab AS MATERIALIZED (
    SELECT source, shingle, COUNT(DISTINCT doc_id) AS df
    FROM ssh GROUP BY source, shingle),
ntab AS MATERIALIZED (
    SELECT source, COUNT(DISTINCT doc_id) AS n_docs
    FROM documents GROUP BY source)
SELECT f.source, f.shingle, CAST(f.df AS BIGINT) AS df,
       CAST(n.n_docs AS BIGINT) AS n_docs
FROM dftab f JOIN ntab n ON f.source = n.source
WHERE f.df >= {min_df} AND f.df * 100 >= n.n_docs * {frac_pct}"""


def boilerplate_ratio_oracle_sql(
    shingles_cte: str, frac_pct: int = 50, min_df: int = 2
) -> str:
    return f"""
WITH {shingles_cte.strip()},
ssh AS MATERIALIZED (
    SELECT d.source, s.doc_id, s.shingle
    FROM shingles s JOIN documents d ON d.doc_id = s.doc_id),
dftab AS MATERIALIZED (
    SELECT source, shingle, COUNT(DISTINCT doc_id) AS df
    FROM ssh GROUP BY source, shingle),
ntab AS MATERIALIZED (
    SELECT source, COUNT(DISTINCT doc_id) AS n_docs
    FROM documents GROUP BY source),
bp AS MATERIALIZED (
    SELECT f.source, f.shingle
    FROM dftab f JOIN ntab n ON f.source = n.source
    WHERE f.df >= {min_df} AND f.df * 100 >= n.n_docs * {frac_pct})
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(b.shingle) AS BIGINT) AS n_boiler,
       CAST(ROUND(CAST(COUNT(b.shingle) AS DOUBLE) / COUNT(*) * 1e6)
            AS BIGINT) AS ratio_micro
FROM ssh s
LEFT JOIN bp b ON b.source = s.source AND b.shingle = s.shingle
GROUP BY s.doc_id"""
