"""Text analysis operators over a documents table.

All expressions are JVM-side built-ins (regexp/length/split) inside
whole-stage codegen — no Python in the hot path.  Every formula is
frozen and mirrored 1:1 in the DuckDB oracle SQL (__spark_entry__),
so hashes and scores are bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gminer_spark.functions import h32

# frozen regexes (RE2/Java-compatible subset)
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT = "[.,;:!?]"
EN_STOP = "\\b(the|and|is|of|to|in)\\b"
DE_STOP = "\\b(der|die|das|und|ist|nicht)\\b"


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_ws_tokens, n_bpe_tokens)."""
    t = F.col("text")
    return documents.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        F.when(F.trim(t) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), "\\s+")))
        .cast("long")
        .alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH)).cast("long").alias("n_bpe_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars, punct_ratio, stopword_ratio, quality).

    quality = round((1 - punct_ratio) * least(1, n_ws_tokens/50), 6)
    — a simple length/punct/stopword composite in the spirit of
    C4/Gopher-style quality filters.
    """
    t = F.col("text")
    low = F.lower(t)
    n_chars = F.length(t).cast("long")
    n_tokens = F.when(F.trim(t) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), "\\s+"))
    )
    punct_ratio = F.round(
        F.regexp_count(t, F.lit(PUNCT)) / F.greatest(n_chars, F.lit(1)), 6
    )
    stop_ratio = F.round(
        F.regexp_count(low, F.lit(EN_STOP)) / F.greatest(n_tokens, F.lit(1)), 6
    )
    quality = F.round(
        (F.lit(1.0) - punct_ratio)
        * F.least(F.lit(1.0), n_tokens / F.lit(50.0)),
        6,
    )
    return documents.select(
        "doc_id",
        n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang, predicted_lang) — stopword-hit heuristic."""
    low = F.lower(F.col("text"))
    en = F.regexp_count(low, F.lit(EN_STOP))
    de = F.regexp_count(low, F.lit(DE_STOP))
    return documents.select(
        "doc_id",
        "lang",
        F.when(en > de, F.lit("en"))
        .when(de > en, F.lit("de"))
        .otherwise(F.lit("unk"))
        .alias("predicted_lang"),
    )


def fingerprints(documents: DataFrame, shingle_words: int = 3) -> DataFrame:
    """(doc_id, fingerprint) — min md5-hash over ``shingle_words``-word
    shingles (bottom-1 sketch; the rolling-hash document signature).
    Docs shorter than one shingle fall back to hashing the whole text.
    """
    words = documents.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "\\s+")).alias("pos", "word"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    shingle = F.concat_ws(
        " ", *[F.lead("word", i).over(w) if i else F.col("word") for i in range(shingle_words)]
    )
    shingled = words.select(
        "doc_id",
        F.lead("word", shingle_words - 1).over(w).isNotNull().alias("full"),
        shingle.alias("shingle"),
    ).where(F.col("full"))
    fp = shingled.groupBy("doc_id").agg(F.min(h32(F.col("shingle"))).alias("fingerprint"))
    fallback = documents.select("doc_id", h32(F.col("text")).alias("fb"))
    return (
        fallback.join(fp, on="doc_id", how="left")
        .select("doc_id", F.coalesce("fingerprint", "fb").alias("fingerprint"))
    )
