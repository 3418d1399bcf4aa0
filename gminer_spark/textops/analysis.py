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


def repetition_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, top_token_share,
    top_bigram_share) — intra-document repetition signals in the
    spirit of Gopher's repetition filters (dup-ngram fractions):
    boilerplate / spam / degenerate pages repeat themselves, prose
    does not.

    - ``dup_token_frac``  = 1 - distinct_tokens / tokens
    - ``top_token_share`` = count of the most frequent token / tokens
    - ``top_bigram_share``= count of the most frequent bigram /
      bigrams (0.0 for single-token docs)

    Zero-token documents are dropped.  Scale shape: explode + two
    hash aggregations keyed by (doc_id, gram) — fully map-side
    combinable, no windows, no skew (keys are per-document).
    """
    from gminer_spark.textops.corpus import _tokens

    toks = _tokens(F.lower(F.col("text")))
    base = documents.select("doc_id", toks.alias("tk")).where(
        F.size("tk") > 0
    )
    words = base.select("doc_id", F.explode("tk").alias("wrd"))
    tok = (
        words.groupBy("doc_id", "wrd")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("c").cast("long").alias("top_cnt"),
        )
    )
    bigs = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
                " (x, i) -> concat(x, ' ', tk[i + 1]))"
            )
        ).alias("bg"),
    )
    bga = (
        bigs.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("nb"), F.max("c").alias("top_big"))
    )
    return (
        tok.join(bga, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_tokens"),
                6,
            ).alias("dup_token_frac"),
            F.round(
                F.col("top_cnt").cast("double") / F.col("n_tokens"), 6
            ).alias("top_token_share"),
            F.coalesce(
                F.round(
                    F.col("top_big").cast("double") / F.col("nb"), 6
                ),
                F.lit(0.0),
            ).alias("top_bigram_share"),
        )
    )


def repetition_stats_oracle_sql() -> str:
    from gminer_spark.textops.corpus import _TOKS_SQL

    toks = _TOKS_SQL.format(col="lower(text)")
    return f"""
WITH t AS MATERIALIZED (
    SELECT doc_id, {toks} AS tk FROM documents),
base AS MATERIALIZED (
    SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
wc AS (
    SELECT doc_id, wrd, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(tk) AS wrd FROM base)
    GROUP BY doc_id, wrd),
tok AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct, MAX(c) AS top_cnt
    FROM wc GROUP BY doc_id),
bgc AS (
    SELECT doc_id, bg, COUNT(*) AS c
    FROM (SELECT doc_id, tk[s + 1] || ' ' || tk[s + 2] AS bg
          FROM (SELECT doc_id, tk, UNNEST(range(0, n - 1)) AS s
                FROM base WHERE n >= 2))
    GROUP BY doc_id, bg),
bga AS (
    SELECT doc_id, SUM(c) AS nb, MAX(c) AS top_big FROM bgc
    GROUP BY doc_id)
SELECT doc_id, n_tokens,
       ROUND(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 6)
           AS dup_token_frac,
       ROUND(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_token_share,
       COALESCE(ROUND(CAST(top_big AS DOUBLE) / nb, 6),
                CAST(0 AS DOUBLE)) AS top_bigram_share
FROM tok LEFT JOIN bga USING (doc_id)
"""


def vocab_growth(documents: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Heaps-law vocabulary growth curve: split the corpus into
    ``n_buckets`` doc-id-ordered slices and report, per cumulative
    prefix, the token count and the DISTINCT-word count — the
    "how much new vocabulary does 10× more data buy" planning curve
    for corpus scaling.

    One pass, no per-prefix rescan: each word's first-appearance
    bucket is min(bucket) over its occurrences; the cumulative
    distinct count at prefix k is the number of words whose first
    bucket <= k (a bucket histogram + running sum over n_buckets
    rows).  Buckets are doc_id rank ntiles — deterministic, total
    order.  All counts exact BIGINTs.

    The ntile is computed DISTRIBUTIVELY (r6, the round-5 verdict's
    plan-level fix): a global ``ntile().over(orderBy(...))`` window
    funnels every distinct doc id through ONE task at scale.  ntile is
    a pure function of (rank, N), so instead: range-partition the doc
    ids, rank locally per partition (bounded window), add per-
    partition offsets (a bounded n_partitions-row cumulative sum),
    and map the global rank through NTILE's exact remainder
    convention — first ``N mod n`` buckets get ``ceil(N/n)`` rows,
    the rest ``floor(N/n)``.  Same values, no single-partition
    exchange; every window in the plan is either partitioned or over
    a bounded-by-construction input.

    Returns (bucket, n_docs, n_tokens, n_distinct_words) with
    cumulative n_tokens / n_distinct_words, bucket 1..n_buckets.
    """
    from pyspark.sql import Window as W

    toks = F.filter(
        F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != ""
    )
    raw_words = documents.select("doc_id", F.explode(toks).alias("word"))
    # bucket only docs with >=1 token: an empty doc must not shift the
    # ntile boundaries (the oracle derives its universe from words)
    docs = raw_words.select("doc_id").distinct()
    # distributed global rank: range partitions are ordered by key, so
    # global_rank = (rows in earlier partitions) + local rank.  The
    # pid-offset table has exactly one row per shuffle partition —
    # bounded by construction, so its unpartitioned windows are safe.
    from gminer_spark.graph.tables import shuffle_partitions

    n_parts = shuffle_partitions(documents.sparkSession)
    ranged = docs.repartitionByRange(n_parts, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    loc = ranged.withColumn(
        "lrn", F.row_number().over(W.partitionBy("pid").orderBy("doc_id"))
    )
    sizes = loc.groupBy("pid").agg(F.count("*").alias("cnt"))
    offs = sizes.select(
        "pid",
        F.coalesce(
            F.sum("cnt").over(
                W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
        F.sum("cnt").over(
            W.orderBy("pid").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n_total"),
    )
    # NTILE(n) over global rank r of N rows: q = N div n, rem = N mod
    # n; the first rem buckets hold q+1 rows, the rest q.  ceil(a/b) =
    # (a + b - 1) div b — integer `div` only (the packed-BIGINT
    # pitfall: never floor(x/d) through doubles).  q = 0 (N < n) only
    # reaches the first branch (r <= N = rem·1); greatest() guards the
    # unevaluated divisor anyway.
    b = int(n_buckets)
    bucket_expr = F.expr(
        f"CASE WHEN (off + lrn) <= (n_total % {b}) * ((n_total div {b}) + 1)"
        f" THEN ((off + lrn) + (n_total div {b})) div ((n_total div {b}) + 1)"
        f" ELSE (n_total % {b})"
        f"  + ((off + lrn) - (n_total % {b}) * ((n_total div {b}) + 1)"
        f"     + greatest(n_total div {b}, 1) - 1)"
        f"    div greatest(n_total div {b}, 1)"
        f" END"
    )
    bucketed = loc.join(F.broadcast(offs), on="pid").select(
        "doc_id", bucket_expr.cast("int").alias("bucket")
    )
    words = raw_words.join(bucketed, on="doc_id")
    per_bucket = words.groupBy("bucket").agg(
        F.countDistinct("doc_id").cast("long").alias("b_docs"),
        F.count("*").cast("long").alias("b_tokens"),
    )
    first_seen = words.groupBy("word").agg(
        F.min("bucket").alias("bucket")
    )
    new_words = first_seen.groupBy("bucket").agg(
        F.count("*").cast("long").alias("b_new_words")
    )
    cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return (
        per_bucket.join(new_words, on="bucket", how="left")
        .select(
            "bucket",
            "b_docs",
            "b_tokens",
            F.coalesce("b_new_words", F.lit(0)).alias("b_new"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.sum("b_docs").over(cum).cast("long").alias("n_docs"),
            F.sum("b_tokens").over(cum).cast("long").alias("n_tokens"),
            F.sum("b_new").over(cum).cast("long").alias("n_distinct_words"),
        )
    )


def vocab_growth_oracle_sql(words_cte: str, n_buckets: int = 10) -> str:
    """DuckDB mirror over ``words(doc_id, word, pos)`` — identical
    ntile bucketing, first-appearance histogram, running sums."""
    return f"""
WITH {words_cte.strip()},
w2 AS MATERIALIZED (SELECT doc_id, word FROM words WHERE word <> ''),
bk AS MATERIALIZED (
    SELECT doc_id, NTILE({n_buckets}) OVER (ORDER BY doc_id) AS bucket
    FROM (SELECT DISTINCT doc_id FROM w2)),
wb AS MATERIALIZED (
    SELECT w.doc_id, w.word, b.bucket
    FROM w2 w JOIN bk b ON b.doc_id = w.doc_id),
pb AS MATERIALIZED (
    SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS b_docs,
           CAST(COUNT(*) AS BIGINT) AS b_tokens
    FROM wb GROUP BY bucket),
fs AS MATERIALIZED (
    SELECT word, MIN(bucket) AS bucket FROM wb GROUP BY word),
nw AS MATERIALIZED (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS b_new
    FROM fs GROUP BY bucket)
SELECT CAST(p.bucket AS BIGINT) AS bucket,
       CAST(SUM(p.b_docs) OVER (ORDER BY p.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs,
       CAST(SUM(p.b_tokens) OVER (ORDER BY p.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(n.b_new, 0)) OVER (ORDER BY p.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_words
FROM pb p LEFT JOIN nw n ON n.bucket = p.bucket"""
