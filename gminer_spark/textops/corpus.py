"""Corpus-construction operators — the steps between cleaned documents
and a training shard.

Training-data pipeline ops complementing :mod:`gminer_spark.textops`'s
dedup/analysis families:

* :func:`dataset_split` — deterministic hash bucketing into
  train/val/test.  Splits must be REPRODUCIBLE and content-keyed (a
  re-run over a grown corpus keeps every old document in its old
  split), which is exactly the engine's md5 idiom
  (gminer_spark.functions.h32, the modular-hash analog of
  /root/reference/util/minhash.cpp:30-45).
* :func:`chunk_documents` — fixed-size token windows with overlap,
  the document → context-window explode every trainer needs.  Pure
  built-in SQL (split / sequence / slice), no UDF.
* :func:`contamination` — exact n-gram-overlap scores of every
  document against a benchmark set (eval-contamination audit):
  shingle hashes on both sides, one distinct join, per-doc ratios.
  The join is on the 32-bit shingle hash, so the shuffle is
  hash-partitioned and the benchmark side is broadcastable when
  small.

All three are exact integer/string computations — full DuckDB value
oracles, no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32

TOKEN_SPLIT = r"\s+"


def _tokens(text_col):
    """Whitespace tokens with empties dropped — identical semantics to
    the DuckDB oracle's regexp_split + list_filter."""
    return F.filter(F.split(text_col, TOKEN_SPLIT), lambda t: t != "")


def dataset_split(
    documents: DataFrame,
    weights: tuple[int, int, int] = (96, 2, 2),
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """(doc_id, bucket, split) — deterministic train/val/test split.

    ``bucket = h32(seed:id) % 100``; buckets fall into train/val/test
    by the cumulative ``weights`` (must sum to 100).  Content-keyed:
    re-running over a larger corpus never moves an old document.
    """
    if sum(weights) != 100:
        raise ValueError("weights must sum to 100")
    train_hi = weights[0]
    val_hi = weights[0] + weights[1]
    bucket = h32(F.concat_ws(":", F.lit(seed), F.col(id_col))) % 100
    return documents.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk) — fixed-size token windows.

    Chunks start every ``chunk_tokens - overlap`` tokens; the last
    chunk may be short; a document shorter than one stride still
    yields chunk 0.  One narrow projection + one explode — Catalyst
    keeps it a single stage, no shuffle.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    with_toks = documents.select(
        F.col(id_col), toks.alias("toks"), F.size(toks).alias("n")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = with_toks.select(
        id_col,
        "toks",
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


def _shingle_hashes(
    documents: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, sh) — distinct h32 hashes of every n-token shingle
    (documents shorter than n tokens contribute none)."""
    toks = _tokens(F.col(text_col))
    with_toks = documents.select(
        F.col(id_col), toks.alias("toks"), F.size(toks).alias("nt")
    )
    starts = F.sequence(F.lit(0), F.col("nt") - n, F.lit(1))
    return (
        with_toks.where(F.col("nt") >= n)
        .select(id_col, "toks", F.explode(starts).alias("s"))
        .select(
            id_col,
            h32(F.array_join(F.slice("toks", F.col("s") + 1, n), " ")).alias(
                "sh"
            ),
        )
        .distinct()
    )


def contamination(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, n_hit, contam_micro) — per-document exact
    n-gram overlap against the ``benchmark`` corpus.

    ``contam_micro`` = round(1e6 · |doc shingles ∩ benchmark
    shingles| / |doc shingles|).  The benchmark shingle set is
    deduplicated across ALL benchmark docs and joined once on the
    shingle hash; at scale it is the small side (eval suites are
    tiny vs the corpus) and broadcasts under Spark's threshold.
    Documents with fewer than ``n`` tokens report 0 shingles, 0 hits.
    """
    doc_sh = _shingle_hashes(documents, n, id_col, text_col)
    bench_sh = _shingle_hashes(benchmark, n, id_col, text_col).select(
        "sh"
    ).distinct()
    hits = (
        doc_sh.join(bench_sh, on="sh", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    base = documents.select(id_col).distinct()
    return (
        base.join(totals, on=id_col, how="left")
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_hit", F.lit(0))
                    / F.col("n_shingles").cast("double")
                    * 1e6,
                    0,
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("long")
            .alias("contam_micro"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB witnesses
# ---------------------------------------------------------------------------

_TOKS_SQL = (
    "list_filter(regexp_split_to_array({col}, '\\s+'), t -> t <> '')"
)


def dataset_split_oracle_sql(
    weights: tuple[int, int, int] = (96, 2, 2), seed: str = "split"
) -> str:
    from gminer_spark.functions import h32_sql

    key = "'" + seed + ":' || CAST(doc_id AS VARCHAR)"
    bucket = f"{h32_sql(key)} % 100"
    return f"""
SELECT doc_id, CAST({bucket} AS BIGINT) AS bucket,
       CASE WHEN {bucket} < {weights[0]} THEN 'train'
            WHEN {bucket} < {weights[0] + weights[1]} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def chunk_documents_oracle_sql(chunk_tokens: int = 64, overlap: int = 8) -> str:
    stride = chunk_tokens - overlap
    toks = _TOKS_SQL.format(col="text")
    return f"""
WITH t AS MATERIALIZED (
    SELECT doc_id, {toks} AS toks, len({toks}) AS n FROM documents),
starts AS (
    SELECT doc_id, toks,
           UNNEST(range(0, GREATEST(n - 1, 0) + 1, {stride})) AS start
    FROM t),
numbered AS (
    SELECT doc_id, toks, start,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start) - 1
               AS chunk_id
    FROM starts)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(toks[start + 1 : start + {chunk_tokens}]) AS INT) AS n_tokens,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk
FROM numbered
"""


def contamination_oracle_sql(
    n: int = 8, bench_pred: str = "doc_id % 50 = 0"
) -> str:
    from gminer_spark.functions import h32_sql

    toks = _TOKS_SQL.format(col="text")
    sh = h32_sql("array_to_string(toks[s + 1 : s + " + str(n) + "], ' ')")
    return f"""
WITH t AS MATERIALIZED (
    SELECT doc_id, {toks} AS toks, len({toks}) AS nt FROM documents),
doc_sh AS MATERIALIZED (
    SELECT DISTINCT doc_id, {sh} AS sh
    FROM (SELECT doc_id, toks, UNNEST(range(0, nt - {n} + 1)) AS s
          FROM t WHERE nt >= {n})),
bench_sh AS MATERIALIZED (
    SELECT DISTINCT sh FROM doc_sh WHERE {bench_pred}),
totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM doc_sh GROUP BY doc_id),
hits AS (
    SELECT d.doc_id, COUNT(*) AS n_hit
    FROM doc_sh d JOIN bench_sh b ON d.sh = b.sh
    GROUP BY d.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(t.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN COALESCE(t.n_shingles, 0) > 0
                 THEN ROUND(COALESCE(h.n_hit, 0)
                            / CAST(t.n_shingles AS DOUBLE) * 1e6)
                 ELSE 0 END AS BIGINT) AS contam_micro
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN totals t ON t.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id
"""


def build_training_corpus(
    documents: DataFrame,
    min_quality: float = 0.5,
    chunk_tokens: int = 64,
    overlap: int = 8,
    weights: tuple[int, int, int] = (96, 2, 2),
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end corpus build — the whole textops family composed:

    quality filter (>= ``min_quality``) → exact-dup canonicals (min
    doc_id per md5(text)) → near-dup cluster canonicals (banded
    MinHash pairs → hash-min CC → min doc_id) → deterministic split
    tag → token chunks.  Returns (doc_id, split, chunk_id, n_tokens,
    chunk) — what a trainer's shard writer consumes.

    Every stage is the already-oracled operator; the composition
    itself has a single composed DuckDB witness
    (:func:`training_corpus_oracle_sql`), so the END-TO-END pipeline
    is value-checked, not just its pieces.
    """
    from gminer_spark.graph.cc import connected_components
    from gminer_spark.textops.analysis import quality_scores
    from gminer_spark.textops.dedup import minhash_lsh_pairs

    ok = (
        quality_scores(documents)
        .where(F.col("quality") >= min_quality)
        .select("doc_id")
    )
    docs_q = documents.join(ok, on="doc_id", how="left_semi")
    exact_keep = docs_q.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id")
    )
    docs_e = docs_q.join(
        exact_keep.select("doc_id"), on="doc_id", how="left_semi"
    ).localCheckpoint()
    pairs = minhash_lsh_pairs(docs_e, num_hashes, bands, shingle_n)
    edges = pairs.select(
        F.col("doc_a").cast("long").alias("src"),
        F.col("doc_b").cast("long").alias("dst"),
    )
    if edges.isEmpty():
        kept = docs_e
    else:
        labels = connected_components(edges).state
        kept = (
            docs_e.join(labels, docs_e.doc_id == labels.id, "left")
            .where(
                F.coalesce(F.col("component"), F.col("doc_id"))
                == F.col("doc_id")
            )
            .select(*documents.columns)
        )
    split = dataset_split(kept, weights=weights)
    chunks = chunk_documents(kept, chunk_tokens=chunk_tokens, overlap=overlap)
    return chunks.join(split.select("doc_id", "split"), on="doc_id").select(
        "doc_id", "split", "chunk_id", "n_tokens", "chunk"
    )


def training_corpus_oracle_sql(
    min_quality: float = 0.5,
    chunk_tokens: int = 64,
    overlap: int = 8,
    weights: tuple[int, int, int] = (96, 2, 2),
    seed: str = "split",
) -> str:
    """Composed witness for :func:`build_training_corpus` (16 hashes /
    4 bands / 3-word shingles — the contract configuration)."""
    from gminer_spark.functions import h32_sql

    stride = chunk_tokens - overlap
    mh_mins = ",\n           ".join(
        "MIN({h}) AS mh_{i}".format(h=h32_sql(f"'{i}:' || shingle"), i=i)
        for i in range(16)
    )
    band_exprs = []
    for b in range(4):
        cols = " || '_' || ".join(
            f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4)
        )
        band_exprs.append(f"SELECT doc_id, {b} AS band, {cols} AS bsig FROM sig")
    bands_union = "\n    UNION ALL\n    ".join(band_exprs)
    key = "'" + seed + ":' || CAST(doc_id AS VARCHAR)"
    bucket = f"{h32_sql(key)} % 100"
    toks = _TOKS_SQL.format(col="text")
    return f"""
WITH RECURSIVE qual AS MATERIALIZED (
    SELECT doc_id FROM (
        SELECT doc_id,
               ROUND((1.0 - ROUND(len(regexp_extract_all(text, '[.,;:!?]'))
                                  * 1.0 / GREATEST(length(text), 1), 6))
                     * LEAST(1.0,
                             (CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(regexp_split_to_array(trim(text),
                                                                  '\\s+'))
                              END) / 50.0), 6) AS quality
        FROM documents)
    WHERE quality >= {min_quality}),
docs_q AS MATERIALIZED (
    SELECT d.* FROM documents d JOIN qual q ON d.doc_id = q.doc_id),
exact_keep AS MATERIALIZED (
    SELECT MIN(doc_id) AS doc_id FROM docs_q GROUP BY md5(text)),
de AS MATERIALIZED (
    SELECT d.* FROM docs_q d JOIN exact_keep e ON d.doc_id = e.doc_id),
words AS (
    SELECT doc_id, unnest(l) AS word, unnest(range(1, len(l)+1)) AS pos
    FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS l
          FROM de)),
shingles AS (
    SELECT DISTINCT doc_id,
           word || ' ' ||
           lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) || ' ' ||
           lead(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
    FROM words
    QUALIFY lead(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL),
sig AS MATERIALIZED (
    SELECT doc_id,
           {mh_mins}
    FROM shingles GROUP BY doc_id),
buckets AS MATERIALIZED (
    {bands_union}
),
pairs AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
psym AS MATERIALIZED (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs),
reach(id, label) AS (
    SELECT doc_id, doc_id FROM de
    UNION
    SELECT p.d, r.label FROM reach r JOIN psym p ON p.s = r.id),
kept AS MATERIALIZED (
    SELECT d.* FROM de d
    JOIN (SELECT id FROM reach GROUP BY id HAVING id = MIN(label)) k
      ON d.doc_id = k.id),
t AS MATERIALIZED (
    SELECT doc_id, {toks} AS tk, len({toks}) AS n,
           CASE WHEN {bucket} < {weights[0]} THEN 'train'
                WHEN {bucket} < {weights[0] + weights[1]} THEN 'val'
                ELSE 'test' END AS split
    FROM kept),
starts AS (
    SELECT doc_id, tk, split,
           UNNEST(range(0, GREATEST(n - 1, 0) + 1, {stride})) AS start
    FROM t),
numbered AS (
    SELECT doc_id, tk, split, start,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start) - 1
               AS chunk_id
    FROM starts)
SELECT doc_id, split, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(tk[start + 1 : start + {chunk_tokens}]) AS INT) AS n_tokens,
       array_to_string(tk[start + 1 : start + {chunk_tokens}], ' ') AS chunk
FROM numbered
"""


def top_ngrams(
    documents: DataFrame,
    n: int = 2,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rk, ngram, cnt) — the corpus's k most frequent token n-grams
    (every occurrence counted, not per-doc distinct) with a total-order
    tie-break (count desc, ngram asc) — the corpus statistic a
    BPE/tokenizer-training pass starts from.  One explode + one
    map-side-combined groupBy; the top-k is a single ordered limit.
    """
    toks = _tokens(F.col(text_col))
    with_toks = documents.select(
        F.col(id_col), toks.alias("toks"), F.size(toks).alias("nt")
    )
    starts = F.sequence(F.lit(0), F.col("nt") - n, F.lit(1))
    grams = (
        with_toks.where(F.col("nt") >= n)
        .select(F.explode(starts).alias("s"), "toks")
        .select(F.array_join(F.slice("toks", F.col("s") + 1, n), " ").alias("ngram"))
    )
    counts = grams.groupBy("ngram").agg(F.count("*").alias("cnt"))
    # TakeOrderedAndProject (distributed partial top-k per partition,
    # merged on the driver) — NOT a global row_number window, which
    # would single-partition the full n-gram distribution; the rank
    # window then runs over only k rows
    topk = counts.orderBy(F.desc("cnt"), F.asc("ngram")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("ngram"))
    return topk.withColumn("rk", F.row_number().over(w)).select(
        "rk", "ngram", "cnt"
    )


def top_ngrams_oracle_sql(n: int = 2, k: int = 100) -> str:
    toks = _TOKS_SQL.format(col="text")
    return f"""
WITH t AS MATERIALIZED (
    SELECT doc_id, {toks} AS tk, len({toks}) AS nt FROM documents),
grams AS (
    SELECT array_to_string(tk[s + 1 : s + {n}], ' ') AS ngram
    FROM (SELECT tk, UNNEST(range(0, nt - {n} + 1)) AS s
          FROM t WHERE nt >= {n})),
counts AS (SELECT ngram, COUNT(*) AS cnt FROM grams GROUP BY ngram)
SELECT CAST(rk AS INT) AS rk, ngram, CAST(cnt AS BIGINT) AS cnt FROM (
    SELECT ngram, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, ngram ASC) AS rk
    FROM counts) x
WHERE rk <= {k}
"""


def pack_token_stream(
    documents: DataFrame,
    ctx_len: int = 2048,
    n_shards: int = 32,
    seed: str = "pack",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, pack_id, doc_id, seg_id, doc_start, pack_start,
    n_tokens, piece) — concatenate-and-slice sequence packing, the
    GPT-style training layout: shard documents deterministically,
    concatenate each shard's token stream in a hash-pinned order, and
    slice the stream into ``ctx_len``-token packs.  A document
    straddling a pack boundary is split across consecutive packs
    (``seg_id`` numbers its segments; ``doc_start``/``pack_start``
    are the segment's token offsets in the document / in the pack).

    Unlike :func:`chunk_documents` (per-document windows, short tails
    padded at train time), packing wastes zero tokens: every pack
    except each shard's last is exactly full.

    Scale shape: ONE hash-partitioned window per shard (running token
    count) + an explode — no joins, no driver state.  A shard is an
    independent token stream, so ``n_shards`` is the parallelism AND
    skew knob: at 100 TB raise it so each shard's window partition
    stays executor-sized; results are deterministic for a given
    (seed, n_shards).  Empty documents (0 tokens) are dropped — they
    contribute nothing to the stream.

    Reference analog: GMiner materializes per-partition adjacency
    blocks sized to worker memory (/root/reference/partition/
    BDGPartitioner.tpp:139-235 bin-packing); packing is the text-
    pipeline counterpart — fixed-budget bins over a deterministic
    stream.
    """
    from pyspark.sql import Window

    toks = _tokens(F.col(text_col))
    t = documents.select(
        F.col(id_col),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n"),
        F.pmod(
            h32(F.concat_ws(":", F.lit(seed), F.lit("shard"), F.col(id_col))),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
        h32(
            F.concat_ws(":", F.lit(seed), F.lit("ord"), F.col(id_col))
        ).alias("ho"),
    ).where(F.col("n") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("ho", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = t.select(
        "shard",
        id_col,
        "toks",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("start"),
    )
    p0 = F.expr(f"start DIV {int(ctx_len)}")
    p1 = F.expr(f"(start + n - 1) DIV {int(ctx_len)}")
    segs = spans.select(
        "shard",
        id_col,
        "toks",
        "n",
        "start",
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
    )
    seg_start = F.greatest(F.col("start"), F.col("pack_id") * ctx_len)
    seg_end = F.least(
        F.col("start") + F.col("n"), (F.col("pack_id") + 1) * ctx_len
    )
    doc_start = (seg_start - F.col("start")).alias("doc_start")
    return segs.select(
        "shard",
        F.col("pack_id").cast("long").alias("pack_id"),
        id_col,
        (F.col("pack_id") - p0).cast("int").alias("seg_id"),
        doc_start,
        (seg_start - F.col("pack_id") * ctx_len).alias("pack_start"),
        (seg_end - seg_start).alias("n_tokens"),
        F.array_join(
            F.slice("toks", (seg_start - F.col("start") + 1).cast("int"),
                    (seg_end - seg_start).cast("int")),
            " ",
        ).alias("piece"),
    )


def pack_token_stream_oracle_sql(
    ctx_len: int = 2048, n_shards: int = 32, seed: str = "pack"
) -> str:
    from gminer_spark.functions import h32_sql

    toks = _TOKS_SQL.format(col="text")
    shard_key = f"'{seed}:shard:' || CAST(doc_id AS VARCHAR)"
    ord_key = f"'{seed}:ord:' || CAST(doc_id AS VARCHAR)"
    return f"""
WITH t AS MATERIALIZED (
    SELECT doc_id, {toks} AS tk, len({toks}) AS n,
           {h32_sql(shard_key)} % {n_shards} AS shard,
           {h32_sql(ord_key)} AS ho
    FROM documents),
spans AS MATERIALIZED (
    -- CAST: DuckDB window SUM(BIGINT) -> HUGEINT, Spark stays long
    SELECT shard, doc_id, tk, n,
           CAST(SUM(n) OVER (PARTITION BY shard ORDER BY ho, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
                - n AS BIGINT) AS start
    FROM t WHERE n > 0),
segs AS (
    SELECT shard, doc_id, tk, n, start,
           UNNEST(range(start // {ctx_len}, (start + n - 1) // {ctx_len} + 1))
               AS pack_id
    FROM spans)
SELECT CAST(shard AS INT) AS shard,
       CAST(pack_id AS BIGINT) AS pack_id,
       doc_id,
       CAST(pack_id - start // {ctx_len} AS INT) AS seg_id,
       CAST(GREATEST(start, pack_id * {ctx_len}) - start AS BIGINT)
           AS doc_start,
       CAST(GREATEST(start, pack_id * {ctx_len}) - pack_id * {ctx_len}
            AS BIGINT) AS pack_start,
       CAST(LEAST(start + n, (pack_id + 1) * {ctx_len})
            - GREATEST(start, pack_id * {ctx_len}) AS BIGINT) AS n_tokens,
       array_to_string(
           tk[GREATEST(start, pack_id * {ctx_len}) - start + 1 :
              LEAST(start + n, (pack_id + 1) * {ctx_len}) - start],
           ' ') AS piece
FROM segs
"""


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int],
    strata_col: str = "lang",
    default_permille: int = 1000,
    seed: str = "strat",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stratum, coin) — deterministic per-stratum
    downsampling, the domain/language-mix rebalance step of a corpus
    build: a document is kept iff ``h32(seed:id) % 1000 <
    rates[stratum]`` (``default_permille`` for unlisted strata, 1000
    = keep all).  Content-keyed like :func:`dataset_split`: re-runs
    over a grown corpus never flip an old document's fate, and the
    realized rate converges to the requested per-mille per stratum.
    Pure JVM expression — a filter over one md5, no shuffle at all.
    """
    coin = F.pmod(
        h32(F.concat_ws(":", F.lit(seed), F.col(id_col))), F.lit(1000)
    )
    rate = None
    for k, v in sorted(rates.items()):
        cond = F.col(strata_col) == k
        rate = (
            F.when(cond, int(v)) if rate is None else rate.when(cond, int(v))
        )
    rate = (
        rate.otherwise(int(default_permille))
        if rate is not None
        else F.lit(int(default_permille))
    )
    return (
        documents.select(
            F.col(id_col),
            F.col(strata_col).alias("stratum"),
            coin.cast("long").alias("coin"),
            rate.alias("_rate"),
        )
        .where(F.col("coin") < F.col("_rate"))
        .drop("_rate")
    )


def stratified_sample_oracle_sql(
    rates: dict[str, int],
    strata_col: str = "lang",
    default_permille: int = 1000,
    seed: str = "strat",
) -> str:
    from gminer_spark.functions import h32_sql

    key = f"'{seed}:' || CAST(doc_id AS VARCHAR)"
    coin = f"{h32_sql(key)} % 1000"
    whens = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(rates.items())
    )
    rate = f"CASE {strata_col} {whens} ELSE {int(default_permille)} END"
    return f"""
SELECT doc_id, {strata_col} AS stratum, CAST({coin} AS BIGINT) AS coin
FROM documents
WHERE {coin} < {rate}
"""


def select_by_token_budget(
    documents: DataFrame, budget_tokens: int
) -> DataFrame:
    """(doc_id, quality_micro, n_tokens, cum_tokens) — greedy
    quality-first corpus selection under a token budget: documents
    ranked by (quality desc, doc_id asc) are taken while the tokens
    already taken are below ``budget_tokens`` (the boundary document
    may overshoot).  The "give me the best N-token corpus" step of a
    training-data build.

    Scale shape: the naive form is one GLOBAL ordered cumsum — a
    single-partition sort of every document.  Instead quality is
    bucketed (micro-int, 1e6 distinct values max): a tiny bucket
    histogram gets the only unpartitioned window (|distinct quality|
    rows), every document then computes its running total inside its
    own quality bucket (window PARTITIONED by bucket) and offsets it
    by the broadcast bucket prefix.  Degenerate corpora where most
    documents share one quality value re-concentrate the window; real
    quality scores do not.

    Quality/token definitions are exactly
    :func:`gminer_spark.textops.analysis.quality_scores` /
    :func:`token_stats` (frozen formulas).
    """
    from pyspark.sql import Window

    from gminer_spark.textops.analysis import quality_scores, token_stats

    s = (
        quality_scores(documents)
        .select(
            "doc_id",
            F.round(F.col("quality") * 1e6, 0)
            .cast("long")
            .alias("quality_micro"),
        )
        .join(
            token_stats(documents).select(
                "doc_id", F.col("n_ws_tokens").alias("n_tokens")
            ),
            on="doc_id",
        )
    )
    buckets = s.groupBy("quality_micro").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    wb = Window.orderBy(F.desc("quality_micro")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    buckets = buckets.withColumn(
        "bucket_before",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)),
    ).drop("bucket_tokens")
    wd = (
        Window.partitionBy("quality_micro")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        s.join(F.broadcast(buckets), on="quality_micro")
        .withColumn(
            "taken_before",
            F.col("bucket_before")
            + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0)),
        )
        .where(F.col("taken_before") < int(budget_tokens))
        .select(
            "doc_id",
            "quality_micro",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("taken_before") + F.col("n_tokens"))
            .cast("long")
            .alias("cum_tokens"),
        )
    )


def select_by_token_budget_oracle_sql(budget_tokens: int) -> str:
    # the witness does the single global ordered cumsum directly —
    # bucketed prefix + in-bucket running total is the same sum
    return f"""
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS n_tokens,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
    FROM documents),
scored AS (
    SELECT doc_id, n_tokens,
           CAST(ROUND(ROUND((1.0 - ROUND(n_punct * 1.0
                    / GREATEST(n_chars, 1), 6))
                * LEAST(1.0, n_tokens / 50.0), 6) * 1000000, 0)
               AS BIGINT) AS quality_micro
    FROM base),
sel AS (
    SELECT doc_id, quality_micro, n_tokens,
           COALESCE(CAST(SUM(n_tokens) OVER (
                ORDER BY quality_micro DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS taken_before
    FROM scored)
SELECT doc_id, quality_micro, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(taken_before + n_tokens AS BIGINT) AS cum_tokens
FROM sel WHERE taken_before < {int(budget_tokens)}
"""
