"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the point of each design):

* exact     — one hash-groupBy; partial agg is the map-side combine.
* jaccard   — shingle inverted index + self-join on shingle: only
              docs sharing a shingle ever meet, so cost is bounded by
              posting-list sizes, not n².  Hot shingles (stopword
              runs) are the skew risk — cap posting lists upstream at
              100-TB scale (df-style frequency cut).
* minhash   — k independent md5-derived hash mins per doc (one
              explode + one groupBy), banded into b bands; candidate
              pairs only within equal (band, band-signature) buckets.
              This is the reference's own signing trick — GMiner
              minhash-signs task request-sets for locality
              (/root/reference/util/minhash.cpp:30-45,
              core/task_sorter.tpp:16-39) — repurposed for content.
* simhash   — per-word md5 bit votes → 16-bit signature; near-dups =
              hamming distance ≤ r via xor+bit_count join.

Every hash is md5-derived (gminer_spark.functions.h32) so the DuckDB
oracle reproduces signatures bit-for-bit — the LSH checks are exact,
not probabilistic, under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32


def exact_dup_groups(documents: DataFrame) -> DataFrame:
    """(canonical_doc_id, n_dups, text_md5) for texts appearing >1 time."""
    return (
        documents.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_dups"),
        )
        .where(F.col("n_dups") > 1)
        .select("canonical_doc_id", "n_dups", "text_md5")
    )


def _word_shingles(documents: DataFrame, n: int) -> DataFrame:
    """Distinct (doc_id, shingle) of n-word shingles (lowercased)."""
    from pyspark.sql import Window

    words = documents.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "\\s+")).alias("pos", "word"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word") if i == 0 else F.lead("word", i).over(w) for i in range(n)]
    return (
        words.select(
            "doc_id",
            F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts)).alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 10_000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-Jaccard ≥ threshold.

    ``max_df`` is the document-frequency cut that makes the inverted
    index scale: a shingle appearing in more than ``max_df`` documents
    (a stopword run shared corpus-wide) is dropped BEFORE the self-join
    — one such shingle in 1M docs would otherwise create a 10¹²-row
    join partition.  The cut is applied symmetrically to the per-doc
    sizes too, so the reported jaccard is the exact Jaccard over the
    RARE-shingle sets (a deterministic, SQL-expressible semantics the
    oracle reproduces; near-dup pairs share rare shingles, so at a
    sane cut recall is unaffected).  ``max_df=None`` disables the cut.
    """
    sh = _word_shingles(documents, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = (
            sh.join(
                df_counts.where(F.col("df") <= max_df).select("shingle"),
                on="shingle",
            )
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, mh_0 … mh_{k-1}) — k md5-derived min-hashes per doc.

    hash_i(s) = h32(i || ':' || s); one shingle explode, k mins in a
    single partial-aggregated groupBy.
    """
    sh = _word_shingles(documents, shingle_n)
    aggs = [
        F.min(h32(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def band_buckets(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band, bsig) — the banded-MinHash LSH bucket rows; two
    docs are near-dup candidates iff they share a (band, bsig) key."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, shingle_n)
    # ONE posexplode instead of a bands-way union of selects over the
    # same signature subtree (r6): the union form referenced the
    # shingle+minhash aggregation once PER BAND (16 parquet scans in
    # the r6 plan audit of minhash_lsh_pairs); the array form scans and
    # aggregates once.  band = array position — same 0..bands-1 ints,
    # same bsig strings, values identical.
    band_sigs = [
        F.concat_ws(
            "_",
            *[
                F.col(f"mh_{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.posexplode(F.array(*band_sigs)).alias("band", "bsig")
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a, doc_b) from banded MinHash.

    rows-per-band = num_hashes/bands; two docs collide if any band's
    signature slice matches exactly.  The band bucket join is the
    LSH: shuffle key = (band_id, band_signature).
    """
    # materialize once: the candidate self-join references the bucket
    # table twice, re-running the shingle + minhash aggregation per
    # side otherwise (r6 plan audit)
    buckets = band_buckets(documents, num_hashes, bands, shingle_n).localCheckpoint()
    a = buckets.alias("a")
    b2 = buckets.alias("b")
    return (
        a.join(b2, on=["band", "bsig"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_signatures(documents: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — per-word md5 bit votes, sign-aggregated."""
    words = documents.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), "\\s+")).alias("word")
    ).where(F.col("word") != "")
    h = h32(F.col("word"))
    votes = [
        F.sum(
            (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    agg = words.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    documents: DataFrame, bits: int = 16, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b, hamming) with hamming(simhash) ≤ max_hamming.

    Small-n: all-pairs join.  At scale, pre-bucket on bit-slices
    (pigeonhole: split signature into max_hamming+1 slices; a near
    pair matches exactly on ≥1 slice) — same trick as the MinHash
    bands; implemented here via the slice-bucket join.
    """
    sig = simhash_signatures(documents, bits)
    slices = max_hamming + 1
    per = bits // slices
    buckets = None
    for s in range(slices):
        mask = ((1 << per) - 1) << (s * per)
        br = sig.select(
            "doc_id",
            F.col("simhash"),
            F.lit(s).alias("slice"),
            F.col("simhash").bitwiseAND(F.lit(mask)).alias("skey"),
        )
        buckets = br if buckets is None else buckets.unionByName(br)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, on=["slice", "skey"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("sa").bitwiseXOR(F.col("sb"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


class DedupMaintainer:
    """Streaming corpus admission: feed document batches (e.g. from a
    ``foreachBatch`` sink), read back the admitted subset — the
    incremental twin of the batch near-dup pipeline, same shape as
    :class:`gminer_spark.graph.cc.CCMaintainer`.

    Per batch: (1) documents whose LSH bands collide with the
    persistent index of ALREADY-ADMITTED documents are rejected;
    (2) the remaining fresh documents are clustered among themselves
    (band-collision pairs -> hash-min CC) and each cluster admits its
    min-doc_id canonical; (3) admitted documents' bands join the
    index, lineage truncated per batch.

    Invariant (pytest-enforced): the admitted set is pairwise
    band-disjoint — no two admitted documents ever share an LSH
    bucket.  Admission is arrival-order dependent across batches (any
    online dedup is); within a batch it is deterministic
    (component-canonical, min doc_id).

    Sub-shingle documents (fewer than ``shingle_n`` tokens) produce no
    MinHash signature and hence no band buckets, so the LSH gate can
    never reject them (ADVICE r3).  They take an EXACT path instead:
    md5(text) dedup against both the current batch (min doc_id per
    hash) and a persistent index of already-admitted short-doc hashes.
    """

    def __init__(
        self,
        num_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
        benchmark: DataFrame | None = None,
        max_contamination: float = 0.05,
        contamination_n: int = 8,
    ) -> None:
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.index: DataFrame | None = None  # (band, bsig) of admitted docs
        self.exact_index: DataFrame | None = None  # (th,) of admitted short docs
        # optional eval-contamination gate: documents whose exact
        # n-gram overlap with the benchmark corpus exceeds
        # max_contamination are dropped BEFORE dedup (the streaming
        # twin of jobs/build_corpus.py's batch gate).  The benchmark
        # shingle set is computed once and checkpointed.
        self.max_contamination = max_contamination
        self._bench_sh: DataFrame | None = None
        if benchmark is not None:
            from gminer_spark.textops.corpus import _shingle_hashes

            self._bench_sh = (
                _shingle_hashes(benchmark, contamination_n, "doc_id", "text")
                .select("sh")
                .distinct()
                .localCheckpoint()
            )
            self._contamination_n = contamination_n

    def update(self, batch_docs: DataFrame) -> DataFrame:
        """Process one batch; returns the admitted (doc_id) rows."""
        from gminer_spark.graph.cc import connected_components

        if self._bench_sh is not None:
            from gminer_spark.textops.corpus import _shingle_hashes

            doc_sh = _shingle_hashes(
                batch_docs, self._contamination_n, "doc_id", "text"
            )
            totals = doc_sh.groupBy("doc_id").agg(
                F.count("*").alias("n_sh")
            )
            hits = (
                doc_sh.join(self._bench_sh, on="sh", how="left_semi")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_hit"))
            )
            dirty = (
                totals.join(hits, on="doc_id")
                .where(
                    F.col("n_hit")
                    > F.col("n_sh") * F.lit(float(self.max_contamination))
                )
                .select("doc_id")
            )
            batch_docs = batch_docs.join(dirty, on="doc_id", how="left_anti")

        from gminer_spark.functions import h32

        buckets = band_buckets(
            batch_docs, self.num_hashes, self.bands, self.shingle_n
        ).localCheckpoint()
        shingled = buckets.select(
            F.col("doc_id").cast("long").alias("doc_id")
        ).distinct()
        # --- exact path: sub-shingle docs have no buckets ------------
        short = (
            batch_docs.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                h32(F.col("text")).alias("th"),
            )
            .distinct()
            .join(shingled, on="doc_id", how="left_anti")
        )
        if self.exact_index is not None:
            short = short.join(self.exact_index, on="th", how="left_anti")
        short_adm = short.groupBy("th").agg(F.min("doc_id").alias("doc_id"))
        # --- band path: shingled docs only ---------------------------
        ids = shingled
        if self.index is not None:
            hit = (
                buckets.join(self.index, on=["band", "bsig"], how="left_semi")
                .select(F.col("doc_id").cast("long").alias("doc_id"))
                .distinct()
            )
            fresh = ids.join(hit, on="doc_id", how="left_anti")
        else:
            fresh = ids
        fresh_buckets = buckets.join(
            fresh.select(F.col("doc_id")), on="doc_id", how="left_semi"
        ).localCheckpoint()
        a = fresh_buckets.alias("a")
        b = fresh_buckets.alias("b")
        edges = (
            a.join(b, on=["band", "bsig"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").cast("long").alias("src"),
                F.col("b.doc_id").cast("long").alias("dst"),
            )
            .distinct()
        )
        if edges.isEmpty():
            admitted = fresh
        else:
            labels = connected_components(edges).state
            admitted = (
                fresh.join(labels, fresh.doc_id == labels.id, "left")
                .where(
                    F.coalesce(F.col("component"), F.col("doc_id"))
                    == F.col("doc_id")
                )
                .select("doc_id")
            )
        admitted = admitted.unionByName(
            short_adm.select("doc_id")
        ).localCheckpoint()
        admitted_bands = fresh_buckets.join(
            admitted, on="doc_id", how="left_semi"
        ).select("band", "bsig")
        new_index = (
            admitted_bands
            if self.index is None
            else self.index.unionByName(admitted_bands)
        )
        self.index = new_index.distinct().localCheckpoint()
        new_th = short_adm.select("th")
        self.exact_index = (
            new_th
            if self.exact_index is None
            else self.exact_index.unionByName(new_th)
        ).distinct().localCheckpoint()
        return admitted


def shingle_containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """(doc_src, doc_ref, containment) — ordered pairs where
    ``containment = |S(src) ∩ S(ref)| / |S(src)| >= threshold`` over
    n-word shingle sets: the ASYMMETRIC near-dup test that Jaccard
    misses — a short page quoted wholesale inside a long one scores
    containment ~1 but Jaccard ~|short|/|long|.  The standard quote /
    sub-document-duplication detector in a corpus cleaning pass.

    Shares the inverted-index join and ``max_df`` rare-shingle cut
    with :func:`ngram_jaccard_pairs` (containment is then exact over
    the rare-shingle sets, identically in the oracle); the unordered
    intersection is computed once and emitted in both directions.
    """
    sh = _word_shingles(documents, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = sh.join(
            df_counts.where(F.col("df") <= max_df).select("shingle"),
            on="shingle",
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    both = inter.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_ref"),
        "inter",
    ).unionByName(
        inter.select(
            F.col("doc_b").alias("doc_src"),
            F.col("doc_a").alias("doc_ref"),
            "inter",
        )
    )
    return (
        both.join(
            sizes.withColumnRenamed("doc_id", "doc_src").withColumnRenamed(
                "sz", "sz_src"
            ),
            on="doc_src",
        )
        .select(
            "doc_src",
            "doc_ref",
            F.round(F.col("inter") / F.col("sz_src"), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def snm_pairs(
    documents: DataFrame,
    window: int = 3,
    key_len: int = 24,
    block_len: int = 4,
    threshold_micro: int = 300_000,
    max_block: int = 10_000,
) -> DataFrame:
    """Sorted-neighborhood near-dup pairs (Hernández & Stolfo,
    SIGMOD'95) — the entity-resolution classic, the 7th candidate-
    generation modality of this family (exact / inverted-index /
    MinHash-LSH / SimHash / containment / embedding / SNM): sort
    documents by a normalized key prefix and compare only rows within
    ``window`` positions of each other.

    Distributed shape: the global sort is replaced by PREFIX BLOCKING
    (first ``block_len`` chars of the key) + an in-block sort — the
    standard blocked SNM; cross-block adjacency is lost by design
    (blocking trades recall for scale, like every other modality's
    banding).  A hot block (every doc starting "the ") would make the
    in-block sort a straggler, so blocks larger than ``max_block``
    are dropped with a loud warning (the max_df discipline).
    Candidates are then verified with the exact 3-shingle Jaccard
    (same definition as the inverted-index dedup) and kept at
    ``threshold_micro``.

    Returns (doc_a, doc_b, jaccard_micro), doc_a < doc_b ordering by
    sort position.
    """
    import warnings

    from pyspark.sql import Window as W

    key = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "\\s+", " "), 1, key_len
    )
    keyed = documents.select(
        "doc_id", "text", key.alias("key")
    ).select(
        "doc_id", "text", "key", F.substring("key", 1, block_len).alias("blk")
    )
    sizes = keyed.groupBy("blk").agg(F.count("*").alias("bsz"))
    n_drop = sizes.where(F.col("bsz") > max_block).count()
    if n_drop:
        warnings.warn(
            f"snm_pairs: dropping {n_drop} blocks larger than "
            f"max_block={max_block} — their pairs are not compared",
            stacklevel=2,
        )
        keyed = keyed.join(
            sizes.where(F.col("bsz") <= max_block).select("blk"), on="blk"
        )
    pos = F.row_number().over(
        W.partitionBy("blk").orderBy("key", "doc_id")
    )
    ranked = keyed.select("doc_id", "blk", pos.alias("pos")).persist()
    cand = (
        ranked.alias("a")
        .join(
            ranked.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("b.pos") > F.col("a.pos"))
            & (F.col("b.pos") <= F.col("a.pos") + window),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )

    toks = F.filter(
        F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != ""
    )
    words = documents.select(
        "doc_id", F.posexplode(toks).alias("pos", "w")
    )
    lead_w = W.partitionBy("doc_id").orderBy("pos")
    sh = (
        words.select(
            "doc_id",
            F.concat_ws(
                " ",
                "w",
                F.lead("w", 1).over(lead_w),
                F.lead("w", 2).over(lead_w),
            ).alias("s"),
            F.lead("w", 2).over(lead_w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .select("doc_id", "s")
        .distinct()
        .persist()
    )
    nsh = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "s")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), on="s")
        .join(cand, on=["doc_a", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(
            nsh.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            on="doc_a",
        )
        .join(
            nsh.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
                * 1e6,
                0,
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
        .where(F.col("jaccard_micro") >= threshold_micro)
    )
    return out


def snm_pairs_oracle_sql(
    words_cte: str,
    shingles_cte: str,
    window: int = 3,
    key_len: int = 24,
    block_len: int = 4,
    threshold_micro: int = 300_000,
) -> str:
    """DuckDB mirror over the shared words/shingles CTEs — identical
    key normalization (regexp_replace needs the 'g' flag: DuckDB is
    first-match-only by default, the documented pitfall), blocking,
    window join, and Jaccard assembly."""
    return f"""
WITH {words_cte.strip()},
{shingles_cte.strip()},
keyed AS MATERIALIZED (
    SELECT doc_id,
           substr(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                  1, {key_len}) AS key
    FROM documents),
ranked AS MATERIALIZED (
    SELECT doc_id, substr(key, 1, {block_len}) AS blk,
           ROW_NUMBER() OVER (PARTITION BY substr(key, 1, {block_len})
                              ORDER BY key, doc_id) AS pos
    FROM keyed),
cand AS MATERIALIZED (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ranked a JOIN ranked b
    ON a.blk = b.blk AND b.pos > a.pos AND b.pos <= a.pos + {window}),
nsh AS MATERIALIZED (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM shingles GROUP BY doc_id),
inter AS MATERIALIZED (
    SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
    FROM cand c
    JOIN shingles x ON x.doc_id = c.doc_a
    JOIN shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
    GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       CAST(ROUND(CAST(i.i AS DOUBLE)
                  / CAST(na.n + nb.n - i.i AS DOUBLE) * 1e6) AS BIGINT)
           AS jaccard_micro
FROM inter i
JOIN nsh na ON na.doc_id = i.doc_a
JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE CAST(ROUND(CAST(i.i AS DOUBLE)
                 / CAST(na.n + nb.n - i.i AS DOUBLE) * 1e6) AS BIGINT)
      >= {threshold_micro}"""


def allpairs_jaccard(
    documents: DataFrame,
    threshold_micro: int = 300_000,
) -> DataFrame:
    """EXACT all-pairs similarity join via prefix filtering (Bayardo,
    Ma & Srikant, WWW'07 "Scaling Up All Pairs") — the 8th candidate-
    generation modality of this family, and the only one besides
    brute force with a COMPLETENESS GUARANTEE: every pair with
    3-shingle Jaccard >= t is returned (LSH/SimHash/SNM trade recall
    for scale; prefix filtering trades nothing).

    Prefix lemma: order the shingle universe by ANY common total
    order (here (df ASC, shingle ASC) — rarest first, which keeps the
    inverted prefix index's posting lists short); if J(A,B) >= t the
    two docs must share a shingle within each one's first
    |d| - ceil(t*|d|) + 1 shingles of that order.  Index only those
    prefixes, join, verify candidates with the exact Jaccard.

    Scale shape: NO global shingle sort — the prefix is selected with
    a per-doc window (bounded by doc size) over (df, shingle); the
    candidate join runs on the rare-shingle prefix index; the
    verification is a semi-joined intersection count.  The oracle is
    an INDEPENDENT brute-force all-pairs join — what's checked is the
    completeness lemma itself.

    Returns (doc_a, doc_b, jaccard_micro), doc_a < doc_b by id.
    """
    from pyspark.sql import Window as W

    toks = F.filter(
        F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != ""
    )
    words = documents.select(
        "doc_id", F.posexplode(toks).alias("pos", "w")
    )
    lead_w = W.partitionBy("doc_id").orderBy("pos")
    sh = (
        words.select(
            "doc_id",
            F.concat_ws(
                " ",
                "w",
                F.lead("w", 1).over(lead_w),
                F.lead("w", 2).over(lead_w),
            ).alias("s"),
            F.lead("w", 2).over(lead_w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .select("doc_id", "s")
        .distinct()
        .persist()
    )
    nsh = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    dfs = sh.groupBy("s").agg(F.count("*").cast("long").alias("df"))
    ranked = sh.join(dfs, on="s").select(
        "doc_id",
        "s",
        F.row_number()
        .over(
            W.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("s"))
        )
        .alias("rn"),
    )
    # prefix length for threshold t = threshold_micro/1e6:
    # n - ceil(t*n) + 1, all integer (ceil(a*n/1e6) via (a*n+999999)//1e6).
    # The output filter compares the MICRO-ROUNDED Jaccard, which can
    # admit J = t - eps (eps < 5e-7); size the prefix for t_micro - 1
    # so those boundary pairs are still generated.
    t_num = int(threshold_micro) - 1
    pref = ranked.join(nsh, on="doc_id").where(
        F.col("rn")
        <= F.col("n")
        - F.floor((F.lit(t_num) * F.col("n") + 999_999) / 1_000_000)
        + 1
    )
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), "s")
        .join(pref.select(F.col("doc_id").alias("doc_b"), "s"), on="s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "s")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), on="s")
        .join(cand, on=["doc_a", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("i"))
    )
    return (
        inter.join(
            nsh.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            on="doc_a",
        )
        .join(
            nsh.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
                * 1e6,
                0,
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
        .where(F.col("jaccard_micro") >= threshold_micro)
    )


def allpairs_jaccard_oracle_sql(
    words_cte: str, shingles_cte: str, threshold_micro: int = 300_000
) -> str:
    """INDEPENDENT brute-force all-pairs oracle (no prefix logic —
    the completeness lemma is what the compare checks)."""
    return f"""
WITH {words_cte.strip()},
{shingles_cte.strip()},
nsh AS MATERIALIZED (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM shingles GROUP BY doc_id),
inter AS MATERIALIZED (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS i
    FROM shingles a
    JOIN shingles b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       CAST(ROUND(CAST(i.i AS DOUBLE)
                  / CAST(na.n + nb.n - i.i AS DOUBLE) * 1e6) AS BIGINT)
           AS jaccard_micro
FROM inter i
JOIN nsh na ON na.doc_id = i.doc_a
JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE CAST(ROUND(CAST(i.i AS DOUBLE)
                 / CAST(na.n + nb.n - i.i AS DOUBLE) * 1e6) AS BIGINT)
      >= {threshold_micro}"""
