"""Text analysis, dedup, similarity search, multimodal plumbing, salting."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def docs_df(spark, texts, langs=None):
    rows = [
        (i, t, (langs or {}).get(i, "en"), f"src{i % 3}", len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_token_stats(spark):
    from gminer_spark.textops.analysis import token_stats

    d = docs_df(spark, ["one two  three", "", "a b c d e!"])
    got = {r["doc_id"]: r for r in token_stats(d).collect()}
    assert got[0]["n_ws_tokens"] == 3
    assert got[1]["n_ws_tokens"] == 0
    assert got[2]["n_ws_tokens"] == 5
    assert got[2]["n_bpe_tokens"] == 6  # a b c d e !


def test_lang_id(spark):
    from gminer_spark.textops.analysis import lang_id

    d = docs_df(
        spark,
        ["the cat and the dog is here", "der hund und die katze ist nicht da", "xyz"],
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in lang_id(d).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "unk"


def test_exact_dedup(spark):
    from gminer_spark.textops.dedup import exact_dup_groups

    d = docs_df(spark, ["same text", "same text", "unique", "same text"])
    rows = exact_dup_groups(d).collect()
    assert len(rows) == 1
    assert rows[0]["canonical_doc_id"] == 0 and rows[0]["n_dups"] == 3


def test_jaccard_and_minhash_agree_on_clear_dups(spark):
    from gminer_spark.textops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words in this document about spark engines"
    d = docs_df(spark, [base, near, far, base])
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()
    }
    assert (0, 3) in jac and (0, 1) in jac and (0, 2) not in jac
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(d, num_hashes=16, bands=8).collect()
    }
    assert (0, 3) in mh  # exact dup always collides in every band


def test_simhash_identical_and_near(spark):
    from gminer_spark.textops.dedup import simhash_near_pairs, simhash_signatures

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = docs_df(spark, [base, base, base + " extraword", "totally other content"])
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(d).collect()}
    assert sigs[0] == sigs[1]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(d, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0


def test_cosine_topk_vs_numpy(spark):
    from gminer_spark.sim.ann import cosine_topk

    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], i % 3) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {}
    for r in cosine_topk(emb, [0, 1], k=3).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    v = vecs.astype(np.float64)
    norm = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in (0, 1):
        order = [
            int(i)
            for i in sorted(range(50), key=lambda i: (-round(sims[q, i], 6), i))
            if i != q
        ][:3]
        assert got[q] == order


def test_ann_lsh_recall(spark):
    from gminer_spark.sim.ann import ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(5, 16)) * 4
    vecs = np.vstack([c + rng.normal(size=(20, 16)) * 0.3 for c in centers])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(len(vecs))],
        "vec_id long, embedding array<float>, label int",
    )
    exact = {}
    for r in cosine_topk(emb, [0, 20, 40], k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in ann_lsh_topk(emb, [0, 20, 40], k=5, n_planes=6, n_tables=6).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / 5 for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6  # clustered data, generous margin


def test_multimodal_plumbing(spark):
    from gminer_spark.multimodal.binary import attach_payload, decode_features

    d = docs_df(spark, ["hello world", "", "binary payload test"])
    wp = attach_payload(d)
    metas = {r["doc_id"]: r["meta"] for r in wp.collect()}
    assert metas[0]["n_bytes"] == len(b"hello world")
    assert metas[0]["mime"] == "text/plain"
    feats = {r["doc_id"]: r for r in decode_features(wp).collect()}
    assert feats[0]["feat"][0] == float(len(b"hello world"))
    assert feats[1]["feat"] == [0.0] * 8  # empty payload
    assert feats[2]["n_bytes"] == len(b"binary payload test")
    # real decode path is stubbed
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        decode_features(wp, stub=False).collect()


def test_salted_agg_matches_plain(spark):
    from gminer_spark.graph.salt import salted_agg, split_hubs
    from tests.conftest import STAR, edges_df

    edges = edges_df(spark, STAR)
    plain = {
        r["dst"]: r["n"]
        for r in edges.groupBy("dst").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["dst"]: r["count_src"]
        for r in salted_agg(edges, "dst", "src", agg="count", n_salts=4).collect()
    }
    assert salted == plain

    hubs = split_hubs(edges, degree_threshold=10, n_splits=4)
    hub_salts = (
        hubs.where(F.col("src") == 0).select("src_salt").distinct().count()
    )
    assert hub_salts > 1  # hub vertex 0 (degree 20) spread over salts
    normal_salts = (
        hubs.where(F.col("src") != 0).select("src_salt").distinct().collect()
    )
    assert [r["src_salt"] for r in normal_salts] == [0]


def test_jaccard_df_cut_kills_hot_shingle_pairs(spark):
    """One stopword-run shingle shared by EVERY doc must not create the
    all-pairs join: with the df-cut the hot shingle leaves the index,
    docs sharing only it produce no pair, and true near-dups (sharing
    rare shingles) survive with exact rare-set jaccard."""
    from gminer_spark.textops.dedup import ngram_jaccard_pairs

    hot = "the quick brown"  # 3-gram present in every doc
    docs = [(0, f"{hot} alpha beta gamma delta"),
            (1, f"{hot} alpha beta gamma delta"),  # true dup of 0
            (2, f"{hot} zig zag zoom whirl"),
            (3, f"{hot} completely different text here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncut = ngram_jaccard_pairs(df, n=3, threshold=0.05, max_df=None)
    cut = ngram_jaccard_pairs(df, n=3, threshold=0.05, max_df=3)
    uncut_pairs = {(r.doc_a, r.doc_b) for r in uncut.collect()}
    cut_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in cut.collect()}
    # without the cut every doc pairs with every other through `hot`
    assert len(uncut_pairs) == 6
    # with the cut, only the true dup pair survives — at jaccard 1.0
    # over the rare-shingle sets
    assert set(cut_pairs) == {(0, 1)}
    assert cut_pairs[(0, 1)] == 1.0


def test_jaccard_hot_shingle_skew_completes(spark):
    """Skew smoke: 2000 docs all sharing one hot shingle; the df-cut
    keeps the self-join off the 2000²-row partition and the query
    completes quickly with only the planted near-dup pair."""
    from gminer_spark.textops.dedup import ngram_jaccard_pairs

    hot = "lorem ipsum dolor"
    docs = [(i, f"{hot} unique{i} token{i} word{i} tail{i}")
            for i in range(2000)]
    docs.append((2000, "lorem ipsum dolor unique7 token7 word7 tail7"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.5, max_df=50).collect()
    }
    assert pairs == {(7, 2000)}


def test_embedding_near_dups_lsh_path(spark):
    """Above the all-pairs gate the LSH bucket join takes over: the
    plan contains no cartesian/nested-loop join and recall vs the
    exact path stays high at a tight threshold."""
    from gminer_spark.sim.ann import embedding_near_dups

    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, 16))
    rows = []
    for i in range(120):
        rows.append((2 * i, [float(x) for x in base[i]], 0))
        near = base[i] + rng.normal(size=16) * 0.02  # planted near-dup
        rows.append((2 * i + 1, [float(x) for x in near], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    exact = embedding_near_dups(emb, threshold=0.95, all_pairs_limit=10**9)
    lsh = embedding_near_dups(
        emb, threshold=0.95, all_pairs_limit=0, n_planes=8, n_tables=8
    )
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    exact_pairs = {(r.vec_a, r.vec_b) for r in exact.collect()}
    lsh_pairs = {(r.vec_a, r.vec_b) for r in lsh.collect()}
    assert lsh_pairs <= exact_pairs  # re-rank is exact: no false positives
    assert len(exact_pairs) >= 100  # the planted dups are found by exact
    recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8


def test_ann_ivf_recall_and_determinism(spark):
    """IVF = deterministic k-means cells + n_probe search + exact
    re-rank: on well-clustered data every query's true neighbors live
    in its nearest cells, so recall should be high; identical output
    under different input partitioning (md5 seeding, rounded
    centroids)."""
    from gminer_spark.sim.ann import ann_ivf_topk, cosine_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 16)) * 4
    vecs = np.vstack([c + rng.normal(size=(20, 16)) * 0.3 for c in centers])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(len(vecs))],
        "vec_id long, embedding array<float>, label int",
    )
    exact = {}
    for r in cosine_topk(emb, [0, 20, 40], k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    rows1 = ann_ivf_topk(emb, [0, 20, 40], k=5, n_cells=8, n_probe=2).collect()
    for r in rows1:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / 5 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8

    rows2 = ann_ivf_topk(
        emb.repartition(13), [0, 20, 40], k=5, n_cells=8, n_probe=2
    ).collect()
    norm = lambda rows: {(r["query_id"], r["neighbor_id"], r["cos"]) for r in rows}
    assert norm(rows1) == norm(rows2)


def test_repetition_stats(spark):
    from gminer_spark.textops.analysis import repetition_stats

    d = docs_df(
        spark,
        [
            "a a a a",            # 1 distinct / 4 tokens, all bigrams "a a"
            "w x y z",            # no repetition at all
            "spam spam ham spam", # top token 3/4; top bigram "spam spam" 1/3
            "solo",               # single token: no bigrams
            "",                   # zero tokens: dropped
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["dup_token_frac"] == 0.75 and got[0]["top_bigram_share"] == 1.0
    assert got[1]["dup_token_frac"] == 0.0 and got[1]["top_token_share"] == 0.25
    assert got[2]["top_token_share"] == 0.75
    assert round(got[2]["top_bigram_share"], 6) == round(1 / 3, 6)
    assert got[3]["n_tokens"] == 1 and got[3]["top_bigram_share"] == 0.0


# -- windowed co-occurrence --------------------------------------------------


def test_cooccurrence_matches_python(spark):
    from collections import defaultdict

    from gminer_spark.textops.cooccur import cooccurrence_topk

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cat and dog and cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.rk, r.w1, r.w2, r.cnt)
        for r in cooccurrence_topk(df, window=2, k=1000, min_count=1).collect()
    ]
    # python replica
    cnt = defaultdict(int)
    for _, text in docs:
        toks = text.lower().split()
        for i in range(len(toks)):
            for d in (1, 2):
                if i + d < len(toks):
                    a, b = sorted((toks[i], toks[i + d]))
                    cnt[(a, b)] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [(i + 1, w1, w2, c) for i, ((w1, w2), c) in enumerate(want)]
    assert got == want


def test_cooccurrence_lift_identity_pair(spark):
    from gminer_spark.textops.cooccur import cooccurrence_topk

    # "a b" x10 = 20 tokens; window 1 gives 19 adjacent pairs, every
    # one sorting to (a, b); c_a = c_b = 10, total = 20
    # lift = 19 * 20 / (10 * 10) = 3.8
    df = spark.createDataFrame([(1, "a b " * 10)], "doc_id long, text string")
    rows = cooccurrence_topk(df, window=1, k=10, min_count=1).collect()
    by_pair = {(r.w1, r.w2): r for r in rows}
    assert by_pair[("a", "b")].cnt == 19
    assert by_pair[("a", "b")].lift_micro == 3_800_000


def test_cooccurrence_deterministic(spark):
    from gminer_spark.textops.cooccur import cooccurrence_topk

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r1 = [tuple(r) for r in cooccurrence_topk(df, k=50).collect()]
    r2 = [tuple(r) for r in cooccurrence_topk(df.repartition(7), k=50).collect()]
    assert r1 == r2 and len(r1) == 50


# -- boilerplate detection ---------------------------------------------------


def test_boilerplate_shingles_detect_template(spark):
    from gminer_spark.textops.boilerplate import (
        boilerplate_ratio,
        boilerplate_shingles,
    )

    tpl = "cookie notice accept all"
    unique_b = [
        "ocean waves crash loudly tonight",
        "mountain trails wind upward slowly",
        "desert sands shift quietly below",
        "forest leaves rustle gently above",
    ]
    docs = [
        (i, f"{tpl} unique body {i} words here", "hostA") for i in range(4)
    ] + [(10 + i, unique_b[i], "hostB") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    bp = boilerplate_shingles(df, shingle_n=3, frac_pct=50, min_df=2).collect()
    assert bp and all(r.source == "hostA" for r in bp)
    shingles = {r.shingle for r in bp}
    assert "cookie notice accept" in shingles and "notice accept all" in shingles
    # hostB docs have zero boilerplate ratio; hostA docs a positive one
    ratios = {r.doc_id: r for r in boilerplate_ratio(df, 3, 50, 2).collect()}
    assert all(ratios[10 + i].n_boiler == 0 for i in range(4))
    assert all(ratios[i].n_boiler >= 2 for i in range(4))
    assert ratios[0].ratio_micro == round(ratios[0].n_boiler / ratios[0].n_shingles * 1e6)


def test_boilerplate_source_scoped(spark):
    from gminer_spark.textops.boilerplate import boilerplate_shingles

    # same shingle in 2 docs of DIFFERENT sources: never boilerplate
    docs = [
        (1, "shared phrase here plus alpha", "h1"),
        (2, "shared phrase here plus beta", "h2"),
        (3, "other words entirely gamma delta", "h1"),
        (4, "more other words epsilon zeta eta", "h2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    assert boilerplate_shingles(df, 3, 50, 2).count() == 0


def test_containment_asymmetric_quote_detection(spark):
    from gminer_spark.textops.dedup import shingle_containment_pairs

    short = "the quick brown fox jumps over the lazy dog"
    long_ = short + " and then continues with a great deal of entirely new material about spark engines and parquet files and shuffle partitions"
    other = "completely unrelated content talking about cooking recipes only"
    d = docs_df(spark, [short, long_, other])
    rows = {
        (r.doc_src, r.doc_ref): r.containment
        for r in shingle_containment_pairs(d, n=3, threshold=0.5, max_df=None).collect()
    }
    # short (doc 0) fully contained in long (doc 1); reverse is below 0.5
    assert rows[(0, 1)] == 1.0
    assert (1, 0) not in rows
    assert not any(2 in k for k in rows)


def test_containment_symmetric_for_exact_dups(spark):
    from gminer_spark.textops.dedup import shingle_containment_pairs

    t = "alpha beta gamma delta epsilon zeta eta theta"
    d = docs_df(spark, [t, t])
    rows = {
        (r.doc_src, r.doc_ref): r.containment
        for r in shingle_containment_pairs(d, n=3, threshold=0.9, max_df=None).collect()
    }
    assert rows == {(0, 1): 1.0, (1, 0): 1.0}


def test_kmeans_two_obvious_blobs(spark):
    """Two well-separated blobs, k=2: every point lands with its blob
    and each rep is a member of its own cluster."""
    from gminer_spark.sim.kmeans import kmeans, kmeans_representatives

    rng = np.random.default_rng(7)
    a = rng.normal(loc=0.0, scale=0.01, size=(12, 4))
    b = rng.normal(loc=1.0, scale=0.01, size=(12, 4))
    vecs = np.vstack([a, b]).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(24)],
        "vec_id long, embedding array<float>, label int",
    )
    asg = {r["vec_id"]: r["cluster"] for r in kmeans(emb, k=2, num_iter=3).collect()}
    blob_a = {asg[i] for i in range(12)}
    blob_b = {asg[i] for i in range(12, 24)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    reps = kmeans_representatives(emb, k=2, num_iter=3).collect()
    assert sorted(r["size"] for r in reps) == [12, 12]
    for r in reps:
        assert asg[r["rep_id"]] == r["cluster"]


def test_kmeans_matches_duckdb_oracle(spark):
    """Bit-identical assignments and reps vs the unrolled Lloyd CTE
    chain on a random float corpus (the micro-int / single-division /
    md5-init discipline is exactly what makes this hold)."""
    import duckdb

    from gminer_spark.sim.kmeans import (
        kmeans,
        kmeans_oracle_sql,
        kmeans_representatives,
        kmeans_representatives_oracle_sql,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 6)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], i % 3) for i in range(60)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE embeddings AS SELECT "
        "UNNEST($ids) AS vec_id, UNNEST($vs) AS embedding, 0 AS label",
        params={"ids": [r[0] for r in rows], "vs": [r[1] for r in rows]},
    )
    got = sorted(map(tuple, kmeans(emb, k=5, num_iter=3).collect()))
    want = sorted(map(tuple, con.sql(kmeans_oracle_sql(5, 3)).fetchall()))
    assert got == want
    got2 = sorted(
        map(tuple, kmeans_representatives(emb, k=5, num_iter=3).collect())
    )
    want2 = sorted(
        map(tuple, con.sql(kmeans_representatives_oracle_sql(5, 3)).fetchall())
    )
    assert got2 == want2


def test_kmeans_deterministic_under_partitioning(spark):
    from gminer_spark.sim.kmeans import kmeans

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 5)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    r1 = sorted(map(tuple, kmeans(emb.repartition(1), k=4, num_iter=2).collect()))
    r32 = sorted(map(tuple, kmeans(emb.repartition(32), k=4, num_iter=2).collect()))
    assert r1 == r32 and r1


def test_pii_scan_counts_and_redaction(spark):
    """Hand-built docs with known PII spans: exact counts, and the
    redacted fingerprint equals h32 of the hand-redacted text."""
    import hashlib

    from gminer_spark.textops.pii import pii_scan

    docs = spark.createDataFrame(
        [
            (1, "write to a.b-c_d@mail.example.org or x@y.io today"),
            (2, "call 555-123-4567 then 555-999-0000 from 10.0.0.1"),
            (3, "clean text with no personal data at all"),
            (4, "ip 192.168.001.042 and半width mail: a@b.co"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 2, 1)
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (0, 0, 0)
    assert (got[4]["n_emails"], got[4]["n_ips"]) == (1, 1)

    def h32(sx):
        return int(hashlib.md5(sx.encode()).hexdigest()[:8], 16)

    assert got[3]["redacted_h32"] == h32("clean text with no personal data at all")
    assert got[2]["redacted_h32"] == h32("call [PHONE] then [PHONE] from [IP]")
    assert got[1]["redacted_h32"] == h32("write to [EMAIL] or [EMAIL] today")


def test_pii_scan_email_runs_before_number_patterns(spark):
    """An address like 'a1@b2.co' must become one [EMAIL], not get its
    digits chewed by later patterns; fixed application order."""
    import hashlib

    from gminer_spark.textops.pii import pii_scan

    docs = spark.createDataFrame(
        [(1, "mail a1@b2.co home 1.2.3.4")], "doc_id long, text string"
    )
    r = pii_scan(docs).collect()[0]
    want = "mail [EMAIL] home [IP]"
    assert r["redacted_h32"] == int(
        hashlib.md5(want.encode()).hexdigest()[:8], 16
    )


def test_doc_keywords_hand_values(spark):
    """3 tiny docs: the ubiquitous word scores lowest; a doc-unique
    word wins its doc; ties break on word asc; empty doc excluded
    from N and output."""
    from gminer_spark.textops.retrieval import doc_keywords

    d = docs_df(
        spark,
        [
            "the cat sat",       # doc 0
            "the dog ran fast",  # doc 1
            "the the zebra",     # doc 2
            "   ",               # doc 3: whitespace-only
        ],
    )
    rows = doc_keywords(d, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    # N = 3; doc 0: cat/sat score 3*1e6/(1*3)=1e6 each, 'the' 1/3e6
    top0 = sorted(by_doc[0], key=lambda r: r["rk"])
    assert [(r["word"], r["score_micro"]) for r in top0] == [
        ("cat", 1_000_000),
        ("sat", 1_000_000),
    ]
    # doc 2: tf(the)=2, dl=3 -> 2*3e6/(3*3)=666667; zebra 1e6
    top2 = sorted(by_doc[2], key=lambda r: r["rk"])
    assert [(r["word"], r["tf"], r["score_micro"]) for r in top2] == [
        ("zebra", 1, 1_000_000),
        ("the", 2, 666_667),
    ]


def test_mmr_prefers_diverse_over_redundant(spark):
    """Query q=[1,0]; a=[1,0] (dup of best), b=[.9,.44], c=[0,1].
    Pure top-2 would pick the two near-copies; MMR's second pick must
    skip the redundant near-duplicate."""
    from gminer_spark.sim.mmr import mmr_select

    rows = [
        (0, [1.0, 0.0, 0.0]),      # query
        (1, [0.99, 0.1, 0.0]),     # best hit
        (2, [0.99, 0.11, 0.0]),    # near-copy of the best hit
        (3, [0.7, 0.0, 0.71]),     # relevant but diverse (3rd axis)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    picks = sorted(
        mmr_select(emb, query_id=0, k=3).collect(),
        key=lambda r: r["rank"],
    )
    assert [p["vec_id"] for p in picks] == [1, 3, 2]
    assert picks[0]["score2_micro"] == picks[0]["rel_micro"]
    # pick 2's objective: rel(3) - sim(3, 1) < rel(3)
    assert picks[1]["score2_micro"] < picks[1]["rel_micro"]


def test_mmr_tie_breaks_min_id(spark):
    """Two identical candidates: the smaller vec_id wins each round."""
    from gminer_spark.sim.mmr import mmr_select

    rows = [
        (0, [1.0, 0.0]),
        (5, [0.5, 0.5]),
        (7, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    picks = [
        r["vec_id"]
        for r in sorted(
            mmr_select(emb, query_id=0, k=2).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert picks == [5, 7]


def test_snm_pairs_finds_prefix_neighbors_only(spark):
    """Two near-identical docs sharing a prefix are found; an
    identical-content doc whose first words differ lands in another
    block and is (by design) missed — the blocking trade-off."""
    from gminer_spark.textops.dedup import snm_pairs

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = docs_df(
        spark,
        [
            body + " one",            # 0
            body + " two",            # 1: same prefix, near-dup of 0
            "zz " + body,             # 2: same content, different block
            "totally different text here with many other words now",
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_micro"]
        for r in snm_pairs(d, window=3, threshold_micro=300_000).collect()
    }
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] >= 700_000


def test_snm_pairs_max_block_cap_warns(spark):
    import pytest as _pytest

    from gminer_spark.textops.dedup import snm_pairs

    d = docs_df(spark, ["same prefix words here %d" % i for i in range(6)])
    with _pytest.warns(UserWarning, match="max_block"):
        rows = snm_pairs(
            d, window=5, threshold_micro=0, max_block=3
        ).collect()
    assert rows == []  # the single hot block was dropped


def test_hybrid_rrf_fuses_both_lists(spark):
    """A doc ranked #1 lexically and #2 vectorially must outscore a
    doc that tops one list but misses the other; absent ranks
    contribute 0."""
    from gminer_spark.textops.retrieval import hybrid_rrf

    d = docs_df(
        spark,
        [
            "query apple banana apple",   # 0: strong lexical hit
            "apple only once here",       # 1: weak lexical
            "nothing relevant at all",    # 2: no lexical hit
        ],
    )
    # embeddings: vec 9 is the query; doc 0 close, doc 2 closest
    emb = spark.createDataFrame(
        [
            (9, [1.0, 0.0]),
            (0, [0.9, 0.1]),
            (1, [0.0, 1.0]),
            (2, [0.99, 0.01]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["doc_id"]: r
        for r in hybrid_rrf(
            d, emb, ["apple"], query_vec_id=9, k_each=3, k_out=10
        ).collect()
    }
    # doc 0: bm25 rank 1 + cos rank 2 -> 1e6/61 + 1e6/62
    assert rows[0]["rrf_micro"] == round(1e6 / 61) + round(1e6 / 62)
    assert (rows[0]["bm25_rank"], rows[0]["cos_rank"]) == (1, 2)
    # doc 2: cos rank 1 only
    assert rows[2]["rrf_micro"] == round(1e6 / 61)
    assert (rows[2]["bm25_rank"], rows[2]["cos_rank"]) == (0, 1)
    # fused order: doc 0 first
    assert rows[0]["rk"] == 1


def test_allpairs_jaccard_complete_vs_bruteforce(spark):
    """The prefix-filtered join must return EXACTLY the brute-force
    pair set (completeness lemma), on a corpus where blocking-style
    methods would miss cross-prefix pairs."""
    from gminer_spark.textops.dedup import allpairs_jaccard

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        base + " one two three",
        "zz yy " + base,                   # same content, different prefix
        base.replace("delta", "delta2") + " four",
        "totally different words entirely here now and then again",
        "alpha beta gamma something else entirely different now ok",
    ]
    d = docs_df(spark, docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_micro"]
        for r in allpairs_jaccard(d, threshold_micro=250_000).collect()
    }
    # brute force in python over 3-shingle sets
    def shset(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want = {}
    ss = [shset(t) for t in docs]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            i = len(ss[a] & ss[b])
            if not i:
                continue
            jm = round(i / len(ss[a] | ss[b]) * 1e6)
            if jm >= 250_000:
                want[(a, b)] = jm
    assert got == want
    assert (0, 1) in got  # the cross-prefix pair SNM-style blocking misses


def test_vocab_growth_hand_values(spark):
    """4 docs, 2 buckets: cumulative tokens and the
    first-appearance-bucket distinct counts."""
    from gminer_spark.textops.analysis import vocab_growth

    d = docs_df(
        spark,
        [
            "a b c",        # bucket 1
            "a b d",        # bucket 1
            "a e",          # bucket 2
            "f f f f",      # bucket 2
        ],
    )
    got = {r["bucket"]: r for r in vocab_growth(d, n_buckets=2).collect()}
    b1, b2 = got[1], got[2]
    assert (b1["n_docs"], b1["n_tokens"], b1["n_distinct_words"]) == (2, 6, 4)
    assert (b2["n_docs"], b2["n_tokens"], b2["n_distinct_words"]) == (4, 12, 6)


def test_rknn_counts_hub_and_outlier(spark):
    """A tight cluster of 3 + a far outlier with k=1: cluster members
    point at each other; nobody points at the outlier (rknn 0), the
    outlier points at its nearest cluster member."""
    from gminer_spark.sim.mmr import rknn_counts

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.14]),
            (3, [0.99, -0.14]),
            (9, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["rknn"] for r in rknn_counts(emb, k=1).collect()}
    assert got[9] == 0
    assert sum(got.values()) == 4  # every vector emits exactly one vote
    assert got[1] >= 1  # 9's vote goes to 1 (cos -1 vs ~-0.99 for 2,3)


def test_kmeans_purity_hand_values(spark):
    """Two well-separated blobs with known labels; k=2 Lloyd finds
    them, purity rows carry exact majority counts (one point
    mislabeled on purpose)."""
    from gminer_spark.sim.kmeans import kmeans_purity

    rows = (
        [(i, [10.0 + (i % 3) * 0.1, 0.0], 1) for i in range(5)]
        + [(5, [10.2, 0.05], 2)]                 # mislabeled in blob A
        + [(10 + i, [-10.0 - (i % 3) * 0.1, 0.0], 2) for i in range(5)]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["cluster"]: (r["n_points"], r["majority_label"], r["n_majority"])
        for r in kmeans_purity(emb, k=2, num_iter=3).collect()
    }
    stats = sorted(got.values())
    assert stats == [(5, 2, 5), (6, 1, 5)]


def test_kmeans_silhouette_separated_blobs(spark):
    """Two tight, well-separated blobs: simplified silhouette near
    1e6 for every cluster (b >> a)."""
    from gminer_spark.sim.kmeans import kmeans_silhouette

    rows = [
        (i, [10.0 + (i % 3) * 0.01, 0.0], 0) for i in range(6)
    ] + [(10 + i, [-10.0 - (i % 3) * 0.01, 0.0], 1) for i in range(6)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = kmeans_silhouette(emb, k=2, num_iter=3).collect()
    assert len(got) == 2
    for r in got:
        assert r["sil_mean_micro"] > 990_000, r
