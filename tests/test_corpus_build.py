"""Corpus-construction ops (split / chunking / contamination)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dataset_split_deterministic_and_stable(spark):
    from gminer_spark.textops.corpus import dataset_split

    d1 = _docs(spark, [(i, "x") for i in range(200)])
    s1 = {r["doc_id"]: (r["bucket"], r["split"]) for r in dataset_split(d1).collect()}
    # python replication of the bucketing
    for i, (b, sp) in s1.items():
        want_b = int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:8], 16) % 100
        assert b == want_b
        assert sp == ("train" if b < 96 else "val" if b < 98 else "test")
    # growing the corpus never moves an old document
    d2 = _docs(spark, [(i, "x") for i in range(400)])
    s2 = {r["doc_id"]: (r["bucket"], r["split"]) for r in dataset_split(d2).collect()}
    assert all(s2[i] == s1[i] for i in s1)


def test_chunk_documents_windows(spark):
    from gminer_spark.textops.corpus import chunk_documents

    text = " ".join(str(i) for i in range(10))
    docs = _docs(spark, [(1, text), (2, "solo"), (3, "  a   b  ")])
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    # doc 1: stride 3, starts 0,3,6,9
    assert rows[(1, 0)] == (4, "0 1 2 3")
    assert rows[(1, 1)] == (4, "3 4 5 6")
    assert rows[(1, 2)] == (4, "6 7 8 9")
    assert rows[(1, 3)] == (1, "9")
    assert rows[(2, 0)] == (1, "solo")
    # whitespace runs collapse; empty tokens dropped
    assert rows[(3, 0)] == (2, "a b")
    assert len([k for k in rows if k[0] == 1]) == 4


def test_contamination_exact_overlap(spark):
    from gminer_spark.textops.corpus import contamination

    docs = _docs(
        spark,
        [
            (1, "a b c d e f"),     # shares the bench 4-gram "a b c d"
            (2, "x y z w v u"),     # disjoint
            (3, "a b"),             # too short for 4-grams
        ],
    )
    bench = _docs(spark, [(10, "q a b c d")])
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contam_micro"])
        for r in contamination(docs, bench, n=4).collect()
    }
    # doc1 4-grams: "a b c d", "b c d e", "c d e f" -> 1 hit of 3
    assert got[1] == (3, 1, 333333)
    assert got[2] == (3, 0, 0)
    assert got[3] == (0, 0, 0)


def test_build_training_corpus_end_to_end(spark):
    """Composed pipeline: quality gate, exact dup, near dup, split,
    chunks — each stage's effect visible on a crafted corpus."""
    from gminer_spark.textops.corpus import build_training_corpus

    long_text = " ".join(f"tok{i}" for i in range(60))
    near_dup = " ".join(f"tok{i}" for i in range(59)) + " tokX"
    rows = [
        (1, long_text),
        (2, long_text),        # exact dup of 1 -> dropped
        (3, near_dup),         # near dup of 1 -> dropped by LSH+CC
        (4, "!!!! ,,,, ;;;;"), # punctuation-only -> quality-gated
        (5, " ".join(f"zz{i}" for i in range(80))),  # independent doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_training_corpus(docs, chunk_tokens=32, overlap=4).collect()
    kept = {r["doc_id"] for r in out}
    assert kept == {1, 5}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 60 tokens, stride 28 -> starts 0,28,56 -> 3 chunks
    assert len(by_doc[1]) == 3
    assert sorted(r["chunk_id"] for r in by_doc[1]) == [0, 1, 2]
    assert all(r["split"] in ("train", "val", "test") for r in out)
    # chunk text reassembles to the token stream
    c0 = next(r for r in by_doc[1] if r["chunk_id"] == 0)
    assert c0["chunk"].split(" ")[:3] == ["tok0", "tok1", "tok2"]
    assert c0["n_tokens"] == 32


def test_top_ngrams_counts_and_plan(spark):
    from pyspark.sql import functions as F

    from gminer_spark.textops.corpus import top_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    rows = {r["ngram"]: (r["rk"], r["cnt"]) for r in top_ngrams(docs, n=2, k=3).collect()}
    # bigrams: doc1: "a b","b a","a b","b c"; doc2: "a b","b x"
    assert rows["a b"] == (1, 3)
    assert set(rows) == {"a b", "b a", "b c"}  # ties broken ngram-asc
    plan = top_ngrams(docs, n=2, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global single-partition window


def test_pack_token_stream_tiles_exactly(spark):
    from gminer_spark.textops.corpus import pack_token_stream

    docs = _docs(
        spark,
        [(i, " ".join(f"t{i}_{j}" for j in range(7 + (i * 3) % 11)))
         for i in range(60)]
        + [(99, "")],  # empty doc is dropped
    )
    rows = pack_token_stream(docs, ctx_len=16, n_shards=4).collect()
    assert all(r["doc_id"] != 99 for r in rows)
    # each shard's packs tile the stream: every pack except the last
    # is exactly full, and segments tile [0, ctx_len) without gaps
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for (shard, pid), segs in by_pack.items():
        segs.sort(key=lambda r: r["pack_start"])
        pos = 0
        for s in segs:
            assert s["pack_start"] == pos
            assert s["n_tokens"] >= 1
            pos += s["n_tokens"]
        last_pid = max(p for (sh, p) in by_pack if sh == shard)
        if pid < last_pid:
            assert pos == 16
        else:
            assert 0 < pos <= 16
    # a document's segments reassemble to its token stream
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(60):
        segs = sorted(by_doc[i], key=lambda r: r["seg_id"])
        assert segs[0]["doc_start"] == 0
        toks = []
        for s in segs:
            assert s["doc_start"] == len(toks)
            toks.extend(s["piece"].split(" "))
        assert toks == [f"t{i}_{j}" for j in range(7 + (i * 3) % 11)]


def test_stratified_sample_rates_and_stability(spark):
    import hashlib

    from gminer_spark.textops.corpus import stratified_sample

    def mk(n):
        return spark.createDataFrame(
            [(i, "x", "en" if i % 2 == 0 else "zh") for i in range(n)],
            "doc_id long, text string, lang string",
        )

    rates = {"en": 300, "zh": 1000}
    got = {r["doc_id"]: r for r in stratified_sample(mk(500), rates).collect()}
    for i in range(500):
        coin = int(hashlib.md5(f"strat:{i}".encode()).hexdigest()[:8], 16) % 1000
        keep = coin < (300 if i % 2 == 0 else 1000)
        assert (i in got) == keep
        if keep:
            assert got[i]["coin"] == coin
    # all zh kept, ~30% en kept
    assert sum(1 for i in got if i % 2 == 1) == 250
    # content-keyed: growing the corpus never flips an old document
    g2 = {r["doc_id"] for r in stratified_sample(mk(1000), rates).collect()}
    assert {i for i in g2 if i < 500} == set(got)


def test_select_by_token_budget_greedy(spark):
    from gminer_spark.textops.corpus import select_by_token_budget

    # no punctuation -> quality = min(1, n_tokens/50); ties by doc_id
    def words(n):
        return " ".join(f"w{j}" for j in range(n))

    docs = _docs(
        spark, [(0, words(60)), (1, words(60)), (2, words(25)), (3, words(10))]
    )
    rows = {
        r["doc_id"]: r
        for r in select_by_token_budget(docs, budget_tokens=130).collect()
    }
    # greedy order (quality desc, doc_id): 0 (cum 60), 1 (120), 2 taken
    # at 120 < 130 (cum 145, overshoot allowed), 3 rejected at 145
    assert set(rows) == {0, 1, 2}
    assert rows[0]["cum_tokens"] == 60 and rows[1]["cum_tokens"] == 120
    assert rows[2]["cum_tokens"] == 145
    assert rows[0]["quality_micro"] == 1_000_000
    assert rows[2]["quality_micro"] == 500_000
