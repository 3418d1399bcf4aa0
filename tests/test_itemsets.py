"""A-Priori frequent itemsets: hand fixture, brute-force replication,
basket cap."""

from __future__ import annotations

import random

import pytest

from gminer_spark.itemsets import frequent_itemsets


def baskets_df(spark, rows):
    return spark.createDataFrame(
        [(int(b), int(i)) for b, i in rows], "basket long, item long"
    )


def test_itemsets_hand_values(spark):
    rows = (
        [(1, i) for i in (10, 20, 30)]
        + [(2, i) for i in (10, 20, 30)]
        + [(3, i) for i in (10, 20, 40)]
        + [(3, 20)]  # duplicate line: distinct-per-basket must dedup
    )
    got = {
        (r["k"], r["itemset"]): r["support"]
        for r in frequent_itemsets(baskets_df(spark, rows)).collect()
    }
    assert got == {
        (2, "10|20"): 3,
        (2, "10|30"): 2,
        (2, "20|30"): 2,
        (3, "10|20|30"): 2,
    }


def test_itemsets_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = {(rng.randrange(40), rng.randrange(25)) for _ in range(400)}
    from collections import Counter, defaultdict

    by_basket = defaultdict(set)
    for b, i in rows:
        by_basket[b].add(i)
    c2, c3 = Counter(), Counter()
    for items in by_basket.values():
        s = sorted(items)
        for ai in range(len(s)):
            for bi in range(ai + 1, len(s)):
                c2[(s[ai], s[bi])] += 1
                for ci in range(bi + 1, len(s)):
                    c3[(s[ai], s[bi], s[ci])] += 1
    want = {
        (2, f"{a}|{b}"): n for (a, b), n in c2.items() if n >= 3
    } | {(3, f"{a}|{b}|{c}"): n for (a, b, c), n in c3.items() if n >= 3}
    got = {
        (r["k"], r["itemset"]): r["support"]
        for r in frequent_itemsets(
            baskets_df(spark, rows), min_support=3
        ).collect()
    }
    assert got == want
    assert any(k == 3 for k, _ in got)  # fixture actually exercises triples


def test_itemsets_max_basket_cap_warns(spark):
    rows = [(1, i) for i in range(10)] + [(2, 0), (2, 1), (3, 0), (3, 1)]
    with pytest.warns(UserWarning, match="max_basket"):
        got = {
            r["itemset"]: r["support"]
            for r in frequent_itemsets(
                baskets_df(spark, rows), max_basket=5, max_k=2
            ).collect()
        }
    # basket 1 dropped: pair (0,1) counted only from baskets 2 and 3
    assert got == {"0|1": 2}


def test_association_rules_hand_values(spark):
    """Baskets: {a,b} x3, {a} x1, {b,c} x1 → rule b→a: conf 3/4,
    a→b: conf 3/4, lift = 3*5/(4*4)."""
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20),
            (4, 10), (5, 20), (5, 30)]
    from gminer_spark.itemsets import association_rules

    got = {
        (r["antecedent"], r["consequent"]): (
            r["support"],
            r["confidence_micro"],
            r["lift_micro"],
        )
        for r in association_rules(
            baskets_df(spark, rows), min_confidence_micro=0
        ).collect()
    }
    # sup(10)=4, sup(20)=4, sup(10,20)=3, n_baskets=5
    lift = round(3 * 5 / (4 * 4) * 1e6)
    assert got == {
        (10, 20): (3, 750_000, lift),
        (20, 10): (3, 750_000, lift),
    }


def test_association_rules_confidence_filter(spark):
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (4, 10)]
    from gminer_spark.itemsets import association_rules

    got = {
        (r["antecedent"], r["consequent"])
        for r in association_rules(
            baskets_df(spark, rows), min_confidence_micro=800_000
        ).collect()
    }
    # 20→10 has conf 1.0 (sup(20)=3, sup pair=3); 10→20 conf 3/4 < 0.8
    assert got == {(20, 10)}


def test_itemset_maintainer_matches_oneshot(spark):
    """Cross-batch baskets: items of the same basket arriving in
    different batches (and re-arriving as duplicates) must yield the
    identical pair-count table as the one-shot engine."""
    import random as _random

    from gminer_spark.itemsets import ItemsetMaintainer, frequent_itemsets

    rng = _random.Random(23)
    rows = [(rng.randrange(30), rng.randrange(20)) for _ in range(300)]
    m = ItemsetMaintainer(min_support=2)
    for i in range(3):
        chunk = rows[i::3] + rows[:5]  # overlap re-feeds duplicates
        m.update(
            spark.createDataFrame(chunk, "basket long, item long")
        )
    got = {
        r["itemset"]: r["support"] for r in m.frequent_pairs().collect()
    }
    want = {
        r["itemset"]: r["support"]
        for r in frequent_itemsets(
            spark.createDataFrame(set(rows), "basket long, item long"),
            min_support=2,
            max_k=2,
        ).collect()
    }
    assert got == want and got


def test_itemset_maintainer_foreachbatch(spark, tmp_path):
    """Structured-streaming feed via foreachBatch parquet batches."""
    from gminer_spark.itemsets import ItemsetMaintainer, frequent_itemsets

    rows = [(b, i) for b in range(12) for i in range(b % 5 + 1)]
    halves = [rows[0::2], rows[1::2]]
    src = str(tmp_path / "basket_batches")
    for batch in halves:
        spark.createDataFrame(batch, "basket long, item long").coalesce(
            1
        ).write.mode("append").parquet(src)

    m = ItemsetMaintainer(min_support=3)
    stream = (
        spark.readStream.schema("basket long, item long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(
        lambda batch, _id: (m.update(batch), None)[1]
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["itemset"]: r["support"] for r in m.frequent_pairs().collect()}
    want = {
        r["itemset"]: r["support"]
        for r in frequent_itemsets(
            spark.createDataFrame(rows, "basket long, item long"),
            min_support=3,
            max_k=2,
        ).collect()
    }
    assert got == want and got


def test_recommend_items_hand_values(spark):
    """Rules a->b (lift 2e6), a->c (lift 3e6), b->c (lift 1e6); user
    owns {a, b}: c scores 3e6+1e6 (both rules fire), b excluded
    (owned)."""
    from gminer_spark.itemsets import recommend_items

    rules = spark.createDataFrame(
        [
            (10, 20, 3, 500_000, 2_000_000),
            (10, 30, 3, 500_000, 3_000_000),
            (20, 30, 3, 500_000, 1_000_000),
        ],
        "antecedent long, consequent long, support long, "
        "confidence_micro long, lift_micro long",
    )
    ui = spark.createDataFrame(
        [(1, 10), (1, 20)], "user long, item long"
    )
    got = [
        (r["rk"], r["item"], r["score_micro"])
        for r in recommend_items(ui, rules, k=5).collect()
    ]
    assert got == [(1, 30, 4_000_000)]
