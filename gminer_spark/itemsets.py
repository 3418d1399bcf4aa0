"""A-Priori frequent-itemset mining over basket tables (Agrawal &
Srikant, VLDB'94), expressed as Spark join-chains.

The reference mines *graph* patterns by growing candidate subgraphs
level-by-level and pruning against a support bound mid-job
(`apps/maxclique.cpp` candidate pruning, SURVEY §2.4 partial+final
max with a mid-job bound); this is the same grow-and-prune discipline
on *set* patterns: level k candidates are generated only from
surviving level k-1 itemsets, so the squaring join never touches
items that already failed the support test.

Scale posture:
* the per-basket self-join is the only quantity that squares, and it
  squares in BASKET SIZE, not corpus size — ``max_basket`` drops
  oversized baskets loudly (the repo's max_df discipline; a basket
  with 10⁵ items is a crawler artifact, not a co-occurrence signal);
* level-1 and level-2 survivors prune the next level via semi-joins
  BEFORE the candidate join (A-Priori anti-monotonicity: a frequent
  triple's sub-pairs are all frequent, so pruning never changes the
  result — it only shrinks the join);
* support counting is one shuffle per level on the itemset key, with
  map-side partial counts (Catalyst partial+final agg).

Output: one row per frequent itemset of size 2..max_k —
``(k, itemset, support)`` with ``itemset`` the '|'-joined sorted
member ids (string: no NULL padding, total-order friendly).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    baskets: DataFrame,
    min_support: int = 2,
    max_k: int = 3,
    basket_col: str = "basket",
    item_col: str = "item",
    max_basket: int | None = None,
) -> DataFrame:
    """Frequent itemsets of size 2..``max_k`` (2 or 3) with support
    >= ``min_support`` over ``baskets`` rows (basket_col, item_col).

    Returns (k:long, itemset:string, support:long).
    """
    if max_k not in (2, 3):
        raise ValueError("max_k must be 2 or 3")
    b = (
        baskets.select(
            F.col(basket_col).cast("long").alias("basket"),
            F.col(item_col).cast("long").alias("item"),
        )
        .distinct()
        .persist()
    )
    if max_basket is not None:
        sizes = b.groupBy("basket").agg(F.count("*").alias("sz"))
        n_drop = sizes.where(F.col("sz") > max_basket).count()
        if n_drop:
            warnings.warn(
                f"frequent_itemsets: dropping {n_drop} baskets larger "
                f"than max_basket={max_basket} — their pairs are not "
                "counted",
                stacklevel=2,
            )
            b = b.join(
                sizes.where(F.col("sz") <= max_basket).select("basket"),
                on="basket",
            ).persist()

    # level 1: frequent items prune the pair join's BOTH sides
    f1 = (
        b.groupBy("item")
        .agg(F.count("*").cast("long").alias("sup"))
        .where(F.col("sup") >= min_support)
        .select("item")
    )
    b1 = b.join(f1, on="item").select("basket", "item")

    # level 2: per-basket ordered self-join, one count shuffle
    pair_occ = b1.alias("a").join(
        b1.alias("bb"),
        (F.col("a.basket") == F.col("bb.basket"))
        & (F.col("a.item") < F.col("bb.item")),
    ).select(
        F.col("a.basket").alias("basket"),
        F.col("a.item").alias("x"),
        F.col("bb.item").alias("y"),
    )
    p2 = (
        pair_occ.groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
        .persist()
    )

    out = p2.select(
        F.lit(2).cast("long").alias("k"),
        F.concat_ws("|", "x", "y").alias("itemset"),
        "support",
    )

    if max_k >= 3:
        # level 3: extend surviving pair OCCURRENCES (not all pairs)
        # by a third frequent item, then A-Priori-prune candidates
        # whose (x,z) or (y,z) sub-pair is infrequent before counting.
        p2_occ = pair_occ.join(p2.select("x", "y"), on=["x", "y"])
        cand = p2_occ.join(
            b1.select("basket", F.col("item").alias("z")), on="basket"
        ).where(F.col("z") > F.col("y"))
        cand = cand.join(
            p2.select(F.col("x").alias("x"), F.col("y").alias("z")).select(
                "x", "z"
            ),
            on=["x", "z"],
        ).join(
            p2.select(F.col("x").alias("y"), F.col("y").alias("z")).select(
                "y", "z"
            ),
            on=["y", "z"],
        )
        t3 = (
            cand.groupBy("x", "y", "z")
            .agg(F.count("*").cast("long").alias("support"))
            .where(F.col("support") >= min_support)
        )
        out = out.unionByName(
            t3.select(
                F.lit(3).cast("long").alias("k"),
                F.concat_ws("|", "x", "y", "z").alias("itemset"),
                "support",
            )
        )
    return out


def frequent_itemsets_oracle_sql(
    baskets_sql: str, min_support: int = 2, max_k: int = 3
) -> str:
    """DuckDB oracle: brute-force level counts (no pruning — A-Priori
    anti-monotonicity makes the pruned engine result identical).
    ``baskets_sql`` must select columns (basket, item)."""
    triple = ""
    if max_k >= 3:
        triple = f"""
UNION ALL
SELECT CAST(3 AS BIGINT) AS k,
       CAST(a.item AS VARCHAR) || '|' || CAST(b2.item AS VARCHAR)
           || '|' || CAST(c.item AS VARCHAR) AS itemset,
       CAST(COUNT(*) AS BIGINT) AS support
FROM b a
JOIN b b2 ON a.basket = b2.basket AND a.item < b2.item
JOIN b c  ON a.basket = c.basket AND b2.item < c.item
GROUP BY a.item, b2.item, c.item
HAVING COUNT(*) >= {min_support}"""
    return f"""
WITH b AS MATERIALIZED (
    SELECT DISTINCT basket, item FROM ({baskets_sql})
)
SELECT CAST(2 AS BIGINT) AS k,
       CAST(a.item AS VARCHAR) || '|' || CAST(b2.item AS VARCHAR) AS itemset,
       CAST(COUNT(*) AS BIGINT) AS support
FROM b a
JOIN b b2 ON a.basket = b2.basket AND a.item < b2.item
GROUP BY a.item, b2.item
HAVING COUNT(*) >= {min_support}{triple}"""


def association_rules(
    baskets: DataFrame,
    min_support: int = 2,
    min_confidence_micro: int = 250_000,
    basket_col: str = "basket",
    item_col: str = "item",
    max_basket: int | None = None,
) -> DataFrame:
    """Pair association rules x→y from the frequent-pair table:
    ``(antecedent, consequent, support, confidence_micro,
    lift_micro)`` — both directions of every frequent pair, filtered
    by confidence ≥ ``min_confidence_micro`` (micro-units).

    confidence(x→y) = sup(x,y)/sup(x);
    lift(x→y) = sup(x,y)·n_baskets / (sup(x)·sup(y)) — symmetric, the
    co-purchase strength normalized by chance (the log-free lift
    idiom; products promoted to double before the division, the
    BIGINT-wrap pitfall from cooccur.py).

    One extra aggregate (item supports) and one broadcast-able join
    beyond :func:`frequent_itemsets` — the rule table is the
    recommender / "customers also bought" surface of basket mining.
    """
    b = (
        baskets.select(
            F.col(basket_col).cast("long").alias("basket"),
            F.col(item_col).cast("long").alias("item"),
        )
        .distinct()
        .persist()
    )
    if max_basket is not None:
        sizes = b.groupBy("basket").agg(F.count("*").alias("sz"))
        b = b.join(
            sizes.where(F.col("sz") <= max_basket).select("basket"),
            on="basket",
        )
    n_baskets = b.select(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    isup = b.groupBy("item").agg(F.count("*").cast("long").alias("sup"))
    pairs = (
        b.alias("a")
        .join(
            b.alias("bb"),
            (F.col("a.basket") == F.col("bb.basket"))
            & (F.col("a.item") < F.col("bb.item")),
        )
        .groupBy(
            F.col("a.item").alias("x"), F.col("bb.item").alias("y")
        )
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    directed = pairs.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("y").alias("antecedent"),
            F.col("x").alias("consequent"),
            "support",
        )
    )
    enriched = (
        directed.join(
            isup.select(
                F.col("item").alias("antecedent"),
                F.col("sup").alias("sup_a"),
            ),
            on="antecedent",
        )
        .join(
            isup.select(
                F.col("item").alias("consequent"),
                F.col("sup").alias("sup_c"),
            ),
            on="consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(
                F.col("support").cast("double")
                / F.col("sup_a").cast("double")
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("confidence_micro"),
            F.round(
                F.col("support").cast("double")
                * F.col("n_baskets").cast("double")
                / (F.col("sup_a").cast("double") * F.col("sup_c").cast("double"))
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("lift_micro"),
        )
    )
    return enriched.where(
        F.col("confidence_micro") >= min_confidence_micro
    )


def association_rules_oracle_sql(
    baskets_sql: str,
    min_support: int = 2,
    min_confidence_micro: int = 250_000,
) -> str:
    """DuckDB mirror of :func:`association_rules` — identical ratio
    trees, CAST-to-DOUBLE per the decimal-literal pitfall."""
    return f"""
WITH b AS MATERIALIZED (
    SELECT DISTINCT basket, item FROM ({baskets_sql})
),
nb AS MATERIALIZED (
    SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
isup AS MATERIALIZED (
    SELECT item, CAST(COUNT(*) AS BIGINT) AS sup FROM b GROUP BY item),
p AS MATERIALIZED (
    SELECT a.item AS x, b2.item AS y, CAST(COUNT(*) AS BIGINT) AS support
    FROM b a JOIN b b2 ON a.basket = b2.basket AND a.item < b2.item
    GROUP BY a.item, b2.item
    HAVING COUNT(*) >= {min_support}),
d AS (
    SELECT x AS antecedent, y AS consequent, support FROM p
    UNION ALL
    SELECT y, x, support FROM p),
r AS (
    SELECT d.antecedent, d.consequent, d.support,
           CAST(ROUND(CAST(d.support AS DOUBLE) / CAST(sa.sup AS DOUBLE)
                      * 1e6) AS BIGINT) AS confidence_micro,
           CAST(ROUND(CAST(d.support AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
                      / (CAST(sa.sup AS DOUBLE) * CAST(sc.sup AS DOUBLE))
                      * 1e6) AS BIGINT) AS lift_micro
    FROM d
    JOIN isup sa ON sa.item = d.antecedent
    JOIN isup sc ON sc.item = d.consequent
    CROSS JOIN nb)
SELECT * FROM r WHERE confidence_micro >= {min_confidence_micro}"""


class ItemsetMaintainer:
    """Streaming frequent-pair maintenance: feed (basket, item) row
    batches (e.g. from ``foreachBatch``), read ``frequent_pairs``
    between updates.

    Baskets may SPAN batches: each update reduces the batch to the
    genuinely new (basket, item) rows (anti-join against the
    accumulated item table), then adds exactly the pair occurrences
    those rows create — new×new within the batch plus new×old against
    the accumulated table — so the maintained counts equal the
    one-shot :func:`frequent_itemsets` pair counts on the union (the
    pair count is order-independent; the two-phase contract witness
    checks the equality on split feeds).

    State is two flat tables behind ``localCheckpoint`` (lineage never
    chains across batches — the maintainer-twin discipline of
    PageRankMaintainer / CCMaintainer): the seen (basket, item) rows
    partitioned by basket, and the (x, y, support) counts.
    """

    def __init__(self, min_support: int = 2) -> None:
        self.min_support = min_support
        self.items: DataFrame | None = None
        self.counts: DataFrame | None = None

    def update(self, batch: DataFrame) -> DataFrame:
        b = batch.select(
            F.col("basket").cast("long").alias("basket"),
            F.col("item").cast("long").alias("item"),
        ).distinct()
        if self.items is None:
            new = b
        else:
            new = b.join(self.items, on=["basket", "item"], how="left_anti")
        new = new.localCheckpoint()

        nn = (
            new.alias("a")
            .join(
                new.alias("bb"),
                (F.col("a.basket") == F.col("bb.basket"))
                & (F.col("a.item") < F.col("bb.item")),
            )
            .select(
                F.col("a.item").alias("x"), F.col("bb.item").alias("y")
            )
        )
        deltas = [nn]
        if self.items is not None:
            no = new.alias("n").join(
                self.items.alias("o"), on="basket"
            ).where(F.col("n.item") != F.col("o.item"))
            deltas.append(
                no.select(
                    F.least("n.item", "o.item").alias("x"),
                    F.greatest("n.item", "o.item").alias("y"),
                )
            )
        delta = deltas[0]
        for d in deltas[1:]:
            delta = delta.unionByName(d)
        dcount = delta.groupBy("x", "y").agg(
            F.count("*").cast("long").alias("d")
        )

        if self.counts is None:
            merged = dcount.select(
                "x", "y", F.col("d").alias("support")
            )
        else:
            merged = (
                self.counts.join(dcount, on=["x", "y"], how="full")
                .select(
                    "x",
                    "y",
                    (
                        F.coalesce("support", F.lit(0))
                        + F.coalesce("d", F.lit(0))
                    ).cast("long").alias("support"),
                )
            )
        self.counts = merged.localCheckpoint()
        self.items = (
            new
            if self.items is None
            else self.items.unionByName(new)
        ).localCheckpoint()
        return self.frequent_pairs()

    def frequent_pairs(self) -> DataFrame:
        """(k, itemset, support) for pairs at ``min_support`` — the
        same shape as :func:`frequent_itemsets` with max_k=2."""
        if self.counts is None:
            raise ValueError("no batches fed yet")
        return self.counts.where(
            F.col("support") >= self.min_support
        ).select(
            F.lit(2).cast("long").alias("k"),
            F.concat_ws("|", "x", "y").alias("itemset"),
            "support",
        )


def recommend_items(
    user_items: DataFrame,
    rules: DataFrame,
    k: int = 5,
) -> DataFrame:
    """(user, rk, item, score_micro) — top-``k`` recommendations per
    user from an association-rule table (:func:`association_rules`):
    for every rule whose antecedent the user owns, the consequent is
    a candidate; candidates the user ALREADY owns are anti-joined
    away; score = Σ lift_micro over the firing rules (exact BIGINT —
    lift is per-rule micro-rounded once); ties (score DESC, item
    ASC).

    The "customers also bought" surface of the basket-mining family.
    Scale shape: rules are a broadcast-able dimension (bounded by the
    frequent-pair count); the candidate join is user_items × rules on
    the item key; top-k per user is a window bounded by the user's
    candidate count.
    """
    from pyspark.sql import Window as W

    ui = user_items.select(
        F.col("user").cast("long").alias("user"),
        F.col("item").cast("long").alias("item"),
    ).distinct()
    cand = (
        ui.join(
            rules.select(
                F.col("antecedent").alias("item"),
                F.col("consequent"),
                "lift_micro",
            ),
            on="item",
        )
        .select("user", F.col("consequent").alias("item"), "lift_micro")
        .join(ui, on=["user", "item"], how="left_anti")
        .groupBy("user", "item")
        .agg(F.sum("lift_micro").cast("long").alias("score_micro"))
    )
    w = W.partitionBy("user").orderBy(F.desc("score_micro"), F.asc("item"))
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("user", "rk", "item", "score_micro")
    )


def recommend_items_oracle_sql(
    baskets_sql: str,
    user_items_sql: str,
    min_support: int = 2,
    min_confidence_micro: int = 100_000,
    k: int = 5,
) -> str:
    """DuckDB mirror: the rule table re-derived by the value-green
    :func:`association_rules_oracle_sql` body, the same anti-join and
    exact lift-sum scoring."""
    rules = association_rules_oracle_sql(
        baskets_sql, min_support, min_confidence_micro
    )
    return f"""
WITH rec_rules AS MATERIALIZED (SELECT * FROM ({rules})),
rec_ui AS MATERIALIZED (
    SELECT DISTINCT CAST("user" AS BIGINT) AS usr,
           CAST(item AS BIGINT) AS item
    FROM ({user_items_sql})),
rec_cand AS MATERIALIZED (
    SELECT u.usr, r.consequent AS item,
           CAST(SUM(r.lift_micro) AS BIGINT) AS score_micro
    FROM rec_ui u
    JOIN rec_rules r ON r.antecedent = u.item
    WHERE NOT EXISTS (
        SELECT 1 FROM rec_ui o
        WHERE o.usr = u.usr AND o.item = r.consequent)
    GROUP BY u.usr, r.consequent)
SELECT usr AS "user",
       CAST(ROW_NUMBER() OVER (PARTITION BY usr
                               ORDER BY score_micro DESC, item ASC)
            AS INT) AS rk,
       item, score_micro
FROM rec_cand
QUALIFY rk <= {k}"""
