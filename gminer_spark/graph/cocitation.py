"""Co-citation and bibliographic-coupling similarity on the link graph.

The two classic link-based relatedness measures on a directed web
graph (Small 1973 / Kessler 1963):

* **co-citation**  cocit(a, b)   = |{w : w->a AND w->b}|   — pages a, b
  are related because the same pages LINK TO both;
* **coupling**     couple(a, b)  = |{w : a->w AND b->w}|   — pages a, b
  are related because both LINK TO the same pages.

Both are one wedge self-join grouped by the pair — the same shuffle
shape as the triangle wedge join (`graph/triangles.py`), and like it
quadratic in the CENTER vertex's degree.  At crawl scale a hub center
(a page cited by millions) must not emit millions² of pairs, so
centers above ``max_center_deg`` are dropped before the join — the
exact ``max_df`` cut the n-gram/LSH dedup family uses
(`textops/dedup.py`): ubiquitous centers carry no similarity signal
anyway (an IDF-zero feature).

Output is the global top-k pairs under the total order
(cnt DESC, a ASC, b ASC) — TakeOrderedAndProject, never a full sort —
with a micro-rounded Jaccard over the endpoint degrees.

Reference analog: GMiner's set-intersection joins over adjacency
lists (/root/reference/core/task.hpp respond/pull; the TC app's
merge-intersection apps/trianglecount.cpp:150-170) compute the same
|N(a) ∩ N(b)| kernel; here it is the declarative join-group-top-k so
Catalyst keeps it partial-aggregated and shuffle-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables


def _pair_counts(
    incid: DataFrame, max_center_deg: int
) -> DataFrame:
    """incid(center, member) -> (a, b, cnt) pairs a < b sharing a
    center, centers above the degree cap excluded pre-join."""
    deg = incid.groupBy("center").agg(F.count("*").alias("cdeg"))
    kept = incid.join(
        deg.where(F.col("cdeg") <= max_center_deg).select("center"),
        on="center",
        how="left_semi",
    )
    l = kept.select("center", F.col("member").alias("a"))
    r = kept.select("center", F.col("member").alias("b"))
    return (
        l.join(r, on="center")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )


def _with_jaccard(pairs: DataFrame, deg: DataFrame) -> DataFrame:
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(da, on="a")
        .join(db, on="b")
        .select(
            "a",
            "b",
            "cnt",
            F.round(
                F.col("cnt")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cnt"))
                * 1e6,
                0,
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
    )


def cocitation_topk(
    edges: DataFrame, top_k: int = 100, max_center_deg: int = 256
) -> DataFrame:
    """(a, b, cnt, jaccard_micro) — top-k co-cited pairs.

    Center = the citing page (shared IN-neighbor); Jaccard normalizes
    by each endpoint's in-degree.  Total order (cnt DESC, a, b).
    """
    incid = edges.select(
        F.col("src").alias("center"), F.col("dst").alias("member")
    ).distinct()
    deg = incid.groupBy(F.col("member").alias("id")).agg(
        F.count("*").alias("deg")
    )
    pairs = _pair_counts(incid, max_center_deg)
    return (
        _with_jaccard(pairs, deg)
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top_k)
    )


def coupling_topk(
    edges: DataFrame, top_k: int = 100, max_center_deg: int = 256
) -> DataFrame:
    """(a, b, cnt, jaccard_micro) — top-k bibliographically-coupled
    pairs.  Center = the cited page (shared OUT-neighbor); Jaccard
    normalizes by each endpoint's out-degree."""
    incid = edges.select(
        F.col("dst").alias("center"), F.col("src").alias("member")
    ).distinct()
    deg = incid.groupBy(F.col("member").alias("id")).agg(
        F.count("*").alias("deg")
    )
    pairs = _pair_counts(incid, max_center_deg)
    return (
        _with_jaccard(pairs, deg)
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top_k)
    )


def _oracle(
    edges_cte: str,
    center: str,
    member: str,
    top_k: int,
    max_center_deg: int,
) -> str:
    return f"""
WITH {edges_cte.strip()},
incid AS MATERIALIZED (
    SELECT DISTINCT {center} AS center, {member} AS member FROM edges),
kept AS MATERIALIZED (
    SELECT i.center, i.member FROM incid i
    JOIN (SELECT center FROM incid GROUP BY center
          HAVING COUNT(*) <= {max_center_deg}) c
    ON i.center = c.center),
deg AS MATERIALIZED (
    SELECT member AS id, COUNT(*) AS deg FROM incid GROUP BY member),
pairs AS MATERIALIZED (
    SELECT l.member AS a, r.member AS b, COUNT(*) AS cnt
    FROM kept l JOIN kept r ON l.center = r.center AND l.member < r.member
    GROUP BY l.member, r.member)
SELECT p.a, p.b, CAST(p.cnt AS BIGINT) AS cnt,
       CAST(ROUND(CAST(p.cnt AS DOUBLE)
                  / (da.deg + db.deg - p.cnt) * 1e6) AS BIGINT)
           AS jaccard_micro
FROM pairs p JOIN deg da ON da.id = p.a JOIN deg db ON db.id = p.b
ORDER BY p.cnt DESC, p.a ASC, p.b ASC
LIMIT {top_k}"""


def cocitation_oracle_sql(
    edges_cte: str, top_k: int = 100, max_center_deg: int = 256
) -> str:
    """Top-k co-citation pairs: center = src, member = dst."""
    return _oracle(edges_cte, "src", "dst", top_k, max_center_deg)


def coupling_oracle_sql(
    edges_cte: str, top_k: int = 100, max_center_deg: int = 256
) -> str:
    """Top-k coupling pairs: center = dst, member = src."""
    return _oracle(edges_cte, "dst", "src", top_k, max_center_deg)
