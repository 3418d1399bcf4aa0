"""Mirror-host detection: host pairs that serve (near-)identical page
sets, found by Jaccard over page-content fingerprints.

Web crawls are full of mirrors — the same site served from several
hostnames (www/no-www, CDNs, scrapers, country mirrors).  Left in, a
mirror multiplies every page-level signal (PageRank mass, dedup work,
training-corpus bytes) by the mirror count, so host-level mirror
collapse runs right after fingerprinting and before the expensive
page-grain stages.

Reference analog: GMiner's set-intersection-on-adjacency primitives
(`core/task.hpp` respond-side intersection); here the "adjacency" is
the host→fingerprint set and the intersection runs as an
inverted-index equi-join — never all-pairs:

1. distinct (host, fp),
2. drop fingerprints shared by more than ``max_df`` hosts (boilerplate
   pages — empty bodies, 404 templates, cookie walls — would otherwise
   create a quadratic hot-key blowup, same df-cut discipline as
   `textops/dedup.py` n-gram Jaccard),
3. self-join on fp with ``host_a < host_b`` → shared counts (shuffle
   keyed by fingerprint: each fp contributes |hosts(fp)|² pairs,
   bounded by max_df²),
4. join per-host set sizes, Jaccard = shared / (n_a + n_b - shared).

Everything is built-in SQL expressions (no UDF, whole-stage codegen);
the plan at 100 TB is two hash aggregates plus one bounded equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32_sql


def mirror_hosts(
    pagefps: DataFrame,
    min_jaccard: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Host pairs whose fingerprint sets overlap with Jaccard ≥
    ``min_jaccard`` → ``(host_a, host_b, n_shared, n_a, n_b,
    jaccard_micro)``.

    ``pagefps`` is any ``(host, fp)`` table (one row per page; dups
    collapse).  ``max_df`` drops fingerprints present on more than
    that many hosts before pairing.  ``jaccard_micro`` is the Jaccard
    rounded to 1e-6 as a BIGINT (cross-engine value-stable).
    """
    fps = pagefps.select("host", "fp").distinct()
    # per-host set size BEFORE the df-cut: Jaccard denominators must
    # reflect true set sizes or boilerplate-heavy hosts inflate
    sizes = fps.groupBy("host").agg(F.count("*").alias("n"))
    rare = fps.join(
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp"),
        on="fp",
    )
    a = rare.select(F.col("host").alias("host_a"), "fp")
    b = rare.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, on="fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")),
            on="host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")),
            on="host_b",
        )
        .withColumn(
            "jaccard_micro",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
                * 1e6,
                0,
            ).cast("long"),
        )
        .where(F.col("jaccard_micro") >= int(min_jaccard * 1e6))
    )
    return out.select(
        "host_a", "host_b", "n_shared", "n_a", "n_b", "jaccard_micro"
    )


def mirror_hosts_oracle_sql(
    pagefps_cte: str, min_jaccard: float = 0.5, max_df: int = 1000
) -> str:
    """DuckDB witness over any CTE ``pagefps(host, fp)``."""
    return f"""
WITH {pagefps_cte.strip()},
fps AS MATERIALIZED (SELECT DISTINCT host, fp FROM pagefps),
sizes AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM fps GROUP BY host),
rare AS (
    SELECT f.host, f.fp FROM fps f
    JOIN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_df}) d
    ON f.fp = d.fp),
shared AS (
    SELECT a.host AS host_a, b.host AS host_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM rare a JOIN rare b ON a.fp = b.fp AND a.host < b.host
    GROUP BY a.host, b.host)
SELECT s.host_a, s.host_b, s.n_shared, sa.n AS n_a, sb.n AS n_b,
       CAST(ROUND(CAST(s.n_shared AS DOUBLE)
                  / (sa.n + sb.n - s.n_shared) * 1e6) AS BIGINT)
           AS jaccard_micro
FROM shared s
JOIN sizes sa ON sa.host = s.host_a
JOIN sizes sb ON sb.host = s.host_b
WHERE CAST(ROUND(CAST(s.n_shared AS DOUBLE)
                 / (sa.n + sb.n - s.n_shared) * 1e6) AS BIGINT)
      >= {int(min_jaccard * 1e6)}
"""


def doc_mirror_pagefps_sql() -> str:
    """The contract fixture as a DuckDB CTE: every document lives on
    host ``h<k>`` (k = h32(doc_id) mod 17); every third document (by
    md5 of 'm:'||doc_id) is ALSO mirrored onto ``m<k>`` — so each
    (h<k>, m<k>) pair shares ~⅓ of its fingerprints."""
    k = f"{h32_sql('CAST(doc_id AS VARCHAR)')} % 17"
    mirror_pick = f"{h32_sql(chr(39) + 'm:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} % 3 = 0"
    fp = h32_sql("text")
    return f"""pagefps AS (
    SELECT 'h' || CAST({k} AS VARCHAR) AS host, {fp} AS fp FROM documents
    UNION ALL
    SELECT 'm' || CAST({k} AS VARCHAR) AS host, {fp} AS fp
    FROM documents WHERE {mirror_pick})"""
