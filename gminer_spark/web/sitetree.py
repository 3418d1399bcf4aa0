"""Site-tree rollup: page counts per (host, path prefix) at every
depth level — the crawl-budget / sitemap view of a URL corpus ("how
big is each section of each site"), run before deciding what to
re-crawl or which sections to sample for a training corpus.

One pass: parse host + path (the same RE2-safe patterns as
``robots_filter``/``host_of``), split the path into segments, explode
each URL into its depth-1..K prefixes, and aggregate — a single
shuffle keyed by (host, prefix).  n_urls counts rows (crawl
frequency), n_pages counts distinct URLs (section size); their ratio
is the per-section revisit rate.

Reference analog: the owner-annotated partition dump + count-by-key
aggregation (SURVEY §2.4 Voronoi histogram) with the partition key
swapped for the URL hierarchy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.web.edges import host_of

PATH_RE = "^https?://[^/?#]+(/[^?#]*)?"


def site_tree(urls: DataFrame, depth: int = 2) -> DataFrame:
    """(host, depth, prefix, n_urls, n_pages) — one row per host and
    path prefix of 1..``depth`` leading segments present in ``urls``
    (column ``url``).  n_urls counts URL rows (crawl frequency);
    n_pages counts distinct PAGES — host + query-/fragment-stripped
    path — so ``?session=`` style variants collapse.  Hosts are
    lower-cased; a URL with fewer segments than ``depth`` contributes
    only the prefixes it has."""
    path = F.regexp_extract(F.col("url"), PATH_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    exploded = urls.select(
        F.concat(host_of(F.col("url")), path).alias("page"),
        host_of(F.col("url")).alias("host"),
        segs.alias("segs"),
    ).where(
        # Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than being
        # empty — a path-less URL must be dropped before the explode
        F.size("segs") >= 1
    ).select(
        "page",
        "host",
        "segs",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(depth), F.size("segs")))
        ).alias("k"),
    )
    return (
        exploded.select(
            "page",
            "host",
            F.col("k").cast("long").alias("depth"),
            F.concat(
                F.lit("/"),
                F.concat_ws("/", F.slice("segs", F.lit(1), F.col("k"))),
            ).alias("prefix"),
        )
        .groupBy("host", "depth", "prefix")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("page").cast("long").alias("n_pages"),
        )
    )


def site_tree_oracle_sql(urls_cte: str, depth: int = 2) -> str:
    """DuckDB mirror over a CTE ``urls(url)`` — identical host/path
    regexes, prefix explosion via range unnest."""
    return f"""
WITH {urls_cte.strip()},
parsed AS MATERIALIZED (
    SELECT lower(regexp_extract(url, '^https?://([^/?#]+)', 1))
               || COALESCE(regexp_extract(url, '{PATH_RE}', 1), '')
               AS page,
           lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
           list_filter(
               string_split(
                   COALESCE(regexp_extract(url, '{PATH_RE}', 1), ''),
                   '/'),
               s -> s <> '') AS segs
    FROM urls),
exploded AS MATERIALIZED (
    SELECT page, host,
           CAST(k AS BIGINT) AS depth,
           '/' || array_to_string(list_slice(segs, 1, k), '/') AS prefix
    FROM parsed,
         UNNEST(range(1, LEAST({depth}, len(segs)) + 1)) AS t(k))
SELECT host, depth, prefix,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT page) AS BIGINT) AS n_pages
FROM exploded
GROUP BY host, depth, prefix"""
