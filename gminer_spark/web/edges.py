"""Mint the hash-partitioned edge table from extracted links.

Replaces the reference's partitioning pipeline output — text files
with owner ids inlined per adjacency entry
(/root/reference/partition/BDGPartitioner.tpp:339-350).  Ownership
here is never materialized: ids are ``xxhash64`` of the normalized
url (JVM-side, no Python), and a row's partition is a pure function
``pmod(hash(src), N)`` applied by the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.web.extract import links_table


def url_ids(links: DataFrame) -> DataFrame:
    """Distinct url → id mapping (id = xxhash64(url))."""
    urls = (
        links.select(F.col("src_url").alias("url"))
        .unionByName(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    return urls.select("url", F.xxhash64("url").alias("id"))


def edges_from_links(
    links: DataFrame, canonicalize: bool = False, n_partitions: int | None = None
) -> DataFrame:
    """links(src_url, dst_url) → edges(src, dst): hashed ids, self-loops
    dropped, duplicates collapsed; optionally canonicalized src<dst.

    The dedup's partial aggregation is the map-side combine; the final
    ``repartition(src)`` realizes the hash partitioning the reference
    bakes into its data files.
    """
    e = links.select(
        F.xxhash64("src_url").alias("src"), F.xxhash64("dst_url").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    if canonicalize:
        e = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    e = e.distinct()
    if n_partitions:
        e = e.repartition(n_partitions, "src")
    return e


def pages_to_edges(pages: DataFrame, canonicalize: bool = False) -> DataFrame:
    """Full spine: pages → links → edges."""
    return edges_from_links(links_table(pages), canonicalize=canonicalize)
