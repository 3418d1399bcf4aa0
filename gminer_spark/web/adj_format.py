"""Readers/writer for the reference's adjacency text formats.

GMiner ingests four whitespace text formats (documented in
/root/reference/docs/TUTORIALS.md:22-42, samples in
sample-datasets/*.adj; parsed by per-app ``to_vertex`` overrides,
e.g. apps/trianglecount.cpp:161-179):

    normal:      vid \\t num_nbrs nb1 nb2 ...
    label:       vid lbl \\t nb1 lbl1 nb2 lbl2 ...
    attr:        vid \\t a1 a2 ... \\t num_nbrs nb1 nb2 ...
    multi-attr:  vid \\t a1 ... \\t num nb1 w1 nb2 w2 ...   (edge weights)

Attribute lists are SPACE-separated (sample-datasets/attr_sample.adj:
``1\\tA1 B2 C9\\t3 2 4 5``; the reference parsers strtok on ' ' and
'; '), so the readers split the attribute field on ``[;\\s]+``.

and, post-partitioning, an owner-annotated variant
(``vid wid \\t nb1 wid1 nb2 wid2 ...`` —
partition/BDGPartitioner.tpp:339-350).

These readers let a reference user load their existing files
directly; parsing is pure ``split``/``cast`` Spark SQL (no UDF) so
it runs inside whole-stage codegen.  Output is the engine's
normalized tables: ``edges(src,dst[,weight])`` (+ ``vertices`` with
labels/attrs where the format carries them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _lines(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).where(F.trim("value") != "")


def read_normal(spark: SparkSession, path: str) -> DataFrame:
    """normal format → edges(src, dst).  The leading neighbor count is
    redundant and dropped (the reference re-derives it too)."""
    parts = _lines(spark, path).select(
        F.split(F.trim("value"), "\\s+").alias("t")
    )
    return parts.select(
        F.element_at("t", 1).cast("long").alias("src"),
        F.explode(F.slice("t", 3, 1_000_000)).alias("nbr"),
    ).select("src", F.col("nbr").cast("long").alias("dst"))


def read_label(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """label format → (vertices(id, label), edges(src, dst))."""
    parts = _lines(spark, path).select(
        F.split(F.trim("value"), "\\s+").alias("t")
    )
    vertices = parts.select(
        F.element_at("t", 1).cast("long").alias("id"),
        F.element_at("t", 2).alias("label"),
    )
    pairs = parts.select(
        F.element_at("t", 1).cast("long").alias("src"),
        F.posexplode(F.slice("t", 3, 1_000_000)).alias("pos", "tok"),
    )
    edges = pairs.where(F.col("pos") % 2 == 0).select(
        "src", F.col("tok").cast("long").alias("dst")
    )
    return vertices, edges


def read_attr(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """attr format → (vertices(id, attrs:array<string>), edges)."""
    cols = _lines(spark, path).select(F.split("value", "\t").alias("c"))
    vertices = cols.select(
        F.trim(F.element_at("c", 1)).cast("long").alias("id"),
        F.split(F.trim(F.element_at("c", 2)), "[;\\s]+").alias("attrs"),
    )
    nbrs = cols.select(
        F.trim(F.element_at("c", 1)).cast("long").alias("src"),
        F.split(F.trim(F.element_at("c", 3)), "\\s+").alias("t"),
    )
    edges = nbrs.select(
        "src", F.explode(F.slice("t", 2, 1_000_000)).alias("nbr")
    ).select("src", F.col("nbr").cast("long").alias("dst"))
    return vertices, edges


def read_multi_attr(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """multi-attr format → (vertices(id, attrs), edges(src, dst, weight))."""
    cols = _lines(spark, path).select(F.split("value", "\t").alias("c"))
    vertices = cols.select(
        F.trim(F.element_at("c", 1)).cast("long").alias("id"),
        F.split(F.trim(F.element_at("c", 2)), "[;\\s]+").alias("attrs"),
    )
    toks = cols.select(
        F.trim(F.element_at("c", 1)).cast("long").alias("src"),
        F.posexplode(
            F.slice(F.split(F.trim(F.element_at("c", 3)), "\\s+"), 2, 1_000_000)
        ).alias("pos", "tok"),
    )
    nb = toks.where(F.col("pos") % 2 == 0).select(
        "src", (F.col("pos") / 2).cast("long").alias("k"),
        F.col("tok").cast("long").alias("dst"),
    )
    wt = toks.where(F.col("pos") % 2 == 1).select(
        F.col("src").alias("src2"),
        ((F.col("pos") - 1) / 2).cast("long").alias("k2"),
        F.col("tok").cast("double").alias("weight"),
    )
    edges = nb.join(
        wt, (nb.src == wt.src2) & (nb.k == wt.k2)
    ).select("src", "dst", "weight")
    return vertices, edges


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """owner-annotated format → edges(src, src_wid, dst, dst_wid).

    The reference bakes worker ownership into the data; we surface it
    as columns (and then ignore it — ownership is a hash function
    here, SURVEY.md §1.3)."""
    parts = _lines(spark, path).select(
        F.split(F.trim("value"), "\\s+").alias("t")
    )
    pairs = parts.select(
        F.element_at("t", 1).cast("long").alias("src"),
        F.element_at("t", 2).cast("int").alias("src_wid"),
        F.posexplode(F.slice("t", 3, 1_000_000)).alias("pos", "tok"),
    )
    nb = pairs.where(F.col("pos") % 2 == 0).select(
        "src", "src_wid", (F.col("pos") / 2).cast("long").alias("k"),
        F.col("tok").cast("long").alias("dst"),
    )
    wid = pairs.where(F.col("pos") % 2 == 1).select(
        F.col("src").alias("s2"), ((F.col("pos") - 1) / 2).cast("long").alias("k2"),
        F.col("tok").cast("int").alias("dst_wid"),
    )
    return nb.join(wid, (nb.src == wid.s2) & (nb.k == wid.k2)).select(
        "src", "src_wid", "dst", "dst_wid"
    )


def write_partitioned(
    edges: DataFrame, path: str, n_workers: int = 8
) -> None:
    """Dump the graph in the reference's owner-annotated text layout
    (one directory per worker id — the ``part_{wid}`` files the
    reference's dump_partition writes, partition/Driver.hpp:30-40).
    Ownership = pmod(id, n_workers)."""
    adj = (
        edges.select(
            "src",
            F.pmod(F.col("src"), F.lit(n_workers)).cast("int").alias("wid"),
            F.concat_ws(
                " ",
                F.col("dst").cast("string"),
                F.pmod(F.col("dst"), F.lit(n_workers)).cast("string"),
            ).alias("nbr_tok"),
        )
        .groupBy("src", "wid")
        .agg(F.array_join(F.sort_array(F.collect_list("nbr_tok")), " ").alias("nbrs"))
        .select(
            "wid",
            F.concat_ws(
                "\t",
                F.concat_ws(" ", F.col("src").cast("string"), F.col("wid").cast("string")),
                F.col("nbrs"),
            ).alias("value"),
        )
    )
    adj.repartition("wid").write.mode("overwrite").partitionBy("wid").text(path)
