"""Deterministic Common-Crawl-style pages fixtures (FIXTURES.md).

One page per vertex; the page's ``<a href>`` links realize a chosen
graph topology.  Controlled noise exercises normalization: fragments,
trailing slashes, duplicate links, relative hrefs, and a ``mailto:``
that must be ignored.  The ``text`` column is the golden extraction
output — engine-extracted text must equal it byte-for-byte.

These play the role of the reference's hand-checkable sample graphs
(/root/reference/sample-datasets/*.adj, docs/TUTORIALS.md:12-42).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_WORDS = (
    "crawl web page link graph spark shuffle vertex edge rank label "
    "partition block superstep anchor index corpus token fetch parse"
).split()

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def url_for(vid: int, namespace: str = "fix") -> str:
    return f"https://site{vid % 7}.example/{namespace}/p{vid}"


def page_rows(
    edges: list[tuple[int, int]],
    namespace: str = "fix",
    seed: int = 42,
    noise: bool = True,
) -> list[tuple]:
    """Rows (url, warc_ts, html, text, lang) realizing ``edges``."""
    rng = random.Random(seed)
    out_adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for s, d in edges:
        out_adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)

    rows = []
    for i, vid in enumerate(sorted(verts)):
        title = f"p{vid}"
        filler = " ".join(rng.choice(_WORDS) for _ in range(12))
        anchors: list[str] = []
        for j, nbr in enumerate(out_adj.get(vid, [])):
            target = url_for(nbr, namespace)
            style = rng.randrange(5) if noise else 0
            if style == 1:
                target += "#frag"  # fragment → stripped
            elif style == 2:
                target += "/"  # trailing slash → stripped
            elif style == 3:
                anchors.append(f'<a href="{target}">dup{j}</a>')  # duplicate
            elif style == 4:
                target = f"/{namespace}/p{nbr}" if nbr % 7 == vid % 7 else target
            anchors.append(f'<a href="{target}">to {nbr}</a>')
        if noise and rng.random() < 0.3:
            anchors.append('<a href="mailto:x@example.com">mail</a>')
        if noise and rng.random() < 0.2:
            anchors.append(f'<a href="{url_for(vid, namespace)}">self</a>')
        html = (
            f"<html><head><title>{title}</title></head><body>"
            f"<p>{filler}</p>{''.join(anchors)}</body></html>"
        ).encode("utf-8")
        text = f"{title}\n{filler}"
        lang = "de" if vid % 13 == 0 else "en"
        rows.append(
            (
                url_for(vid, namespace),
                _EPOCH + dt.timedelta(seconds=i),
                html,
                text,
                lang,
            )
        )
    return rows


def pages_df(
    spark: SparkSession,
    edges: list[tuple[int, int]],
    namespace: str = "fix",
    seed: int = 42,
    noise: bool = True,
) -> DataFrame:
    return spark.createDataFrame(
        page_rows(edges, namespace, seed, noise), PAGES_SCHEMA
    )


def pages_df_distributed(
    spark: SparkSession,
    edges: "DataFrame",
    namespace: str = "bench",
    seed: int = 42,
) -> DataFrame:
    """Distributed pages generation from an ``edges(src, dst)`` DataFrame.

    For bench-scale fixtures (FIXTURES.md `bench_1m`): adjacency is
    grouped per vertex and each partition's pages are rendered inside
    an Arrow-batched kernel.  Noise is seeded per-vertex (md5 of
    ``(seed, vid, j)``) so output is deterministic under any
    partitioning / parallelism — unlike :func:`page_rows`, which uses
    one sequential RNG stream.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for vid, nbrs in zip(pdf["id"], pdf["nbrs"]):
            vid = int(vid)
            h = int(
                hashlib.md5(f"{seed}:{vid}".encode()).hexdigest()[:8], 16
            )
            title = f"p{vid}"
            filler = " ".join(
                _WORDS[(h >> (i * 2)) % len(_WORDS)] for i in range(10)
            )
            anchors = []
            for j, nbr in enumerate(sorted(int(x) for x in nbrs)):
                target = url_for(nbr, namespace)
                style = int(
                    hashlib.md5(f"{seed}:{vid}:{j}".encode()).hexdigest()[:2], 16
                ) % 4
                if style == 1:
                    target += "#frag"
                elif style == 2:
                    target += "/"
                anchors.append(f'<a href="{target}">to {nbr}</a>')
            html = (
                f"<html><head><title>{title}</title></head><body>"
                f"<p>{filler}</p>{''.join(anchors)}</body></html>"
            ).encode("utf-8")
            rows.append(
                (
                    url_for(vid, namespace),
                    _EPOCH + dt.timedelta(seconds=vid % 86400),
                    html,
                    f"{title}\n{filler}",
                    "de" if vid % 13 == 0 else "en",
                )
            )
        return pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        )

    verts = (
        edges.select(F.col("src").alias("id"), F.col("dst"))
        .unionByName(
            edges.select(F.col("dst").alias("id"), F.lit(None).cast("long").alias("dst"))
        )
        .groupBy("id")
        .agg(F.collect_list("dst").alias("nbrs"))
    )
    return verts.mapInPandas(
        lambda it: (render(pdf) for pdf in it),
        PAGES_SCHEMA,
    )


def powerlaw_edges(
    n: int, m: int = 5, seed: int = 42
) -> list[tuple[int, int]]:
    """Preferential-attachment graph (Barabási–Albert-style): each new
    vertex links to ``m`` existing targets sampled ∝ degree — the
    Common-Crawl-like skewed topology (FIXTURES.md §3)."""
    rng = random.Random(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    edges: list[tuple[int, int]] = []
    for v in range(m, n):
        chosen = set()
        while len(chosen) < m:
            chosen.add(rng.choice(repeated) if repeated else rng.randrange(v))
        for t in chosen:
            edges.append((v, t))
            repeated.append(v)
            repeated.append(t)
    return edges
