"""HTML → text + links extraction (frozen, deterministic).

The reference's analog is the per-line ``to_vertex`` parser family
(/root/reference/core/slave.hpp:90 pure virtual; e.g.
apps/trianglecount.cpp:161-179) — user-defined input parsing at load
time.  Here the input is a Common-Crawl-style ``pages`` table
(BASELINE.json input_hint) and the parser is an Arrow-vectorized
pandas UDF: one Python call per batch, zero per-row Python on the
Spark side.

The extraction function is FROZEN — byte-identical output per url is
a correctness invariant (north_star).  Rules:

* ``text`` = title + "\\n" + paragraphs, where title is the first
  ``<title>…</title>`` payload and each paragraph is a ``<p>…</p>``
  payload with nested tags stripped; whitespace inside each piece is
  collapsed to single spaces and stripped; pieces joined by "\\n".
  Bytes decoded as UTF-8 (errors="replace").  No locale, no NFC/NFKC.
* links = every ``href`` attribute of ``<a>`` tags, in document
  order, resolved/normalized by :func:`normalize_url`; non-http(s)
  schemes dropped.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_P_RE = re.compile(rb"<p[^>]*>(.*?)</p>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(
    rb"<a\s[^>]*?href\s*=\s*[\"']([^\"']*)[\"']", re.IGNORECASE | re.DOTALL
)
_ANCHOR_RE = re.compile(
    rb"<a\s[^>]*?href\s*=\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)


def _clean(raw: bytes) -> str:
    s = raw.decode("utf-8", errors="replace")
    s = _TAG_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def extract_text(html: bytes) -> str:
    """Pure, frozen text extraction — the golden-byte contract."""
    if html is None:
        return ""
    pieces: list[str] = []
    m = _TITLE_RE.search(html)
    if m:
        pieces.append(_clean(m.group(1)))
    for pm in _P_RE.finditer(html):
        pieces.append(_clean(pm.group(1)))
    return "\n".join(pieces)


def normalize_url(href: str, base_url: str | None = None) -> str | None:
    """Canonical url: resolve relative, strip fragment, lowercase
    scheme+host, drop trailing slash on non-root paths.  Returns None
    for non-http(s) schemes (mailto:, javascript:, …)."""
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    try:
        if base_url:
            href = urljoin(base_url, href)
        parts = urlsplit(href)
    except ValueError:  # malformed href (e.g. bad IPv6 bracket) — drop
        return None
    if parts.scheme not in ("http", "https"):
        return None
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc.lower(), path, parts.query, "")
    )


def extract_links(html: bytes, base_url: str) -> list[str]:
    """Normalized outbound http(s) links, document order, with dups."""
    if html is None:
        return []
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        u = normalize_url(m.group(1).decode("utf-8", errors="replace"), base_url)
        if u is not None:
            out.append(u)
    return out


# Single-purpose UDFs, each marked non-deterministic: Catalyst's
# projection collapse otherwise CLONES a python UDF per field access
# (a struct-returning UDF selected twice showed up as 4 ArrowEvalPython
# nodes = 4x the regex work).  They ARE deterministic functions; the
# flag only blocks expression duplication/reordering.


@F.pandas_udf(T.StringType())
def _text_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_text(h) for h in html])


@F.pandas_udf(T.ArrayType(T.StringType()))
def _links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series([extract_links(h, u) for h, u in zip(html, url)])


_text_udf = _text_udf.asNondeterministic()
_links_udf = _links_udf.asNondeterministic()


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → + extracted_text, links.

    Arrow-batched; the scan reads only (url, html) plus passthroughs —
    column pruning reaches the parquet/Iceberg scan.
    """
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        "text",
        _text_udf(F.col("html")).alias("extracted_text"),
        _links_udf(F.col("html"), F.col("url")).alias("links"),
    )


def links_table(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) pairs — one row per normalized href.

    Reads only (url, html); the text extraction never runs here.
    """
    ex = pages.select(
        normalize_url_col(F.col("url")).alias("src_url"),
        _links_udf(F.col("html"), F.col("url")).alias("links"),
    )
    return ex.select("src_url", F.explode("links").alias("dst_url"))


def extract_anchors(html: bytes, base_url: str) -> list[tuple[str, str]]:
    """(dst_url, anchor_text) pairs — one per ``<a href>…</a>`` tag, in
    document order, with dups.  The url is normalized exactly like
    :func:`extract_links`; the anchor text is the tag body cleaned with
    the same frozen ``_clean`` rules the text extractor uses (nested
    tags stripped, whitespace collapsed).  Anchors whose href doesn't
    normalize (mailto:, javascript:, …) are dropped; empty anchor text
    (image links) is kept as "".

    Anchor text is the classic web-corpus signal the reference-era
    engines aggregate per target page (it describes the TARGET, not the
    source) — used for ranking features and as training-data text for
    pages that themselves extract poorly.
    """
    if html is None:
        return []
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(html):
        u = normalize_url(m.group(1).decode("utf-8", errors="replace"), base_url)
        if u is not None:
            out.append((u, _clean(m.group(2))))
    return out


_ANCHOR_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("dst_url", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@F.pandas_udf(_ANCHOR_SCHEMA)
def _anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series([extract_anchors(h, u) for h, u in zip(html, url)])


_anchors_udf = _anchors_udf.asNondeterministic()


def anchors_table(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per anchor tag.

    Reads only (url, html); Arrow-batched, single-purpose UDF (the
    same anti-cloning discipline as ``_links_udf``).
    """
    ex = pages.select(
        normalize_url_col(F.col("url")).alias("src_url"),
        _anchors_udf(F.col("html"), F.col("url")).alias("anchors"),
    )
    return ex.select(
        "src_url",
        F.explode("anchors").alias("a"),
    ).select("src_url", F.col("a.dst_url").alias("dst_url"), F.col("a.anchor").alias("anchor"))


@F.pandas_udf(T.StringType())
def _norm_url_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: normalize_url(u) if u is not None else None)


_norm_url_udf = _norm_url_udf.asNondeterministic()


def normalize_url_col(col):
    return _norm_url_udf(col)
