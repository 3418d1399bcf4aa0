"""The extraction spine: pages → text (byte-identical) → links → edges → algorithms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import CYCLE6, K5, PATH5, STAR, TWOCOMP
from tests.oracle import graph_oracle as oracle


def test_extract_text_byte_identity(spark):
    """Engine-extracted text must equal the golden text column byte-for-byte
    for every url (BASELINE.json per-row invariant)."""
    from gminer_spark.web.extract import extract_pages
    from gminer_spark.web.fixtures import pages_df

    pages = pages_df(spark, STAR + PATH5, namespace="bi")
    ex = extract_pages(pages)
    bad = ex.where(
        (F.col("extracted_text") != F.col("text"))
        | F.col("extracted_text").isNull()
    ).count()
    assert bad == 0
    # and as raw bytes via encode comparison
    bad2 = ex.where(
        F.encode("extracted_text", "UTF-8") != F.encode("text", "UTF-8")
    ).count()
    assert bad2 == 0


def test_normalize_url_rules():
    from gminer_spark.web.extract import normalize_url

    assert normalize_url("HTTPS://Example.COM/a/#frag") == "https://example.com/a"
    assert normalize_url("https://example.com/a/b/") == "https://example.com/a/b"
    assert normalize_url("https://example.com") == "https://example.com/"
    assert normalize_url("mailto:x@y.z") is None
    assert normalize_url("javascript:void(0)") is None
    assert (
        normalize_url("/rel/p3", "https://site0.example/rel/p0")
        == "https://site0.example/rel/p3"
    )
    assert normalize_url("  ", "https://a.b/") is None


@pytest.mark.parametrize(
    "name,topology",
    [("path5", PATH5), ("k5", K5), ("twocomp", TWOCOMP), ("star", STAR)],
)
def test_pages_roundtrip_topology(spark, name, topology):
    """pages built from a topology must yield exactly that edge set back
    (noise — fragments, dups, self-links, mailto — all normalized away)."""
    from gminer_spark.web.edges import pages_to_edges, url_ids
    from gminer_spark.web.extract import links_table
    from gminer_spark.web.fixtures import pages_df, url_for

    pages = pages_df(spark, topology, namespace=name)
    links = links_table(pages).persist()
    e = (
        links.select(
            F.col("src_url").alias("su"), F.col("dst_url").alias("du")
        )
        .where(F.col("su") != F.col("du"))  # self-links drop at edge minting
        .distinct()
        .collect()
    )
    got = {(r.su, r.du) for r in e}
    want = {(url_for(s, name), url_for(d, name)) for s, d in set(topology)}
    assert got == want

    # hashed ids: same graph modulo relabeling
    edges = pages_to_edges(pages)
    ids = {r.url: r.id for r in url_ids(links).collect()}
    got_ids = {(r.src, r.dst) for r in edges.collect()}
    want_ids = {
        (ids[url_for(s, name)], ids[url_for(d, name)]) for s, d in set(topology)
    }
    assert got_ids == want_ids
    links.unpersist()


def test_full_pipeline_pagerank_on_pages(spark):
    """End-to-end: pages → edges → PageRank equals oracle on the raw topology."""
    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.web.edges import pages_to_edges, url_ids
    from gminer_spark.web.extract import links_table
    from gminer_spark.web.fixtures import pages_df, url_for

    topo = CYCLE6 + [(10, 11), (11, 12), (12, 10), (12, 13)]
    pages = pages_df(spark, topo, namespace="e2e")
    edges = pages_to_edges(pages)
    res = pagerank(edges, tol=1e-9, max_iter=300)
    ids = {r.url: r.id for r in url_ids(links_table(pages)).collect()}
    got = {r.id: r["rank"] for r in res.state.collect()}
    want = oracle.pagerank(topo, tol=1e-9)
    for v, rank in want.items():
        assert got[ids[url_for(v, "e2e")]] == pytest.approx(rank, abs=1e-6)


def test_full_pipeline_triangles_and_cc(spark):
    from gminer_spark.graph.cc import connected_components
    from gminer_spark.graph.triangles import triangle_count
    from gminer_spark.web.edges import pages_to_edges
    from gminer_spark.web.fixtures import pages_df

    topo = K5 + [(100, 101)]
    pages = pages_df(spark, topo, namespace="tri")
    edges = pages_to_edges(pages)
    assert triangle_count(edges) == 10
    res = connected_components(edges)
    n_comp = res.state.select("component").distinct().count()
    assert n_comp == 2


def test_powerlaw_generator_deterministic():
    from gminer_spark.web.fixtures import powerlaw_edges

    e1 = powerlaw_edges(500, m=3, seed=42)
    e2 = powerlaw_edges(500, m=3, seed=42)
    assert e1 == e2
    degs: dict[int, int] = {}
    for s, d in e1:
        degs[d] = degs.get(d, 0) + 1
    assert max(degs.values()) > 20  # skewed


def test_host_graph_rollup(spark):
    from gminer_spark.web.edges import host_graph

    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/1", "https://b.com/y"),   # same pair, same page
            ("https://a.com/2", "https://b.com/x"),   # same pair, new page
            ("https://A.COM/3", "https://b.com/z"),   # host case-folds
            ("https://a.com/4", "https://a.com/5"),   # same-host: dropped
            ("ftp://a.com/5", "https://b.com/x"),     # non-http src: dropped
            ("https://c.com:8080/1", "https://b.com/x"),  # port kept in host
        ],
        "src_url string, dst_url string",
    )
    rows = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
        for r in host_graph(links).collect()
    }
    assert rows[("a.com", "b.com")] == (4, 3)
    assert rows[("c.com:8080", "b.com")] == (1, 1)
    assert len(rows) == 2


def test_extract_anchors_rules():
    """Anchor pairs: document order, normalized urls, frozen _clean text
    rules (nested tags stripped, whitespace collapsed), non-http dropped,
    empty anchor text kept."""
    from gminer_spark.web.extract import extract_anchors

    html = (
        b'<html><body>'
        b'<a href="/rel/x">First  link</a>'
        b'<a class="z" href="https://Other.COM/a/">a <b>bold</b>\n  text</a>'
        b'<a href="mailto:x@y.z">write us</a>'
        b'<a href="https://img.example.com/i"><img src="p.png"/></a>'
        b'</body></html>'
    )
    pairs = extract_anchors(html, "https://site.example/rel/p0")
    assert pairs == [
        ("https://site.example/rel/x", "First link"),
        ("https://other.com/a", "a bold text"),
        ("https://img.example.com/i", ""),
    ]
    assert extract_anchors(None, "https://x.y/") == []


def test_anchor_stats_rollup(spark):
    """Totals ride dst_url; top_anchor tie-breaks (count desc, lex asc)."""
    from gminer_spark.web.edges import anchor_stats

    anchors = spark.createDataFrame(
        [
            ("https://a.com/1", "https://t.com/x", "zebra"),
            ("https://a.com/1", "https://t.com/x", "apple"),
            ("https://a.com/2", "https://t.com/x", "zebra"),
            ("https://b.com/1", "https://t.com/x", "apple"),  # 2-2 tie
            ("https://b.com/1", "https://t.com/y", "only"),
        ],
        "src_url string, dst_url string, anchor string",
    )
    rows = {r["dst_url"]: r for r in anchor_stats(anchors).collect()}
    x = rows["https://t.com/x"]
    assert (x["n_anchors"], x["n_unique_anchors"], x["n_src_pages"]) == (4, 2, 3)
    assert (x["top_anchor"], x["top_anchor_n"]) == ("apple", 2)  # lex tie-break
    y = rows["https://t.com/y"]
    assert (y["n_anchors"], y["top_anchor"], y["top_anchor_n"]) == (1, "only", 1)


def test_anchors_table_spine(spark):
    """anchors_table over rendered pages: every href with its cleaned text."""
    from gminer_spark.web.extract import anchors_table
    from gminer_spark.web.fixtures import pages_df

    pages = pages_df(spark, PATH5, namespace="anch")
    tbl = anchors_table(pages)
    assert tbl.columns == ["src_url", "dst_url", "anchor"]
    rows = tbl.collect()
    assert len(rows) > 0
    # every anchor pair's dst must also appear in the href-only links table
    from gminer_spark.web.extract import links_table

    link_pairs = {
        (r["src_url"], r["dst_url"]) for r in links_table(pages).collect()
    }
    assert {(r["src_url"], r["dst_url"]) for r in rows} <= link_pairs


def test_resolve_redirects_chains(spark):
    """Pointer doubling resolves chains to the terminal url with exact
    hop counts; conflicting redirects pick min dst; self-redirects
    dropped."""
    from gminer_spark.web.edges import resolve_redirects

    redirects = spark.createDataFrame(
        [
            # depth-4 chain a0->a1->a2->a3->a4
            ("https://r/a0", "https://r/a1"),
            ("https://r/a1", "https://r/a2"),
            ("https://r/a2", "https://r/a3"),
            ("https://r/a3", "https://r/a4"),
            # conflicting: b -> {z, y} => min pick y
            ("https://r/b", "https://r/z"),
            ("https://r/b", "https://r/y"),
            # self-redirect only: dropped entirely
            ("https://r/self", "https://r/self"),
        ],
        "src_url string, dst_url string",
    )
    rows = {
        r["src_url"]: (r["final_url"], r["hops"])
        for r in resolve_redirects(redirects).collect()
    }
    assert rows["https://r/a0"] == ("https://r/a4", 4)
    assert rows["https://r/a1"] == ("https://r/a4", 3)
    assert rows["https://r/a3"] == ("https://r/a4", 1)
    assert rows["https://r/b"] == ("https://r/y", 1)
    assert "https://r/self" not in rows
    assert len(rows) == 5


def test_resolve_redirects_cycle_warns(spark):
    """A 2-cycle never terminates — the loop stops at max_rounds and
    warns; chain rows that already converged are still exact."""
    import warnings

    from gminer_spark.web.edges import resolve_redirects

    redirects = spark.createDataFrame(
        [
            ("https://r/c1", "https://r/c2"),
            ("https://r/c2", "https://r/c1"),
            ("https://r/ok", "https://r/done"),
        ],
        "src_url string, dst_url string",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = {
            r["src_url"]: (r["final_url"], r["hops"])
            for r in resolve_redirects(redirects, max_rounds=3).collect()
        }
    assert any("cycle" in str(x.message) for x in w)
    assert rows["https://r/ok"] == ("https://r/done", 1)
    assert len(rows) == 3


def test_mirror_hosts_jaccard_and_df_cut(spark):
    """Jaccard math on a known overlap; boilerplate fingerprint shared
    by >max_df hosts is excluded from pairing but still counts toward
    set sizes (true denominators)."""
    from gminer_spark.web.mirrors import mirror_hosts

    rows = []
    # hosts a and b: 4 fps each, 3 shared -> J = 3/5
    for fp in [1, 2, 3, 10]:
        rows.append(("a", fp))
    for fp in [1, 2, 3, 20]:
        rows.append(("b", fp))
    # boilerplate fp 99 on a, b, c, d (df=4 > max_df=3): never pairs
    for h in ["a", "b", "c", "d"]:
        rows.append((h, 99))
    pagefps = spark.createDataFrame(rows, "host string, fp long")
    out = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_hosts(pagefps, min_jaccard=0.3, max_df=3).collect()
    }
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    # sizes include the boilerplate fp (5 each); shared excludes it (3)
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (3, 5, 5)
    assert r["jaccard_micro"] == round(3 / 7 * 1e6)  # 3/(5+5-3)


def test_crawl_frontier_anti_join(spark):
    """Only uncrawled targets appear; host count is distinct linking
    hosts, page count distinct linking pages."""
    from gminer_spark.web.edges import crawl_frontier

    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://t.com/new"),
            ("https://a.com/1", "https://t.com/new"),  # dup link, same page
            ("https://a.com/2", "https://t.com/new"),
            ("https://b.com/1", "https://t.com/new"),
            ("https://a.com/1", "https://t.com/seen"),
        ],
        "src_url string, dst_url string",
    )
    crawled = spark.createDataFrame(
        [("https://t.com/seen",)], "url string"
    )
    rows = {r["url"]: r for r in crawl_frontier(links, crawled).collect()}
    assert set(rows) == {"https://t.com/new"}
    r = rows["https://t.com/new"]
    assert (r["n_inlinks"], r["n_src_pages"], r["n_src_hosts"]) == (4, 3, 2)


def test_frontier_maintainer_matches_batch_operator(spark):
    """Incremental frontier over 3 batches equals crawl_frontier over
    the concatenated inputs; a url crawled late leaves the frontier
    even when its links arrived earlier."""
    from gminer_spark.web.edges import FrontierMaintainer, crawl_frontier

    batches = [
        # (links, crawled)
        (
            [("https://a.com/1", "https://t.com/x"),
             ("https://a.com/1", "https://t.com/y")],
            ["https://a.com/1"],
        ),
        (
            [("https://b.com/1", "https://t.com/x"),
             ("https://b.com/2", "https://t.com/z")],
            ["https://b.com/1", "https://t.com/y"],  # y crawled late
        ),
        (
            [("https://c.com/1", "https://t.com/y")],  # link to crawled url
            ["https://c.com/1"],
        ),
    ]
    fm = FrontierMaintainer()
    all_links, all_crawled = [], []
    for links, crawled in batches:
        ldf = spark.createDataFrame(links, "src_url string, dst_url string")
        cdf = spark.createDataFrame([(u,) for u in crawled], "url string")
        fm.update(ldf, cdf)
        all_links += links
        all_crawled += crawled
    got = sorted(map(tuple, fm.frontier.select(
        "url", "n_inlinks", "n_src_pages", "n_src_hosts").collect()))
    want = sorted(map(tuple, crawl_frontier(
        spark.createDataFrame(all_links, "src_url string, dst_url string"),
        spark.createDataFrame([(u,) for u in all_crawled], "url string"),
    ).select("url", "n_inlinks", "n_src_pages", "n_src_hosts").collect()))
    assert got == want
    urls = {u for u, *_ in got}
    assert "https://t.com/y" not in urls  # crawled late -> gone
    assert {"https://t.com/x", "https://t.com/z"} <= urls


def test_robots_filter_rules(spark):
    """Prefix semantics: narrower prefix keeps siblings; '/item/' kills
    the tree; empty prefix disallows the whole host; other hosts and
    extra columns pass through."""
    from gminer_spark.web.edges import robots_filter

    urls = spark.createDataFrame(
        [
            ("https://a.com/item/1", 1),
            ("https://a.com/item/2", 2),
            ("https://b.com/item/9", 3),
            ("https://b.com/other", 4),
            ("https://C.com/x", 5),      # host case-folds vs rule 'c.com'
            ("https://c.com", 6),        # no path: only '' matches
            ("https://free.com/item/1", 7),
        ],
        "url string, k long",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", "/item/1"),  # narrow: only item/1*
            ("b.com", "/item/"),   # subtree
            ("c.com", ""),         # disallow all
        ],
        "host string, disallow_prefix string",
    )
    got = {(r["url"], r["k"]) for r in robots_filter(urls, rules).collect()}
    assert got == {
        ("https://a.com/item/2", 2),
        ("https://b.com/other", 4),
        ("https://free.com/item/1", 7),
    }


def test_site_tree_hand_values(spark):
    """Query-string variants collapse into one page; depth-1 and
    depth-2 prefixes roll up; path-less URLs drop."""
    from gminer_spark.web.sitetree import site_tree

    urls = spark.createDataFrame(
        [
            ("https://A.example.com/docs/api/x?v=1",),
            ("https://a.example.com/docs/api/x?v=2",),
            ("https://a.example.com/docs/guide",),
            ("https://a.example.com/blog",),
            ("https://a.example.com",),  # no path: dropped
        ],
        "url string",
    )
    got = {
        (r["host"], r["depth"], r["prefix"]): (r["n_urls"], r["n_pages"])
        for r in site_tree(urls, depth=2).collect()
    }
    assert got == {
        ("a.example.com", 1, "/docs"): (3, 2),
        ("a.example.com", 1, "/blog"): (1, 1),
        ("a.example.com", 2, "/docs/api"): (2, 1),
        ("a.example.com", 2, "/docs/guide"): (1, 1),
    }
