"""Hyperlink extraction / URL resolution / link + host graph tests, and
an end-to-end host-PageRank vs the nx oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from jgtextrank_spark.weblinks import (
    extract_hrefs,
    host_edges,
    link_edges,
    resolve_href,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def test_resolve_href_cases(spark):
    base = "https://www.example.org/a/b/page.html"
    cases = {
        "https://other.org/x": "https://other.org/x",          # absolute
        "HTTP://UP.org/x": "HTTP://UP.org/x",                  # scheme case
        "//cdn.org/y": "https://cdn.org/y",                    # proto-rel
        "/root.html": "https://www.example.org/root.html",     # root-rel
        "sib.html": "https://www.example.org/a/b/sib.html",    # relative
        "sib.html#frag": "https://www.example.org/a/b/sib.html",
        "#frag": None,                                          # frag-only
        "javascript:void(0)": None,
        "mailto:x@y.z": None,
    }
    df = spark.createDataFrame(
        [(base, h) for h in cases], "base string, href string"
    ).select("href", resolve_href(F.col("base"), F.col("href")).alias("r"))
    got = {r["href"]: r["r"] for r in df.collect()}
    for href, want in cases.items():
        assert got[href] == want, (href, got[href], want)


def test_resolve_href_pathless_and_query_bases(spark):
    """Regression: a base with NO path ('https://h.org' — ubiquitous in
    crawls) must resolve relative refs against '/', and a '/' inside the
    query string is not a path separator."""
    cases = [
        ("https://example.com", "about.html", "https://example.com/about.html"),
        ("https://example.com?q=1", "about.html",
         "https://example.com/about.html"),
        ("https://h.org/a?x=/y", "z.html", "https://h.org/z.html"),
        ("https://h.org/a/b?x=/y/z", "c.html", "https://h.org/a/c.html"),
    ]
    df = spark.createDataFrame(
        cases, "base string, href string, want string"
    ).select(
        "want", resolve_href(F.col("base"), F.col("href")).alias("r")
    )
    for r in df.collect():
        assert r["r"] == r["want"], (r["r"], r["want"])


def test_dot_segment_normalization(spark):
    """../ and ./ resolve in the path (above-root clamps, query string
    untouched) — browser/RFC 3986 behaviour."""
    base = "https://h.org/a/b/c.html"
    cases = [
        ("../x.html", "https://h.org/a/x.html"),
        ("../../x.html", "https://h.org/x.html"),
        ("../../../x.html", "https://h.org/x.html"),  # above root clamps
        ("./x.html", "https://h.org/a/b/x.html"),
        ("d/../x.html", "https://h.org/a/b/x.html"),
        ("x.html?p=../q", "https://h.org/a/b/x.html?p=../q"),  # query kept
        ("https://o.org/p/../q.html", "https://o.org/q.html"),  # absolute
    ]
    df = spark.createDataFrame(
        [(base, h, w) for h, w in cases], "base string, href string, want string"
    ).select("want", resolve_href(F.col("base"), F.col("href")).alias("r"))
    for r in df.collect():
        assert r["r"] == r["want"], (r["r"], r["want"])


def test_href_mixed_quotes(spark):
    """Regression: an apostrophe inside a double-quoted href must not
    truncate the target (backreferenced quote delimiter)."""
    pages = _pages(
        spark,
        [("https://s.org/d/p", '<a href="it\'s-a-page.html">x</a>'
                               "<a href='say \"hi\".html'>y</a>")],
    )
    got = {r["dst"] for r in link_edges(pages).collect()}
    assert got == {
        "https://s.org/d/it's-a-page.html",
        'https://s.org/d/say "hi".html',
    }


def test_extract_and_weights(spark):
    html = (
        '<html><a href="https://t.org/a">1</a>'
        "<A COLOR='x' HREF='https://t.org/a'>again</A>"
        '<a href="/b">rel</a><a href="javascript:void(0)">no</a></html>'
    )
    pages = _pages(spark, [("https://s.org/p", html)])
    assert extract_hrefs(pages).count() == 4  # js link extracted, then..
    edges = {
        (r["src"], r["dst"]): r["weight"]
        for r in link_edges(pages).collect()
    }
    assert edges[("https://s.org/p", "https://t.org/a")] == 2.0  # dup anchor
    assert edges[("https://s.org/p", "https://s.org/b")] == 1.0
    assert len(edges) == 2  # ..dropped by the resolver


def test_self_loops_dropped_and_host_rollup(spark):
    pages = _pages(
        spark,
        [
            ("https://a.org/1", '<a href="https://a.org/1">self</a>'
                                '<a href="https://a.org/2">intra</a>'
                                '<a href="https://b.org/x">inter</a>'),
            ("https://a.org/2", '<a href="https://b.org/x">inter</a>'),
            ("https://b.org/x", '<a href="https://a.org/1">back</a>'),
        ],
    )
    pe = link_edges(pages)
    assert ("https://a.org/1", "https://a.org/1") not in {
        (r["src"], r["dst"]) for r in pe.collect()
    }
    he = {(r["src"], r["dst"]): r["weight"] for r in host_edges(pe).collect()}
    # intra-host a.org/1 -> a.org/2 dropped in the host projection
    assert he == {("a.org", "b.org"): 2.0, ("b.org", "a.org"): 1.0}


def test_html_to_text(spark):
    from jgtextrank_spark.weblinks import extract_page_text

    html = (
        "<html><head><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<!-- comment -->"
        "<body><p>Hello &amp;&nbsp;world</p><div>A &lt;tag&gt; "
        "&quot;quoted&#39;</div></body></html>"
    )
    pages = _pages(spark, [("https://s.org/p", html)])
    got = extract_page_text(pages).collect()[0]["text"]
    assert got == "Hello & world A <tag> \"quoted'"
    # &amp;lt; must decode to the LITERAL '&lt;', not '<'
    pages2 = _pages(spark, [("https://s.org/q", "<p>&amp;lt;</p>")])
    assert extract_page_text(pages2).collect()[0]["text"] == "&lt;"


def test_host_pagerank_vs_nx(spark):
    """North-star flagship shape: pages -> hyperlink edges -> host graph
    -> DIRECTED weighted PageRank, vs the nx-recurrence oracle."""
    from oracle.nxparity import pagerank_edges

    from jgtextrank_spark.algos.pagerank import pagerank

    rows = []
    for i in range(40):
        host = f"h{i % 5}.org"
        t1, t2 = (7 * i + 1) % 40, (13 * i + 3) % 40
        html = (
            f'<a href="https://h{t1 % 5}.org/d/{t1}">x</a>'
            f'<a href="https://h{t2 % 5}.org/d/{t2}">y</a>'
        )
        rows.append((f"https://{host}/d/{i}", html))
    he = host_edges(link_edges(_pages(spark, rows))).persist()
    got = {r["vertex"]: r["score"] for r in pagerank(he).collect()}
    want = pagerank_edges(
        [(r["src"], r["dst"], r["weight"]) for r in he.collect()]
    )
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-9
