"""Hyperlink extraction + web link-graph construction.

The north-star input is a table of Common-Crawl-style pages
``(url, warc_ts, html binary, text, lang)`` and the engine's edge table
comes from BOTH hyperlinks and co-occurrence windows. ``graph.py`` covers
co-occurrence; this module covers the hyperlink side:

    pages ──extract_hrefs──► (src_url, href)
          ──resolve_href───► (src_url, dst_url)         absolute targets
          ──link_edges─────► (src, dst, weight)         page-level graph
          ──host_edges─────► (src, dst, weight)         host-level rollup

Everything is JVM-side column algebra (binary decode + regexp + string
ops) — no Python in the hot path, so extraction is embarrassingly
parallel over page partitions and the only shuffles are the final edge
aggregations. Every step is deterministic and replayable in ANSI SQL
(the correctness gate replays it in DuckDB).

URL resolution implements the subset of RFC 3986 that dominates web
corpora — absolute http(s), protocol-relative (``//h/p``), root-relative
(``/p``), and relative references — drops non-navigational schemes
(javascript/mailto/data/tel) and pure-fragment links, and removes
dot-segments (``./``, ``../`` incl. above-root clamping) from the
resolved path. Remaining canonicalization steps (IDN, percent-encoding
case) are a documented follow-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "HREF_PATTERN",
    "extract_hrefs",
    "resolve_href",
    "normalize_dot_segments",
    "link_edges",
    "host_of",
    "host_edges",
    "html_to_text",
    "extract_page_text",
]

_DOT_DEPTH = 8  # max nesting of ../ handled per URL (fixed expression)

# href attribute of <a> tags; group 2 = the target (group 1 is the
# opening quote, backreferenced so an apostrophe inside a double-quoted
# href does not truncate the target). Case-insensitive, tolerant of
# attribute order.
HREF_PATTERN = r"""(?i)<a\s[^>]*href\s*=\s*(["'])([^>]*?)\1"""
_HREF_GROUP = 2


def _html_str(col, binary: bool) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.decode(c, "UTF-8") if binary else c


def extract_hrefs(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    html_is_binary: bool = True,
) -> DataFrame:
    """(src_url, href): one row per anchor occurrence (duplicates kept —
    they carry the link weight)."""
    return pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(
                _html_str(html_col, html_is_binary),
                F.lit(HREF_PATTERN),
                F.lit(_HREF_GROUP),
            )
        ).alias("href"),
    )


def normalize_dot_segments(url: Column) -> Column:
    """RFC 3986 dot-segment removal on the PATH of an absolute URL as a
    fixed chain of regexp passes: ``/./`` collapses, ``/seg/../``
    cancels, and above-root ``/../`` clamps to ``/`` (browser behaviour).
    Handles up to ``_DOT_DEPTH`` nesting levels — beyond that the
    residual dots stay literal (fixed-depth expression by design; crawl
    URLs virtually never nest deeper). The origin is split off first so
    ``https://h.org/../x`` clamps instead of eating the host."""
    origin = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)
    tail = F.substr(url, F.length(origin) + 1)
    path = F.regexp_extract(tail, r"^([^?#]*)", 1)  # query/fragment kept
    rest = F.substr(tail, F.length(path) + 1)
    for _ in range(_DOT_DEPTH):
        path = F.regexp_replace(path, r"/\.(/|$)", "/")
    for _ in range(_DOT_DEPTH):
        path = F.regexp_replace(path, r"/(?!\.\./)[^/]+/\.\.(/|$)", "/")
    for _ in range(_DOT_DEPTH):
        path = F.regexp_replace(path, r"^/\.\.(/|$)", "/")  # clamp
    return F.when(origin == "", url).otherwise(
        F.concat(origin, path, rest)
    )


def resolve_href(base: Column, href: Column) -> Column:
    """Absolute target URL for ``href`` found on page ``base``, or NULL
    for non-navigational targets. Fragments are stripped first (links to
    an anchor on the same resource are the same edge)."""
    h = F.trim(href)
    h = F.split_part(h, F.lit("#"), F.lit(1))  # strip fragment
    scheme = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)
    # directory of the base: last '/' of the PATH component only — the
    # query/fragment are excluded first (a '/' inside '?x=/y' is not a
    # path separator), and a base with no path at all ('https://h.org')
    # resolves relative references against '/'
    base_path = F.regexp_extract(
        base, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    path_dir = F.regexp_extract(base_path, r"^(.*/)", 1)
    base_dir = F.concat(
        origin, F.when(path_dir == "", F.lit("/")).otherwise(path_dir)
    )
    resolved = (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.rlike(r"(?i)^(javascript|mailto|data|tel):"), F.lit(None))
        .when(h.rlike(r"(?i)^https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(base_dir, h))
    )
    return normalize_dot_segments(resolved)


def link_edges(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    html_is_binary: bool = True,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Page-level link graph ``(src, dst, weight)``; weight = number of
    anchors from src to dst. One narrow extraction pass + one aggregation
    shuffle."""
    hrefs = extract_hrefs(pages, html_col, url_col, html_is_binary)
    resolved = hrefs.select(
        F.col("src_url").alias("src"),
        resolve_href(F.col("src_url"), F.col("href")).alias("dst"),
    ).where(F.col("dst").isNotNull())
    if drop_self_loops:
        resolved = resolved.where(F.col("src") != F.col("dst"))
    return resolved.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def host_of(col) -> Column:
    """Host component (SQL-replayable regexp, lowercased)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1))


_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def html_to_text(col, binary: bool = True) -> Column:
    """Visible text of an HTML document as a column expression:
    script/style/comment blocks removed, tags replaced by spaces, the six
    ubiquitous entities decoded, whitespace collapsed. Deterministic
    regexp algebra (JVM-side, DuckDB-replayable) — a cleaning pass, not a
    browser; layout-accurate rendering is out of scope by design."""
    t = _html_str(col, binary)
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_page_text(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    html_is_binary: bool = True,
) -> DataFrame:
    """(url, text): extracted visible text per page — the ingest step
    that turns the raw crawl table into the engine's text column."""
    return pages.select(
        F.col(url_col).alias("url"),
        html_to_text(html_col, html_is_binary).alias("text"),
    )


def host_edges(page_edges: DataFrame) -> DataFrame:
    """Host-level rollup of a page-level link graph: ``(src, dst,
    weight)`` with weight = total inter-host anchors; intra-host links
    dropped (the standard web-graph host projection)."""
    hosts = page_edges.select(
        host_of("src").alias("src"),
        host_of("dst").alias("dst"),
        "weight",
    ).where(
        (F.col("src") != "") & (F.col("dst") != "")
        & (F.col("src") != F.col("dst"))
    )
    return hosts.groupBy("src", "dst").agg(
        F.sum("weight").alias("weight")
    )
