"""Crawl-frontier operators: discovery, prioritisation, and politeness
scheduling over the link graph.

The operational loop of a web crawler at 10^12-document scale is itself
a link-graph workload: the frontier (URLs seen but not fetched) is an
anti-join of the edge table against the crawled set, fetch priority is a
function of link evidence (in-degree, referrer rank), and politeness
(bounded per-host concurrency) is a per-host window — never a global
one, so the plan scales with the host count, not the frontier size.

All ordering is deterministic (score desc, url asc tiebreaks), so a
schedule is replayable — the same property the sampling module
guarantees (functions/sampling.py) and the DuckDB gate checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .weblinks import host_of

__all__ = [
    "frontier_urls",
    "crawl_schedule",
    "parse_robots",
    "robots_filter",
]


def frontier_urls(
    edges: DataFrame, crawled: DataFrame
) -> DataFrame:
    """Discover the frontier: ``(url, host, n_refs)`` — link DESTINATIONS
    not yet in the crawled set, with their discovery in-degree (number of
    distinct referring pages) as the default priority signal.

    One aggregation on dst + one anti-join against the crawled set (the
    crawled side joins on the URL key; at scale both sides hash-partition
    on url, and the frontier inherits that partitioning for the
    downstream schedule window's host re-shuffle)."""
    refs = (
        edges.select("src", "dst")
        .distinct()
        .groupBy(F.col("dst").alias("url"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
    )
    return refs.join(
        crawled.select(F.col("url")).distinct(), "url", "left_anti"
    ).select("url", host_of(F.col("url")).alias("host"), "n_refs")


def crawl_schedule(
    frontier: DataFrame,
    per_host_rate: int = 2,
    score_col: str = "n_refs",
) -> DataFrame:
    """Politeness scheduling: ``(url, host, host_rank, wave)``.

    URLs are ranked WITHIN each host by (``score_col`` desc, url asc) —
    ``host_rank`` — and assigned to fetch waves of at most
    ``per_host_rate`` URLs per host: ``wave = ceil(host_rank / rate)``.
    A fetcher that consumes wave 1 across all hosts, then wave 2, ...
    never issues more than ``per_host_rate`` concurrent requests to one
    host while keeping every wave maximally wide — the standard
    politeness/throughput trade.

    The window partitions by host (cardinality ~10^7 hosts for 10^12
    pages — wide enough to parallelise, and per-host groups are
    in-memory-bounded because a single host's URL count is capped by
    crawl policy long before executor memory matters)."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.col(score_col).desc(), F.col("url").asc()
    )
    return (
        frontier.withColumn(
            "host_rank", F.row_number().over(w).cast("long")
        )
        .withColumn(
            "wave",
            F.ceil(F.col("host_rank") / F.lit(per_host_rate)).cast("long"),
        )
        .select("url", "host", "host_rank", "wave")
    )


def parse_robots(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into the per-host rule table for one
    crawler identity: ``(host, rule, path, path_len, rx)`` with ``rule``
    in ('allow', 'disallow'), ``path_len`` the RFC 9309 specificity
    (octet length of the original pattern) and ``rx`` the anchored regex
    the matcher uses (``*`` -> ``.*``, trailing ``$`` end-anchors).

    Group semantics (RFC 9309 §2.2.1, simplified where documented):

    * lines are split on newlines; ``#`` comments stripped; directive
      names case-insensitive; blank/unknown lines ignored (but any
      non-UA directive CLOSES a run of consecutive User-agent lines —
      the next UA line starts a new group);
    * consecutive ``User-agent:`` lines share one group; a group's rules
      apply to every named agent;
    * the crawler obeys the MOST SPECIFIC matching group only: all
      groups naming ``agent`` (exact match, case-insensitive — the RFC's
      product-token prefix matching is simplified to equality) if any,
      else all groups naming ``*``; hosts with neither yield no rows
      (fully allowed);
    * empty rule values ("Disallow:") are the allow-everything idiom —
      dropped.

    Everything is JVM column algebra over one posexplode of the body —
    no Python, one window per host body (robots bodies are KB-sized;
    the per-host group is trivially memory-bounded)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host",
        "ln",
        F.lower(
            F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)
        ).alias("directive"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(
        F.col("directive").isin("user-agent", "allow", "disallow")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    # a UA line starts a group unless the previous directive line was UA
    starts = (
        (is_ua == 1)
        & (F.coalesce(F.lag("directive").over(w), F.lit("")) != "user-agent")
    ).cast("int")
    grouped = parsed.withColumn(
        "group_id", F.sum(starts).over(w)
    ).filter(F.col("group_id") > 0)  # rules before any UA line are ignored

    agents = (
        grouped.filter(F.col("directive") == "user-agent")
        .groupBy("host", "group_id")
        .agg(F.collect_set(F.lower("value")).alias("agents"))
    )
    a = agent.lower()
    flags = agents.select(
        "host",
        "group_id",
        F.array_contains("agents", a).alias("named"),
        F.array_contains("agents", "*").alias("wild"),
    )
    host_mode = flags.groupBy("host").agg(
        F.max(F.col("named").cast("int")).alias("has_named")
    )
    applicable = (
        flags.join(host_mode, "host")
        .filter(
            F.when(F.col("has_named") == 1, F.col("named")).otherwise(
                F.col("wild")
            )
        )
        .select("host", "group_id")
    )
    rules = (
        grouped.filter(F.col("directive") != "user-agent")
        .join(applicable, ["host", "group_id"])
        .filter(F.col("value") != "")
        .select(
            "host",
            F.col("directive").alias("rule"),
            F.col("value").alias("path"),
            F.length("value").cast("long").alias("path_len"),
        )
        .distinct()
    )
    anchored = F.col("path").endswith("$")
    body = F.when(
        anchored, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    escaped = F.regexp_replace(
        body, r"([.^$+?(){}\[\]\\|])", r"\\$1"
    )
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(escaped, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return rules.withColumn("rx", rx)


def robots_filter(
    frontier: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Politeness gate: annotate frontier URLs with the RFC 9309 verdict
    for ``agent`` — ``(url, host, allowed, matched_rule, matched_path)``.

    Longest-match decides (max ``path_len`` over matching rules); on a
    length tie ALLOW wins; no matching rule (or no robots for the host)
    means allowed. Matching is on the URL's path-and-query with the
    parsed rules' anchored regexes.

    Plan shape: the rule table is robots-sized (hosts x a handful of
    rules) and BROADCAST; the verdict is one map-side left join on host
    + one partial-agg groupBy on url — nothing scales with frontier x
    rules beyond each host's own rule count, so a 10^10-URL frontier
    against 10^7 hosts' robots stays a broadcast join."""
    rules = parse_robots(robots, agent)
    path = F.regexp_replace(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
    )
    fr = frontier.select(
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
        F.when(path == "", "/").otherwise(path).alias("_path"),
    )
    j = fr.join(F.broadcast(rules), "host", "left").withColumn(
        "hit",
        F.col("rx").isNotNull() & F.expr("regexp_like(_path, rx)"),
    )
    verdict = j.groupBy("url", "host").agg(
        F.max(
            F.when(
                F.col("hit"),
                F.struct(
                    F.col("path_len"),
                    (F.col("rule") == "allow").cast("int").alias("is_allow"),
                    F.col("rule").alias("rule"),
                    F.col("path").alias("path"),
                ),
            )
        ).alias("win")
    )
    return verdict.select(
        "url",
        "host",
        F.coalesce(F.col("win.is_allow") == 1, F.lit(True)).alias("allowed"),
        F.col("win.rule").alias("matched_rule"),
        F.col("win.path").alias("matched_path"),
    )
