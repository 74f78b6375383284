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

__all__ = ["frontier_urls", "crawl_schedule"]


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
