"""Structured Streaming surface: incremental ingestion of Common-Crawl
style page streams into the same operators the batch engine runs.

The reference is batch-only; this is the generalization the north rule's
"Common-Crawl-style web pages" input calls for when pages arrive
continuously (new WARC drops): the SAME zero-shuffle pair-generation and
fingerprint expressions feed ``readStream`` sources, so streaming and
batch stay semantically identical by construction (the streaming tests
assert availableNow-triggered results equal the batch operator on the
same files).

Design notes for the cluster:

* **Edge aggregation is a streaming stateful agg.** With an event-time
  column, edges are aggregated per ``window(warc_ts, ...)`` under a
  watermark — state is bounded and append-mode sinks work (each window's
  edge partial finalizes when the watermark passes). Periodic batch
  compaction of window partials into the global edge table is one
  ``groupBy(src,dst).sum`` — the classic lambda-free incremental build.
* **Streaming dedup is ``dropDuplicates`` on the fingerprint under the
  same watermark** — Spark keeps one state row per fingerprint within
  the watermark horizon, i.e. bounded memory at any corpus size.
* No new shuffle shapes: everything reuses the batch expressions
  (``graph.cooccurrence_pairs``, ``textstats.fingerprint_expr``), so the
  plan properties audited in EXPLAIN.md carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.textstats import fingerprint_expr, tokens_expr
from .graph import cooccurrence_pairs

__all__ = [
    "PAGES_SCHEMA",
    "stream_pages",
    "streaming_cooccurrence_edges",
    "streaming_dedup_pages",
    "streaming_token_stats",
]

# the north-rule input table shape (BASELINE.json input_hint)
PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession,
    path: str,
    schema: str = PAGES_SCHEMA,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a drop directory of page files."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def streaming_cooccurrence_edges(
    pages: DataFrame,
    window: int = 2,
    text_col: str = "text",
    ts_col: str | None = "warc_ts",
    time_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Incremental weighted co-occurrence edge table.

    With ``ts_col``: (window, src, dst, weight) partials per event-time
    window under a watermark (append-compatible, bounded state). Without:
    the global running (src, dst, weight) aggregate (update/complete
    sinks). Pair generation is the batch zero-shuffle array path."""
    toks = pages.select(
        *([F.col(ts_col)] if ts_col else []),
        tokens_expr(text_col).alias("tokens"),
    )
    if ts_col:
        toks = toks.withWatermark(ts_col, watermark)
    pairs = cooccurrence_pairs(
        toks, window=window, extra_cols=[ts_col] if ts_col else None
    )
    pairs = pairs.select(
        *([F.col(ts_col)] if ts_col else []),
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    )
    if ts_col:
        grouped = pairs.groupBy(
            F.window(ts_col, time_window).alias("time_window"), "src", "dst"
        )
    else:
        grouped = pairs.groupBy("src", "dst")
    return grouped.agg(F.count(F.lit(1)).cast("double").alias("weight"))


def streaming_dedup_pages(
    pages: DataFrame,
    text_col: str = "text",
    ts_col: str | None = "warc_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """First-seen page per content fingerprint (exact streaming dedup):
    one state row per fingerprint inside the watermark horizon."""
    fp = pages.withColumn("fp", fingerprint_expr(text_col))
    if ts_col:
        fp = fp.withWatermark(ts_col, watermark)
        return fp.dropDuplicatesWithinWatermark(["fp"])
    return fp.dropDuplicates(["fp"])


def streaming_token_stats(
    pages: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    time_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-time-window corpus stats (pages, tokens, chars) — the
    monitoring rollup a continuous ingest pipeline alarms on."""
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, time_window).alias("time_window"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.size(tokens_expr(text_col))).alias("n_tokens"),
            F.sum(F.length(text_col)).alias("n_chars"),
        )
    )
