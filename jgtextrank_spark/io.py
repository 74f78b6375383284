"""Sources and sinks.

Readers: parquet pages tables (the Common-Crawl-style input of
BASELINE.json's input_hint: url, warc_ts, html, text, lang), Iceberg when
the runtime has the catalog (gated — not bundled in this sandbox), text
directories, binary archives.

Writers: keyword exports mirroring the reference's CSV/JSON sinks
(utility.py:192-204, core.py:1306-1314) plus plain DataFrame writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_pages",
    "read_pages_iceberg",
    "read_text_directory",
    "read_binary_archive",
    "export_keywords",
    "write_bucketed_edges",
    "read_bucketed_edges",
]

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a pages table. Columns beyond the canonical five are kept;
    missing optional ones (warc_ts/html/lang) are tolerated — only url and
    text are required downstream."""
    df = spark.read.format(fmt).load(path)
    missing = {"url", "text"} - set(df.columns)
    if missing:
        raise ValueError(f"pages table at {path} missing columns {missing}")
    return df


def read_pages_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg scan (north-star input). Requires an Iceberg catalog on the
    cluster; raises a clear error in environments without one."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "Iceberg runtime not available in this Spark session; on a "
            "cluster add the iceberg-spark-runtime jar and catalog conf. "
            f"Underlying error: {e}"
        ) from e


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 64,
    by: tuple[str, ...] = ("src",),
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist an edge table hash-bucketed (and sorted) by its join key.

    Bucketing is the durable form of the in-memory `repartition(N, src)`
    the superstep solvers rely on: two tables bucketed the same way
    join/aggregate on the bucket key with ZERO exchange at read time —
    the co-located-join strategy for edge tables that are read by many
    jobs (every solver run re-reads the adjacency; paying the shuffle
    once at write time amortizes it across all of them). Requires a
    table catalog (saveAsTable); plain parquet files cannot carry bucket
    metadata."""
    writer = edges.write.mode(mode).format("parquet").bucketBy(
        buckets, *by
    )
    if sort:
        writer = writer.sortBy(*by)
    writer.saveAsTable(table)


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed edge table; Catalyst sees the bucket spec and
    drops the exchange for joins/aggregations on the bucket key."""
    return spark.table(table)


def read_text_directory(
    spark: SparkSession, dirname: str, encoding: str = "utf-8"
) -> DataFrame:
    """One document per file (reference CorpusContent2RawSentences,
    utility.py:63-98): (url, text)."""
    return (
        # wholetext must be the text() kwarg; as a reader .option() it is
        # silently ignored and each file splits into one row per line
        spark.read.text(dirname, wholetext=True)
        .select(F.input_file_name().alias("url"), F.col("value").alias("text"))
    )


def read_binary_archive(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file scan (reference ``load_all_files_from_zip_file``,
    resource/example_utility.py:552-569): (url, length, content). Works on
    directories of zips/WARCs/etc via Spark's binaryFile source."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select(
        F.col("path").alias("url"),
        F.col("length"),
        F.col("content"),
    )


def export_keywords(
    keywords: DataFrame,
    path: str,
    export_format: str = "csv",
    encoding: str = "utf-8",
) -> None:
    """Reference `_export_result` mirror (core.py:1306-1314): csv with
    header (term, weight) or json. Distributed write (one part per
    partition); coalesce(1) for small single-file parity outputs."""
    if export_format == "csv":
        (
            keywords.select(
                F.col("term"), F.col("score").alias("weight")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("encoding", encoding)
            .csv(path)
        )
    elif export_format == "json":
        (
            keywords.select("term", F.col("score").alias("weight"))
            .coalesce(1)
            .write.mode("overwrite")
            .json(path)
        )
    else:
        raise ValueError(
            f"Unsupported export format: {export_format!r} (csv|json)"
        )
