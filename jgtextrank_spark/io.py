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
    "read_warc_records",
    "warc_pages",
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


def _parse_warc_bytes(data: bytes):
    """Yield (url, warc_date, warc_type, payload bytes) per WARC record.

    Minimal ISO 28500 framing parser: records start at a ``WARC/1.x``
    version line, headers run to the first blank line, the content block
    is exactly ``Content-Length`` bytes (never scanned for delimiters —
    binary payloads with embedded 'WARC/1.0' strings parse correctly),
    followed by two CRLFs. For ``response`` records the HTTP response
    headers are split off the payload at the first CRLFCRLF so the
    payload is the entity body (the html). Gzip (including the
    multi-member per-record gzip Common Crawl ships) is handled by the
    caller via ``gzip.decompress``, which decodes concatenated members."""
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("latin-1", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            # skip garbage to the next version line
            nxt = data.find(b"WARC/1.", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        hdrs = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        try:
            length = int(hdrs.get("content-length", "0"))
        except ValueError:
            length = 0
        body = data[head_end + 4 : head_end + 4 + length]
        wtype = hdrs.get("warc-type", "")
        if wtype == "response":
            # strip the HTTP status line + headers off the payload
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                body = body[split + 4 :]
        yield (
            hdrs.get("warc-target-uri"),
            hdrs.get("warc-date"),
            wtype,
            body,
        )
        pos = head_end + 4 + length
        # consume the record-terminating blank lines
        while data.startswith(b"\r\n", pos):
            pos += 2


def read_warc_records(
    spark: SparkSession, path: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """WARC source: ``(url, warc_ts, record_type, payload binary)`` from
    a directory/glob of ``.warc`` / ``.warc.gz`` files — the native
    format of Common-Crawl-style crawls (the north-rule pages table's
    upstream).

    Scale shape: ``binaryFile`` gives one task per file (WARC is not
    split-safe mid-file; Common Crawl ships ~1 GB files by the tens of
    thousands, so file-level parallelism saturates any cluster), and the
    framing parse runs in Arrow-batched ``mapInPandas`` — per-record
    Content-Length arithmetic has no column-algebra form, the documented
    exception class (multimodal decode, per-group Tarjan). HTTP response
    headers are stripped so ``payload`` is the entity body (html)."""
    import pandas as pd

    bin_df = spark.read.format("binaryFile").load(path)
    keep = tuple(record_types)

    def parse(batches):
        import gzip

        for pdf in batches:
            out = {"url": [], "warc_ts": [], "record_type": [], "payload": []}
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fname.endswith(".gz"):
                    data = gzip.decompress(data)
                for url, ts, wtype, body in _parse_warc_bytes(data):
                    if keep and wtype not in keep:
                        continue
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["record_type"].append(wtype)
                    out["payload"].append(body)
            yield pd.DataFrame(out)

    raw = bin_df.select("path", "content").mapInPandas(
        parse,
        schema="url string, warc_ts string, record_type string, "
        "payload binary",
    )
    return raw.select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        "record_type",
        "payload",
    )


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC response records as the canonical north-rule pages table
    ``(url, warc_ts, html, text, lang)``: payload becomes ``html``,
    ``text`` is the extracted visible text (weblinks.html_to_text), and
    ``lang`` the marker-ratio heuristic prediction (textstats.lang_id
    expression) — all downstream of the one Arrow parse pass."""
    from .functions.textstats import EN_MARKERS, tokens_expr
    from .weblinks import html_to_text

    recs = read_warc_records(spark, path, record_types=("response",))
    pages = recs.select(
        "url",
        "warc_ts",
        F.col("payload").alias("html"),
        html_to_text(F.col("payload"), binary=True).alias("text"),
    )
    toks = tokens_expr("text")
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_MARKERS)))
    ntok = F.size(toks)
    ratio = F.when(ntok > 0, hits.cast("double") / ntok).otherwise(0.0)
    return pages.select(
        "url",
        "warc_ts",
        "html",
        "text",
        F.when((ntok >= 5) & (ratio >= 0.05), F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("lang"),
    )


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
