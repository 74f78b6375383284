"""Structured Streaming surface: availableNow-triggered streaming results
must equal the batch operators on the same files (same expressions by
construction; these tests pin it)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jgtextrank_spark.streaming import (
    stream_pages,
    streaming_cooccurrence_edges,
    streaming_dedup_pages,
    streaming_token_stats,
)

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _pages_rows():
    return [
        ("u1", T0, b"<html>", "linear constraints over numbers", "en"),
        ("u2", T0 + dt.timedelta(minutes=10), b"<html>",
         "minimal set of solutions", "en"),
        # exact duplicate content of u1, later
        ("u3", T0 + dt.timedelta(minutes=20), b"<html>",
         "Linear constraints over numbers!", "en"),
        ("u4", T0 + dt.timedelta(hours=2), b"<html>",
         "minimal generating sets", "en"),
    ]


def _write_pages(spark, tmp_path):
    path = str(tmp_path / "pages_stream")
    spark.createDataFrame(
        _pages_rows(),
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(path)
    return path


def _run(spark, df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def test_streaming_edges_match_batch(spark, tmp_path):
    path = _write_pages(spark, tmp_path)
    pages = stream_pages(spark, path)
    got = _run(
        spark,
        streaming_cooccurrence_edges(pages, window=2),
        "stream_edges",
        "complete",
    )
    batch = spark.read.parquet(path)
    from jgtextrank_spark.streaming import streaming_cooccurrence_edges as _e

    want = _e(batch, window=2)  # same code path works on a batch df
    g = {
        (r["time_window"], r["src"], r["dst"], r["weight"])
        for r in got.collect()
    }
    w = {
        (r["time_window"], r["src"], r["dst"], r["weight"])
        for r in want.collect()
    }
    assert g == w and len(g) > 0


def test_streaming_dedup_first_seen(spark, tmp_path):
    path = _write_pages(spark, tmp_path)
    pages = stream_pages(spark, path)
    got = _run(
        spark, streaming_dedup_pages(pages), "stream_dedup", "append"
    )
    # u3 normalizes to u1's fingerprint ('!' stripped, lowercased)
    urls = {r["url"] for r in got.collect()}
    assert "u1" in urls or "u3" in urls
    assert not {"u1", "u3"} <= urls  # only one survivor of the dup pair
    assert {"u2", "u4"} <= urls


def test_streaming_token_stats(spark, tmp_path):
    path = _write_pages(spark, tmp_path)
    pages = stream_pages(spark, path)
    got = _run(
        spark,
        streaming_token_stats(pages, time_window="1 hour"),
        "stream_stats",
        "complete",
    )
    rows = {
        r["time_window"]["start"]: (r["n_pages"], r["n_tokens"])
        for r in got.collect()
    }
    assert rows[T0] == (3, 4 + 4 + 4)
    assert rows[T0 + dt.timedelta(hours=2)] == (1, 3)


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: gap-based session
    windows with per-key state. Sessions separated by more than the gap
    INSIDE the stream close and emit; trailing open sessions stay in
    state (closed later by the processing-time timeout on a live
    stream)."""
    from jgtextrank_spark.streaming import streaming_sessionize

    rows = [
        ("u1", T0, 1.0),
        ("u1", T0 + dt.timedelta(minutes=5), 2.0),
        # > 10-minute gap -> first session closes
        ("u1", T0 + dt.timedelta(minutes=60), 4.0),
        ("u1", T0 + dt.timedelta(minutes=62), 8.0),
        ("u2", T0, 16.0),  # single open session, must NOT emit
    ]
    path = str(tmp_path / "events_stream")
    spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double"
    ).write.parquet(path)
    ev = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .parquet(path)
    )
    got = _run(
        spark,
        streaming_sessionize(ev, gap_minutes=10),
        "stream_sessions",
        "append",
    )
    sessions = {
        (r["key"], r["session_start"], r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    assert sessions == {("u1", T0, 2, 3.0)}


def test_streaming_minhash_candidates_match_batch(spark, tmp_path):
    """Incremental LSH candidates == the batch minhash_lsh_pairs
    candidate set (same md5 family, per-row signatures) on the same
    corpus, modulo per-band duplicates."""
    from jgtextrank_spark.functions.dedup import minhash_lsh_pairs
    from jgtextrank_spark.streaming import streaming_minhash_candidates

    texts = {
        "d1": "the quick brown fox jumps over the lazy dog again today",
        "d2": "the quick brown fox jumps over the lazy dog again now",
        "d3": "completely different content about spark streaming state",
        "d4": "the quick brown fox jumps over the lazy dog again today",
    }
    path = str(tmp_path / "mh_pages")
    spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1), b"", v, "en") for k, v in texts.items()],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).write.parquet(path)

    pages = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string"
    ).parquet(path)
    got = _run(
        spark,
        streaming_minhash_candidates(pages, bands=8, rows_per_band=2),
        "stream_mh",
        "append",
    )
    stream_pairs = {(r["doc_a"], r["doc_b"]) for r in got.collect()}

    batch_docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id string, text string"
    )
    batch_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            batch_docs, bands=8, rows_per_band=2, verify_threshold=None
        ).collect()
    }
    assert stream_pairs == batch_pairs
    assert ("d1", "d4") in stream_pairs  # exact dup always collides
    assert not any("d3" in p for p in stream_pairs)


def test_streaming_edges_running_total(spark, tmp_path):
    """No event-time column: global running (src, dst, weight) aggregate."""
    path = _write_pages(spark, tmp_path)
    pages = stream_pages(spark, path)
    got = _run(
        spark,
        streaming_cooccurrence_edges(pages, window=2, ts_col=None),
        "stream_edges_global",
        "complete",
    )
    g = {(r["src"], r["dst"], r["weight"]) for r in got.collect()}
    batch = spark.read.parquet(path)
    want = streaming_cooccurrence_edges(batch, window=2, ts_col=None)
    w = {(r["src"], r["dst"], r["weight"]) for r in want.collect()}
    assert g == w and len(g) > 0
    assert ("constraints", "linear", 1.0) in g  # raw tokens, not lowercased
    assert F is not None
