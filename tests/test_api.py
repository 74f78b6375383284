"""API-layer smoke + parity tests: entry points, IO, eval ops,
vertex dictionary encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jgtextrank_spark.api import (
    build_cooccurrence_graph,
    keywords_extraction,
    keywords_extraction_from_segmented_corpus,
    keywords_extraction_from_tagged_corpus,
)
from jgtextrank_spark.graph import decode_scores, encode_vertices

TEXT = (
    "Compatibility of systems of linear constraints over the set of "
    "natural numbers. Criteria of compatibility of a system of linear "
    "Diophantine equations are considered."
)


def test_keywords_extraction_single_text(spark):
    kw = keywords_extraction(spark, TEXT, weight_comb="sum")
    rows = kw.collect()
    assert rows
    assert rows[0]["score"] >= rows[-1]["score"]
    terms = {r["term"] for r in rows}
    assert any(" " in t for t in terms)  # some multi-word terms


def test_segmented_corpus_entry(spark):
    seg = spark.createDataFrame(
        [
            Row(doc_id="d1", ctx_id=0,
                tokens=["compatibility", "of", "linear", "constraints"]),
            Row(doc_id="d1", ctx_id=1,
                tokens=["criteria", "of", "compatibility"]),
        ]
    )
    kw = keywords_extraction_from_segmented_corpus(seg, weight_comb="sum")
    assert kw.count() > 0


def test_tagged_corpus_entry_matches_reference(spark, reference):
    tagged_py = [
        [("systems", "NNS"), ("of", "IN"), ("linear", "JJ"),
         ("constraints", "NNS")],
        [("linear", "JJ"), ("systems", "NNS"), ("again", "RB")],
    ]
    from jgtextrank import keywords_extraction_from_tagged_corpus as ref_fn

    want = dict(
        ref_fn(tagged_py, weight_comb="sum", top_p=1.0, lemma=False)[0]
    )
    df = spark.createDataFrame(
        [
            Row(doc_id="d", ctx_id=i,
                tagged=[Row(token=t, tag=g) for t, g in sent])
            for i, sent in enumerate(tagged_py)
        ]
    )
    got = {
        r["term"]: r["score"]
        for r in keywords_extraction_from_tagged_corpus(
            df, weight_comb="sum", top_p=1.0
        ).collect()
    }
    assert got == want


def test_build_cooccurrence_graph_shapes(spark):
    pages = spark.createDataFrame([("u", TEXT)], "url string, text string")
    from jgtextrank_spark.corpus import build_sentences

    sentences = build_sentences(pages)
    vertices, edges = build_cooccurrence_graph(sentences, window=2)
    v = {r["id"] for r in vertices.collect()}
    e = [(r["src"], r["dst"]) for r in edges.collect()]
    assert v and e
    assert all(s in v and d in v for s, d in e)
    assert all(s <= d for s, d in e)  # canonical undirected


def test_encode_vertices_roundtrip(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0)],
        "src string, dst string, weight double",
    )
    enc, vdict = encode_vertices(edges)
    enc_rows = enc.collect()
    assert len(enc_rows) == 3
    assert all(isinstance(r["src"], int) for r in enc_rows)
    ids = {r["id"]: r["token"] for r in vdict.collect()}
    assert len(ids) == 3
    # run pagerank on encoded ids and decode back
    from jgtextrank_spark.algos.pagerank import pagerank
    from jgtextrank_spark.graph import symmetrize

    scores = pagerank(symmetrize(enc))
    decoded = decode_scores(scores, vdict)
    out = {r["vertex"]: r["score"] for r in decoded.collect()}
    assert set(out) == {"a", "b", "c"}


def test_evalops(spark):
    from jgtextrank_spark.functions.evalops import (
        evaluate_results,
        f1_score,
        term_precision,
        term_recall,
    )

    gold = spark.createDataFrame(
        [("linear constraints",), ("natural numbers",), ("upper bounds",)],
        "term string",
    )
    pred = spark.createDataFrame(
        [("Linear Constraints!", 0.9), ("types systems", 0.8),
         ("natural numbers", 0.7), ("noise", 0.1)],
        "term string, score double",
    )
    p = term_precision(gold, pred)
    r = term_recall(gold, pred)
    assert p == 0.5  # 2 of 4
    assert r == round(2 / 3, 3)
    assert f1_score(p, r) == round(2 * p * r / (p + r), 3)
    at = {
        row["cutoff"]: (row["precision"], row["recall"])
        for row in evaluate_results(gold, pred, cutoffs=[1, 2]).collect()
    }
    assert at[1] == (1.0, round(1 / 3, 3))
    assert at[2] == (0.5, round(1 / 3, 3))
    assert at[-1] == (0.5, round(2 / 3, 3))


def test_export_and_read(spark, tmp_path):
    from jgtextrank_spark.io import export_keywords, read_pages

    kw = spark.createDataFrame(
        [("linear constraints", 0.5), ("types systems", 0.4)],
        "term string, score double",
    )
    out = str(tmp_path / "kw_csv")
    export_keywords(kw, out, export_format="csv")
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2
    assert set(back.columns) == {"term", "weight"}

    pages_path = str(tmp_path / "pages")
    spark.createDataFrame(
        [("u1", "hello world")], "url string, text string"
    ).write.parquet(pages_path)
    assert read_pages(spark, pages_path).count() == 1
    with pytest.raises(ValueError, match="missing columns"):
        bad = str(tmp_path / "bad")
        spark.createDataFrame([("x",)], "nottext string").write.parquet(bad)
        read_pages(spark, bad)


def test_bucketed_edges_colocated_join(spark, tmp_path):
    """Bucketed edge tables must join and aggregate on the bucket key
    with NO exchange — the co-located-join contract that amortizes the
    adjacency shuffle across solver runs."""
    import io as _io
    from contextlib import redirect_stdout

    from jgtextrank_spark.io import read_bucketed_edges, write_bucketed_edges

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/wh'"
    )
    edges = spark.createDataFrame(
        [(str(i % 7), str(i % 11), 1.0) for i in range(200)],
        "src string, dst string, weight double",
    )
    write_bucketed_edges(edges, "bktdb.edges_a", buckets=4)
    write_bucketed_edges(edges, "bktdb.edges_b", buckets=4)
    a = read_bucketed_edges(spark, "bktdb.edges_a")
    b = read_bucketed_edges(spark, "bktdb.edges_b")

    def plan_of(df):
        buf = _io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # force the shuffle-join path (tiny test tables broadcast otherwise,
    # which sidesteps bucketing entirely — at scale broadcast is off the
    # table and this is the plan that matters)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "src")
        assert "Exchange" not in plan_of(joined), plan_of(joined)
        assert joined.count() > 0

        agg = a.groupBy("src").sum("weight")
        assert "Exchange" not in plan_of(agg), plan_of(agg)
        assert agg.count() == 7
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE bktdb CASCADE")


def test_read_text_directory_whole_files(spark, tmp_path):
    """Regression: one document per FILE even for multi-line files (the
    wholetext flag is only honoured as the text() kwarg, not as a reader
    option — reference CorpusContent2RawSentences reads whole files)."""
    from jgtextrank_spark.io import read_text_directory

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first line.\nsecond line.\n")
    (d / "b.txt").write_text("only line.\n")
    rows = read_text_directory(spark, str(d)).collect()
    assert len(rows) == 2
    by_url = {r["url"].split("/")[-1]: r["text"] for r in rows}
    assert "second line." in by_url["a.txt"]


# ------------------------------------------------------------------ WARC I/O
def _warc_record(wtype, uri, date, http_body=None, raw_body=b""):
    if http_body is not None:
        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + http_body
    else:
        body = raw_body
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def test_warc_reader(spark, tmp_path):
    """Minimal WARC framing: Content-Length-exact payloads (a body
    containing the literal 'WARC/1.0' must not confuse the parser), HTTP
    header stripping on response records, request records filtered,
    multi-member gzip (the Common Crawl per-record layout), and the
    pages-table composition with extracted text + lang."""
    import gzip

    from jgtextrank_spark.io import read_warc_records, warc_pages

    html1 = b"<html><p>the cat sat on the mat with a hat</p></html>"
    html2 = b"<html><p>embedded WARC/1.0 marker inside body</p></html>"
    r1 = _warc_record(
        "response", "https://a.org/1", "2024-01-02T03:04:05Z", http_body=html1
    )
    rq = _warc_record(
        "request", "https://a.org/1", "2024-01-02T03:04:05Z",
        raw_body=b"GET /1 HTTP/1.1\r\n\r\n",
    )
    r2 = _warc_record(
        "response", "https://b.org/2", "2024-02-03T04:05:06Z", http_body=html2
    )
    (tmp_path / "a.warc").write_bytes(r1 + rq + r2)
    # per-record gzip members concatenated, as Common Crawl ships
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(r1) + gzip.compress(rq) + gzip.compress(r2)
    )

    recs = read_warc_records(spark, str(tmp_path / "a.warc")).collect()
    got = {r["url"]: r for r in recs}
    assert set(got) == {"https://a.org/1", "https://b.org/2"}
    assert bytes(got["https://a.org/1"]["payload"]) == html1
    assert bytes(got["https://b.org/2"]["payload"]) == html2
    assert got["https://a.org/1"]["warc_ts"] is not None

    gz = {
        r["url"]: bytes(r["payload"])
        for r in read_warc_records(spark, str(tmp_path / "b.warc.gz")).collect()
    }
    assert gz == {"https://a.org/1": html1, "https://b.org/2": html2}

    rows = warc_pages(spark, str(tmp_path)).collect()
    assert len(rows) == 4  # 2 responses per file, both files read
    pages = {r["url"]: r for r in rows}
    p1 = pages["https://a.org/1"]
    assert p1["text"] == "the cat sat on the mat with a hat"
    assert p1["lang"] == "en"
    assert pages["https://b.org/2"]["lang"] == "und"
