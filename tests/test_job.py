"""spark-submit job entry point: argument wiring + run() on a live
session (the real spark-submit --py-files invocation is exercised
manually/in CI; here we pin the job logic itself)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))

import linkgraph_job  # noqa: E402


def _write_edges(spark, tmp_path):
    # asymmetric on purpose: a uniform-stationary graph (e.g. a plain
    # directed cycle) converges at superstep 1, before any durable
    # checkpoint exists, and the resume test below would see nothing
    path = str(tmp_path / "edges")
    spark.createDataFrame(
        [
            ("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
            ("a", "c", 3.0), ("d", "d", 1.0),
        ],
        "src string, dst string, weight double",
    ).write.parquet(path)
    return path


def test_job_components_on_edge_table(spark, tmp_path):
    edges = _write_edges(spark, tmp_path)
    out = str(tmp_path / "out")
    args = linkgraph_job.parse_args(
        ["--edges", edges, "--output", out, "--algo", "components_star"]
    )
    summary = linkgraph_job.run(spark, args)
    assert summary["rows"] == 4
    got = {
        r["vertex"]: r["component"]
        for r in spark.read.parquet(out + "/result").collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}
    meta = json.loads((tmp_path / "out" / "metrics.json").read_text())
    assert meta["algo"] == "components_star"


def test_job_pagerank_resumes(spark, tmp_path):
    edges = _write_edges(spark, tmp_path)
    out = str(tmp_path / "pr_out")
    ckpt = str(tmp_path / "ckpt")
    base = [
        "--edges", edges, "--output", out, "--algo", "pagerank",
        "--checkpoint-dir", ckpt, "--checkpoint-every", "2",
    ]
    a1 = linkgraph_job.parse_args(base + ["--max-iter", "2"])
    linkgraph_job.run(spark, a1)
    a2 = linkgraph_job.parse_args(base + ["--max-iter", "50"])
    s2 = linkgraph_job.run(spark, a2)
    assert any(
        m.get("event") == "resume" for m in s2["superstep_metrics"]
    ), "second submit must resume from the durable checkpoint"
    scores = {
        r["vertex"]: r["score"]
        for r in spark.read.parquet(out + "/result").collect()
    }
    assert abs(sum(scores.values()) - 1.0) < 1e-9


def test_job_scc_and_salsa_on_edge_table(spark, tmp_path):
    edges = _write_edges(spark, tmp_path)
    out = str(tmp_path / "out_scc")
    args = linkgraph_job.parse_args(
        ["--edges", edges, "--output", out, "--algo", "scc"]
    )
    summary = linkgraph_job.run(spark, args)
    assert summary["rows"] == 4
    got = {
        r["vertex"]: r["component"]
        for r in spark.read.parquet(out + "/result").collect()
    }
    # a->b->c->a cycle is one SCC; d (self-loop only) is a singleton
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}

    out2 = str(tmp_path / "out_salsa")
    args = linkgraph_job.parse_args(
        ["--edges", edges, "--output", out2, "--algo", "salsa"]
    )
    summary = linkgraph_job.run(spark, args)
    rows = spark.read.parquet(out2 + "/result").collect()
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-9


def test_job_trustrank_and_warc_source(spark, tmp_path):
    import gzip

    edges = _write_edges(spark, tmp_path)
    out = str(tmp_path / "out_tr")
    args = linkgraph_job.parse_args(
        ["--edges", edges, "--output", out, "--algo", "trustrank",
         "--trusted", "a,b"]
    )
    summary = linkgraph_job.run(spark, args)
    assert summary["rows"] == 4
    scores = {
        r["vertex"]: r["score"]
        for r in spark.read.parquet(out + "/result").collect()
    }
    assert abs(sum(scores.values()) - 1.0) < 1e-6
    # d is unreachable from the seeds: only (tiny) dangling leakage
    assert scores["d"] < min(scores["a"], scores["b"], scores["c"])

    # WARC directory as the page source, link edges end-to-end
    body = (
        b"HTTP/1.1 200 OK\r\n\r\n"
        b'<html><a href="https://b.org/y">l</a></html>'
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.org/x\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body + b"\r\n\r\n"
    )
    wdir = tmp_path / "warc"
    wdir.mkdir()
    (wdir / "c.warc.gz").write_bytes(gzip.compress(rec))
    out2 = str(tmp_path / "out_warc")
    args = linkgraph_job.parse_args(
        ["--warc", str(wdir), "--output", out2, "--algo", "pagerank"]
    )
    summary = linkgraph_job.run(spark, args)
    got = {
        r["vertex"]: r["score"]
        for r in spark.read.parquet(out2 + "/result").collect()
    }
    assert set(got) == {"https://a.org/x", "https://b.org/y"}
    assert abs(sum(got.values()) - 1.0) < 1e-6
