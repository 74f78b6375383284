"""Corpus-curation operators for LLM training-data pipelines: repetition
signals, PII scrubbing, and benchmark decontamination.

These extend the engine beyond the reference's keyword-extraction scope
(the reference has no corpus-curation surface) with the standard filters a
web-scale pretraining pipeline applies between crawl and training:

* :func:`repetition_signals` — the Gopher-style repetition heuristics
  (Rae et al. 2021, "Scaling Language Models", Table A1): fraction of
  duplicate lines, fraction of all bigrams accounted for by the most
  frequent bigram, fraction of trigrams occurring more than once.
  Boilerplate-heavy or degenerate pages score high and get filtered.
* :func:`pii_scrub` — regex-based detection + redaction of emails,
  NANP-style phone numbers, and IPv4 addresses, returning both per-doc
  counts and the redacted text. Patterns are deliberately simple and
  identical under Java regex (Spark) and RE2 (DuckDB) so the operator is
  oracle-replayable.
* :func:`decontaminate` — n-gram overlap against a benchmark table
  (the standard eval-contamination check): a document is contaminated if
  any of its sliding word n-grams exactly matches a benchmark n-gram.

Scale shape: everything is JVM-side column algebra; the only shuffles are
partial-aggregation-friendly ``groupBy(doc_id)`` reductions over exploded
grams, and the benchmark side of :func:`decontaminate` is broadcast
(benchmark suites are tiny next to a 100 TB corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "repetition_signals",
    "fix_mojibake",
    "MOJIBAKE_MARKER_RE",
    "pii_scrub",
    "decontaminate",
    "frequent_lines",
    "remove_boilerplate_lines",
    "ngrams_expr",
    "EMAIL_RE",
    "PHONE_RE",
    "IPV4_RE",
]

# Shared with the DuckDB oracle — keep to the Java-regex ∩ RE2 subset
# (no backrefs, no lookaround, no \b-adjacent quirks beyond word chars).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _toks(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


def ngrams_expr(col, n: int) -> Column:
    """Sliding word n-grams of the whitespace tokenization, as an array of
    space-joined strings (empty array when the doc has < n tokens). Pure
    JVM higher-order functions — the per-row analogue of the co-occurrence
    window generator in graph.py, no self-join."""
    toks = _toks(col)
    m = F.size(toks) - F.lit(n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition heuristics per document:

    ``(doc_id, n_lines, dup_line_frac, top_bigram_frac, dup_trigram_frac)``

    * ``dup_line_frac``: 1 - distinct_lines/lines over non-empty lines
      (0.0 for <= 1 line) — catches copy-pasted boilerplate blocks,
    * ``top_bigram_frac``: count of the most frequent bigram / total
      bigrams — catches "foo bar foo bar ..." degeneracy,
    * ``dup_trigram_frac``: fraction of trigram OCCURRENCES whose gram
      appears more than once — catches longer-range loops.

    The line fraction is per-row column algebra; the gram fractions are
    one explode + two partial-agg-friendly ``groupBy`` reductions (gram
    counts combine map-side; no window functions, no self-joins)."""
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda s: s != "")
    nl = F.size(lines)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        nl.cast("long").alias("n_lines"),
        F.round(
            F.when(
                nl > 1,
                1.0 - F.size(F.array_distinct(lines)).cast("double") / nl,
            ).otherwise(0.0),
            6,
        ).alias("dup_line_frac"),
        ngrams_expr(text_col, 2).alias("g2"),
        ngrams_expr(text_col, 3).alias("g3"),
    )

    def _frac(col_grams: str, kind: str) -> DataFrame:
        per_gram = (
            base.select("doc_id", F.explode(col_grams).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        if kind == "top":
            # max(c)/sum(c): the modal gram's share of all occurrences
            expr = F.max("c").cast("double") / F.sum("c")
        else:
            # sum(c where c>1)/sum(c): occurrences covered by repeats
            expr = (
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("c")
            )
        return per_gram.groupBy("doc_id").agg(
            F.round(expr, 6).alias(f"{kind}_frac")
        )

    top2 = _frac("g2", "top").withColumnRenamed("top_frac", "top_bigram_frac")
    dup3 = _frac("g3", "dup").withColumnRenamed(
        "dup_frac", "dup_trigram_frac"
    )
    return (
        base.select("doc_id", "n_lines", "dup_line_frac")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias(
                "dup_trigram_frac"
            ),
        )
    )


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + redaction, map-only:

    ``(doc_id, n_emails, n_phones, n_ips, clean_text)`` with emails →
    ``<EMAIL>``, phones → ``<PHONE>``, IPv4s → ``<IP>``. Emails are
    redacted FIRST so a digits-only local part can't be half-eaten by the
    phone pass; IPs last (the phone pattern's 3-3-4 shape cannot match a
    dotted quad, so the order is total). Counts come from the original
    text. One projection, whole-stage-codegen friendly, no shuffle."""
    text = F.col(text_col)

    def _n(rx: str) -> Column:
        return F.size(
            F.regexp_extract_all(text, F.lit(rx), F.lit(0))
        ).cast("long")

    clean = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        _n(EMAIL_RE).alias("n_emails"),
        _n(PHONE_RE).alias("n_phones"),
        _n(IPV4_RE).alias("n_ips"),
        clean.alias("clean_text"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by exact n-gram overlap: a document is
    contaminated if any of its sliding word ``n``-grams equals any
    ``n``-gram of the benchmark corpus (the GPT-3/PaLM-style 8-13-gram
    membership test).

    Returns ``(doc_id, n_hits, contaminated)`` for EVERY input document —
    ``n_hits`` = number of DISTINCT benchmark grams present in the doc.

    Scale shape: the benchmark's distinct grams are broadcast (benchmark
    suites are a few MB against a 100 TB corpus); each doc's grams are
    generated per-row (no self-join), de-duplicated per doc before the
    join so a gram repeated inside one doc counts once, and the final
    ``groupBy(doc_id)`` combines map-side."""
    bench_grams = (
        benchmark.select(F.explode(ngrams_expr(bench_text_col, n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(ngrams_expr(text_col, n))).alias("g"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def frequent_lines(
    df: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide heavy-hitter lines: ``(line, n)`` for every non-empty
    line occurring at least ``min_count`` times across all documents.

    One explode + one partial-agg-friendly count. The output is SMALL by
    construction — at threshold k over L total lines there are at most
    L/k qualifying distinct lines — which is what makes the two-pass
    boilerplate filter broadcast-able."""
    return (
        df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), "\n"), lambda s: s != "")
            ).alias("line")
        )
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    drop every line whose corpus-wide occurrence count is >=
    ``min_count`` (nav bars, cookie banners, footers repeat across a
    crawl; body text doesn't), keeping remaining lines in order.

    Returns ``(doc_id, text, n_kept, n_dropped)`` for every input doc
    (``text`` is '' when everything was boilerplate; empty input lines
    are dropped and not counted).

    Scale shape: pass 1 computes the heavy-hitter line set (small by
    construction, see :func:`frequent_lines`); pass 2 is a BROADCAST
    anti-membership check per line — no shuffle of the exploded corpus,
    and reassembly is one ``groupBy(doc_id)`` whose per-doc line structs
    are sorted by position (deterministic, no global window)."""
    freq = F.broadcast(frequent_lines(df, min_count, text_col))
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), "\n"), lambda s: s != "")
        ).alias("pos", "line"),
    )
    marked = exploded.join(
        freq.select("line", F.lit(True).alias("is_boiler")), "line", "left"
    )
    rebuilt = marked.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_boiler").isNull(),
                            F.struct("pos", "line"),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.sum(F.when(F.col("is_boiler").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )


# UTF-8-read-as-Latin-1 signature: a Latin-1 char that IS a UTF-8 lead
# byte (C2-C3 two-byte, E0-EF three-byte) followed by a continuation-byte
# char (80-BF). Shared with the DuckDB oracle via this constant.
MOJIBAKE_MARKER_RE = "[\u00c2-\u00c3\u00e0-\u00ef][\u0080-\u00bf]"


def fix_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and repair the classic double-encoding corruption (UTF-8
    bytes decoded as Latin-1: ``é`` renders as ``Ã©``, ``…`` as
    ``â\u0080¦``) — the ftfy-style fixer every web-crawl ingest needs,
    as pure JVM column algebra: repair = ``decode(encode(text, latin-1),
    utf-8)``, a lossless byte round-trip exactly when the corruption
    happened.

    Returns ``(doc_id, text_fixed, was_mojibake)``. The repair applies
    only when ALL of:

    * mojibake markers present (``MOJIBAKE_MARKER_RE``);
    * every char is <= U+00FF (true mojibake is all-Latin-1; anything
      higher would be mangled by the Latin-1 encode);
    * the Latin-1 re-encoding is VALID UTF-8 (``is_valid_utf8``) and
      decoding it strictly reduces the marker count (a genuine Latin-1
      text that merely looks suspicious is left alone).

    Otherwise the text passes through unchanged. Windows-1252-specific
    mojibake (curly quotes via C1 bytes) is out of scope — Spark 4's
    charset allowlist has no cp1252 — and documented as such.

    Map-only (no shuffle, no Python); the correctness gate replays the
    verdict in closed form on synthesized corruption."""
    t = F.col(text_col)
    markers = F.regexp_count(t, F.lit(MOJIBAKE_MARKER_RE))
    all_latin1 = t.rlike("^[\u0000-\u00ff]*$")
    pre = (markers > 0) & all_latin1
    # ANSI mode: encode throws on chars > U+00FF and decode throws on
    # invalid UTF-8, so both run conditionally — encode only behind the
    # all-Latin-1 check, decode only behind is_valid_utf8
    raw = F.when(pre, F.encode(t, "ISO-8859-1"))
    valid = F.coalesce(F.is_valid_utf8(raw), F.lit(False))
    repaired = F.when(pre & valid, F.decode(raw, "UTF-8"))
    fix = (
        pre
        & valid
        & (F.regexp_count(repaired, F.lit(MOJIBAKE_MARKER_RE)) < markers)
    )
    return df.select(
        "doc_id",
        F.when(fix, repaired).otherwise(t).alias("text_fixed"),
        fix.alias("was_mojibake"),
    )
