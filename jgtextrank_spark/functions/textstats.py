"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (no Python UDFs): language-ID heuristic,
quality scoring, token counting, document fingerprinting. Deterministic and
ANSI-SQL-expressible so every one has a DuckDB oracle in the correctness
gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens_expr",
    "token_count",
    "bpe_ish_token_count",
    "lang_id",
    "quality_score",
    "fingerprint",
    "readability",
    "word_entropy",
    "fingerprint_expr",
    "EN_MARKERS",
]

# Tiny high-frequency English marker set for the n-gram/stopword-hit
# language heuristic (shared with the SQL oracle).
EN_MARKERS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "with", "as", "was", "on", "are", "by", "this", "be", "or", "an",
]


def tokens_expr(col) -> Column:
    """Whitespace tokenization with empty-token removal (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars): whitespace token count + char count."""
    return df.select(
        "doc_id",
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bpe): BPE-ish subword proxy count — runs of letters,
    runs of digits, or single other non-space symbols (a stable regex
    approximation of byte-pair tokenizer granularity for budgeting)."""
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return df.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).cast("long").alias("n_bpe"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, en_ratio, lang_pred): fraction of tokens that are
    high-frequency English markers; 'en' iff ratio >= 0.05 over >= 5
    tokens."""
    toks = tokens_expr(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_MARKERS)))
    n = F.size(toks)
    ratio = F.when(n > 0, hits.cast("double") / n).otherwise(0.0)
    return df.select(
        "doc_id",
        F.round(ratio, 6).alias("en_ratio"),
        F.when((n >= 5) & (ratio >= 0.05), F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_word_len, alnum_ratio, stop_ratio, quality):
    composable quality features + a [0,1] score. Pure column algebra."""
    toks = tokens_expr(text_col)
    n = F.size(toks)
    nd = n.cast("double")
    text = F.col(text_col)
    n_chars = F.length(text)
    alnum = F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    alnum_ratio = F.when(n_chars > 0, alnum.cast("double") / n_chars).otherwise(
        0.0
    )
    mean_wl = F.when(n > 0, (n_chars - (n - 1)).cast("double") / nd).otherwise(
        0.0
    )
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(EN_MARKERS)))
    stop_ratio = F.when(n > 0, stop_hits.cast("double") / nd).otherwise(0.0)
    # clamp-product score: length window, word-length window, alnum floor
    len_ok = F.least(nd / 20.0, F.lit(1.0))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.5)
    quality = F.round(len_ok * wl_ok * alnum_ratio, 6)
    return df.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality.alias("quality"),
    )


def fingerprint_expr(col) -> Column:
    """md5 of the whitespace/punct-normalized lowercase text — the
    exact-dedup key as a column expression (shared by the batch operator
    and the streaming dropDuplicates path)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " "), r" +", " "
        )
    )
    return F.md5(norm)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp). Stable across engines (md5 is ubiquitous)."""
    return df.select("doc_id", fingerprint_expr(text_col).alias("fp"))


def readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): Flesch
    reading-ease with the standard web-pipeline approximations —
    sentences = runs of [.!?] (floored at 1), syllables = vowel-group
    runs [aeiouy]+ (the classic heuristic, exact enough for corpus
    filtering thresholds). Pure column algebra; NULL flesch for empty
    docs."""
    text = F.col(text_col)
    w = F.size(tokens_expr(text_col))
    s = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))),
    )
    sy = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), F.lit(0))
    )
    wd, sd, syd = (c.cast("double") for c in (w, s, sy))
    flesch = F.when(
        w > 0,
        F.round(
            F.lit(206.835) - F.lit(1.015) * (wd / sd)
            - F.lit(84.6) * (syd / wd),
            6,
        ),
    )
    return df.select(
        "doc_id",
        w.cast("long").alias("n_words"),
        s.cast("long").alias("n_sentences"),
        sy.cast("long").alias("n_syllables"),
        flesch.alias("flesch"),
    )


def word_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, entropy): Shannon entropy (bits) of the lowercased
    unigram distribution — the cheap gibberish/repetition signal
    (entropy near 0 = one word repeated; high = diverse vocabulary).
    Computed as log2(n) - sum(c*log2(c))/n from per-(doc, word) counts:
    one explode + two partial-aggregating groupBys, no UDFs. Empty docs
    get 0.0."""
    words = df.select(
        "doc_id", F.explode(tokens_expr(text_col)).alias("w")
    ).select("doc_id", F.lower("w").alias("w"))
    counts = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    ent = (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c").cast("double") * F.log2("c")).alias("clc"),
        )
        .select(
            "doc_id",
            F.round(
                F.log2(F.col("n").cast("double"))
                - F.col("clc") / F.col("n").cast("double"),
                6,
            ).alias("entropy"),
        )
    )
    return (
        df.select("doc_id")
        .join(ent, "doc_id", "left")
        .select("doc_id", F.coalesce("entropy", F.lit(0.0)).alias("entropy"))
    )
