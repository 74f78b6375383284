"""Corpus language-model operators: bigram fluency scoring and PMI
collocation mining.

The perplexity-style quality signal of CCNet/Gopher pipelines, minus the
external LM: the corpus itself is the training set. Everything is count
algebra + logs (JVM-side, no Python), deterministic, and mirrored
expression-for-expression by the DuckDB gate oracles.

Scale shape: bigram/unigram count tables are classic map-side-combinable
word-counts; scoring joins each doc bigram against the (much smaller)
count tables — broadcastable for bounded vocabularies, shuffle hash
joins otherwise; the per-doc rollup is one aggregation. Nothing is
quadratic and no window is global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

__all__ = ["doc_bigrams", "bigram_lm_score", "pmi_collocations", "dsir_weights"]


def doc_bigrams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent token pairs ``(doc_id, w1, w2)`` — one row per bigram
    OCCURRENCE (not distinct), built with array higher-order functions
    (zero shuffle)."""
    toks = tokens_expr(text_col)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_lm_score(
    df: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    alpha: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Per-doc fluency under a corpus-trained bigram LM with stupid
    backoff (Brants et al. 2007): ``(doc_id, n_bigrams, avg_logp)``.

    ``p(w2|w1) = c(w1,w2) / c1(w1)`` when the bigram was seen in
    ``train`` (default: ``df`` itself), else ``alpha * p_uni(w2)`` with
    add-one-smoothed unigrams ``p_uni(w) = (c(w)+1) / (N+V)`` — so
    unseen words score finitely. ``avg_logp`` is the mean natural log
    probability over the doc's bigrams (0.0 for docs with none); higher
    is more fluent. Train on a clean subset and score the whole corpus
    to get the CCNet-style quality split."""
    if train is None:
        train = df
    tb = doc_bigrams(train, text_col)
    big = tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c1 = bigram-LEFT occurrences (so seen bigrams have p <= 1 exactly)
    left = tb.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni = (
        train.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    scal = uni.agg(
        F.sum("cu").cast("double").alias("n_tok"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    logp = F.when(
        F.col("c12").isNotNull(),
        F.log(F.col("c12") / F.col("c1")),
    ).otherwise(
        F.log(
            F.lit(alpha)
            * ((F.coalesce("cu", F.lit(0)) + F.lit(1))
               / (F.col("n_tok") + F.col("vocab")))
        )
    )
    scored = (
        doc_bigrams(df, text_col)
        .join(big, ["w1", "w2"], "left")
        .join(left, "w1", "left")
        .join(uni.withColumnRenamed("w", "w2"), "w2", "left")
        .crossJoin(F.broadcast(scal))
        .select("doc_id", logp.alias("logp"))
    )
    return (
        df.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.round(F.avg("logp"), round_to).alias("avg_logp"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce("avg_logp", F.lit(0.0)).alias("avg_logp"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Collocation mining: ``(w1, w2, n, pmi)`` for adjacent token pairs
    with ``n >= min_count``, where ``pmi = ln((n/B) / ((c1/N)*(c2/N)))``
    (B = total bigram slots, N = total tokens). High PMI = the pair
    co-occurs far above chance — multiword expressions, the statistical
    counterpart of the reference's adjacency-collapse MWT step
    (jgtextrank core.py _collapse_adjacent_keywords)."""
    bg = doc_bigrams(df, text_col)
    big = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    uni = (
        df.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    scal = bg.agg(F.count(F.lit(1)).cast("double").alias("b_tot")).crossJoin(
        uni.agg(F.sum("cu").cast("double").alias("n_tok"))
    )
    return (
        big.filter(F.col("n") >= min_count)
        .join(
            uni.select(F.col("w").alias("w1"), F.col("cu").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(scal))
        .select(
            "w1",
            "w2",
            "n",
            F.round(
                F.log(
                    (F.col("n") / F.col("b_tot"))
                    / ((F.col("c1") / F.col("n_tok"))
                       * (F.col("c2") / F.col("n_tok")))
                ),
                round_to,
            ).alias("pmi"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    n_buckets: int = 8192,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023): score
    every corpus document by how target-like its hashed n-gram profile
    is — ``log w(x) = Σ_b c_x(b) · (log p_target(b) − log p_raw(b))``
    over hashed unigram+bigram buckets — then feed the weights to
    :func:`~jgtextrank_spark.functions.sampling.weighted_sample` to
    draw a target-shaped training subset from a raw crawl. This is the
    standard importance-resampling selection step between a small clean
    target corpus (Wikipedia, books) and a 100 TB raw crawl.

    ``p(b) = (count(b) + 1) / (N + n_buckets)`` (add-one over buckets)
    for both sides; ``raw`` defaults to ``corpus`` itself. Buckets are
    the same md5 hash family as
    :func:`~jgtextrank_spark.functions.search.feature_hash_vectors`
    (unsigned counts — DSIR models bags, not signed sketches), so the
    whole computation is md5 + log/count algebra: map-side-combinable
    count tables, one broadcastable bucket-distribution join, one
    per-doc rollup. Returns ``(doc_id, n_feats, log_weight,
    avg_log_ratio)`` — ``log_weight`` is the raw DSIR statistic
    (length-correlated), ``avg_log_ratio`` the per-feature mean (length-
    normalized), both rounded for engine-stable ranking."""
    if raw is None:
        raw = corpus

    def grams(df: DataFrame) -> DataFrame:
        toks = tokens_expr(text_col)
        pairs = F.filter(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            lambda g: g.contains(" "),
        )
        return df.select(
            "doc_id", F.explode(F.concat(toks, pairs)).alias("gram")
        ).select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("gram")), 1, 6), 16, 10)
            .cast("long")
            .__mod__(n_buckets)
            .alias("b"),
        )

    def dist(df: DataFrame, name: str) -> DataFrame:
        counts = grams(df).groupBy("b").agg(
            F.count(F.lit(1)).alias("c")
        )
        total = counts.agg(F.sum("c").alias("n")).collect()[0]["n"] or 0
        return counts.select(
            "b",
            F.log(
                (F.col("c") + F.lit(1.0))
                / F.lit(float(total + n_buckets))
            ).alias(f"logp_{name}"),
        ), float(total)

    tgt, n_tgt = dist(target, "tgt")
    rawd, n_raw = dist(raw, "raw")
    # unseen-bucket log-probs are constants (add-one floor)
    import math

    floor_tgt = math.log(1.0 / (n_tgt + n_buckets))
    floor_raw = math.log(1.0 / (n_raw + n_buckets))
    ratio = (
        tgt.join(rawd, "b", "outer")
        .select(
            "b",
            (
                F.coalesce("logp_tgt", F.lit(floor_tgt))
                - F.coalesce("logp_raw", F.lit(floor_raw))
            ).alias("log_ratio"),
        )
    )
    per_doc = (
        grams(corpus)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(ratio), "b", "left")
        .select(
            "doc_id",
            "c",
            (
                F.col("c")
                * F.coalesce(
                    "log_ratio", F.lit(floor_tgt - floor_raw)
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum("contrib").alias("lw"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.round(F.coalesce("lw", F.lit(0.0)), round_to).alias(
                "log_weight"
            ),
            F.round(
                F.when(
                    F.coalesce("n_feats", F.lit(0)) > 0,
                    F.col("lw") / F.col("n_feats"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("avg_log_ratio"),
        )
    )
