"""Full-text retrieval operators: inverted index, TF-IDF vectors, BM25
top-k search.

The web-scale complement of the graph side: the reference ranks keywords
WITHIN documents (TextRank); a link-graph engine also needs to rank
documents FOR queries. Everything here is pure column algebra over the
postings table — no Python in the hot path — and deterministic, so every
operator has a DuckDB oracle in the correctness gate.

Scale notes:

* ``term_postings`` is one zero-shuffle token projection plus one
  partial-agg groupBy on ``(term, doc_id)`` — the classic map-side
  combinable index build. At 100 TB it is the same plan as a word-count.
* Corpus scalars (N, avgdl) ride a broadcast 1-row join, never a
  driver-side collect inside the plan.
* ``bm25_topk`` joins the (small) query-term table to the postings with
  the query side broadcast, aggregates per (query, doc), and ranks with
  a window PARTITIONED BY QUERY — no global window. Per-query result
  groups are top-k-bounded.
* Scoring uses the Lucene/Okapi BM25 form
  ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` with
  ``tf' = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``. Scores are
  rounded to 6 dp BEFORE ranking in both the Spark plan and the SQL
  oracle so the rank boundary is engine-stable; ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

__all__ = [
    "term_postings",
    "doc_frequency",
    "tfidf_vectors",
    "bm25_topk",
    "feature_hash_vectors",
]


def term_postings(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Inverted-index postings ``(term, doc_id, tf)`` over whitespace
    tokens. One explode + one map-side-combinable aggregation."""
    return (
        df.select("doc_id", F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def doc_frequency(postings: DataFrame) -> DataFrame:
    """``(term, df)`` — number of documents containing each term. Partial
    aggregation applies (postings are already distinct per (term, doc))."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )


def tfidf_vectors(
    df: DataFrame, text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Sparse TF-IDF entries ``(doc_id, term, tfidf)`` with the smoothed
    idf ``ln((1 + N)/(1 + df)) + 1`` (sklearn's formulation) and raw term
    frequency. The corpus size joins in as a broadcast 1-row cross join —
    no driver collect in the plan."""
    post = term_postings(df, text_col)
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    idf = (
        F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
        + F.lit(1.0)
    )
    return (
        post.join(doc_frequency(post), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * idf, round_to).alias("tfidf"),
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k retrieval: ``(query_id, doc_id, score, rank)`` with at
    most ``k`` docs per query, ranked by (rounded score desc, doc_id).

    ``queries`` has columns ``(query_id, text)``; duplicate terms within
    a query count once (standard short-query semantics — documented, and
    mirrored by the oracle). The query side is broadcast, so the postings
    join is map-side; the only exchanges are the index build and the
    per-(query, doc) score aggregation."""
    from pyspark.sql import Window

    post = term_postings(df, text_col)
    dfreq = doc_frequency(post)
    dl = df.select(
        "doc_id", F.size(tokens_expr(text_col)).cast("double").alias("dl")
    )
    scal = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(tokens_expr(text_col)).cast("double")).alias("avgdl"),
    )
    qterms = queries.select(
        "query_id", F.explode(tokens_expr(text_col)).alias("term")
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.join(qterms.select("term").distinct(), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def feature_hash_vectors(
    df: DataFrame,
    n_features: int = 4096,
    bigrams: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Signed hashing-trick featurizer (Weinberger et al. 2009; the
    scheme behind scikit-learn's HashingVectorizer / Vowpal Wabbit):
    sparse ``(doc_id, idx, value)`` rows where ``idx = h(gram) %
    n_features`` and each occurrence contributes ``+1`` or ``-1`` by an
    independent sign hash (keeps the hashed inner product unbiased under
    collisions). Grams are whitespace unigrams and, with ``bigrams``,
    adjacent pairs joined by a space.

    This is how corpus-scale quality/topic classifiers featurize at
    100 TB: a fixed-width vector space with NO vocabulary build — no
    global dictionary job, no OOV path, memory independent of corpus
    size. Plan: zero-shuffle gram explode + one partial-agg-friendly
    aggregation on ``(doc_id, idx)``; md5-derived hashes, so the gate
    oracle replays every bucket and sign bit-exactly. Zero-sum buckets
    (equal +/- collisions) are kept: dropping them would make the
    representation depend on collision order."""
    if n_features <= 0:
        raise ValueError("n_features must be positive")
    toks = tokens_expr(text_col)
    grams = toks
    if bigrams:
        pairs = F.filter(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            lambda g: g.contains(" "),
        )
        grams = F.concat(toks, pairs)
    g = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 6), 16, 10)
        .cast("long")
        .__mod__(n_features)
    )
    sign = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("sign:"), "gram")), 1, 1), 16, 10)
        .cast("int")
        < 8,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        g.select(F.col(id_col), bucket.alias("idx"), sign.alias("s"))
        .groupBy(id_col, "idx")
        .agg(F.sum("s").cast("long").alias("value"))
    )
