"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes baked into each: the exact path is one hash-groupBy; the
near-dup paths never materialize the O(n^2) pair space — candidates come
from LSH band buckets (MinHash), hamming buckets (SimHash) or sign-pattern
buckets (embeddings), with an exact verify join afterwards. All hashing is
md5-based so the DuckDB oracle can replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import fingerprint, tokens_expr

__all__ = [
    "exact_duplicates",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "exact_jaccard_for_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "embedding_near_dup_pairs",
]


def exact_jaccard_for_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard for an explicit candidate-pair table:
    ``(doc_a, doc_b)`` -> ``(doc_a, doc_b, jaccard)``. The verify stage
    shared by the batch LSH path and the streaming candidate stream
    (foreachBatch) — linear in the candidate count, never all-pairs."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    sh = shingles(d, "text", n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.select("doc_a", "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce("inter", F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs:
    (fp, canonical_doc, n_dups). Canonical = min doc_id. One shuffle."""
    fp = fingerprint(df, text_col)
    return (
        fp.groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle): distinct word n-gram shingles per doc, built with
    array higher-order functions (no Python)."""
    toks = tokens_expr(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs:
    (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold.

    Inverted-index self-join on shingles; ``max_shingle_freq`` drops
    degenerate shingles shared by huge numbers of docs (boilerplate) — the
    standard web-scale guard against quadratic hot keys. The cap is an
    explicit, tunable parameter (set it above your corpus size to disable);
    pairs whose ONLY shared shingles are boilerplate are not reported.
    """
    sh = shingles(df, text_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq_ok = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") <= max_shingle_freq)
        .select("shingle")
    )
    sh_f = sh.join(freq_ok, "shingle", "left_semi")
    a = sh_f.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_f.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def _minhash_col(band: int, row: int) -> Column:
    """One MinHash value: min over shingles of md5(salt || shingle). String
    min over hex digests is a valid uniform min-hash family and replays
    identically in any engine with md5."""
    salt = f"{band}:{row}:"
    return F.min(F.md5(F.concat(F.lit(salt), F.col("shingle"))))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    verify_threshold: float | None = 0.7,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs:
    (doc_a, doc_b[, jaccard]) with doc_a < doc_b.

    Signature = bands x rows_per_band min-hashes; docs sharing any full band
    key become candidates (collision prob ~ 1-(1-s^r)^b). With
    ``verify_threshold`` set, candidates are verified with exact Jaccard
    and filtered — the standard candidate->verify split that keeps the
    join linear in bucket sizes at 100 TB.
    """
    sh = shingles(df, text_col, n).persist()
    mins = sh.groupBy("doc_id").agg(
        *[
            _minhash_col(b, r).alias(f"mh_{b}_{r}")
            for b in range(bands)
            for r in range(rows_per_band)
        ]
    )
    band_rows = None
    for b in range(bands):
        key = F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh_{b}_{r}") for r in range(rows_per_band)]
            )
        )
        one = mins.select(
            "doc_id", F.lit(b).alias("band"), key.alias("bucket")
        )
        band_rows = one if band_rows is None else band_rows.unionByName(one)

    a = band_rows.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
    b_ = band_rows.select(
        F.col("doc_id").alias("doc_b"), "band", "bucket"
    )
    cands = (
        a.join(b_, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if verify_threshold is None:
        return cands
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )


_SIMHASH_BITS = 48  # 12 hex chars of md5 -> fits comfortably in a long


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 48-bit SimHash over whitespace tokens weighted by
    in-doc frequency. Token hash = first 12 hex chars of md5(token); all
    bit algebra is JVM-side (conv/shiftright), no Python."""
    toks = df.select("doc_id", F.explode(tokens_expr(text_col)).alias("tok"))
    weighted = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("w")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long")
    weighted = weighted.withColumn("h", h)
    bit_sums = weighted.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                    F.col("w"),
                ).otherwise(-F.col("w"))
            ).alias(f"b{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    sig = None
    for j in range(_SIMHASH_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return bit_sums.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    block_bits: int = 12,
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within ``max_hamming`` bit flips.

    Candidate generation by block permutation: split the 48-bit signature
    into 4 blocks of ``block_bits``; any pair within hamming distance 3
    shares at least one exact block (pigeonhole) -> join per block, then
    verify exact hamming with bit_count.
    """
    sigs = simhash(df, text_col).persist()
    n_blocks = _SIMHASH_BITS // block_bits
    blocks = None
    for i in range(n_blocks):
        one = sigs.select(
            "doc_id",
            "simhash",
            F.lit(i).alias("blk"),
            F.shiftright(F.col("simhash"), i * block_bits)
            .bitwiseAND(F.lit(2**block_bits - 1))
            .alias("key"),
        )
        blocks = one if blocks is None else blocks.unionByName(one)
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "blk", "key",
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "blk", "key",
    )
    cands = (
        a.join(b, ["blk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).alias("hamming")
    return cands.select("doc_a", "doc_b", hamming).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_dims: int = 0,
) -> DataFrame:
    """(id_a, id_b, cosine): embedding near-duplicates above a cosine
    threshold. ``bucket_dims=0`` = exact brute force (quadratic — small
    inputs / verification); ``bucket_dims=k`` buckets by the sign pattern
    of the first k dimensions first (near-identical vectors almost surely
    share it), making the join linear in bucket sizes at scale."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(
        F.col(id_col).alias("id"),
        v.alias("vec"),
        F.sqrt(
            F.aggregate(
                v, F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("nrm"),
    )
    if bucket_dims > 0:
        sign_key = F.concat_ws(
            "",
            *[
                F.when(F.element_at("vec", i + 1) >= 0, "1").otherwise("0")
                for i in range(bucket_dims)
            ],
        )
        base = base.withColumn("bkt", sign_key)
        join_cond = ["bkt"]
    else:
        base = base.withColumn("bkt", F.lit(0))
        join_cond = ["bkt"]
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "bkt",
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "bkt",
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, join_cond)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
