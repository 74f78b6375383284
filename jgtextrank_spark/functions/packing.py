"""Sequence packing: laying documents into fixed-length training
context windows.

Training pipelines consume tokenized documents as fixed-size context
windows. The standard "concat-and-chunk" scheme (GPT-style) concatenates
every document's tokens in a deterministic order and slices the stream
into ``context_len``-token windows — zero padding waste, documents may
straddle a window boundary. The alternative "greedy whole-doc" scheme
keeps each (truncated) document intact per window and pads the
remainder.

Both run per SHARD: a global token stream would serialize the whole
corpus through one partition (a global-ordering window = Exchange
SinglePartition — the r1 anti-pattern). Sharding by a hash of the
document id keeps every window computation inside one hash partition
while staying deterministic, which is also how real pipelines write
packed shards (one output file per shard). Scale shape: one hash
exchange on ``shard``, then per-shard window cumsums — no join, no
global sort, JVM-side only.

* :func:`pack_concat_chunk` — exact SQL-replayable column algebra.
* :func:`pack_greedy` — per-shard first-fit (inherently sequential per
  shard; one Arrow ``applyInPandas`` group op, the same shape as
  ``scc_per_group``'s millions-of-small-graphs path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_expr

__all__ = ["pack_concat_chunk", "pack_greedy"]


def _shard_expr(id_col: str, n_shards: int):
    """Deterministic md5-derived shard id (24-bit prefix mod n_shards) —
    the engine's cross-engine-replayable hash convention (DuckDB has no
    crc32)."""
    return (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10
        )
        .cast("long")
        .__mod__(n_shards)
        .alias("shard")
    )


def pack_concat_chunk(
    docs: DataFrame,
    context_len: int,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan.

    Within each shard (md5-derived, see ``_shard_expr``), documents are laid
    end-to-end in ``doc_id`` order; the token stream is sliced into
    ``context_len``-token windows. Returns one row per document:

    ``(shard, doc_id, n_tokens, start_off, end_off, first_chunk,
    last_chunk)`` where offsets are token positions in the shard's
    stream (``end_off`` exclusive) and chunks are the window indices the
    document's tokens land in. Empty documents occupy no tokens and are
    assigned the chunk at their start offset.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    w = Window.partitionBy("shard").orderBy(id_col)
    toks = docs.select(
        _shard_expr(id_col, n_shards),
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        toks.withColumn("end_off", F.sum("n_tokens").over(w))
        .select(
            "shard",
            id_col,
            "n_tokens",
            (F.col("end_off") - F.col("n_tokens")).alias("start_off"),
            "end_off",
        )
        .select(
            "shard",
            id_col,
            "n_tokens",
            "start_off",
            "end_off",
            (F.col("start_off") / context_len).cast("long")
            .alias("first_chunk"),
            # last token of the doc sits at end_off-1; empty docs pin to
            # the start offset's chunk
            (
                F.greatest(F.col("end_off") - 1, F.col("start_off"))
                / context_len
            ).cast("long").alias("last_chunk"),
        )
    )


def pack_greedy(
    docs: DataFrame,
    context_len: int,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy whole-document packing: within each shard (in ``doc_id``
    order) a document goes into the current bin if it fits, else opens a
    new bin; documents longer than ``context_len`` are truncated to one
    full bin of their own. Returns ``(shard, doc_id, n_tokens, bin_id,
    bin_off, truncated)``.

    First-fit state (current bin fill) is inherently sequential per
    shard, so each shard packs in one Arrow ``applyInPandas`` group —
    deterministic, and parallel across shards."""
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    toks = docs.select(
        _shard_expr(id_col, n_shards),
        F.col(id_col).alias("doc_id"),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    )
    id_type = dict(toks.dtypes)["doc_id"]
    schema = (
        f"shard long, doc_id {id_type}, n_tokens long, bin_id long, "
        "bin_off long, truncated boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        out_bin, out_off, out_trunc = [], [], []
        started = False
        for n in pdf["n_tokens"]:
            take = min(int(n), context_len)
            if started and fill + take > context_len:
                bin_id += 1
                fill = 0
            out_bin.append(bin_id)
            out_off.append(fill)
            out_trunc.append(int(n) > context_len)
            fill += take
            started = True
        pdf["bin_id"] = out_bin
        pdf["bin_off"] = out_off
        pdf["truncated"] = out_trunc
        return pdf[
            ["shard", "doc_id", "n_tokens", "bin_id", "bin_off", "truncated"]
        ]

    return toks.groupBy("shard").applyInPandas(pack, schema)
