"""Byte-pair-encoding tokenizer training as a Spark job.

The canonical training-data-pipeline operator the engine lacked: induce
a subword merge table from a corpus (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"). The
reference has no analog (SURVEY §2.11 engine extension); the semantics
follow the original algorithm exactly:

* Words are whitespace tokens; each word becomes its character symbols
  plus a ``</w>`` end-of-word marker.
* Per round, count ADJACENT symbol pairs weighted by word frequency —
  overlapping occurrences all count (``get_stats`` semantics: ``xxx``
  contributes 2 to ``(x, x)``), ties break ``(count DESC, left ASC,
  right ASC)`` so training is deterministic.
* The winning pair merges GREEDY LEFT-TO-RIGHT, non-overlapping
  (``xxx`` with pair ``(x, x)`` becomes ``xx x``), in every word.

Scale shape — why this survives 100 TB: the only corpus-sized work is
the ONE initial word-frequency aggregation (map-side partial combine,
one shuffle). Every merge round then runs on the VOCABULARY-sized
``(word, freq, symbols)`` table — bounded by distinct words, not corpus
bytes — with one pair-count aggregation and one scalar argmax action
per round (the engine's one-action-per-superstep pattern). The merge
itself is a JVM-side ``aggregate()`` fold over the symbol array: no
Python in the loop, no UDF, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bpe_train", "bpe_apply", "word_symbol_table"]

END = "</w>"


def word_symbol_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq, syms) over whitespace tokens of ``text_col`` — the
    one corpus-scale aggregation; everything after is vocab-sized.
    ``syms`` is the word's characters plus the ``</w>`` marker."""
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"), lambda x: x != ""
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda x: x != ""),
            F.array(F.lit(END)),
        ).alias("syms"),
    )


def _adjacent_pairs(sym_tab: DataFrame) -> DataFrame:
    """(l, r, c): frequency-weighted adjacent-pair counts, overlapping
    occurrences included (get_stats semantics)."""
    return (
        sym_tab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("syms"), 1, F.size("syms") - F.lit(1)
                    ),
                    F.slice(F.col("syms"), 2, F.size("syms") - F.lit(1)),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("c"))
    )


def _merge_expr(arr, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) in the symbol array — a pure JVM aggregate() fold
    (state: emitted prefix + one pending symbol; a just-merged token is
    never immediately remerged, the classic single-pass semantics)."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("prev")),
            )
            .when(
                (acc["prev"] == lit_l) & (s == lit_r),
                F.struct(
                    F.concat(
                        acc["out"], F.array(F.concat(acc["prev"], s))
                    ).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    s.alias("prev"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(arr, init, step, fin)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    merges: int = 8,
) -> DataFrame:
    """Train ``merges`` BPE merge rules on the corpus; returns the merge
    table ``(rank, left, right, merged, freq)`` ordered by rank — the
    artifact a tokenizer consumes. ``freq`` is the pair's weighted count
    at selection time. Stops early when no pair remains (fully merged
    vocabulary). One scalar action per round on the vocab-sized table;
    per-round lineage truncated with localCheckpoint."""
    spark = docs.sparkSession
    sym_tab = word_symbol_table(docs, text_col).localCheckpoint(eager=True)
    rules = []
    for rank in range(1, merges + 1):
        top = (
            _adjacent_pairs(sym_tab)
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        rules.append((rank, l, r, l + r, int(c)))
        sym_tab = sym_tab.select(
            "word", "freq", _merge_expr(F.col("syms"), l, r).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string, freq bigint"
    )


def bpe_apply(
    docs: DataFrame,
    rules,
    text_col: str = "text",
) -> DataFrame:
    """Segment the corpus VOCABULARY with a trained merge table:
    (word, freq, tokens array<string>). ``rules`` is ``bpe_train``'s
    output DataFrame (collected — merge tables are tiny) or a rank-
    ordered list of (left, right) pairs. Each rule applies as ONE greedy
    left-to-right pass in rank order — exactly the training evolution,
    so applying a table to its own training corpus reproduces the
    final training symbol state (the gate's oracle identity). Scale
    shape: the fold chain runs on the vocab-sized table; segment the
    corpus itself by joining the result back on the word column."""
    if isinstance(rules, DataFrame):
        pairs = [
            (r["left"], r["right"]) for r in rules.orderBy("rank").collect()
        ]
    else:
        pairs = list(rules)
    col = F.col("syms")
    for l, r in pairs:
        col = _merge_expr(col, l, r)
    return word_symbol_table(docs, text_col).select(
        "word", "freq", col.alias("tokens")
    )
