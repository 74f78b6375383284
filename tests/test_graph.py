"""Co-occurrence edge builder parity vs the REAL reference
(`build_cooccurrence_graph`, /root/reference/jgtextrank/core.py:469-520)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jgtextrank_spark.corpus import sentences_from_tagged
from jgtextrank_spark.graph import (
    cooccurrence_edges,
    vertices_from_sentences,
)

# Hand-tagged multi-sentence corpus exercising: repeated tokens (self-loop
# windows), filtered neighbours between keywords, multi-doc contexts.
TAGGED_CORPUS = [
    [
        ("Compatibility", "NN"), ("of", "IN"), ("systems", "NNS"),
        ("of", "IN"), ("linear", "JJ"), ("constraints", "NNS"),
        ("over", "IN"), ("the", "DT"), ("set", "NN"), ("of", "IN"),
        ("natural", "JJ"), ("numbers", "NNS"), (".", "."),
    ],
    [
        ("Criteria", "NNS"), ("of", "IN"), ("compatibility", "NN"),
        ("of", "IN"), ("a", "DT"), ("system", "NN"), ("of", "IN"),
        ("linear", "JJ"), ("Diophantine", "JJ"), ("equations", "NNS"),
        (",", ","), ("strict", "JJ"), ("inequations", "NNS"), (",", ","),
        ("and", "CC"), ("nonstrict", "JJ"), ("inequations", "NNS"),
        ("are", "VBP"), ("considered", "VBN"), (".", "."),
    ],
    [
        ("again", "RB"), ("again", "RB"), ("systems", "NNS"),
        ("systems", "NNS"), ("upper", "JJ"), ("bounds", "NNS"),
    ],
]


def _reference_edges(reference, window, conn_with_original_ctx):
    """Run the reference pipeline up to the graph and return its undirected
    edge set + node set."""
    from jgtextrank.core import (
        _load_preprocessed_corpus_context,
        build_cooccurrence_graph,
    )

    pre = _load_preprocessed_corpus_context(TAGGED_CORPUS, lemma=False)
    graph, original_ctx = build_cooccurrence_graph(
        pre,
        directed=False,
        weighted=False,
        conn_with_original_ctx=conn_with_original_ctx,
        window=window,
    )
    edges = {tuple(sorted((u, v))) for u, v in graph.edges()}
    return edges, set(graph.nodes())


def _spark_sentences(spark):
    rows = [
        Row(url="doc1", sent_id=i, tagged=[
            Row(token=t, tag=g) for t, g in sent
        ])
        for i, sent in enumerate(TAGGED_CORPUS)
    ]
    df = spark.createDataFrame(rows)
    return sentences_from_tagged(df, normalized=False)


@pytest.mark.parametrize("window", [1, 2, 3, 4])
@pytest.mark.parametrize("conn_with_original_ctx", [True, False])
def test_edge_parity(spark, reference, window, conn_with_original_ctx):
    sentences = _spark_sentences(spark)
    edges_df = cooccurrence_edges(
        sentences, window=window, conn_with_original_ctx=conn_with_original_ctx
    )
    got_edges = {
        (r["src"], r["dst"]) for r in edges_df.collect()
    }
    got_vertices = {
        r["id"] for r in vertices_from_sentences(sentences).collect()
    }
    want_edges, want_vertices = _reference_edges(
        reference, window, conn_with_original_ctx
    )
    assert got_vertices == want_vertices
    assert got_edges == want_edges


def test_weighted_edges_count_events(spark):
    """weighted=True counts co-occurrence events per unordered pair."""
    rows = [
        Row(
            url="d",
            sent_id=0,
            tagged=[
                Row(token="a", tag="NN"),
                Row(token="b", tag="NN"),
                Row(token="a", tag="NN"),
            ],
        )
    ]
    sentences = sentences_from_tagged(spark.createDataFrame(rows), normalized=False)
    edges = cooccurrence_edges(sentences, window=1, weighted=True).collect()
    weights = {(r["src"], r["dst"]): r["weight"] for r in edges}
    # events: (a,b) at pos(0,1), (b,a) at pos(1,2) -> canonical (a,b) x2
    assert weights == {("a", "b"): 2.0}
