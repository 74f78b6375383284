"""Extract-stage invariants: per-url byte-identical determinism between the
distributed pipeline and a single-process run, and normalize() parity with
the reference normaliser."""

from __future__ import annotations

import pytest

from jgtextrank_spark.corpus import build_sentences
from jgtextrank_spark.extract import (
    normalize_token,
    preprocess_text,
    rule_pos_tag,
    sent_tokenize,
    word_tokenize,
)

DOCS = [
    ("u1", "Compatibility of systems of linear constraints over the set "
           "of natural numbers. Criteria of compatibility are considered."),
    ("u2", "Zürich café naïve résumé — ñandú. Ångström units!"),
    ("u3", ""),
    ("u4", "again again again."),
    ("u5", "One two. THREE four? Five!   "),
]


def test_normalize_parity_with_reference(reference):
    from jgtextrank.preprocessing.normaliser import normalize

    samples = [
        "Systems", "Café", "naïve", "ÅNGSTRÖM", "a  b\tc", "ñandú",
        "ZÜRICH", "", "already lower", "Mixed-Case", "ﬁligree",  # U+FB01
        "éclair",  # combining acute
    ]
    for s in samples:
        assert normalize_token(s) == normalize(s, lemma=False), s


def test_distributed_equals_single_process(spark):
    pages = spark.createDataFrame(DOCS, "url string, text string")
    got = {}
    for r in build_sentences(pages).collect():
        got.setdefault(r["url"], []).append(
            (r["sent_id"], list(r["tokens"]),
             [(t["token"], t["tag"]) for t in r["filtered"]])
        )
    for url, text in DOCS:
        want = preprocess_text(text)
        rows = sorted(got.get(url, []))
        assert len(rows) == len(want), url
        for (sid, tokens, filtered), (w_tokens, w_filtered) in zip(
            rows, want
        ):
            assert tokens == w_tokens, (url, sid)
            assert filtered == w_filtered, (url, sid)


def test_tokenizer_determinism():
    text = DOCS[0][1]
    a = [word_tokenize(s.lower()) for s in sent_tokenize(text)]
    b = [word_tokenize(s.lower()) for s in sent_tokenize(text)]
    assert a == b
    assert rule_pos_tag(a[0]) == rule_pos_tag(b[0])


def test_punct_substring_quirk():
    from jgtextrank_spark.extract import token_passes_filters

    # '' and '<=' are substrings of string.punctuation -> filtered;
    # '!!' is not a substring -> kept (reference semantics)
    assert not token_passes_filters("", "NN")
    assert not token_passes_filters("<=", "NN")
    assert token_passes_filters("!!", "NN")
    assert not token_passes_filters("word", "VB")  # wrong tag
    assert token_passes_filters("word", "NN")
