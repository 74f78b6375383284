"""String-cleanup helper parity vs the reference preprocessing module."""

from __future__ import annotations

import pytest

from jgtextrank_spark.extract import (
    get_wordnet_pos,
    lemmatize,
    punctuation_filter_for_list,
    remove_digits,
    remove_punctuations,
    stem,
    strip_punc,
)


def test_parity_with_reference(reference):
    from jgtextrank.preprocessing.normaliser import (
        remove_digits as ref_digits,
    )
    from jgtextrank.preprocessing.normaliser import (
        remove_punctuations as ref_punct,
    )
    from jgtextrank.preprocessing.normaliser import (
        get_wordnet_pos as ref_wnpos,
    )
    from jgtextrank.preprocessing.segmentation import strip_punc as ref_strip

    samples = [
        "hello, world!!", "a-b-c", "...", "x2y3", "no1 2no", "  spaced  ",
        "plain",
    ]
    for s in samples:
        assert remove_punctuations(s) == ref_punct(s), s
        assert remove_digits(s) == ref_digits(s), s
        assert strip_punc(s) == ref_strip(s), s
        assert strip_punc(s, all_=True) == ref_strip(s, all=True), s
    for tag in ["JJ", "VBZ", "NN", "RB", "DT", "", "nns"]:
        assert get_wordnet_pos(tag) == ref_wnpos(tag), tag


def test_punct_filters_exact(reference):
    from jgtextrank.preprocessing.normaliser import (
        punctuation_filter_for_list as ref_list,
    )
    from jgtextrank.preprocessing.normaliser import (
        punctuation_filter_for_word_level as ref_word,
    )
    from jgtextrank_spark.extract import punctuation_filter_for_word_level

    toks = ["good", "...", "semi;colon", "a,b", ",", "'lysis", "genes'",
            "monocytes/macrophag"]
    assert punctuation_filter_for_list(toks) == ref_list(toks)
    assert punctuation_filter_for_word_level(toks) == list(ref_word(toks))


def test_gated_nltk_ops_raise_cleanly():
    with pytest.raises(NotImplementedError, match="NLTK"):
        lemmatize("running", pos="v")
    with pytest.raises(NotImplementedError, match="NLTK"):
        stem("running")
    assert lemmatize("anything", pos="  ") == "anything"  # empty-pos skip
