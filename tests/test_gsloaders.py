"""GS term-list loader spec tests (reference example_utility.py:62-221
semantics on synthetic fixtures — the reference module itself imports
spacy and is unimportable here, so the expected sets encode its documented
behaviour line-by-line) + an end-to-end evaluate_results example."""

from __future__ import annotations

from pathlib import Path

from jgtextrank_spark.functions.evalops import evaluate_results
from jgtextrank_spark.functions.gsloaders import (
    load_aclrdtec1_gs_terms,
    load_genia_gs_terms,
    load_hulth2003_gs_terms,
    load_scienceie_gs_terms,
)

FIX = Path(__file__).parent / "fixtures" / "gs"


def _terms(df):
    return {r["term"] for r in df.collect()}


def test_genia_loader(spark):
    """Stop-marker substring drop, annotation-fix mapping before
    normalisation, punctuation->space normalisation, post-norm GENIA
    synonym replacements, dedupe."""
    got = _terms(load_genia_gs_terms(spark, str(FIX / "genia_concept.txt")))
    assert got == {
        "ifn gamma level",      # 'IFN-gamma leve' -> mapping -> norm
        "mice bone marrow",     # post-norm synonym mouse -> mice
        "t cell receptor",      # 'T-cell receptor!' and 't-cell receptor'
        "family members",       # 'familiy' -> 'family' mapping
        "analysis of variance", # post-norm synonym analyses -> analysis
    }


def test_hulth2003_loader(spark):
    """';'-split per file; entries *starting* with a newline are dropped
    before stripping (the reference's ignore_lines_startswith quirk)."""
    got = _terms(load_hulth2003_gs_terms(spark, str(FIX / "hulth")))
    assert got == {
        "linear constraints",
        "natural numbers",
        "strict inequations",
        "minimal supporting set",
    }


def test_scienceie_loader(spark):
    """Third TSV column of .ann files; rows without one (relations) drop."""
    got = _terms(load_scienceie_gs_terms(spark, str(FIX / "scienceie")))
    assert got == {"upper bounds", "minimal set"}


def test_aclrdtec1_loader(spark):
    """Header row honoured; only annotation flag != 0 rows kept."""
    got = _terms(load_aclrdtec1_gs_terms(spark, str(FIX / "aclrdtec.tsv")))
    assert got == {"linear constraint", "diophantine equation"}


def test_end_to_end_eval(spark):
    """The reference's evaluate_*_dataset flow: GS loader -> ranked
    predictions -> P/R/F1 at cutoffs (example_utility.py:320-405)."""
    gold = load_hulth2003_gs_terms(spark, str(FIX / "hulth"))  # 4 terms
    preds = spark.createDataFrame(
        [
            ("Linear Constraints", 0.9),   # hit (normalised)
            ("natural numbers", 0.8),      # hit
            ("upper bounds", 0.7),         # miss
            ("strict inequations", 0.6),   # hit, outside cutoff 2
        ],
        "term string, score double",
    )
    rows = {
        r["cutoff"]: r
        for r in evaluate_results(gold, preds, cutoffs=[2]).collect()
    }
    full = rows[-1]
    assert (full["precision"], full["recall"]) == (0.75, 0.75)
    at2 = rows[2]
    assert (at2["precision"], at2["recall"]) == (1.0, 0.5)
    assert at2["f1"] == round(2 * 1.0 * 0.5 / 1.5, 3)
