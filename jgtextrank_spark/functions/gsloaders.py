"""Gold-standard term-list loaders for the evaluation harness.

DataFrame re-expressions of the reference's GS loaders
(``/root/reference/resource/example_utility.py:62-221``): GENIA
``concept.txt`` lists, Hulth2003 ``.uncontr`` files, ScienceIE ``.ann``
files, and the ACL RD-TEC annotated-candidates CSV. Each loader returns a
one-column DataFrame ``term`` ready for
``functions.evalops.evaluate_results`` (the reference's
``evaluate_*_dataset`` flows, example_utility.py:320-405).

The shared cleanup pipeline mirrors ``load_gs_terms_from_list``
(example_utility.py:112-135) exactly:

1. drop any raw term containing a configured stop-marker *substring*;
2. strip, then apply the ordered literal replacement mapping;
3. dedupe surface forms;
4. if ``is_norm``: ``normalise_term`` = punctuation->space + whitespace
   collapse + lower + trim (example_utility.py:223-224, same semantics as
   ``extract.remove_punctuations``), dropping terms that normalise to ''.

Everything is JVM-side column algebra over ``spark.read.text``/``csv``
scans — at 100x these are embarrassingly parallel file scans; the gold
tables are tiny and are meant to be broadcast into the eval joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract import remove_punctuations_expr

__all__ = [
    "GENIA_GS_STOP_WORDS",
    "GENIA_ANNOTATION_MAPPING",
    "GENIA_SYNONYM_MAPPING",
    "clean_gs_terms",
    "load_gs_terms_from_lines",
    "load_genia_gs_terms",
    "load_hulth2003_gs_terms",
    "load_scienceie_gs_terms",
    "load_aclrdtec1_gs_terms",
]

# example_utility.py:75-77
GENIA_GS_STOP_WORDS = [
    "*", "(OR", "(NOT", "(TO", "(THAN", "(VERSUS", "(AND", "(BUT", "(AS",
    "(AND/OR", "Blood cell receptor",
]

# example_utility.py:79-88 (ordered: dict insertion order is applied order)
GENIA_ANNOTATION_MAPPING = {
    "responsivenessp": "responsiveness",
    "PU.1- /- mouse": "PU.1-/- mice",
    "activationp": "activation",
    "mammalian oncogenic virus": "mammalian oncogenic viruses",
    "endrometrium": "endometrium",
    "bonep": "bone",
    "yhiol": "Thiol",
    "IFN-gamma leve": "IFN-gamma level",
    "familiy": "family",
    "frequencie": "frequencies",
}

# synonym_normalisation_4_genia (example_utility.py:245-266), applied to
# the already-normalised terms; ordered
GENIA_SYNONYM_MAPPING = [
    ("mouse", "mice"),
    ("Mouse", "Mice"),
    ("analyses", "analysis"),
    ("Analyses", "Analysis"),
    ("women", "woman"),
    ("l cell resistance", "lymphoid cell resistance"),
    ("DS lymphocyte", "DS ones"),
    ("ds lymphocyte", "ds ones"),
]


def _apply_replacements(col, replacements) -> F.Column:
    for key, value in replacements:
        col = F.replace(col, F.lit(key), F.lit(value))
    return col


def clean_gs_terms(
    terms: DataFrame,
    stopwords: list[str] | None = None,
    replacements: dict[str, str] | list[tuple[str, str]] | None = None,
    is_norm: bool = True,
    term_col: str = "term",
) -> DataFrame:
    """``load_gs_terms_from_list`` (example_utility.py:112-135) as a
    DataFrame transform; returns distinct one-column ``term`` rows."""
    reps = (
        list(replacements.items())
        if isinstance(replacements, dict)
        else list(replacements or [])
    )
    out = terms.select(F.col(term_col).alias("term")).where(
        F.col("term").isNotNull()
    )
    for sw in stopwords or []:
        out = out.where(~F.contains(F.col("term"), F.lit(sw)))
    out = out.select(
        _apply_replacements(F.trim(F.col("term")), reps).alias("term")
    ).distinct()
    if is_norm:
        out = (
            out.select(
                F.lower(remove_punctuations_expr(F.col("term"))).alias("term")
            )
            .where(F.col("term") != "")
            .distinct()
        )
    return out


def load_gs_terms_from_lines(
    spark: SparkSession,
    path: str,
    stopwords: list[str] | None = None,
    replacements: dict[str, str] | None = None,
    is_norm: bool = True,
) -> DataFrame:
    """One term per non-empty line (the reference's WordListCorpusReader
    path, example_utility.py:95-109)."""
    lines = spark.read.text(path).select(F.col("value").alias("term")).where(
        F.trim("term") != ""
    )
    return clean_gs_terms(lines, stopwords, replacements, is_norm)


def load_genia_gs_terms(
    spark: SparkSession, fname: str, is_norm: bool = True
) -> DataFrame:
    """GENIA ``concept.txt`` loader (example_utility.py:62-92): stop-marker
    filter + annotation-fix mapping + normalise, then the GENIA synonym /
    inflection replacements + trailing-apostrophe strip on the normalised
    forms."""
    base = load_gs_terms_from_lines(
        spark, fname, GENIA_GS_STOP_WORDS, GENIA_ANNOTATION_MAPPING, is_norm
    )
    syn = F.rtrim(
        _apply_replacements(F.col("term"), GENIA_SYNONYM_MAPPING)
    )
    # rstrip("'") in the reference; after normalisation no quotes remain,
    # kept for the is_norm=False path
    syn = F.regexp_replace(syn, r"'+$", "")
    return base.select(syn.alias("term")).where(
        F.col("term") != ""
    ).distinct()


def load_hulth2003_gs_terms(
    spark: SparkSession, dataset_dir: str, file_suffix: str = ".uncontr"
) -> DataFrame:
    """Hulth2003 loader (example_utility.py:157-190): per ``.uncontr``
    file, split on ';', drop entries starting with a newline, strip, then
    the standard cleanup."""
    raw = (
        spark.read.text(f"{dataset_dir}/*{file_suffix}", wholetext=True)
        .select(F.explode(F.split("value", ";")).alias("term"))
        .where(~F.startswith(F.col("term"), F.lit("\n")))
        .select(F.trim("term").alias("term"))
        .where(F.col("term") != "")
    )
    return clean_gs_terms(raw)


def load_scienceie_gs_terms(
    spark: SparkSession, dataset_dir: str, file_suffix: str = ".ann"
) -> DataFrame:
    """ScienceIE / SemEval-2017 task 10 loader (example_utility.py:193-221):
    third tab-separated column of the ``.ann`` brat files."""
    raw = (
        spark.read.option("sep", "\t")
        .csv(f"{dataset_dir}/*{file_suffix}")
        .select(F.col("_c2").alias("term"))
        .where(F.col("term").isNotNull())
    )
    return clean_gs_terms(raw)


def load_aclrdtec1_gs_terms(
    spark: SparkSession, annotated_candidate_terms_file: str
) -> DataFrame:
    """ACL RD-TEC 1.0 loader (example_utility.py:167-175 + 577-589):
    tab-separated file with a header row; keep column 1 (term) where
    column 2 (annotation flag) != 0."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .csv(annotated_candidate_terms_file)
    )
    term_c, flag_c = df.columns[1], df.columns[2]
    raw = df.where(F.col(flag_c).cast("int") != 0).select(
        F.col(term_c).alias("term")
    )
    return clean_gs_terms(raw)
