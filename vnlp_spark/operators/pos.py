"""Part-of-speech tagging (UD UPOS tags).

Reference surface: ``PoSTagger.predict(sentence)`` -> [(token, upos)]
(vnlp/part_of_speech_tagger/part_of_speech_tagger.py:36-62).  The
reference's TreeStack variant derives PoS from the stemmer's morphological
tags (treestack_pos.py) — exactly the architecture used here: run the
morphological disambiguator, then map the analysis's final PoS tag to UD
UPOS.  This replaces the unavailable S3-hosted GRU with a deterministic
two-stage pipeline (morphology -> tag map) and keeps the same Spark shape:
one pandas-UDF row per tokenized sentence.

The morph->UPOS mapping follows the reference tagsets (morph tags per
_yildiz_analyzer.py TAG_FLAG_MAP; UPOS per the PoS model's label set).
"""
from __future__ import annotations

from typing import List, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .morphology import py_analyze_tokens

_MORPH_TO_UPOS = {
    "Noun": "NOUN",
    "Adj": "ADJ",
    "Adverb": "ADV",
    "Verb": "VERB",
    "Pron": "PRON",
    "Det": "DET",
    "Conj": "CCONJ",
    "Postp": "ADP",
    "Ques": "AUX",
    "Interj": "INTJ",
    "Num": "NUM",
    "Punc": "PUNCT",
    "Dup": "X",
    "Unknown": "NOUN",  # unanalyzable content words are usually nominals
}


def upos_from_analysis(analysis: str) -> str:
    """Morph analysis string -> UD UPOS.  The PoS is the first tag of the
    LAST derivation group (after the final ^DB), with Prop -> PROPN
    (reference get_pos_from_analysis, _yildiz_analyzer.py:531-535)."""
    tags_str = analysis.split("+", 1)[1] if "+" in analysis else analysis
    if "^" in tags_str:
        tags_str = tags_str[tags_str.rfind("^") + 4 :]  # skip '^DB+'
    tags = tags_str.split("+")
    if tags[0] == "Noun" and len(tags) > 1 and tags[1] == "Prop":
        return "PROPN"
    return _MORPH_TO_UPOS.get(tags[0], "X")


def py_pos_tags(tokens: List[str]) -> List[str]:
    return [upos_from_analysis(a) for a in py_analyze_tokens(tokens)]


def py_pos_pairs(tokens: List[str]) -> List[Tuple[str, str]]:
    return list(zip(tokens, py_pos_tags(tokens)))


@F.pandas_udf(ArrayType(StringType()))
def _pos_udf(token_arrays: pd.Series) -> pd.Series:
    return token_arrays.map(lambda ts: py_pos_tags(list(ts)) if ts is not None else None)


def pos_tags(col: Column | str) -> Column:
    """array<string> tokens -> array<string> UPOS tags."""
    return _pos_udf(F.col(col) if isinstance(col, str) else col)


def pos_from_analyses(col: Column | str) -> Column:
    """Derive UPOS **natively** from an already-materialized analyses
    column (array<string>) — no second Python pass when morphology ran
    upstream.  Same semantics as ``upos_from_analysis``, expressed with
    JVM string functions inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, _upos_sql)


def _upos_sql(a: Column) -> Column:
    tags = F.split(a, r"\+")
    after_db = F.element_at(F.split(a, "\\^DB\\+"), -1)
    first_tag = F.when(a.contains("^DB"), F.split(after_db, r"\+")[0]).otherwise(tags[1])
    second_tag = F.when(a.contains("^DB"), F.split(after_db, r"\+")[1]).otherwise(tags[2])
    mapping = F.create_map(*[F.lit(x) for kv in _MORPH_TO_UPOS.items() for x in kv])
    return F.when(
        (first_tag == "Noun") & (second_tag == "Prop"), F.lit("PROPN")
    ).otherwise(F.coalesce(mapping[first_tag], F.lit("X")))


def upos_label_names() -> List[str]:
    """The reference's REAL PoS label id order (PoS_label_tokenizer.json:
    NOUN=1, PUNCT=2, VERB=3, ...; 0 = Keras pad, decoded as X) — trained
    weights' output units line up with the harness's label ids."""
    from .. import resources

    return resources.label_list("pos_label", pad="X")


def pos_tags_gru(tokens_col: Column | str, spark) -> Column:
    """PoS via the AutoregressiveTagger model harness (SURVEY W2):
    broadcast weights, previous-label feedback per token — the executor
    shape of the reference's SPUContext PoS GRU (spu_context_pos.py:
    142-157).  Surrogate weights -> deterministic ids; swapping in trained
    arrays changes only the broadcast payload."""
    from .model_harness import AutoregressiveTagger, make_autoregressive_tagger_udf

    UPOS_LABEL_SET = upos_label_names()
    tagger = AutoregressiveTagger.surrogate(
        vocab=32768, dim=32, hidden=64, n_labels=len(UPOS_LABEL_SET), seed=13
    )
    bc = spark.sparkContext.broadcast(tagger.arrays())
    label_udf = make_autoregressive_tagger_udf(bc)
    names = F.array(*[F.lit(x) for x in UPOS_LABEL_SET])
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.transform(label_udf(c), lambda i: F.element_at(names, i + 1))
