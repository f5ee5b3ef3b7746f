"""Word tokenizers (reference T2/T3, vnlp/tokenizer/tokenizer.py).

``WordPunct`` is a single findall — expressible natively via
``regexp_extract_all`` (JVM-side, codegen).  ``Treebank`` is a 16-step
sequential ``re.sub`` chain whose Python-regex semantics are the parity
contract for every downstream annotator (it is the canonical tokenizer of
the reference's stemmer/NER/PoS/DP), so it runs as an Arrow-vectorized
pandas UDF over whole columns with the regexes precompiled once per
interpreter.
"""
from __future__ import annotations

import re
from typing import List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# T2 ---------------------------------------------------------------------
_WORDPUNCT_RE = re.compile(r"\w+|[^\w\s]+", re.UNICODE | re.MULTILINE | re.DOTALL)


def py_word_punct_tokenize(text: str) -> List[str]:
    return _WORDPUNCT_RE.findall(text)


def word_punct_tokenize(col: Column | str) -> Column:
    """Native regexp_extract_all — matches Python ``\\w+|[^\\w\\s]+`` for
    unicode text (Java regex is unicode-category aware for \\w with the
    UNICODE_CHARACTER_CLASS flag, embedded below as ``(?U)``).  Built from
    the function API with a Column literal pattern — no expr()-string
    composition, so it survives arbitrary input Columns and Spark Connect."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"(?U)\w+|[^\w\s]+"), 0)


# T3 ---------------------------------------------------------------------
# Simplified NLTK Treebank rules, same order as the reference
# (tokenizer.py:19-78); rule list is the public NLTK rule set.
_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]
_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]
_PARENS = (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> ")
_DASHES = (re.compile(r"--"), r" -- ")
_ENDING_QUOTES = [
    (re.compile(r"''"), " '' "),
    (re.compile(r'"'), " '' "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]


def py_treebank_tokenize(text: str) -> List[str]:
    for rx, sub in _STARTING_QUOTES:
        text = rx.sub(sub, text)
    for rx, sub in _PUNCTUATION:
        text = rx.sub(sub, text)
    text = _PARENS[0].sub(_PARENS[1], text)
    text = _DASHES[0].sub(_DASHES[1], text)
    text = " " + text + " "
    for rx, sub in _ENDING_QUOTES:
        text = rx.sub(sub, text)
    return text.replace("``", '"').replace("''", '"').split()


@F.pandas_udf(ArrayType(StringType()))
def _treebank_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_treebank_tokenize(t) if t is not None else None)


def treebank_tokenize(col: Column | str) -> Column:
    return _treebank_udf(F.col(col) if isinstance(col, str) else col)


@F.pandas_udf(ArrayType(StringType()))
def _wordpunct_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_word_punct_tokenize(t) if t is not None else None)


def word_punct_tokenize_udf(col: Column | str) -> Column:
    """Pandas-UDF variant guaranteeing exact Python-regex semantics."""
    return _wordpunct_udf(F.col(col) if isinstance(col, str) else col)
