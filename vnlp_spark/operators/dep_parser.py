"""Dependency parsing -> (idx, token, head, deprel) quadruples.

Reference surface: ``DependencyParser.predict(sentence)`` returns 1-based
(index, token, head, deprel) with head 0 = root and UD deprels
(vnlp/dependency_parser/dependency_parser.py:32-81, decode at
dependency_parser/utils.py:51-64); sentences longer than 40 tokens are
refused (spu_context_dp.py:159-162).

The reference's GRU weights are S3-hosted and unavailable offline, so this
is a deterministic head-final heuristic parser with the same output
contract (swap point: any ``(tokens, upos, analyses) -> arcs`` callable).
Attachment rules for Turkish SOV order:

- root = last verb of the sentence (else last non-punct token)
- other verbs attach to the root: ``parataxis`` when a comma separates
  them from it, else ``advcl``
- nouns/pronouns attach to the next verb (else root) with a case-driven
  relation: Acc->obj, Dat/Loc/Abl->obl, Ins->obl, Nom directly before the
  verb->nsubj, Gen->nmod to the next nominal
- a genitive or bare nominal immediately before another nominal -> nmod
- adjectives -> amod to the next nominal; determiners -> det; adverbs ->
  advmod to the next verb; adpositions -> case to the previous nominal
- punctuation -> punct, attached to the nearest preceding verb (else root)

The 40-token refusal is reproduced as ``arcs = null`` (callers route long
sentences to chunking upstream and the lineage layer counts refusals).

Spark mapping: pandas UDF per sentence returning
array<struct<idx:int, token:string, head:int, deprel:string>>.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .morphology import py_analyze_tokens
from .pos import upos_from_analysis

MAX_TOKENS = 40  # reference hard cap (spu_context_dp.py:159-162)

_NOMINAL = {"NOUN", "PROPN", "PRON", "NUM"}


def _case_of(analysis: str) -> str:
    tags = set(analysis.split("+"))
    for case in ("Acc", "Dat", "Loc", "Abl", "Gen", "Ins", "Nom"):
        if case in tags:
            return case
    return ""


def py_parse_tokens(
    tokens: List[str],
    upos: Optional[List[str]] = None,
    analyses: Optional[List[str]] = None,
) -> Optional[List[Tuple[int, str, int, str]]]:
    n = len(tokens)
    if n == 0:
        return []
    if n > MAX_TOKENS:
        return None  # reference refuses; pipeline chunks upstream
    if analyses is None:
        analyses = py_analyze_tokens(tokens)
    if upos is None:
        upos = [upos_from_analysis(a) for a in analyses]

    verbs = [i for i, u in enumerate(upos) if u == "VERB"]
    non_punct = [i for i, u in enumerate(upos) if u != "PUNCT"]
    root = verbs[-1] if verbs else (non_punct[-1] if non_punct else n - 1)

    def next_verb(i: int) -> int:
        for v in verbs:
            if v > i:
                return v
        return root

    def next_nominal(i: int) -> int:
        for j in range(i + 1, n):
            if upos[j] in _NOMINAL:
                return j
        return next_verb(i)

    def prev_verb(i: int) -> int:
        cands = [v for v in verbs if v < i]
        return cands[-1] if cands else root

    heads = [0] * n
    rels = [""] * n
    for i in range(n):
        u = upos[i]
        if i == root:
            heads[i], rels[i] = 0, "root"
        elif u == "PUNCT":
            heads[i], rels[i] = prev_verb(i) + 1, "punct"
        elif u == "VERB":
            between = tokens[i + 1: root]
            sep = any(t == "," for t in between)
            heads[i], rels[i] = root + 1, ("parataxis" if sep else "advcl")
        elif u == "DET":
            heads[i], rels[i] = next_nominal(i) + 1, "det"
        elif u == "ADJ":
            heads[i], rels[i] = next_nominal(i) + 1, "amod"
        elif u == "ADV":
            heads[i], rels[i] = next_verb(i) + 1, "advmod"
        elif u == "ADP":
            # postposition: case-marks the *previous* nominal
            prev_nom = next((j for j in range(i - 1, -1, -1) if upos[j] in _NOMINAL), root)
            heads[i], rels[i] = prev_nom + 1, "case"
        elif u in _NOMINAL:
            case = _case_of(analyses[i])
            nv = next_verb(i)
            if case == "Gen":
                if i + 1 < n and upos[i + 1] == "ADP":
                    # postpositional phrase (Onun için) -> oblique of the verb
                    heads[i], rels[i] = nv + 1, "obl"
                else:
                    heads[i], rels[i] = next_nominal(i) + 1, "nmod"
            elif case == "Acc":
                heads[i], rels[i] = nv + 1, "obj"
            elif case in ("Dat", "Loc", "Abl", "Ins"):
                heads[i], rels[i] = nv + 1, "obl"
            else:  # Nom / unmarked
                nxt = i + 1
                if u in ("PROPN", "PRON"):
                    # proper nouns / pronouns in the nominative are subjects
                    heads[i], rels[i] = nv + 1, "nsubj"
                elif nxt < n and upos[nxt] in _NOMINAL and nxt != nv:
                    heads[i], rels[i] = nxt + 1, "nmod"
                elif nxt == nv or (nxt < n and upos[nxt] == "VERB"):
                    # unmarked common noun right before the verb: indefinite
                    # object incorporation (tatil yaptı, kitap okudu)
                    heads[i], rels[i] = nv + 1, "obj"
                else:
                    heads[i], rels[i] = nv + 1, "obl"
        else:
            heads[i], rels[i] = root + 1, "dep"

    return [(i + 1, tokens[i], heads[i], rels[i]) for i in range(n)]


def py_parse_sentence(sentence: str):
    from ..functions.tokenizer import py_treebank_tokenize

    return py_parse_tokens(py_treebank_tokenize(sentence))


ARC_SCHEMA = ArrayType(
    StructType(
        [
            StructField("idx", IntegerType()),
            StructField("token", StringType()),
            StructField("head", IntegerType()),
            StructField("deprel", StringType()),
        ]
    )
)


@F.pandas_udf(ARC_SCHEMA)
def _parse_udf(token_arrays: pd.Series, analyses_arrays: pd.Series) -> pd.Series:
    # per-batch memo on the token sequence: web corpora repeat sentences
    # (boilerplate), and the struct-array output is the expensive part
    cache: dict = {}

    def one(row):
        ts, an = row
        if ts is None:
            return None
        key = tuple(ts)
        hit = cache.get(key)
        if hit is None:
            an = list(an) if an is not None else None
            hit = py_parse_tokens(list(ts), analyses=an)
            cache[key] = hit
        return hit

    return pd.Series(map(one, zip(token_arrays, analyses_arrays)))


def dependency_parse(tokens_col: Column | str, analyses_col: Column | str) -> Column:
    """(tokens array, analyses array) -> arcs array<struct>.  Passing the
    analyses column avoids re-running morphology (treestack-style chaining,
    reference treestack_dp.py:163-171)."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    a = F.col(analyses_col) if isinstance(analyses_col, str) else analyses_col
    return _parse_udf(t, a)
