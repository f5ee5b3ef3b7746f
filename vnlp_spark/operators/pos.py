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

from functools import lru_cache
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
    if tags[0] == "Noun" and len(tags) > 1 and tags[1] == "Time":
        return "NUM"  # digit tokens analyzed Noun+Time (29, 2024)
    return _MORPH_TO_UPOS.get(tags[0], "X")


@lru_cache(maxsize=200_000)
def _readings(token: str) -> frozenset:
    """Coarse reading classes available for a token, from the candidate
    generator (cached; used for context disambiguation in the adjusted-POS
    layer and the parser — 'can this word be a bare adjective / a plain
    noun / both Acc and P3sg+Nom?')."""
    from .morphology import _engine

    gen, _dis = _engine()
    out = set()
    for _root, _suffix, tags in gen.get_analysis_candidates(token):
        if isinstance(tags, str):
            continue
        tset = set(tags)
        if tags[0] == "Adj" and len(tags) == 1:
            out.add("bare_adj")
        if tags[0] == "Noun" and "Prop" not in tset:
            if "Acc" in tset:
                out.add("acc")
            if "Nom" in tset and tset & {"P3sg", "P3pl"}:
                out.add("p3nom")
            if "Nom" in tset and "Pnon" in tset and "A3sg" in tset:
                out.add("bare_noun")
    return frozenset(out)


# existential predicates: var/yok (+ copular tense) are ADJ roots in the
# UD Turkish treebanks, not the homophonous verb imperatives
_EXISTENTIALS = {"var", "yok", "vardır", "yoktur"}
# past/evidential existentials (vardı, yokmuş) keep the finite-verb
# reading: the reference's published PoS output tags "vardı" VERB
# (part_of_speech_tagger.py:52-57)

# adjectives that also work adverbially directly before a verb
_ADVERBIAL_ADJS = {
    "yorgun", "olumsuz", "olumlu", "hızlı", "yavaş", "iyi", "kötü",
    "doğru", "kolay", "zor", "güzel", "sessiz", "rahat", "mutlu",
}


def adjust_upos(tokens: List[str], upos: List[str], analyses: List[str]) -> List[str]:
    """Context repairs on the morph-derived UPOS (gold tuning-split error
    clusters): temporal/degree adverbs read as nominals, case-marked
    participles as subordinate verbs, noun/adjective homographs resolved
    by the following token.  Shared by py_pos_tags and the parser."""
    from .dep_parser import _DEGREE_ADVS, _TEMPORAL_ADVS, _case_of
    from .morphology import to_lower

    n = len(tokens)
    out = list(upos)
    for i in range(n):
        low = to_lower(tokens[i])
        tags = set(analyses[i].replace("^", "+").split("+"))
        if low in _EXISTENTIALS:
            out[i] = "ADJ"
        elif (
            out[i] == "VERB"
            and "Zero" in tags
            and (lambda gs: gs[0].split("+")[1:2] == ["Adj"]
                 or (len(gs) >= 2 and gs[-2].split("+")[0] == "Adj"))(
                analyses[i].replace("^", "+").split("+DB+"))
            and analyses[i].split("+", 1)[0] not in ("var", "yok")
            and not tags & {"A1sg", "A2sg", "A1pl", "A2pl"}
        ):
            # zero-copula 3rd-person adjectival predicate keeps ADJ in UD
            # (soğuktu, kaplıydı, önemlidir); var/yok stay VERB per the
            # reference's published PoS output
            out[i] = "ADJ"
        elif low == "hiç":
            out[i] = "ADV"
        elif low in _TEMPORAL_ADVS and out[i] in ("NOUN", "ADJ", "ADP", "ADV"):
            # önce/sonra after an ablative or time NP stay postpositions
            if low in ("önce", "sonra") and i > 0 and (
                _case_of(analyses[i - 1]) == "Abl" or upos[i - 1] in ("NOUN", "NUM")
            ):
                out[i] = "ADP"
            else:
                out[i] = "ADV"
        elif low in _DEGREE_ADVS:
            nxt = out[i + 1] if i + 1 < n else ""
            if nxt in ("ADJ", "ADV", "VERB") or (
                i + 1 < n and to_lower(tokens[i + 1]) in _DEGREE_ADVS
            ):
                out[i] = "ADV"
        elif out[i] == "NOUN" and (
            "PastPart" in tags
            or (tags & {"FutPart", "Inf2"}
                and _case_of(analyses[i]) in ("Acc", "Dat", "Loc", "Abl"))
        ):
            # case-marked participles are subordinate verbs, not nominals
            # (yapacağını söyledi, anlattığı konu); bare FutPart nominals
            # stay nominal (gelecek hafta)
            out[i] = "VERB"
        elif (
            out[i] == "ADJ"
            and tags & {"With", "Without"}
            and not (i + 1 < n and out[i + 1] in ("ADJ", "DET", "NUM")
                     or (i + 1 < n and out[i + 1] in ("NOUN", "PROPN")
                         and _case_of(analyses[i + 1]) in ("Nom", "")))
            and not all(out[j] == "PUNCT" for j in range(i + 1, n))
            and not (i + 1 < n and out[i + 1] == "VERB"
                     and analyses[i + 1].split("+", 1)[0]
                     in ("ol", "et", "gel", "görün", "dur"))
        ):
            # -lH/-sHz adjective not modifying anything nominal is a
            # zero-derived noun (Mahalleli ... rahatsız oldu); but keep
            # the adjective reading in predicative position (yol ...
            # daha güvenli.) and before copular/psych verbs (mantıklı
            # geldi)
            out[i] = "NOUN"
        elif (
            out[i] == "NOUN"
            and "Pnon" in tags
            and "Nom" in tags
            and i + 1 < n
            and out[i + 1] in ("NOUN", "PROPN")
            and _case_of(analyses[i + 1]) in ("Nom", "")
            and not (i + 2 < n and out[i + 2] in ("NOUN", "PROPN"))
            and "bare_adj" in _readings(tokens[i])
        ):
            # noun/adjective homograph directly before a BARE nominal is
            # the adjective (taze balık); before a case-marked nominal
            # (Bakan projenin ... söyledi) or a longer nominal chain
            # (Karar kurul tarafından ...) the noun reading stands
            out[i] = "ADJ"
    for i in range(n - 1):
        if out[i] == "ADJ" and out[i + 1] == "VERB":
            nxt_root = analyses[i + 1].split("+", 1)[0]
            if nxt_root in ("ol", "et"):
                continue  # predicative complement: rahatsız oldu
            if nxt_root in ("gel", "görün", "dur") and i > 0 and (
                _case_of(analyses[i - 1]) == "Dat"
            ):
                continue  # psych-verb frame: bana mantıklı geldi
            low = to_lower(tokens[i])
            if "bare_noun" in _readings(tokens[i]) and low not in _ADVERBIAL_ADJS:
                # homograph directly before the verb is an argument
                # (taze balık getirdi -> balık NOUN)
                out[i] = "NOUN"
            else:
                # adjective used adverbially (yorgun döndüm)
                out[i] = "ADV"
    return out


def py_pos_tags(tokens: List[str]) -> List[str]:
    analyses = py_analyze_tokens(tokens)
    raw = [upos_from_analysis(a) for a in analyses]
    return adjust_upos(tokens, raw, analyses)


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
    ).when(
        (first_tag == "Noun") & (second_tag == "Time"), F.lit("NUM")
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
