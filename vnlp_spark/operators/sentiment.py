"""Sentiment analysis: text -> P(positive).

Reference surface: ``SentimentAnalyzer.predict_proba(text)`` -> float and
``predict`` -> 0/1 at a 0.5 threshold (vnlp/sentiment_analyzer/
sentiment_analyzer.py:26-76; BiGRU impl spu_context_bigru_sentiment.py:
118-164, with recursive halving of >256-piece inputs).

Two scorers share the Spark surface:

- ``sentiment_lexicon``: deterministic polarity lexicon over Turkish
  sentiment-bearing stems with negation flipping (değil / -ma- / -me-),
  squashed through a sigmoid.  Interpretable and offline-reproducible.
- ``make_sentiment_model_udf``: the GRU model harness
  (operators/model_harness.py) with broadcast weights — the exact
  executor shape of the reference model; carries surrogate weights until
  the S3-hosted trained arrays are supplied.
"""
from __future__ import annotations

import math
import re
from typing import List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .morphology import to_lower

_POSITIVE = {
    "güzel", "iyi", "harika", "mükemmel", "muhteşem", "başarılı", "mutlu",
    "sevin", "beğen", "teşekkür", "memnun", "keyif", "lezzetli", "tatlı",
    "sev", "dost", "kolay", "hızlı", "taze", "temiz", "rahat", "huzur",
    "doyur", "şahane", "enfes", "özenli", "candan", "sıcak", "kazan",
}
_NEGATIVE = {
    "kötü", "berbat", "rezalet", "korkunç", "çirkin", "yavaş", "kirli",
    "soğuk", "pahalı", "bozuk", "eksik", "geç", "sorun", "problem", "şikayet",
    "üzgün", "üzül", "kız", "sinir", "nefret", "iğrenç", "zor", "kayıp",
    "kaybet", "yanlış", "hata", "pişman", "mutsuz", "vasat", "felaket",
}
_NEGATORS = {"değil", "değilim", "yok", "asla", "hiç"}
_NEG_SUFFIX_RE = re.compile(r"(ma|me|maz|mez|mıyor|miyor|muyor|müyor)(dı|di|du|dü|m|n|k|z|sın|sin|ler|lar)?$")
_TOKEN_RE = re.compile(r"[a-zçğıöşü]+", re.UNICODE)


def py_sentiment_proba(text: str) -> float:
    """Lexicon score -> sigmoid( (pos - neg) ) with negation flip."""
    if not text:
        return 0.5
    toks = _TOKEN_RE.findall(to_lower(text))
    score = 0.0
    for i, tok in enumerate(toks):
        polarity = 0
        if any(tok.startswith(s) for s in _POSITIVE):
            polarity = 1
        elif any(tok.startswith(s) for s in _NEGATIVE):
            polarity = -1
        if polarity:
            # morphological negation on the token itself (sev-me-dim)
            stemless = tok
            if _NEG_SUFFIX_RE.search(stemless):
                polarity = -polarity
            # lexical negator right after (güzel değil)
            if i + 1 < len(toks) and toks[i + 1] in _NEGATORS:
                polarity = -polarity
            score += polarity
    return 1.0 / (1.0 + math.exp(-1.5 * score))


def py_sentiment(text: str) -> int:
    return int(py_sentiment_proba(text) >= 0.5)


@F.pandas_udf(DoubleType())
def _sentiment_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_sentiment_proba(t) if t is not None else None)


def sentiment_proba(col: Column | str) -> Column:
    return _sentiment_udf(F.col(col) if isinstance(col, str) else col)


def sentiment_label(col: Column | str) -> Column:
    return (sentiment_proba(col) >= 0.5).cast("int")


def make_sentiment_model_udf(spark, seed: int = 7):
    """GRU-harness scorer over token arrays (broadcast surrogate weights);
    returns a Column function usable as ``udf(tokens_col)``."""
    from .model_harness import GRUModel, make_sequence_scorer_udf

    model = GRUModel.surrogate(vocab=32768, dim=32, hidden=64, out=1, seed=seed)
    bc = spark.sparkContext.broadcast(model.arrays())
    return make_sequence_scorer_udf(bc)
