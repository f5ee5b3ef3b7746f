"""Triple precision/recall harness (the north-rule quality gate).

The reference pipeline's trained weights are S3-hosted and unavailable in
this environment, so the gold standard is **fixture-pinned**: for every
sentence in the synthetic corpus pool, the expected (subj, pred, obj)
triples are recorded here (hand-verified against the annotation rules and,
where the reference's own unit tests cover the sentence, against those
goldens — e.g. the FIXTURES.md §4.4 gold triples for the dependency-parse
sentence).  ``score_triples`` then measures P/R of any pipeline output
against the gold set — the same harness plugs in reference-generated gold
when the weights are available.
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# gold (pred, obj, subj) triples per pool sentence; None = argument absent.
# FIXTURES.md §4.4 pins the two reference-derived triples for the golden
# dependency sentence; the rest are hand-verified template expectations.
GOLD_TRIPLES = {
    "Onun için yol arkadaşlarımızı titizlikle seçer, kendilerini iyice sınarız.": [
        (None, "seçer", "arkadaşlarımızı"),
        (None, "sınarız", "kendilerini"),
    ],
    "Üniversite sınavlarına canla başla çalışıyorlardı.": [
        (None, "çalışıyorlardı", None),  # obl-only clause (sınavlarına)
    ],
    "Ahmet dün İstanbul'da yeni bir mağaza açtı.": [("Ahmet", "açtı", "mağaza")],
    "Mehmet geçen yıl Ankara'da üniversiteyi bitirdi.": [("Mehmet", "bitirdi", "üniversiteyi")],
    "Ayşe sabah Türkiye'nin en büyük köprüsünü gördü.": [("Ayşe", "gördü", "köprüsünü")],
    "Mustafa Galatasaray maçını arkadaşlarıyla izledi.": [("Mustafa", "izledi", "maçını")],
    "Ali TÜBİTAK projesini başarıyla tamamladı.": [("Ali", "tamamladı", "projesini")],
    "Hasan İzmir'de denize girdi.": [("Hasan", "girdi", None)],
    "Murat Türkiye İş Bankası'nda çalışıyor.": [("Murat", "çalışıyor", None)],
}


@dataclass
class PRResult:
    precision: float
    recall: float
    n_gold: int
    n_pred: int
    n_hit: int


def score_triples(triples: DataFrame, sentences: DataFrame) -> PRResult:
    """P/R of pipeline triples against the pinned gold, joined through the
    sentence text so every occurrence of a gold sentence is scored."""
    gold_rows = [
        (sent, subj, pred, obj)
        for sent, ts in GOLD_TRIPLES.items()
        for (subj, pred, obj) in ts
    ]
    spark = triples.sparkSession
    gold = spark.createDataFrame(gold_rows, ["sentence", "g_subj", "g_pred", "g_obj"])

    sent_keyed = sentences.select("url", "sent_id", "sentence")
    scored_sents = sent_keyed.join(F.broadcast(gold), "sentence", "inner")
    gold_inst = scored_sents.select(
        "url", "sent_id", "g_subj", "g_pred", "g_obj"
    )

    # restrict predictions to gold-covered sentences
    covered = sent_keyed.join(F.broadcast(gold.select("sentence").distinct()), "sentence", "left_semi")
    pred_inst = triples.join(covered.select("url", "sent_id"), ["url", "sent_id"], "left_semi").select(
        "url", "sent_id", "subj", "pred", "obj"
    )

    nullsafe = lambda a, b: a.eqNullSafe(b)  # noqa: E731
    hits = pred_inst.alias("p").join(
        gold_inst.alias("g"),
        on=[
            F.col("p.url") == F.col("g.url"),
            F.col("p.sent_id") == F.col("g.sent_id"),
            nullsafe(F.col("p.subj"), F.col("g.g_subj")),
            F.col("p.pred") == F.col("g.g_pred"),
            nullsafe(F.col("p.obj"), F.col("g.g_obj")),
        ],
    )
    n_hit = hits.count()
    n_pred = pred_inst.count()
    n_gold = gold_inst.count()
    return PRResult(
        precision=n_hit / n_pred if n_pred else 0.0,
        recall=n_hit / n_gold if n_gold else 0.0,
        n_gold=n_gold,
        n_pred=n_pred,
        n_hit=n_hit,
    )
