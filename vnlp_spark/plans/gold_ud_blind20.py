"""Twentieth BLIND gold split — round 3, post-blind-19 generalization check.

Protocol (same as gold_ud_blind{,2..19}.py): blind-19 (commit 07483b9's
record) was scored ONCE at triple P/R 0.850 and its five categories
were fixed with general rules and pinned, burning it.  These 20 NEW
sentences were written and UD-annotated by hand AFTER those fixes
landed and are COMMITTED BEFORE the engine touches them in any way.
The first-run score is recorded as-is in BENCH.md regardless of
outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes of the blind-19 fixes: a passive double-izafet subject
slot (``Şehir stadyumunda veda maçı oynandı``), an intransitive
``-ken`` subject (``Güneş batarken``), a participle-headed OSV object
(``Toplanan bağışları dernek dağıttı``), positive and negative
necessitatives (``almalı``, ``konuşmamalı``), and the yardım-class
noun re-probed as a passive subject and izafet modifier (``Yardım
dağıtımı okulda yapıldı``).  Virgin constructions: ``-DIkçA``
(``arttıkça``), formal ``-mAktAdIr`` (``sürmektedir``), pluperfect
``-mIştI``, a passive ``-mAdAn önce`` converb under the corrected
convention, a ``-mIş`` participle relative (``Kurumuş dallar``),
quantifier ``Çoğu`` (a çok+P3sg homograph), the ``üzerine`` frame,
and an ``-IncA`` passive converb (``kesilince``).

Annotation conventions: the authoritative list in gold_ud.py's
docstring, identical to every earlier split.
"""
from typing import List

BLIND20: List[dict] = [
    dict(
        text="Şehir stadyumunda veda maçı oynandı.",
        tokens=["Şehir", "stadyumunda", "veda", "maçı", "oynandı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Güneş batarken sahil kalabalıklaştı.",
        tokens=["Güneş", "batarken", "sahil", "kalabalıklaştı", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Toplanan bağışları dernek dağıttı.",
        tokens=["Toplanan", "bağışları", "dernek", "dağıttı", "."],
        upos=["VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["acl", "obj", "nsubj", "root", "punct"],
    ),
    dict(
        text="Hastalar ilaçlarını zamanında almalı.",
        tokens=["Hastalar", "ilaçlarını", "zamanında", "almalı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Sürücüler telefonla konuşmamalı.",
        tokens=["Sürücüler", "telefonla", "konuşmamalı", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Talep arttıkça fiyatlar yükseliyor.",
        tokens=["Talep", "arttıkça", "fiyatlar", "yükseliyor", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Çalışmalar sürmektedir.",
        tokens=["Çalışmalar", "sürmektedir", "."],
        upos=["NOUN", "VERB", "PUNCT"],
        heads=[2, 0, 2],
        deprels=["nsubj", "root", "punct"],
    ),
    dict(
        text="Takım sezona iyi başlamıştı.",
        tokens=["Takım", "sezona", "iyi", "başlamıştı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Binanın çatısında onarım yapıldı.",
        tokens=["Binanın", "çatısında", "onarım", "yapıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Karar verilmeden önce taraflar dinlendi.",
        tokens=["Karar", "verilmeden", "önce", "taraflar", "dinlendi",
                "."],
        upos=["NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 2, 5, 0, 5],
        deprels=["nsubj", "advcl", "case", "nsubj", "root", "punct"],
    ),
    dict(
        text="Kurumuş dallar toplandı.",
        tokens=["Kurumuş", "dallar", "toplandı", "."],
        upos=["VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 0, 3],
        deprels=["acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Çoğu izleyici finali beğendi.",
        tokens=["Çoğu", "izleyici", "finali", "beğendi", "."],
        upos=["DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["det", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Salon davetlilerle doluydu.",
        tokens=["Salon", "davetlilerle", "doluydu", "."],
        upos=["NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Şikayetler üzerine denetim başlatıldı.",
        tokens=["Şikayetler", "üzerine", "denetim", "başlatıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Firmalar yeni teşviklerden yararlanacak.",
        tokens=["Firmalar", "yeni", "teşviklerden", "yararlanacak",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Sular kesilince mahalle karanlıkta kaldı.",
        tokens=["Sular", "kesilince", "mahalle", "karanlıkta", "kaldı",
                "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nsubj", "advcl", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Kardeşim sınıfını geçti.",
        tokens=["Kardeşim", "sınıfını", "geçti", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Yardım dağıtımı okulda yapıldı.",
        tokens=["Yardım", "dağıtımı", "okulda", "yapıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Vatandaşlar başvurularını internetten yapabilir.",
        tokens=["Vatandaşlar", "başvurularını", "internetten",
                "yapabilir", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Orkestra konseri açık havada verdi.",
        tokens=["Orkestra", "konseri", "açık", "havada", "verdi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
]

for _g in BLIND20:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
