"""BLIND gold split — round 3 post-tuning generalization probe.

Protocol: these 20 sentences were written and UD-annotated by hand
AFTER all round-3 tuning finished, and COMMITTED BEFORE the engine was
run on them even once (verify: this file's first commit precedes the
BENCH.md entry recording the score; no engine/annotator source changes
in between).  They deliberately use fresh lexemes and the full
construction mix: transitives/intransitives, possessive chains,
genitive + compound, converb clauses, light verbs, ADP adjuncts,
passives, -ki adjectivals, title + name.  The score measured on this
split is a true generalization number: no rule was ever adjusted
against it.

Annotation conventions: universaldependencies.org/tr, same as
gold_ud.py / gold_ud_heldout.py (first-clause root, comma to the clause
it introduces, title-headed flat names).
"""
from typing import List

BLIND: List[dict] = [
    dict(
        text="Müfettiş raporu dikkatle inceledi.",
        tokens=["Müfettiş", "raporu", "dikkatle", "inceledi", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Şirketin geliri bu çeyrekte azaldı.",
        tokens=["Şirketin", "geliri", "bu", "çeyrekte", "azaldı", "."],
        upos=["NOUN", "NOUN", "DET", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "det", "obl", "root", "punct"],
    ),
    dict(
        text="Genç mühendis köprünün ayağını onardı.",
        tokens=["Genç", "mühendis", "köprünün", "ayağını", "onardı", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Yolcular otobüste sessizce bekliyordu.",
        tokens=["Yolcular", "otobüste", "sessizce", "bekliyordu", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Aşçı çorbaya taze baharat ekledi.",
        tokens=["Aşçı", "çorbaya", "taze", "baharat", "ekledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Öğrenciler sınava birlikte hazırlandı.",
        tokens=["Öğrenciler", "sınava", "birlikte", "hazırlandı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Belediye parkın girişine çeşme yaptırdı.",
        tokens=["Belediye", "parkın", "girişine", "çeşme", "yaptırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Hemşire hastanın ateşini ölçtü.",
        tokens=["Hemşire", "hastanın", "ateşini", "ölçtü", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Kasabın dükkanı sabah erken açıldı.",
        tokens=["Kasabın", "dükkanı", "sabah", "erken", "açıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Yazar romanında savaş yıllarını anlatıyor.",
        tokens=["Yazar", "romanında", "savaş", "yıllarını", "anlatıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Kaptan fırtınaya rağmen denize açıldı.",
        tokens=["Kaptan", "fırtınaya", "rağmen", "denize", "açıldı", "."],
        upos=["NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "obl", "root", "punct"],
    ),
    dict(
        text="Komşunun kedisi bahçemize girdi.",
        tokens=["Komşunun", "kedisi", "bahçemize", "girdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Takım antrenmanı yağmur yüzünden iptal edildi.",
        tokens=["Takım", "antrenmanı", "yağmur", "yüzünden", "iptal",
                "edildi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 3, 6, 0, 6],
        deprels=["nmod", "nsubj", "obl", "case", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Profesör Aydın öğrencilerine sabır tavsiye etti.",
        tokens=["Profesör", "Aydın", "öğrencilerine", "sabır", "tavsiye",
                "etti", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 6, 6, 0, 6],
        deprels=["nsubj", "flat", "obl", "obj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Dağcılar zirveye ulaşınca bayrak açtı.",
        tokens=["Dağcılar", "zirveye", "ulaşınca", "bayrak", "açtı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "advcl", "obj", "root", "punct"],
    ),
    dict(
        text="Sanayi bölgesindeki fabrikalar denetlendi.",
        tokens=["Sanayi", "bölgesindeki", "fabrikalar", "denetlendi", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 4, 0, 4],
        deprels=["nmod", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Müzede eski eserler sergileniyor.",
        tokens=["Müzede", "eski", "eserler", "sergileniyor", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["obl", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Gazete yazısı okurları kızdırdı.",
        tokens=["Gazete", "yazısı", "okurları", "kızdırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Çiftçi tarlayı traktörle sürdü.",
        tokens=["Çiftçi", "tarlayı", "traktörle", "sürdü", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Konferans salonundaki dinleyiciler soru sordu.",
        tokens=["Konferans", "salonundaki", "dinleyiciler", "soru",
                "sordu", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 5, 5, 0, 5],
        deprels=["nmod", "amod", "nsubj", "obj", "root", "punct"],
    ),
]

for _g in BLIND:
    assert len(_g["tokens"]) == len(_g["upos"]) == len(_g["heads"]) == len(_g["deprels"]), _g["text"]
