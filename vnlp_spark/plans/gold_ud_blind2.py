"""Second BLIND gold split — round 3, post-category-fix generalization probe.

Protocol (same as gold_ud_blind.py): the first blind split (commit
b63214c) was scored ONCE at triple P/R 0.700, its miss categories were
fixed (commit 5bda92f pins them in the tuning split with fresh lexemes),
and it is thereby burned as a blind instrument.  These 20 NEW sentences
were written and UD-annotated by hand AFTER those fixes landed and are
COMMITTED BEFORE the engine runs on them even once.  They use fresh
lexemes and a fresh construction mix: causatives, genitive chains,
possessed postpositional frames (nedeniyle/sonrasında — deliberately
NOT in the fixed yüzünden set), -ki adjectivals, idiomatic light verbs
(kontrol altına alındı), reduplicated adverbs, participial relatives,
copular predicates, nominalized complements, converb + önce, and
adjective-as-adverb usage.  The first-run score is recorded as-is in
BENCH.md regardless of outcome.

Annotation conventions: universaldependencies.org/tr, same as
gold_ud.py (first-clause root, title-headed flat names, subtypes
collapsed to base relations).
"""
from typing import List

BLIND2: List[dict] = [
    dict(
        text="Belediye eski binayı gelecek ay yıktıracak.",
        tokens=["Belediye", "eski", "binayı", "gelecek", "ay", "yıktıracak", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Araştırmacılar yeni ilacın etkisini inceliyor.",
        tokens=["Araştırmacılar", "yeni", "ilacın", "etkisini", "inceliyor", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Fabrikadaki işçiler yeni sözleşmeyi imzaladı.",
        tokens=["Fabrikadaki", "işçiler", "yeni", "sözleşmeyi", "imzaladı", "."],
        upos=["ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Kuraklık nedeniyle baraj seviyesi düştü.",
        tokens=["Kuraklık", "nedeniyle", "baraj", "seviyesi", "düştü", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 4, 5, 0, 5],
        deprels=["obl", "case", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Müze ziyaretçilere ücretsiz rehberlik sunuyor.",
        tokens=["Müze", "ziyaretçilere", "ücretsiz", "rehberlik", "sunuyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Başkan Demir toplantıda önemli kararlar açıkladı.",
        tokens=["Başkan", "Demir", "toplantıda", "önemli", "kararlar",
                "açıkladı", "."],
        upos=["NOUN", "PROPN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["nsubj", "flat", "obl", "amod", "obj", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Sporcular antrenman sonrasında dinlenme tesisine geçti.",
        tokens=["Sporcular", "antrenman", "sonrasında", "dinlenme",
                "tesisine", "geçti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obl", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Yangın kısa sürede kontrol altına alındı.",
        tokens=["Yangın", "kısa", "sürede", "kontrol", "altına", "alındı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obl", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Okul müdürü velilerle uzun uzun konuştu.",
        tokens=["Okul", "müdürü", "velilerle", "uzun", "uzun", "konuştu", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "ADV", "VERB", "PUNCT"],
        heads=[2, 6, 6, 6, 4, 0, 6],
        deprels=["nmod", "nsubj", "obl", "advmod", "compound", "root", "punct"],
    ),
    dict(
        text="Hastane bahçesindeki ağaçlar budandı.",
        tokens=["Hastane", "bahçesindeki", "ağaçlar", "budandı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 4, 0, 4],
        deprels=["nmod", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Şehirdeki trafik akşam saatlerinde yoğunlaşıyordu.",
        tokens=["Şehirdeki", "trafik", "akşam", "saatlerinde",
                "yoğunlaşıyordu", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Kütüphane hafta sonu öğrencilere açık.",
        tokens=["Kütüphane", "hafta", "sonu", "öğrencilere", "açık", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Yeni açılan restoran kısa zamanda ünlendi.",
        tokens=["Yeni", "açılan", "restoran", "kısa", "zamanda", "ünlendi", "."],
        upos=["ADV", "VERB", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 5, 6, 0, 6],
        deprels=["advmod", "acl", "nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Takımın genç oyuncusu ilk golünü attı.",
        tokens=["Takımın", "genç", "oyuncusu", "ilk", "golünü", "attı", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 5, 6, 0, 6],
        deprels=["nmod", "amod", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Vatandaşlar elektrik kesintisinden şikayet etti.",
        tokens=["Vatandaşlar", "elektrik", "kesintisinden", "şikayet",
                "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "compound", "root", "punct"],
    ),
    dict(
        text="Dağcılar zirveye ulaşmadan önce kamp kurdu.",
        tokens=["Dağcılar", "zirveye", "ulaşmadan", "önce", "kamp", "kurdu", "."],
        upos=["NOUN", "NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "case", "obj", "root", "punct"],
    ),
    dict(
        text="Sanatçının son sergisi büyük ilgi gördü.",
        tokens=["Sanatçının", "son", "sergisi", "büyük", "ilgi", "gördü", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 5, 6, 0, 6],
        deprels=["nmod", "amod", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Çiftçiler ürünlerini pazarda satmaya başladı.",
        tokens=["Çiftçiler", "ürünlerini", "pazarda", "satmaya", "başladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "ccomp", "root", "punct"],
    ),
    dict(
        text="Kar yağışı ulaşımı olumsuz etkiledi.",
        tokens=["Kar", "yağışı", "ulaşımı", "olumsuz", "etkiledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Yetkililer konuyla ilgili açıklama yapmadı.",
        tokens=["Yetkililer", "konuyla", "ilgili", "açıklama", "yapmadı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
]

for _g in BLIND2:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
