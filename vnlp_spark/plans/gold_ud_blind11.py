"""Eleventh BLIND gold split — round 3, post-blind-10 generalization check.

Protocol (same as gold_ud_blind{,2..10}.py): blind-10 (commit 62b8fea)
was scored ONCE at triple P/R 0.900 and its four residual categories
were fixed with general rules and pinned, burning it.  These 20 NEW
sentences were written and UD-annotated by hand AFTER those fixes
landed and are COMMITTED BEFORE the engine touches them in any way
(the tokenizations below are hand-written).  The first-run score is
recorded as-is in BENCH.md regardless of outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes of the blind-10 burn categories: an adjective inside an
intervening oblique phrase (``adil şekilde``), an everyday-transitive
class member (``haşladı``), a Loc-possessed temporal noun oblique
(``gününde``), ``kal-`` copular predicates with fresh adjectives
(``boş kaldı``), and title runs holding their name against following
ambiguous nominals (``Doktor Yıldırım hastaları``, ``Antrenör Çetin
oyuncuları`` — Çetin also probing the mid-sentence-capital prior on
an ADJ-stem surname).  Earlier burned classes re-probed with unseen
members: a genitive that must STAY a possessor inside a nominalized
complement (``taraftarların desteğini unutmayacağını``), an
overtly-possessed-accusative compound (``müşteri şikayetlerini``), a
passive×negative conditional (``taşınmazsa``) under an izafet subject
(``Mahkeme kararı``), amod-lift over a bare compound into a passive
(``Eski fabrika binası ... dönüştürüldü``), possessed postpositions
(``sırasında``, ``nedeniyle``, ``göre``, ``öğleden sonra``), and VP
coordination with shared subjects.

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py and the earlier splits.
"""
from typing import List

BLIND11: List[dict] = [
    dict(
        text="Hakem maçı adil şekilde yönetti.",
        tokens=["Hakem", "maçı", "adil", "şekilde", "yönetti", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Kira gününde ödendi.",
        tokens=["Kira", "gününde", "ödendi", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Bazı koltuklar konser sırasında boş kaldı.",
        tokens=["Bazı", "koltuklar", "konser", "sırasında", "boş",
                "kaldı", "."],
        upos=["DET", "NOUN", "NOUN", "ADP", "ADJ", "VERB", "PUNCT"],
        heads=[2, 6, 6, 3, 6, 0, 6],
        deprels=["det", "nsubj", "obl", "case", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Doktor Yıldırım hastaları öğleden sonra kabul etti.",
        tokens=["Doktor", "Yıldırım", "hastaları", "öğleden", "sonra",
                "kabul", "etti", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "ADP", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 1, 7, 7, 4, 7, 0, 7],
        deprels=["nsubj", "flat", "obj", "obl", "case", "compound",
                 "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Çırak patatesleri haşladı ve tabağa koydu.",
        tokens=["Çırak", "patatesleri", "haşladı", "ve", "tabağa",
                "koydu", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 6, 6, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "obl", "conj", "punct"],
    ),
    dict(
        text="Yazar Bulut yeni romanını tanıttı.",
        tokens=["Yazar", "Bulut", "yeni", "romanını", "tanıttı", "."],
        upos=["NOUN", "PROPN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 4, 5, 0, 5],
        deprels=["nsubj", "flat", "amod", "obj", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Sınav sonuçları yarın açıklanacak.",
        tokens=["Sınav", "sonuçları", "yarın", "açıklanacak", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Kulüp taraftarların desteğini unutmayacağını vurguladı.",
        tokens=["Kulüp", "taraftarların", "desteğini",
                "unutmayacağını", "vurguladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Yeni köprü ulaşımı oldukça kolaylaştırdı.",
        tokens=["Yeni", "köprü", "ulaşımı", "oldukça",
                "kolaylaştırdı", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Müze ziyaretçilere hafta sonu ücretsiz.",
        tokens=["Müze", "ziyaretçilere", "hafta", "sonu", "ücretsiz",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Şirketin kârı geçen yıla göre arttı.",
        tokens=["Şirketin", "kârı", "geçen", "yıla", "göre", "arttı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 4, 0, 6],
        deprels=["nmod", "nsubj", "amod", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Gönüllüler sahili temizledi ve çöpleri ayırdı.",
        tokens=["Gönüllüler", "sahili", "temizledi", "ve", "çöpleri",
                "ayırdı", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 6, 6, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "obj", "conj", "punct"],
    ),
    dict(
        text="Eski fabrika binası kültür merkezine dönüştürüldü.",
        tokens=["Eski", "fabrika", "binası", "kültür", "merkezine",
                "dönüştürüldü", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 5, 6, 0, 6],
        deprels=["amod", "nmod", "nsubj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Başvurular elektronik ortamda alınacak.",
        tokens=["Başvurular", "elektronik", "ortamda", "alınacak",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Antrenör Çetin oyuncuları sabah çalıştırdı.",
        tokens=["Antrenör", "Çetin", "oyuncuları", "sabah",
                "çalıştırdı", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["nsubj", "flat", "obj", "obl", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Proje bütçe yetersizliği nedeniyle durduruldu.",
        tokens=["Proje", "bütçe", "yetersizliği", "nedeniyle",
                "durduruldu", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[5, 3, 5, 3, 0, 5],
        deprels=["nsubj", "nmod", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Çocuklar parkta koştu ve salıncakta sallandı.",
        tokens=["Çocuklar", "parkta", "koştu", "ve", "salıncakta",
                "sallandı", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 6, 6, 3, 3],
        deprels=["nsubj", "obl", "root", "cc", "obl", "conj", "punct"],
    ),
    dict(
        text="Firma müşteri şikayetlerini hızla çözeceğini açıkladı.",
        tokens=["Firma", "müşteri", "şikayetlerini", "hızla",
                "çözeceğini", "açıkladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "VERB", "PUNCT"],
        heads=[6, 3, 5, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "advmod", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Mahkeme kararı temyize taşınmazsa kesinleşecek.",
        tokens=["Mahkeme", "kararı", "temyize", "taşınmazsa",
                "kesinleşecek", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[2, 4, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "advcl", "root", "punct"],
    ),
    dict(
        text="Oteller yaz sezonunda tamamen doldu.",
        tokens=["Oteller", "yaz", "sezonunda", "tamamen", "doldu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "advmod", "root", "punct"],
    ),
]

for _g in BLIND11:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
