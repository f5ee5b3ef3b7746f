"""Eighth BLIND gold split — round 3, post-blind-7 generalization check.

Protocol (same as gold_ud_blind{,2,3,4,5,6,7}.py): blind-7 (commit
b57cc2c) was scored ONCE at triple P/R 0.750 and its eight residual
categories were fixed and pinned (commit b669d70), burning it.  These 20
NEW sentences were written and UD-annotated by hand AFTER those fixes
landed and are COMMITTED BEFORE the engine touches them in any way (no
tokenizer, no analyzer, nothing — the tokenizations below are
hand-written).  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: representative web-news, fresh content lexemes.  The split
includes natural-occurrence generalization checks on earlier burn
categories with UNSEEN class members: a loan ``-î`` adjective homograph
in attributive position (``tarihi konağı``), an unlisted ``-mAyA
başla`` complement verb (``onarmaya``), an unseen possessed-temporal
postposition (``öncesinde``), a spatial relational noun under the
NOUN-obl convention (``çevresinde``), an inflected lexicalized ``-An``
noun (``çalışanlarına``), genitive-subject nominalized complements with
internal arguments, a conditional protasis, VP coordination, a
title-headed flat name, and a zero-copula adjectival predicate.

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py (first-clause root, title-headed flat names, amod on the
compound head, subtypes collapsed to base relations, grammaticalized
possessed TEMPORAL postpositions as ADP/case while spatial relational
nouns stay NOUN with nmod host, nominalized -mA/-DIk/-AcAk complements
as ccomp hosting their own arguments, participle relatives as acl).
"""
from typing import List

BLIND8: List[dict] = [
    dict(
        text="Belediye hasarlı yolları onarmaya başladı.",
        tokens=["Belediye", "hasarlı", "yolları", "onarmaya", "başladı",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Restorasyon ekibi tarihi konağı tamamen yeniledi.",
        tokens=["Restorasyon", "ekibi", "tarihi", "konağı", "tamamen",
                "yeniledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "amod", "obj", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Maç öncesinde taraftarlar stadyum çevresinde toplandı.",
        tokens=["Maç", "öncesinde", "taraftarlar", "stadyum",
                "çevresinde", "toplandı", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["obl", "case", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Uzmanlar kuraklığın tarım ürünlerini etkileyeceğini"
             " vurguladı.",
        tokens=["Uzmanlar", "kuraklığın", "tarım", "ürünlerini",
                "etkileyeceğini", "vurguladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "nmod", "obj", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Profesör Arslan konferansta iklim değişikliğini anlattı.",
        tokens=["Profesör", "Arslan", "konferansta", "iklim",
                "değişikliğini", "anlattı", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["nsubj", "flat", "obl", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Yeni hastane binası geçen hafta hizmete açıldı.",
        tokens=["Yeni", "hastane", "binası", "geçen", "hafta", "hizmete",
                "açıldı", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[3, 3, 7, 5, 7, 7, 0, 7],
        deprels=["amod", "nmod", "nsubj", "amod", "obl", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Yağışlar sürerse nehir taşabilir.",
        tokens=["Yağışlar", "sürerse", "nehir", "taşabilir", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Şirket üretimi artırdı ve yeni personel aldı.",
        tokens=["Şirket", "üretimi", "artırdı", "ve", "yeni", "personel",
                "aldı", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[3, 3, 0, 7, 6, 7, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "amod", "obj", "conj",
                 "punct"],
    ),
    dict(
        text="Ödülü kazanan yazar okurlarına teşekkür etti.",
        tokens=["Ödülü", "kazanan", "yazar", "okurlarına", "teşekkür",
                "etti", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 6, 6, 0, 6],
        deprels=["obj", "acl", "nsubj", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Yangın çıkınca bina derhal boşaltıldı.",
        tokens=["Yangın", "çıkınca", "bina", "derhal", "boşaltıldı",
                "."],
        upos=["NOUN", "VERB", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nsubj", "advcl", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Sözcü görüşmelerin yarın süreceğini belirtti.",
        tokens=["Sözcü", "görüşmelerin", "yarın", "süreceğini",
                "belirtti", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nsubj", "advmod", "ccomp", "root", "punct"],
    ),
    dict(
        text="Kulüp genç oyuncuya yeni sözleşme önerdi.",
        tokens=["Kulüp", "genç", "oyuncuya", "yeni", "sözleşme",
                "önerdi", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Polis kazayla ilgili soruşturma başlattı.",
        tokens=["Polis", "kazayla", "ilgili", "soruşturma", "başlattı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Rapora göre işsizlik oranı azaldı.",
        tokens=["Rapora", "göre", "işsizlik", "oranı", "azaldı", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 4, 5, 0, 5],
        deprels=["obl", "case", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Festival iki gün boyunca yerli turistleri ağırladı.",
        tokens=["Festival", "iki", "gün", "boyunca", "yerli",
                "turistleri", "ağırladı", "."],
        upos=["NOUN", "NUM", "NOUN", "ADP", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 3, 6, 7, 0, 7],
        deprels=["nsubj", "nummod", "obl", "case", "amod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Sergi bu hafta ücretsiz.",
        tokens=["Sergi", "bu", "hafta", "ücretsiz", "."],
        upos=["NOUN", "DET", "NOUN", "ADJ", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "det", "obl", "root", "punct"],
    ),
    dict(
        text="Takım deplasmanda üçüncü galibiyetini aldı.",
        tokens=["Takım", "deplasmanda", "üçüncü", "galibiyetini", "aldı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Gönüllüler sahildeki çöpleri sabah saatlerinde topladı.",
        tokens=["Gönüllüler", "sahildeki", "çöpleri", "sabah",
                "saatlerinde", "topladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Firma çalışanlarına ek prim ödeyecek.",
        tokens=["Firma", "çalışanlarına", "ek", "prim", "ödeyecek", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Okullar pazartesi günü yeniden açılacak.",
        tokens=["Okullar", "pazartesi", "günü", "yeniden", "açılacak",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "advmod", "root", "punct"],
    ),
]
