"""Third BLIND gold split — round 3, second-generation generalization probe.

Protocol (same as gold_ud_blind.py / gold_ud_blind2.py): blind-2
(commit 3adb425) was scored ONCE at triple P/R 0.750, its miss
categories were fixed with general rules pinned by fresh tuning
sentences (commit 23c8844), and it is thereby burned as a blind
instrument.  These 20 NEW sentences were written and UD-annotated by
hand AFTER those fixes landed and are COMMITTED BEFORE the engine runs
on them even once.  Fresh lexemes, fresh construction mix: ditransitive
datives, the dative-governing postposition `göre`, three-link genitive
chains, object-gap `-dIk` relatives with genitive subjects, copular
past, negative existential, `-mA+Dat` complements with an object left
argument, possessed postpositions from UNSEEN class members
(`kapsamında`, `ardından` — the nedeniyle/sonrasında fixes are the ones
being generalization-tested), instrumental obliques, `-ArAk` converbs,
`kadar`-bounded temporals, conditionals, `ve` coordination (first
coordination in any blind split), LOC NER, title flat with a fresh
title noun, negative abilitative, numeral + light verb, future-in-past
compound tense, and `-DIktAn sonra` converbs.  The first-run score is
recorded as-is in BENCH.md regardless of outcome.

Annotation conventions: universaldependencies.org/tr, same as
gold_ud.py (first-clause root, title-headed flat names, existential
var/yok as ADJ root, subtypes collapsed to base relations).
"""
from typing import List

BLIND3: List[dict] = [
    dict(
        text="Öğretmen öğrencilere yeni ödevler verdi.",
        tokens=["Öğretmen", "öğrencilere", "yeni", "ödevler", "verdi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Rapora göre ihracat geçen yıl arttı.",
        tokens=["Rapora", "göre", "ihracat", "geçen", "yıl", "arttı", "."],
        upos=["NOUN", "ADP", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["obl", "case", "nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Şirketin yönetim kurulu üyeleri istifa etti.",
        tokens=["Şirketin", "yönetim", "kurulu", "üyeleri", "istifa",
                "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 4, 6, 6, 0, 6],
        deprels=["nmod", "nmod", "nmod", "nsubj", "compound", "root", "punct"],
    ),
    dict(
        text="Yazarın okuduğu kitap çok beğenildi.",
        tokens=["Yazarın", "okuduğu", "kitap", "çok", "beğenildi", "."],
        upos=["NOUN", "VERB", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 3, 5, 5, 0, 5],
        deprels=["nsubj", "acl", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Hava bu sabah çok soğuktu.",
        tokens=["Hava", "bu", "sabah", "çok", "soğuktu", "."],
        upos=["NOUN", "DET", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "det", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Depoda yeterli malzeme yok.",
        tokens=["Depoda", "yeterli", "malzeme", "yok", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["obl", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Polis kaçan şüpheliyi yakalamaya çalıştı.",
        tokens=["Polis", "kaçan", "şüpheliyi", "yakalamaya", "çalıştı", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "acl", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Belediye yol çalışmaları kapsamında trafiği durdurdu.",
        tokens=["Belediye", "yol", "çalışmaları", "kapsamında", "trafiği",
                "durdurdu", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "nmod", "obl", "case", "obj", "root", "punct"],
    ),
    dict(
        text="Yolcular otobüsü durakta sabırla bekledi.",
        tokens=["Yolcular", "otobüsü", "durakta", "sabırla", "bekledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Gençler sahilde koşarak eğleniyor.",
        tokens=["Gençler", "sahilde", "koşarak", "eğleniyor", "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "obl", "advcl", "root", "punct"],
    ),
    dict(
        text="Sergi gelecek hafta sonuna kadar sürecek.",
        tokens=["Sergi", "gelecek", "hafta", "sonuna", "kadar", "sürecek",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[6, 3, 4, 6, 4, 0, 6],
        deprels=["nsubj", "amod", "nmod", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Yağmur yağarsa maç ertelenecek.",
        tokens=["Yağmur", "yağarsa", "maç", "ertelenecek", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Öğrenciler ve öğretmenler törene katıldı.",
        tokens=["Öğrenciler", "ve", "öğretmenler", "törene", "katıldı", "."],
        upos=["NOUN", "CCONJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 1, 5, 0, 5],
        deprels=["nsubj", "cc", "conj", "obl", "root", "punct"],
    ),
    dict(
        text="Şirket İzmir fuarında yeni ürünlerini tanıttı.",
        tokens=["Şirket", "İzmir", "fuarında", "yeni", "ürünlerini",
                "tanıttı", "."],
        upos=["NOUN", "PROPN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obl", "amod", "obj", "root", "punct"],
        ner=["O", "LOC", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Doktor Yılmaz hastaları sabah muayene etti.",
        tokens=["Doktor", "Yılmaz", "hastaları", "sabah", "muayene",
                "etti", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 6, 6, 0, 6],
        deprels=["nsubj", "flat", "obj", "obl", "compound", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Tanıklar olayı net hatırlayamadı.",
        tokens=["Tanıklar", "olayı", "net", "hatırlayamadı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Bakanlık üç yeni hastane inşa edecek.",
        tokens=["Bakanlık", "üç", "yeni", "hastane", "inşa", "edecek", "."],
        upos=["NOUN", "NUM", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 4, 4, 6, 6, 0, 6],
        deprels=["nsubj", "nummod", "amod", "obj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Konser açık havada yapılacaktı.",
        tokens=["Konser", "açık", "havada", "yapılacaktı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Seçimin ardından piyasalar hızla toparlandı.",
        tokens=["Seçimin", "ardından", "piyasalar", "hızla", "toparlandı",
                "."],
        upos=["NOUN", "ADP", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["obl", "case", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Yemek yedikten sonra yürüyüşe çıktılar.",
        tokens=["Yemek", "yedikten", "sonra", "yürüyüşe", "çıktılar", "."],
        upos=["NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 2, 5, 0, 5],
        deprels=["obj", "advcl", "case", "obl", "root", "punct"],
    ),
]

for _g in BLIND3:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
