"""Fourteenth BLIND gold split — round 3, post-blind-13 generalization check.

Protocol (same as gold_ud_blind{,2..13}.py): blind-13 (commit
99b1d92's record) was scored ONCE at triple P/R 0.850 and its five
residual categories were fixed with general rules and pinned, burning
it.  These 20 NEW sentences were written and UD-annotated by hand
AFTER those fixes landed and are COMMITTED BEFORE the engine touches
them in any way (the tokenizations below are hand-written).  The
first-run score is recorded as-is in BENCH.md regardless of outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes of every blind-13 burn category: a zincirleme genitive
chain (``Fabrika müdürünün kararı``), a comma+``ve`` conjunct list
(``elma , portakal ve muz``), a 2pl pronoun subject (``Hepiniz ...
geçtiniz``), a productive ``-CI`` agentive absent from the stem list
(``fırıncıları``, base fırın), and a measure-class transitive
(``tarttı``).  Earlier burned classes with unseen members: role-noun
before a dative (``Yetkili gazetecilere``), negative FutPart
(``değiştirmeyeceğini``), passive-negative conditional
(``incelenmezse``), Become-Fut finite (``modernleşecek``),
title-flats (``Vali Doğan``, ``Mühendis Ak`` — a two-letter ADJ-stem
surname), a saturated-genitive nominalization subject (``turizmin
istihdam oranını yükselteceğini``), ``kal-`` copular (``yarım
kaldı``), a comparative (``diğerinden daha``), an ``-Ip`` chain
(``dolaşıp``), a participial relative (``yürüyen``), and a
manner-frame ``-lI`` adjective (``düzenli biçimde``).

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py and the earlier splits.
"""
from typing import List

BLIND14: List[dict] = [
    dict(
        text="Fabrika müdürünün kararı tartışma yarattı.",
        tokens=["Fabrika", "müdürünün", "kararı", "tartışma",
                "yarattı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 5, 5, 0, 5],
        deprels=["nmod", "nmod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Sepette elma, portakal ve muz bulunuyor.",
        tokens=["Sepette", "elma", ",", "portakal", "ve", "muz",
                "bulunuyor", "."],
        upos=["NOUN", "NOUN", "PUNCT", "NOUN", "CCONJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 7, 4, 2, 6, 2, 0, 7],
        deprels=["obl", "nsubj", "punct", "conj", "cc", "conj", "root",
                 "punct"],
    ),
    dict(
        text="Hepiniz sınavı başarıyla geçtiniz.",
        tokens=["Hepiniz", "sınavı", "başarıyla", "geçtiniz", "."],
        upos=["PRON", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Dernek fırıncıları toplantıya davet etti.",
        tokens=["Dernek", "fırıncıları", "toplantıya", "davet", "etti",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "compound", "root", "punct"],
    ),
    dict(
        text="Kasap eti özenle tarttı.",
        tokens=["Kasap", "eti", "özenle", "tarttı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Yetkili gazetecilere bilgi verdi.",
        tokens=["Yetkili", "gazetecilere", "bilgi", "verdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Parti adayını değiştirmeyeceğini duyurdu.",
        tokens=["Parti", "adayını", "değiştirmeyeceğini", "duyurdu",
                "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Başvurular incelenmezse süreç uzayacak.",
        tokens=["Başvurular", "incelenmezse", "süreç", "uzayacak",
                "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Kasabalar hızla modernleşecek.",
        tokens=["Kasabalar", "hızla", "modernleşecek", "."],
        upos=["NOUN", "ADV", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Vali Doğan köyleri ziyaret etti.",
        tokens=["Vali", "Doğan", "köyleri", "ziyaret", "etti", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["nsubj", "flat", "obj", "compound", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Raporlar turizmin istihdam oranını yükselteceğini"
             " gösteriyor.",
        tokens=["Raporlar", "turizmin", "istihdam", "oranını",
                "yükselteceğini", "gösteriyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "nmod", "obj", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Proje yarım kaldı.",
        tokens=["Proje", "yarım", "kaldı", "."],
        upos=["NOUN", "ADJ", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "compound", "root", "punct"],
    ),
    dict(
        text="Bu kumaş diğerinden daha yumuşak.",
        tokens=["Bu", "kumaş", "diğerinden", "daha", "yumuşak", "."],
        upos=["DET", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["det", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Öğrenciler müzeyi dolaşıp izlenimlerini yazdı.",
        tokens=["Öğrenciler", "müzeyi", "dolaşıp", "izlenimlerini",
                "yazdı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "advcl", "obj", "root", "punct"],
    ),
    dict(
        text="Sahilde yürüyen turistler manzarayı izledi.",
        tokens=["Sahilde", "yürüyen", "turistler", "manzarayı",
                "izledi", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 5, 5, 0, 5],
        deprels=["obl", "acl", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Şirket belgeyi düzenli biçimde yayımladı.",
        tokens=["Şirket", "belgeyi", "düzenli", "biçimde", "yayımladı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Okullar pazartesi açılacak.",
        tokens=["Okullar", "pazartesi", "açılacak", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Yazarın son kitabı okurlardan övgü aldı.",
        tokens=["Yazarın", "son", "kitabı", "okurlardan", "övgü",
                "aldı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 6, 6, 0, 6],
        deprels=["nmod", "amod", "nsubj", "obl", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Takımlar finalde yarın karşılaşacak.",
        tokens=["Takımlar", "finalde", "yarın", "karşılaşacak", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Mühendis Ak köprü projesini savundu.",
        tokens=["Mühendis", "Ak", "köprü", "projesini", "savundu",
                "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 4, 5, 0, 5],
        deprels=["nsubj", "flat", "nmod", "obj", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
]

for _g in BLIND14:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
