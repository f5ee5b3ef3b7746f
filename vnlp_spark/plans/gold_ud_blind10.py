"""Tenth BLIND gold split — round 3, post-blind-9 generalization check.

Protocol (same as gold_ud_blind{,2..9}.py): blind-9 (commit a50c536)
was scored ONCE at triple P/R 0.800 and its seven residual categories
were fixed with general rules and pinned, burning it.  These 20 NEW
sentences were written and UD-annotated by hand AFTER those fixes
landed and are COMMITTED BEFORE the engine touches them in any way
(the tokenizations below are hand-written).  The first-run score is
recorded as-is in BENCH.md regardless of outcome.

Register: representative web-news, fresh content lexemes.  Natural-
occurrence generalization probes on the blind-9 burn categories with
UNSEEN class members: passive×negative conditionals with BOTH passive
allomorphs (``ödenmezse`` n-class, ``giderilmezse`` Il-class, plus a
passive negative future ``kullanılmayacak``), an unseen ``-lAn+DIr``
member (``görevlendirdi``), an unseen finite-before-coordinator
homograph (``kurudu`` = kuru-/kurut), unseen occupation-title flat
names over capitalized common-noun surnames (``Gazeteci Yıldız``,
``Savcı Toprak``, ``Hemşire Güneş``), unseen degree-adverb compound
predicates (``Köy meydanı oldukça geniş``), an unseen
saturated-genitive nominalization subject (``şirketin reklam
bütçesini kısacağını``), a NON-nominalized saturated compound where
the genitive must STAY a possessor (``köprünün taşıma
kapasitesini``), an unseen ``X altına alındı`` frame member
(``denetim``), an unseen comparative (``eskisinden daha dayanıklı``),
unseen possessed postpositions (``sayesinde``, ``boyunca``,
``nedeniyle``), and an unseen ``-IncA`` converb (``bitince``).

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py and the earlier splits (first-clause root, title-headed
flat names, amod on the compound head, subtypes collapsed to base
relations, grammaticalized possessed postpositions as ADP/case,
nominalized complements as ccomp hosting their own arguments, -IncA
converbs hosting their own subject, copular predicative complements
as compound, bare time nouns as obl).
"""
from typing import List

BLIND10: List[dict] = [
    dict(
        text="Gazeteci Yıldız soruları sakin biçimde yanıtladı.",
        tokens=["Gazeteci", "Yıldız", "soruları", "sakin", "biçimde",
                "yanıtladı", "."],
        upos=["NOUN", "PROPN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["nsubj", "flat", "obj", "amod", "obl", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Borç zamanında ödenmezse faiz işleyecek.",
        tokens=["Borç", "zamanında", "ödenmezse", "faiz", "işleyecek",
                "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Müdür iki memuru soruşturmayla görevlendirdi.",
        tokens=["Müdür", "iki", "memuru", "soruşturmayla",
                "görevlendirdi", "."],
        upos=["NOUN", "NUM", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nummod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Çamaşırlar balkonda kurudu ve akşam toplandı.",
        tokens=["Çamaşırlar", "balkonda", "kurudu", "ve", "akşam",
                "toplandı", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 6, 6, 3, 3],
        deprels=["nsubj", "obl", "root", "cc", "obl", "conj", "punct"],
    ),
    dict(
        text="Savcı Toprak dosyayı yeniden inceledi.",
        tokens=["Savcı", "Toprak", "dosyayı", "yeniden", "inceledi",
                "."],
        upos=["NOUN", "PROPN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["nsubj", "flat", "obj", "advmod", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Köy meydanı oldukça geniş.",
        tokens=["Köy", "meydanı", "oldukça", "geniş", "."],
        upos=["NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Analistler şirketin reklam bütçesini kısacağını"
             " öngörüyor.",
        tokens=["Analistler", "şirketin", "reklam", "bütçesini",
                "kısacağını", "öngörüyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "nmod", "obj", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Yangın kısa sürede denetim altına alındı.",
        tokens=["Yangın", "kısa", "sürede", "denetim", "altına",
                "alındı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obl", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Yeni model eskisinden daha dayanıklı.",
        tokens=["Yeni", "model", "eskisinden", "daha", "dayanıklı",
                "."],
        upos=["ADJ", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Festival gönüllüler sayesinde erken bitti.",
        tokens=["Festival", "gönüllüler", "sayesinde", "erken",
                "bitti", "."],
        upos=["NOUN", "NOUN", "ADP", "ADV", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "advmod", "root", "punct"],
    ),
    dict(
        text="Toplantı bitince misafirler bahçeye çıktı.",
        tokens=["Toplantı", "bitince", "misafirler", "bahçeye",
                "çıktı", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nsubj", "advcl", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Belediye ağaç dikti ve yeni banklar yerleştirdi.",
        tokens=["Belediye", "ağaç", "dikti", "ve", "yeni", "banklar",
                "yerleştirdi", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[3, 3, 0, 7, 6, 7, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "amod", "obj", "conj",
                 "punct"],
    ),
    dict(
        text="Sulama kanalı bakım nedeniyle kapatıldı.",
        tokens=["Sulama", "kanalı", "bakım", "nedeniyle", "kapatıldı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 5, 5, 3, 0, 5],
        deprels=["nmod", "nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Aşçı sebzeleri doğradı ve tencereye ekledi.",
        tokens=["Aşçı", "sebzeleri", "doğradı", "ve", "tencereye",
                "ekledi", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 6, 6, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "obl", "conj", "punct"],
    ),
    dict(
        text="Mühendisler köprünün taşıma kapasitesini ölçtü.",
        tokens=["Mühendisler", "köprünün", "taşıma", "kapasitesini",
                "ölçtü", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Hemşire Güneş hastaları sabah ziyaret etti.",
        tokens=["Hemşire", "Güneş", "hastaları", "sabah", "ziyaret",
                "etti", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 6, 6, 0, 6],
        deprels=["nsubj", "flat", "obj", "obl", "compound", "root",
                 "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Hasar giderilmezse bina kullanılmayacak.",
        tokens=["Hasar", "giderilmezse", "bina", "kullanılmayacak",
                "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Takım maçtan sonra kampa dönecek.",
        tokens=["Takım", "maçtan", "sonra", "kampa", "dönecek", "."],
        upos=["NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "obl", "root", "punct"],
    ),
    dict(
        text="Kütüphane sınav haftası boyunca açık kalacak.",
        tokens=["Kütüphane", "sınav", "haftası", "boyunca", "açık",
                "kalacak", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "ADJ", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "nmod", "obl", "case", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Ressamın yeni sergisi sanatseverlerden büyük ilgi"
             " gördü.",
        tokens=["Ressamın", "yeni", "sergisi", "sanatseverlerden",
                "büyük", "ilgi", "gördü", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[3, 3, 7, 7, 6, 7, 0, 7],
        deprels=["nmod", "amod", "nsubj", "obl", "amod", "obj", "root",
                 "punct"],
    ),
]

for _g in BLIND10:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
