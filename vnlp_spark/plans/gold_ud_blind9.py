"""Ninth BLIND gold split — round 3, post-blind-8 generalization check.

Protocol (same as gold_ud_blind{,2,3,4,5,6,7,8}.py): blind-8 (commit
0b29b41) was scored ONCE at triple P/R 0.950 and its four residual
categories were fixed and pinned, burning it.  These 20 NEW sentences
were written and UD-annotated by hand AFTER those fixes landed and are
COMMITTED BEFORE the engine touches them in any way (no tokenizer, no
analyzer, nothing — the tokenizations below are hand-written).  The
first-run score is recorded as-is in BENCH.md regardless of outcome.

Register: representative web-news, fresh content lexemes.  Natural-
occurrence generalization checks on earlier burn categories with UNSEEN
class members: a fresh loan ``-î`` adjective (``mali destek``), an
unseen possessed-temporal postposition (``sırasında``), a fresh
``-IncA`` converb (``dinince``), a genitive subject over a compound-
saturated nominalization (``krizin konut satışlarını
yavaşlatacağını``), VP coordination with a post-coordinator adjective
(``ve sessiz salonlar ekledi``) and with a bare second-conjunct object
(``battaniye dağıttı``), an unseen ``X altına alındı`` frame member
(``koruma``), an unseen comparative (``modellerden daha sessiz``), an
unseen possessed-instrumental postposition (``aracılığıyla``), an
unseen negative conditional compound tense (``yenilenmezse``), an
unseen Dat-selecting predicate adjective (``elverişli``), an unlisted
title-headed flat name (``Mimar Kaya``), and a genitive + loan-î-ADJ +
possessed izafet control (``Kentin tarihi dokusu``).

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py and the earlier splits (first-clause root, title-headed flat
names, amod on the compound head, subtypes collapsed to base relations,
grammaticalized possessed TEMPORAL/INSTRUMENTAL postpositions as
ADP/case while spatial relational nouns stay NOUN with nmod host,
nominalized -mA/-DIk/-AcAk complements as ccomp hosting their own
arguments, participle relatives as acl, -IncA converbs hosting their
own subject, existential var/yok as ADJ root).
"""
from typing import List

BLIND9: List[dict] = [
    dict(
        text="Hükümet çiftçilere mali destek sağlayacak.",
        tokens=["Hükümet", "çiftçilere", "mali", "destek", "sağlayacak",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Tören sırasında yağmur başladı.",
        tokens=["Tören", "sırasında", "yağmur", "başladı", "."],
        upos=["NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[4, 1, 4, 0, 4],
        deprels=["obl", "case", "nsubj", "root", "punct"],
    ),
    dict(
        text="Fırtına dinince seferler yeniden başladı.",
        tokens=["Fırtına", "dinince", "seferler", "yeniden", "başladı",
                "."],
        upos=["NOUN", "VERB", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nsubj", "advcl", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Ekonomistler krizin konut satışlarını yavaşlatacağını"
             " savunuyor.",
        tokens=["Ekonomistler", "krizin", "konut", "satışlarını",
                "yavaşlatacağını", "savunuyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "nmod", "obj", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Kütüphane saatlerini uzattı ve sessiz salonlar ekledi.",
        tokens=["Kütüphane", "saatlerini", "uzattı", "ve", "sessiz",
                "salonlar", "ekledi", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[3, 3, 0, 7, 6, 7, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "amod", "obj", "conj",
                 "punct"],
    ),
    dict(
        text="Koşucu ulusal rekoru kırdı.",
        tokens=["Koşucu", "ulusal", "rekoru", "kırdı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Tanıklar sürücünün kırmızı ışıkta geçtiğini söyledi.",
        tokens=["Tanıklar", "sürücünün", "kırmızı", "ışıkta",
                "geçtiğini", "söyledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "amod", "obl", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Ekipler bölgede çadır kurdu ve battaniye dağıttı.",
        tokens=["Ekipler", "bölgede", "çadır", "kurdu", "ve",
                "battaniye", "dağıttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[4, 4, 4, 0, 7, 7, 4, 4],
        deprels=["nsubj", "obl", "obj", "root", "cc", "obj", "conj",
                 "punct"],
    ),
    dict(
        text="Yeni ders programı oldukça yoğun.",
        tokens=["Yeni", "ders", "programı", "oldukça", "yoğun", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["amod", "nmod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Köprü altında eski kayıklar duruyor.",
        tokens=["Köprü", "altında", "eski", "kayıklar", "duruyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Mimar Kaya eski garı müzeye dönüştürdü.",
        tokens=["Mimar", "Kaya", "eski", "garı", "müzeye",
                "dönüştürdü", "."],
        upos=["NOUN", "PROPN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 4, 6, 6, 0, 6],
        deprels=["nsubj", "flat", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Festival bu yıl neden iptal edildi?",
        tokens=["Festival", "bu", "yıl", "neden", "iptal", "edildi",
                "?"],
        upos=["NOUN", "DET", "NOUN", "ADV", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "det", "obl", "advmod", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Gençler sahneye çıkıp türkü söyledi.",
        tokens=["Gençler", "sahneye", "çıkıp", "türkü", "söyledi", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "advcl", "obj", "root", "punct"],
    ),
    dict(
        text="Tarihi çınar ağacı koruma altına alındı.",
        tokens=["Tarihi", "çınar", "ağacı", "koruma", "altına",
                "alındı", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 5, 6, 0, 6],
        deprels=["amod", "nmod", "nsubj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Elektrikli otobüsler eski modellerden daha sessiz.",
        tokens=["Elektrikli", "otobüsler", "eski", "modellerden",
                "daha", "sessiz", "."],
        upos=["ADJ", "NOUN", "ADJ", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["amod", "nsubj", "amod", "obl", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Banka müşterilerini uygulama aracılığıyla bilgilendirdi.",
        tokens=["Banka", "müşterilerini", "uygulama", "aracılığıyla",
                "bilgilendirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[5, 5, 5, 3, 0, 5],
        deprels=["nsubj", "obj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Kavşakta yeni sinyalizasyon sistemi var.",
        tokens=["Kavşakta", "yeni", "sinyalizasyon", "sistemi", "var",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["obl", "amod", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Sözleşme yenilenmezse ihale iptal edilecek.",
        tokens=["Sözleşme", "yenilenmezse", "ihale", "iptal",
                "edilecek", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nsubj", "advcl", "nsubj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Sahil kasabası aile tatiline elverişli.",
        tokens=["Sahil", "kasabası", "aile", "tatiline", "elverişli",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Kentin tarihi dokusu ziyaretçileri etkiliyor.",
        tokens=["Kentin", "tarihi", "dokusu", "ziyaretçileri",
                "etkiliyor", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nmod", "amod", "nsubj", "obj", "root", "punct"],
    ),
]
