"""Seventh BLIND gold split — round 3 continuation, generalization probe.

Protocol (same as gold_ud_blind{,2,3,4,5,6}.py): blind-6 (commit 9df6742)
was scored ONCE at triple P/R 0.900 and its four residual categories were
fixed and pinned (commit f564aaf), burning it.  These 20 NEW sentences
were written and UD-annotated by hand AFTER those fixes landed and are
COMMITTED BEFORE the engine touches them in any way (no tokenizer, no
analyzer, nothing — the tokenizations below are hand-written).  The
first-run score is recorded as-is in BENCH.md regardless of outcome.

Register: representative web-news, entirely fresh content lexemes.  The
split deliberately includes generalization checks on category fixes from
earlier burns, with UNSEEN class members: an unlisted possessed
postposition (`çerçevesinde` — kapsamında/ardından/nedeniyle are listed,
this one is not), an `-IncA` converb carrying its own subject, a
subject-gap `-An` relative before a case-marked head, a zero-copula
bare-adjective predicate, `-mAyA başla` nominalized complements, a
reported `-AcAk+Acc` complement with a genitive subject, clause
coordination with `fakat`, a title+surname flat subject, and bare-noun
indefinite objects.

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py (first-clause root, title-headed flat names, amod on the
compound head, subtypes collapsed to base relations, grammaticalized
possessed postpositions as ADP/case, nominalized -mA/-DIk/-AcAk
complements as ccomp hosting their own arguments).
"""
from typing import List

BLIND7: List[dict] = [
    dict(
        text="Gazeteciler basın toplantısında soru sordu.",
        tokens=["Gazeteciler", "basın", "toplantısında", "soru", "sordu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Bakanlık yeni yönetmeliği resmi gazetede yayımladı.",
        tokens=["Bakanlık", "yeni", "yönetmeliği", "resmi", "gazetede",
                "yayımladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Araştırmacılar denizdeki kirliliği ölçmek için örnekler"
             " topladı.",
        tokens=["Araştırmacılar", "denizdeki", "kirliliği", "ölçmek",
                "için", "örnekler", "topladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "ADP", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 3, 4, 7, 4, 7, 0, 7],
        deprels=["nsubj", "amod", "obj", "advcl", "case", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Şarkıcı konserini sağlık sorunları nedeniyle erteledi.",
        tokens=["Şarkıcı", "konserini", "sağlık", "sorunları",
                "nedeniyle", "erteledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[6, 6, 4, 6, 4, 0, 6],
        deprels=["nsubj", "obj", "nmod", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Genç yüzücü milli takıma seçildi.",
        tokens=["Genç", "yüzücü", "milli", "takıma", "seçildi", "."],
        upos=["ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Profesör Kaya öğrencilerine sınav tarihini bildirdi.",
        tokens=["Profesör", "Kaya", "öğrencilerine", "sınav", "tarihini",
                "bildirdi", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["nsubj", "flat", "obl", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Fabrikada çalışan işçiler maaş artışı istedi.",
        tokens=["Fabrikada", "çalışan", "işçiler", "maaş", "artışı",
                "istedi", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 5, 6, 0, 6],
        deprels=["obl", "acl", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Yeni istasyon engelli yolcular için oldukça kullanışlı.",
        tokens=["Yeni", "istasyon", "engelli", "yolcular", "için",
                "oldukça", "kullanışlı", "."],
        upos=["ADJ", "NOUN", "ADJ", "NOUN", "ADP", "ADV", "ADJ", "PUNCT"],
        heads=[2, 7, 4, 7, 4, 7, 0, 7],
        deprels=["amod", "nsubj", "amod", "obl", "case", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Yağmur öğleden sonra durdu fakat rüzgar şiddetini artırdı.",
        tokens=["Yağmur", "öğleden", "sonra", "durdu", "fakat", "rüzgar",
                "şiddetini", "artırdı", "."],
        upos=["NOUN", "NOUN", "ADP", "VERB", "CCONJ", "NOUN", "NOUN",
              "VERB", "PUNCT"],
        heads=[4, 4, 2, 0, 8, 8, 8, 4, 4],
        deprels=["nsubj", "obl", "case", "root", "cc", "nsubj", "obj",
                 "conj", "punct"],
    ),
    dict(
        text="Görevliler parktaki ağaçları budamaya başladı.",
        tokens=["Görevliler", "parktaki", "ağaçları", "budamaya",
                "başladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Kaza sonrasında yol iki saat trafiğe kapatıldı.",
        tokens=["Kaza", "sonrasında", "yol", "iki", "saat", "trafiğe",
                "kapatıldı", "."],
        upos=["NOUN", "ADP", "NOUN", "NUM", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 1, 7, 5, 7, 7, 0, 7],
        deprels=["obl", "case", "nsubj", "nummod", "obl", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Ekonomistler enflasyonun gelecek yıl düşeceğini öngörüyor.",
        tokens=["Ekonomistler", "enflasyonun", "gelecek", "yıl",
                "düşeceğini", "öngörüyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "amod", "obl", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Turizm gelirleri geçen yıla göre hızla arttı.",
        tokens=["Turizm", "gelirleri", "geçen", "yıla", "göre", "hızla",
                "arttı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "ADP", "ADV", "VERB",
              "PUNCT"],
        heads=[2, 7, 4, 7, 4, 7, 0, 7],
        deprels=["nmod", "nsubj", "amod", "obl", "case", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Savcılık olayla ilgili soruşturma başlattı.",
        tokens=["Savcılık", "olayla", "ilgili", "soruşturma", "başlattı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Dağcılar zirveye ulaştıktan sonra kamp kurdu.",
        tokens=["Dağcılar", "zirveye", "ulaştıktan", "sonra", "kamp",
                "kurdu", "."],
        upos=["NOUN", "NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "case", "obj", "root", "punct"],
    ),
    dict(
        text="Hastane yönetimi modern cihazların alımını onayladı.",
        tokens=["Hastane", "yönetimi", "modern", "cihazların", "alımını",
                "onayladı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "amod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Sel suları köprüyü yıkınca ulaşım aksadı.",
        tokens=["Sel", "suları", "köprüyü", "yıkınca", "ulaşım", "aksadı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "advcl", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Firma Almanya'daki tesisinde üretimi azalttı.",
        tokens=["Firma", "Almanya'daki", "tesisinde", "üretimi",
                "azalttı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Yaşlı kadın kaybolan kedisini mahalle sakinleriyle aradı.",
        tokens=["Yaşlı", "kadın", "kaybolan", "kedisini", "mahalle",
                "sakinleriyle", "aradı", "."],
        upos=["ADJ", "NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 7, 4, 7, 6, 7, 0, 7],
        deprels=["amod", "nsubj", "acl", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Festival çerçevesinde şehirde çeşitli etkinlikler"
             " düzenlenecek.",
        tokens=["Festival", "çerçevesinde", "şehirde", "çeşitli",
                "etkinlikler", "düzenlenecek", "."],
        upos=["NOUN", "ADP", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["obl", "case", "obl", "amod", "nsubj", "root", "punct"],
    ),
]
