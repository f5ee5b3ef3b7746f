"""Thirty-third BLIND gold split — round 4, restart of the consecutive
representative series after blind-32's 0.900 reset (the VERDICT r03
criterion needs three consecutive ≥0.95 first-runs; this is attempt 1
of the fresh series, frozen AFTER the post-blind-32 probe-sweep
hardening commit).

Protocol (same as gold_ud_blind{,2..32}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (the established protocol; zero out-of-lexicon words this
time); the parser was not run on any candidate sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: -DAki locative adjectives (sahildeki);
genitive-subject FutPart ccomps (barajın dolacağını); spatial
relational-noun obliques under passives (alanının yakınında); -Ip
converbs with own objects; title flat names with et-complex LVCs
(Vali Demirtaş ... ziyaret etti); değil-negated zero-copula adjective
predicates with için obliques; -IncA own-subject converbs with
geri-ADV verb particles; Inf2 ccomps with embedded izafet Acc
(çalışan sayısını artırmayı); ordinal kez frequency adjuncts; passive
clause coordination with ve; nedeniyle causal ADPs in passive
et-complexes; passive participle relatives heading için obliques
under copular oldu; genitive-possessor objects (kentin su
şebekesini); multiple obliques (Ins + Abl + Dat); -ArAk converbs
with own objects; time-NP absorption (akşam geç saatlerde); Dat-goal
frames with amod objects (çiftçilere ek destek); noun-homograph
izafet subjects with measure objects (Kar kalınlığı ... bir metreyi);
bare-Nom izafet objects of Inf2 (güneş panelleri üretmeye);
genitive-subject PastPart ccomps (rezervasyonların arttığını).

Convention notes made BEFORE scoring, where the list is silent:
ordinal + kez follows the frozen precedent (beşinci ADJ amod on kez
NOUN obl — gold_ud.py:2260, blind-15, blind-25, blind-32); adnominal
bir before a measure noun is DET+det per the conventions list's
"uniformly" clause (bir metreyi); the et-complex keeps its nominal as
compound and takes the outside object (köyleri ziyaret etti — the
gold_ud.py davet-etti precedent); yap-free iniş-style event nominals
do not appear, so the blind-32 et/yap split is not at issue.
"""
from typing import List

BLIND33: List[dict] = [
    dict(
        text="Gönüllüler sahildeki çöpleri büyük torbalara doldurdu.",
        tokens=["Gönüllüler", "sahildeki", "çöpleri", "büyük",
                "torbalara", "doldurdu", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Yetkililer barajın gelecek ay dolacağını açıkladı.",
        tokens=["Yetkililer", "barajın", "gelecek", "ay", "dolacağını",
                "açıkladı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "amod", "obl", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Kazı alanının yakınında yeni bir sergi salonu açıldı.",
        tokens=["Kazı", "alanının", "yakınında", "yeni", "bir",
                "sergi", "salonu", "açıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "DET", "NOUN", "NOUN",
              "VERB", "PUNCT"],
        heads=[2, 3, 8, 7, 7, 7, 8, 0, 8],
        deprels=["nmod", "nmod", "obl", "amod", "det", "nmod",
                 "nsubj", "root", "punct"],
    ),
    dict(
        text="Ekipler enkazı kaldırıp yolu trafiğe açtı.",
        tokens=["Ekipler", "enkazı", "kaldırıp", "yolu", "trafiğe",
                "açtı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "obj", "advcl", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Vali Demirtaş selden etkilenen köyleri ziyaret etti.",
        tokens=["Vali", "Demirtaş", "selden", "etkilenen", "köyleri",
                "ziyaret", "etti", "."],
        upos=["NOUN", "PROPN", "NOUN", "VERB", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 1, 4, 5, 7, 7, 0, 7],
        deprels=["nsubj", "flat", "obl", "acl", "obj", "compound",
                 "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Yeni tarife esnaf için uygun değil.",
        tokens=["Yeni", "tarife", "esnaf", "için", "uygun", "değil",
                "."],
        upos=["ADJ", "NOUN", "NOUN", "ADP", "ADJ", "AUX", "PUNCT"],
        heads=[2, 5, 5, 3, 0, 5, 5],
        deprels=["amod", "nsubj", "obl", "case", "root", "cop",
                 "punct"],
    ),
    dict(
        text="Yağmur dinince seyirciler tribünlere geri döndü.",
        tokens=["Yağmur", "dinince", "seyirciler", "tribünlere",
                "geri", "döndü", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 6, 6, 6, 6, 0, 6],
        deprels=["nsubj", "advcl", "nsubj", "obl", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Şirket çalışan sayısını artırmayı planlıyor.",
        tokens=["Şirket", "çalışan", "sayısını", "artırmayı",
                "planlıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Festival bu yıl beşinci kez düzenlendi.",
        tokens=["Festival", "bu", "yıl", "beşinci", "kez",
                "düzenlendi", "."],
        upos=["NOUN", "DET", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "det", "obl", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Tarihi çeşme onarıldı ve ziyarete açıldı.",
        tokens=["Tarihi", "çeşme", "onarıldı", "ve", "ziyarete",
                "açıldı", "."],
        upos=["ADJ", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 0, 6, 6, 3, 3],
        deprels=["amod", "nsubj", "root", "cc", "obl", "conj",
                 "punct"],
    ),
    dict(
        text="Sis nedeniyle feribot seferleri iptal edildi.",
        tokens=["Sis", "nedeniyle", "feribot", "seferleri", "iptal",
                "edildi", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 4, 6, 6, 0, 6],
        deprels=["obl", "case", "nmod", "nsubj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Sınava hazırlanan öğrenciler için kurslar ücretsiz oldu.",
        tokens=["Sınava", "hazırlanan", "öğrenciler", "için",
                "kurslar", "ücretsiz", "oldu", "."],
        upos=["NOUN", "VERB", "NOUN", "ADP", "NOUN", "ADJ", "VERB",
              "PUNCT"],
        heads=[2, 3, 7, 3, 7, 7, 0, 7],
        deprels=["obl", "acl", "obl", "case", "nsubj", "compound",
                 "root", "punct"],
    ),
    dict(
        text="Belediye kentin su şebekesini yeniledi.",
        tokens=["Belediye", "kentin", "su", "şebekesini", "yeniledi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Ürünler kamyonlarla depodan mağazalara taşındı.",
        tokens=["Ürünler", "kamyonlarla", "depodan", "mağazalara",
                "taşındı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Mühendisler verileri inceleyerek raporu hazırladı.",
        tokens=["Mühendisler", "verileri", "inceleyerek", "raporu",
                "hazırladı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "advcl", "obj", "root", "punct"],
    ),
    dict(
        text="Akşam geç saatlerde elektrik kesintisi yaşandı.",
        tokens=["Akşam", "geç", "saatlerde", "elektrik", "kesintisi",
                "yaşandı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 5, 6, 0, 6],
        deprels=["nmod", "amod", "obl", "nmod", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Bakanlık çiftçilere ek destek sağladı.",
        tokens=["Bakanlık", "çiftçilere", "ek", "destek", "sağladı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Kar kalınlığı yüksek kesimlerde bir metreyi aştı.",
        tokens=["Kar", "kalınlığı", "yüksek", "kesimlerde", "bir",
                "metreyi", "aştı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "DET", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 7, 4, 7, 6, 7, 0, 7],
        deprels=["nmod", "nsubj", "amod", "obl", "det", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Fabrika güneş panelleri üretmeye başladı.",
        tokens=["Fabrika", "güneş", "panelleri", "üretmeye", "başladı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Turizmciler rezervasyonların arttığını söyledi.",
        tokens=["Turizmciler", "rezervasyonların", "arttığını",
                "söyledi", "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nsubj", "ccomp", "root", "punct"],
    ),
]
