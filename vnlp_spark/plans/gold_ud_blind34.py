"""Thirty-fourth BLIND gold split — round 4, attempt 2 of the restarted
consecutive representative series (blind-33 opened it at a perfect
1.000 first-run; two more consecutive ≥0.95 first-runs complete the
VERDICT r03 criterion).

Protocol (same as gold_ud_blind{,2..33}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (the established protocol; zero out-of-lexicon words this
time); the parser was not run on any candidate sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: nedeniyle causal ADPs with -DAki izafet
subjects (göldeki balık sayısı); existential var/yok ADJ roots with
place obliques; tarafından agentive passives (ünlü bir mimar
tarafından); -mAdAn converbs with own objects; emphatic de/da on a
focused oblique (ilçede de); -DIktAn sonra advcl+case; zero-copula
comparatives (eskisinden daha geniş); hem...hem correlative Dat
conjuncts under a ver-LVC; bare-Nom compound objects (kelebek türü
keşfetti); Gen-Loc time izafet (maçın son dakikasında) with
penaltı-verdi LVC; Dat-complement karar-verdi LVC (the frozen
light-verb obj convention); yok existential with amod-on-compound
subjects (sessiz çalışma salonu); -DAki subjects under double
passives (veteriner kontrolünden geçirildi); passive ve-coordination
with Ins obliques; genitive-subject PastPart ccomps (salgının
yavaşladığını); three-token title flats (Profesör Elif Kaya);
-AcAk participle relatives under passives (Yıkılacak binalar);
Her-quantified subjects; yüzünden causal ADPs with amod-on-compound
hosts (kötü hava koşulları yüzünden); -IncA own-subject converbs
(güneş açınca).

Convention notes made BEFORE scoring, where the list is silent:
ver-class light verbs keep their nominal as obj (hizmet veriyor,
penaltı verdi, karar verdi — the frozen gold_ud.py tahliyesine-karar
precedent), with the Dat complement as obl; three-token flats chain
BOTH name tokens to the title head (Mühendis Cem Uzun precedent,
blind-16); the agentive tarafından is NOUN obl with the agent as
nmod (conventions list); hem..hem conjuncts follow the frozen
first-conjunct chain (hem yolları hem parkları precedent).
"""
from typing import List

BLIND34: List[dict] = [
    dict(
        text="Kaçak avlanma nedeniyle göldeki balık sayısı azaldı.",
        tokens=["Kaçak", "avlanma", "nedeniyle", "göldeki", "balık",
                "sayısı", "azaldı", "."],
        upos=["ADJ", "NOUN", "ADP", "ADJ", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 7, 2, 6, 6, 7, 0, 7],
        deprels=["amod", "obl", "case", "amod", "nmod", "nsubj",
                 "root", "punct"],
    ),
    dict(
        text="Kasabada eski bir değirmen var.",
        tokens=["Kasabada", "eski", "bir", "değirmen", "var", "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "ADJ", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["obl", "amod", "det", "nsubj", "root", "punct"],
    ),
    dict(
        text="Köprü ünlü bir mimar tarafından tasarlandı.",
        tokens=["Köprü", "ünlü", "bir", "mimar", "tarafından",
                "tasarlandı", "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 4, 4, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "det", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Sürücü belgelerini göstermeden kapıdan geçti.",
        tokens=["Sürücü", "belgelerini", "göstermeden", "kapıdan",
                "geçti", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "advcl", "obl", "root", "punct"],
    ),
    dict(
        text="Komşu ilçede de elektrik hatları güçlendirildi.",
        tokens=["Komşu", "ilçede", "de", "elektrik", "hatları",
                "güçlendirildi", "."],
        upos=["ADJ", "NOUN", "CCONJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 2, 5, 6, 0, 6],
        deprels=["amod", "obl", "advmod", "nmod", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Yarış bittikten sonra sporcular madalyalarını aldı.",
        tokens=["Yarış", "bittikten", "sonra", "sporcular",
                "madalyalarını", "aldı", "."],
        upos=["NOUN", "VERB", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 2, 6, 6, 0, 6],
        deprels=["nsubj", "advcl", "case", "nsubj", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Modern terminal eskisinden daha geniş.",
        tokens=["Modern", "terminal", "eskisinden", "daha", "geniş",
                "."],
        upos=["ADJ", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Kafeterya hem öğrencilere hem öğretmenlere hizmet veriyor.",
        tokens=["Kafeterya", "hem", "öğrencilere", "hem",
                "öğretmenlere", "hizmet", "veriyor", "."],
        upos=["NOUN", "CCONJ", "NOUN", "CCONJ", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 5, 3, 7, 0, 7],
        deprels=["nsubj", "cc", "obl", "cc", "conj", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Araştırmacılar mağarada nadir bir kelebek türü keşfetti.",
        tokens=["Araştırmacılar", "mağarada", "nadir", "bir",
                "kelebek", "türü", "keşfetti", "."],
        upos=["NOUN", "NOUN", "ADJ", "DET", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 7, 6, 6, 6, 7, 0, 7],
        deprels=["nsubj", "obl", "amod", "det", "nmod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Hakem maçın son dakikasında penaltı verdi.",
        tokens=["Hakem", "maçın", "son", "dakikasında", "penaltı",
                "verdi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 4, 4, 6, 6, 0, 6],
        deprels=["nsubj", "nmod", "amod", "obl", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Kurul eski binanın yıkımına karar verdi.",
        tokens=["Kurul", "eski", "binanın", "yıkımına", "karar",
                "verdi", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 4, 6, 6, 0, 6],
        deprels=["nsubj", "amod", "nmod", "obl", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Kütüphanenin üst katında sessiz çalışma salonu yok.",
        tokens=["Kütüphanenin", "üst", "katında", "sessiz", "çalışma",
                "salonu", "yok", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "NOUN", "ADJ",
              "PUNCT"],
        heads=[3, 3, 7, 6, 6, 7, 0, 7],
        deprels=["nmod", "amod", "obl", "amod", "nmod", "nsubj",
                 "root", "punct"],
    ),
    dict(
        text="Çiftlikteki hayvanlar veteriner kontrolünden geçirildi.",
        tokens=["Çiftlikteki", "hayvanlar", "veteriner",
                "kontrolünden", "geçirildi", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Cadde sabah saatlerinde yıkandı ve çiçeklerle süslendi.",
        tokens=["Cadde", "sabah", "saatlerinde", "yıkandı", "ve",
                "çiçeklerle", "süslendi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[4, 3, 4, 0, 7, 7, 4, 4],
        deprels=["nsubj", "nmod", "obl", "root", "cc", "obl", "conj",
                 "punct"],
    ),
    dict(
        text="Uzmanlar salgının yavaşladığını belirtti.",
        tokens=["Uzmanlar", "salgının", "yavaşladığını", "belirtti",
                "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nsubj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Profesör Elif Kaya konferansta iklim değişikliğini anlattı.",
        tokens=["Profesör", "Elif", "Kaya", "konferansta", "iklim",
                "değişikliğini", "anlattı", "."],
        upos=["NOUN", "PROPN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 1, 1, 7, 6, 7, 0, 7],
        deprels=["nsubj", "flat", "flat", "obl", "nmod", "obj",
                 "root", "punct"],
        ner=["O", "PER", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Yıkılacak binalar önceden boşaltıldı.",
        tokens=["Yıkılacak", "binalar", "önceden", "boşaltıldı", "."],
        upos=["VERB", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["acl", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Her katılımcı anket formunu imzaladı.",
        tokens=["Her", "katılımcı", "anket", "formunu", "imzaladı",
                "."],
        upos=["DET", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["det", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Organizatörler etkinliği kötü hava koşulları yüzünden erteledi.",
        tokens=["Organizatörler", "etkinliği", "kötü", "hava",
                "koşulları", "yüzünden", "erteledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "ADP", "VERB",
              "PUNCT"],
        heads=[7, 7, 5, 5, 7, 5, 0, 7],
        deprels=["nsubj", "obj", "amod", "nmod", "obl", "case",
                 "root", "punct"],
    ),
    dict(
        text="Turistler güneş açınca plaja indi.",
        tokens=["Turistler", "güneş", "açınca", "plaja", "indi", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nsubj", "advcl", "obl", "root", "punct"],
    ),
]
