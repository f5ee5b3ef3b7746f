"""Thirty-second BLIND gold split — round 4, the CLOSER of the restarted
consecutive representative series (blind-30 and blind-31 both cleared
the gate at 0.950 first-run; a third consecutive ≥0.95 first-run here
completes the VERDICT r03 criterion).

Protocol (same as gold_ud_blind{,2..31}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (the established protocol; zero out-of-lexicon words this
time); the parser was not run on any candidate sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: sabah-erken-saatlerde time-NP absorption;
Dat-goal LVC frames (fiyatlarına indirim istedi); genitive-subject
FutPart ccomps (ocağın kapatılacağını); izafet subjects with Acc
objects; -Ip converbs with own objects; passive clause coordination
with ve; spatial çevresinde izafet obliques under passives; Inf2
ccomps with embedded izafet Acc; title flat names (Başhekim Acar);
değil-negated zero-copula predicates; nedeniyle causal ADPs inside
LVC frames (acil iniş yaptı); geri-ADV verb particles in -ArAk
converbs; -IncA own-subject converbs feeding Dat-Inf2 ccomps
(yapmaya başladı); izafet subject + object pairs; acl participles
heading için obliques; genitive-possessor objects; multiple obliques
(Ins + Abl + Dat); frequency kez adjuncts with ordinal amods; noun
homograph subjects (Dolu yağışı); noun reduplication adverbials
(dakika dakika).

Convention notes made BEFORE scoring, where the list is silent:
reduplicated bare nouns in manner function are ADV with the second
token compound on the first (dakika dakika — the uzun-uzun precedent);
`değil` after a zero-copula adjective predicate is AUX cop on that
predicate (the blind-26 precedent); light-verb yap/ver keep their
nominal as obj (iniş yaptı, zarar verdi — the UD-BOUN convention
already frozen in the list).
"""
from typing import List

BLIND32: List[dict] = [
    dict(
        text="Balıkçılar limandan sabah erken saatlerde ayrıldı.",
        tokens=["Balıkçılar", "limandan", "sabah", "erken", "saatlerde",
                "ayrıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 5, 5, 6, 0, 6],
        deprels=["nsubj", "obl", "nmod", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Fırıncılar un fiyatlarına indirim istedi.",
        tokens=["Fırıncılar", "un", "fiyatlarına", "indirim", "istedi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Madenciler ocağın kapatılacağını öğrendi.",
        tokens=["Madenciler", "ocağın", "kapatılacağını", "öğrendi",
                "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nsubj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Tiyatro topluluğu yeni oyununu başkentte sahneledi.",
        tokens=["Tiyatro", "topluluğu", "yeni", "oyununu", "başkentte",
                "sahneledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "amod", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="İtfaiye yangını söndürüp bölgeyi güvenceye aldı.",
        tokens=["İtfaiye", "yangını", "söndürüp", "bölgeyi",
                "güvenceye", "aldı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "obj", "advcl", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Sempozyumda bildiriler sunuldu ve ödüller dağıtıldı.",
        tokens=["Sempozyumda", "bildiriler", "sunuldu", "ve", "ödüller",
                "dağıtıldı", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 6, 6, 3, 3],
        deprels=["obl", "nsubj", "root", "cc", "nsubj", "conj",
                 "punct"],
    ),
    dict(
        text="Ada çevresinde tekne turları düzenleniyor.",
        tokens=["Ada", "çevresinde", "tekne", "turları", "düzenleniyor",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Yönetim bina cephesini boyamayı kararlaştırdı.",
        tokens=["Yönetim", "bina", "cephesini", "boyamayı",
                "kararlaştırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Başhekim Acar randevu sistemini savundu.",
        tokens=["Başhekim", "Acar", "randevu", "sistemini", "savundu",
                "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 4, 5, 0, 5],
        deprels=["nsubj", "flat", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Yeni sezonun bilet fiyatları henüz belli değil.",
        tokens=["Yeni", "sezonun", "bilet", "fiyatları", "henüz",
                "belli", "değil", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "ADV", "ADJ", "AUX",
              "PUNCT"],
        heads=[2, 4, 4, 6, 6, 0, 6, 6],
        deprels=["amod", "nmod", "nmod", "nsubj", "advmod", "root",
                 "cop", "punct"],
    ),
    dict(
        text="Kargo uçağı teknik arıza nedeniyle acil iniş yaptı.",
        tokens=["Kargo", "uçağı", "teknik", "arıza", "nedeniyle",
                "acil", "iniş", "yaptı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "ADP", "ADJ", "NOUN",
              "VERB", "PUNCT"],
        heads=[2, 8, 4, 8, 4, 7, 8, 0, 8],
        deprels=["nmod", "nsubj", "amod", "obl", "case", "amod", "obj",
                 "root", "punct"],
    ),
    dict(
        text="Firma ambalajları geri dönüştürerek atıkları azalttı.",
        tokens=["Firma", "ambalajları", "geri", "dönüştürerek",
                "atıkları", "azalttı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[6, 4, 4, 6, 6, 0, 6],
        deprels=["nsubj", "obj", "advmod", "advcl", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Sınav sonuçları açıklanınca adaylar tercih yapmaya başladı.",
        tokens=["Sınav", "sonuçları", "açıklanınca", "adaylar",
                "tercih", "yapmaya", "başladı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "VERB",
              "PUNCT"],
        heads=[2, 3, 7, 7, 6, 7, 0, 7],
        deprels=["nmod", "nsubj", "advcl", "nsubj", "obj", "ccomp",
                 "root", "punct"],
    ),
    dict(
        text="Sigorta şirketi hasar dosyalarını hızla sonuçlandırdı.",
        tokens=["Sigorta", "şirketi", "hasar", "dosyalarını", "hızla",
                "sonuçlandırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "obj", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Ormanda çıkan yangın için soruşturma başlatıldı.",
        tokens=["Ormanda", "çıkan", "yangın", "için", "soruşturma",
                "başlatıldı", "."],
        upos=["NOUN", "VERB", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 3, 6, 0, 6],
        deprels=["obl", "acl", "obl", "case", "nsubj", "root", "punct"],
    ),
    dict(
        text="Yayınevi genç şairlerin şiirlerini kitaplaştırdı.",
        tokens=["Yayınevi", "genç", "şairlerin", "şiirlerini",
                "kitaplaştırdı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Turistler teleferikle zirveden vadiye indi.",
        tokens=["Turistler", "teleferikle", "zirveden", "vadiye",
                "indi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Komisyon bu ay dördüncü kez toplandı.",
        tokens=["Komisyon", "bu", "ay", "dördüncü", "kez", "toplandı",
                "."],
        upos=["NOUN", "DET", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "det", "obl", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Dolu yağışı seralara zarar verdi.",
        tokens=["Dolu", "yağışı", "seralara", "zarar", "verdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Muhabirler açılış törenini dakika dakika aktardı.",
        tokens=["Muhabirler", "açılış", "törenini", "dakika", "dakika",
                "aktardı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "ADV", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 4, 0, 6],
        deprels=["nsubj", "nmod", "obj", "advmod", "compound", "root",
                 "punct"],
    ),
]
