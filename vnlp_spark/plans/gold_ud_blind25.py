"""Twenty-fifth BLIND gold split — round 4, restart of the consecutive
gate series after blind-24 missed first-run (VERDICT r03 item #3: three
consecutive fresh splits scoring >=0.95 first-run, at least one
deliberately hard; the hard slot in this restarted series is planned
for blind-26).

Protocol (same as gold_ud_blind{,2..24}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: REPRESENTATIVE web-news prose with fresh content vocabulary
across burned construction categories: compound-head amod with adnominal
bir; NUM-derived adjectives (bin yillik); a title-headed flat name with a
locative LVC (incelemelerde bulunmak); -AcAk ccomp with genitive subject
and a bare time-compound obl; tarafindan agent frame with the
derivational-adjective homograph unlu in attributive position; -An
participle relative with its own oblique; -IncA converb with its own
subject; finite ve coordination with an ADP icin oblique in the second
conjunct; emphatic da on a focused subject with a bare-Nom LVC; a
zero-copula ADJ root over an izafet subject; existential var with a
loan-adjective attributive; spatial relational noun arasinda (NOUN obl
with nmod host); grammaticalized kapsaminda over a passive with a
bare-Nom passive subject; Acc -mA ccomp; nominal hem..hem with zero
copula (first conjunct root); Ins + birlikte (ADV advmod) with an et-
LVC; sentence-initial Ancak with a copular ol- ccomp; ordinal frequency
obl (ikinci kez); PCDat gore; -ArAk converb whose clause holds its own
Acc object.

Convention notes made BEFORE scoring, where the list is silent:
bare-Nom nominals of et-/ol- light verbs are compound (ziyaret etti);
bare-Nom nominals of OTHER light verbs (al-, ver-) are obj, per the
blind-4 precedent reaffirmed in blind-24's drift correction (sahne
aldi, destek verdi); case-marked LVC nominals are obl (incelemelerde
bulunacak).  Ordinals (ikinci) are ADJ amod on their kez host.
"""
from typing import List

BLIND25: List[dict] = [
    dict(
        text="Şirket geçen ay çalışanlarına yeni bir eğitim programı başlattı.",
        tokens=["Şirket", "geçen", "ay", "çalışanlarına", "yeni", "bir",
                "eğitim", "programı", "başlattı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "ADJ", "DET", "NOUN",
              "NOUN", "VERB", "PUNCT"],
        heads=[9, 3, 9, 9, 8, 8, 8, 9, 0, 9],
        deprels=["nsubj", "amod", "obl", "obl", "amod", "det", "nmod",
                 "obj", "root", "punct"],
    ),
    dict(
        text="Araştırmacılar kazıda bin yıllık bir mezar buldu.",
        tokens=["Araştırmacılar", "kazıda", "bin", "yıllık", "bir",
                "mezar", "buldu", "."],
        upos=["NOUN", "NOUN", "NUM", "ADJ", "DET", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 7, 4, 6, 6, 7, 0, 7],
        deprels=["nsubj", "obl", "nummod", "amod", "det", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Vali Demir yarın kentte incelemelerde bulunacak.",
        tokens=["Vali", "Demir", "yarın", "kentte", "incelemelerde",
                "bulunacak", "."],
        upos=["NOUN", "PROPN", "ADV", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 6, 6, 0, 6],
        deprels=["nsubj", "flat", "advmod", "obl", "obl", "root",
                 "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Yetkililer köprünün hafta sonu kapanacağını duyurdu.",
        tokens=["Yetkililer", "köprünün", "hafta", "sonu",
                "kapanacağını", "duyurdu", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "nmod", "obl", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Yeni terminal binası ünlü bir mimar tarafından tasarlandı.",
        tokens=["Yeni", "terminal", "binası", "ünlü", "bir", "mimar",
                "tarafından", "tasarlandı", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADJ", "DET", "NOUN", "NOUN",
              "VERB", "PUNCT"],
        heads=[3, 3, 8, 6, 6, 7, 8, 0, 8],
        deprels=["amod", "nmod", "nsubj", "amod", "det", "nmod", "obl",
                 "root", "punct"],
    ),
    dict(
        text="Sahilde yürüyen turistler fırtına uyarısını duymadı.",
        tokens=["Sahilde", "yürüyen", "turistler", "fırtına",
                "uyarısını", "duymadı", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 5, 6, 0, 6],
        deprels=["obl", "acl", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Fiyatlar artınca vatandaşlar yerli ürünlere yöneldi.",
        tokens=["Fiyatlar", "artınca", "vatandaşlar", "yerli",
                "ürünlere", "yöneldi", "."],
        upos=["NOUN", "VERB", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nsubj", "advcl", "nsubj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Belediye parkı yeniledi ve çocuklar için oyun alanı kurdu.",
        tokens=["Belediye", "parkı", "yeniledi", "ve", "çocuklar",
                "için", "oyun", "alanı", "kurdu", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "ADP", "NOUN",
              "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 9, 9, 5, 8, 9, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "obl", "case", "nmod",
                 "obj", "conj", "punct"],
    ),
    dict(
        text="Festivalde yerel sanatçılar da sahne aldı.",
        tokens=["Festivalde", "yerel", "sanatçılar", "da", "sahne",
                "aldı", "."],
        upos=["NOUN", "ADJ", "NOUN", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["obl", "amod", "nsubj", "advmod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Kentin yeni metro hattı oldukça uzun.",
        tokens=["Kentin", "yeni", "metro", "hattı", "oldukça", "uzun",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[4, 4, 4, 6, 6, 0, 6],
        deprels=["nmod", "amod", "nmod", "nsubj", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Müzenin bahçesinde tarihi bir çeşme var.",
        tokens=["Müzenin", "bahçesinde", "tarihi", "bir", "çeşme",
                "var", "."],
        upos=["NOUN", "NOUN", "ADJ", "DET", "NOUN", "ADJ", "PUNCT"],
        heads=[2, 6, 5, 5, 6, 0, 6],
        deprels=["nmod", "obl", "amod", "det", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="İki mahalle arasında yeni bir yol açıldı.",
        tokens=["İki", "mahalle", "arasında", "yeni", "bir", "yol",
                "açıldı", "."],
        upos=["NUM", "NOUN", "NOUN", "ADJ", "DET", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 3, 7, 6, 6, 7, 0, 7],
        deprels=["nummod", "nmod", "obl", "amod", "det", "nsubj",
                 "root", "punct"],
    ),
    dict(
        text="Proje kapsamında okullara tablet dağıtıldı.",
        tokens=["Proje", "kapsamında", "okullara", "tablet",
                "dağıtıldı", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["obl", "case", "obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Yönetim bilet fiyatlarını düşürmeyi değerlendiriyor.",
        tokens=["Yönetim", "bilet", "fiyatlarını", "düşürmeyi",
                "değerlendiriyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Yeni uygulama hem hızlı hem güvenli.",
        tokens=["Yeni", "uygulama", "hem", "hızlı", "hem", "güvenli",
                "."],
        upos=["ADJ", "NOUN", "CCONJ", "ADJ", "CCONJ", "ADJ", "PUNCT"],
        heads=[2, 4, 4, 0, 6, 4, 4],
        deprels=["amod", "nsubj", "cc", "root", "cc", "conj", "punct"],
    ),
    dict(
        text="Bakan mühendislerle birlikte fabrikayı ziyaret etti.",
        tokens=["Bakan", "mühendislerle", "birlikte", "fabrikayı",
                "ziyaret", "etti", "."],
        upos=["NOUN", "NOUN", "ADV", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 6, 6, 6, 0, 6],
        deprels=["nsubj", "obl", "advmod", "obj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Ancak uzmanlar bu yöntemin riskli olduğunu savunuyor.",
        tokens=["Ancak", "uzmanlar", "bu", "yöntemin", "riskli",
                "olduğunu", "savunuyor", "."],
        upos=["CCONJ", "NOUN", "DET", "NOUN", "ADJ", "VERB", "VERB",
              "PUNCT"],
        heads=[7, 7, 4, 6, 6, 7, 0, 7],
        deprels=["cc", "nsubj", "det", "nsubj", "compound", "ccomp",
                 "root", "punct"],
    ),
    dict(
        text="Dernek bu yıl ikinci kez yardım kampanyası düzenledi.",
        tokens=["Dernek", "bu", "yıl", "ikinci", "kez", "yardım",
                "kampanyası", "düzenledi", "."],
        upos=["NOUN", "DET", "NOUN", "ADJ", "NOUN", "NOUN", "NOUN",
              "VERB", "PUNCT"],
        heads=[8, 3, 8, 5, 8, 7, 8, 0, 8],
        deprels=["nsubj", "det", "obl", "amod", "obl", "nmod", "obj",
                 "root", "punct"],
    ),
    dict(
        text="Şirketin geliri geçen yıla göre arttı.",
        tokens=["Şirketin", "geliri", "geçen", "yıla", "göre", "arttı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 4, 0, 6],
        deprels=["nmod", "nsubj", "amod", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Gönüllüler sahili temizleyerek kampanyaya destek verdi.",
        tokens=["Gönüllüler", "sahili", "temizleyerek", "kampanyaya",
                "destek", "verdi", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "obj", "advcl", "obl", "obj", "root",
                 "punct"],
    ),
]
