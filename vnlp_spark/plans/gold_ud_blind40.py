"""Fortieth BLIND gold split — round 4, attempt 2 of the restarted
consecutive representative series (blind-39 opened it at 1.000
first-run; two more consecutive ≥0.95 first-runs complete the VERDICT
r03 criterion).

Protocol (same as gold_ud_blind{,2..39}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (zero out-of-lexicon words); the parser was not run on
any candidate sentence.

Register: REPRESENTATIVE web-news prose, everyday vocabulary in fresh
combinations across burned categories: month obliques with Acc
objects; kaçak-class attributive homographs (kaçak yapıları); Dat-goal
reflexives (destek programına başvurdu); Abl-complement LVCs (özür
diledi); double-Acc/Dat frames (iki ilçeyi birbirine bağladı); Loc
venue obliques; zero-copula kapalı with time izafet (öğle arasında);
için-bounded uyarı-yap LVCs; Gen-subject Inf2 ccomps (güzergahının
uzatılmasını); deputy-title flats (Vali yardımcısı Demir); ardından
grammaticalized ADPs; degree-adjective subjects (Yüksek enflasyon);
oybirliği Ins obliques; izafet objects (göl seviyesini); Ins
instrument obliques (bayraklarla donattı); ilgili-ADJ frames (olayla
ilgili soruşturma); Dat + Acc dit-transitives (velilere karne gününü
hatırlattı); Dat zam-gel frames (biletlerine zam geldi); Ins-source
middles (güneş enerjisiyle ısınıyor); Dat + bare-object ver-LVCs
(oyunculara şans verdi).

Convention notes made BEFORE scoring, where the list is silent:
'özür diledi' and 'şans verdi' keep the LVC nominal as obj (frozen
light-verb convention); 'olayla ilgili' is the Ins-selected ilgili-ADJ
frame with the oblique on the adjective (the conventions list's
case-selected complement clause); 'zam geldi' reads zam as the
subject of intransitive gel- with the Dat as oblique.
"""
from typing import List

BLIND40: List[dict] = [
    dict(
        text="Bakanlık burs başvurularını ekimde alacak.",
        tokens=["Bakanlık", "burs", "başvurularını", "ekimde",
                "alacak", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Zabıta ekipleri kaçak yapıları mühürledi.",
        tokens=["Zabıta", "ekipleri", "kaçak", "yapıları", "mühürledi",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Genç girişimciler destek programına başvurdu.",
        tokens=["Genç", "girişimciler", "destek", "programına",
                "başvurdu", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Kulüp taraftarlarından özür diledi.",
        tokens=["Kulüp", "taraftarlarından", "özür", "diledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Yeni köprü iki ilçeyi birbirine bağladı.",
        tokens=["Yeni", "köprü", "iki", "ilçeyi", "birbirine",
                "bağladı", "."],
        upos=["ADJ", "NOUN", "NUM", "NOUN", "PRON", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["amod", "nsubj", "nummod", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Aşçılar yöresel yemekleri festivalde tanıttı.",
        tokens=["Aşçılar", "yöresel", "yemekleri", "festivalde",
                "tanıttı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Banka şubeleri öğle arasında kapalı.",
        tokens=["Banka", "şubeleri", "öğle", "arasında", "kapalı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Meteoroloji hafta sonu için fırtına uyarısı yaptı.",
        tokens=["Meteoroloji", "hafta", "sonu", "için", "fırtına",
                "uyarısı", "yaptı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 3, 6, 7, 0, 7],
        deprels=["nsubj", "nmod", "obl", "case", "nmod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Çalışanlar servis güzergahının uzatılmasını talep etti.",
        tokens=["Çalışanlar", "servis", "güzergahının", "uzatılmasını",
                "talep", "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 4, 6, 6, 0, 6],
        deprels=["nsubj", "nmod", "nsubj", "ccomp", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Vali yardımcısı Demir kriz masasını yönetti.",
        tokens=["Vali", "yardımcısı", "Demir", "kriz", "masasını",
                "yönetti", "."],
        upos=["NOUN", "NOUN", "PROPN", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 6, 2, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "flat", "nmod", "obj", "root",
                 "punct"],
        ner=["O", "O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Opera binası restorasyonun ardından açıldı.",
        tokens=["Opera", "binası", "restorasyonun", "ardından",
                "açıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 5, 5, 3, 0, 5],
        deprels=["nmod", "nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Yüksek enflasyon alım gücünü azalttı.",
        tokens=["Yüksek", "enflasyon", "alım", "gücünü", "azalttı",
                "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Komisyon raporu oybirliğiyle kabul etti.",
        tokens=["Komisyon", "raporu", "oybirliğiyle", "kabul", "etti",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "compound", "root", "punct"],
    ),
    dict(
        text="Kuraklık göl seviyesini düşürdü.",
        tokens=["Kuraklık", "göl", "seviyesini", "düşürdü", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Organizasyon ekibi salonu bayraklarla donattı.",
        tokens=["Organizasyon", "ekibi", "salonu", "bayraklarla",
                "donattı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Savcılık olayla ilgili soruşturma başlattı.",
        tokens=["Savcılık", "olayla", "ilgili", "soruşturma",
                "başlattı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Öğretmen velilere karne gününü hatırlattı.",
        tokens=["Öğretmen", "velilere", "karne", "gününü",
                "hatırlattı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Şehirlerarası otobüs biletlerine zam geldi.",
        tokens=["Şehirlerarası", "otobüs", "biletlerine", "zam",
                "geldi", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["amod", "nmod", "obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Tesis güneş enerjisiyle ısınıyor.",
        tokens=["Tesis", "güneş", "enerjisiyle", "ısınıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Antrenör genç oyunculara şans verdi.",
        tokens=["Antrenör", "genç", "oyunculara", "şans", "verdi",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obl", "obj", "root", "punct"],
    ),
]
