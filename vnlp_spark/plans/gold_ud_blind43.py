"""Forty-third BLIND gold split — round 4, second extension probe after
the closed gate series (blind-42 scored 0.900 first-run; a ≥0.95 here
lifts the rolling-last-five aggregate above its exact 0.950).

Protocol (same as gold_ud_blind{,2..42}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (zero out-of-lexicon words); the parser was not run on
any candidate sentence.

Register: REPRESENTATIVE web-news prose, everyday vocabulary in fresh
combinations across burned categories: izafet subjects before ambiguous
Acc objects (Nakliye firması EŞYALARI yerleştirdi; Çiftlik sahibi
AHIRI genişletti); fossil -evi subjects with Dat-izafet obliques
(Aşevi ihtiyaç sahiplerine); genitive chains with ordinal amods (maçın
İKİNCİ yarısını); overt -lArInI objects (bagajlarını bekledi);
Gen-possessor objects under kadar ADPs (masanın ayaklarını akşama
kadar); bare-time + erken adverb frames (sabah erken suladı);
ambiguous plurals before listed transitives (gülleri suladı,
siparişleri götürdü) including one deliberate INVENTORY PROBE with a
verb likely unlisted (etleri SAKLIYOR); material-noun nmods (taş
fırında); spatial-frame obliques (yağmur altında tamamladı); karşı
temporal ADPs (sabaha karşı söndürdü); possessed-Acc izafet objects
with left subjects (sınav sonuçlarını panoda; mahalle sakinlerini).

Convention notes made BEFORE scoring, where the list is silent:
'sabah erken suladı' reads sabah as the bare time oblique and erken
as advmod on the verb; 'son anda' is amod + oblique (the burned son
anda class); ordinal 'ikinci' is ADJ amod.
"""
from typing import List

BLIND43: List[dict] = [
    dict(
        text="Nakliye firması eşyaları yeni depoya yerleştirdi.",
        tokens=["Nakliye", "firması", "eşyaları", "yeni", "depoya",
                "yerleştirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Aşevi ihtiyaç sahiplerine sıcak yemek dağıtıyor.",
        tokens=["Aşevi", "ihtiyaç", "sahiplerine", "sıcak", "yemek",
                "dağıtıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obl", "amod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Hakem maçın ikinci yarısını uzattı.",
        tokens=["Hakem", "maçın", "ikinci", "yarısını", "uzattı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Çiftlik sahibi ahırı geçen yıl genişletti.",
        tokens=["Çiftlik", "sahibi", "ahırı", "geçen", "yıl",
                "genişletti", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Yolcular bagajlarını bantta bekledi.",
        tokens=["Yolcular", "bagajlarını", "bantta", "bekledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Gazete pazar ekini okurlara veriyor.",
        tokens=["Gazete", "pazar", "ekini", "okurlara", "veriyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Marangoz masanın ayaklarını akşama kadar onardı.",
        tokens=["Marangoz", "masanın", "ayaklarını", "akşama", "kadar",
                "onardı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 4, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Bahçıvan gülleri sabah erken suladı.",
        tokens=["Bahçıvan", "gülleri", "sabah", "erken", "suladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Şoför yolcuları durakta bıraktı.",
        tokens=["Şoför", "yolcuları", "durakta", "bıraktı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Kasap etleri soğuk odada saklıyor.",
        tokens=["Kasap", "etleri", "soğuk", "odada", "saklıyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Sanatçı sergisini başkentte açtı.",
        tokens=["Sanatçı", "sergisini", "başkentte", "açtı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Fırıncı hamuru taş fırında pişirdi.",
        tokens=["Fırıncı", "hamuru", "taş", "fırında", "pişirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Takım antrenmanı yağmur altında tamamladı.",
        tokens=["Takım", "antrenmanı", "yağmur", "altında", "tamamladı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Kaleci penaltıyı son anda kurtardı.",
        tokens=["Kaleci", "penaltıyı", "son", "anda", "kurtardı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Mimar projeyi belediyeye sundu.",
        tokens=["Mimar", "projeyi", "belediyeye", "sundu", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Öğretmen sınav sonuçlarını panoda duyurdu.",
        tokens=["Öğretmen", "sınav", "sonuçlarını", "panoda", "duyurdu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Muhtar mahalle sakinlerini toplantıya çağırdı.",
        tokens=["Muhtar", "mahalle", "sakinlerini", "toplantıya",
                "çağırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="İtfaiye ekibi yangını sabaha karşı söndürdü.",
        tokens=["İtfaiye", "ekibi", "yangını", "sabaha", "karşı",
                "söndürdü", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 6, 6, 6, 4, 0, 6],
        deprels=["nmod", "nsubj", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Dernek üyeleri aidatlarını elden ödedi.",
        tokens=["Dernek", "üyeleri", "aidatlarını", "elden", "ödedi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Garson siparişleri mutfağa götürdü.",
        tokens=["Garson", "siparişleri", "mutfağa", "götürdü", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
]
