"""Forty-fourth BLIND gold split — round 4, third extension probe after
the closed gate series (blind-42/43 both scored 0.900 first-run; the
rolling-last-five aggregate sits at exactly 0.950 and a ≥0.95 here
lifts it above the gate).

Protocol (same as gold_ud_blind{,2..43}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (zero out-of-lexicon words); the parser was not run on
any candidate sentence.

Register: REPRESENTATIVE web-news prose, everyday vocabulary in fresh
combinations across burned categories: izafet subjects before ambiguous
plural-Acc objects (Belediye ekipleri KALDIRIMLARI; Müze ziyaretçileri
antika SAATLERİ); grammaticalized-ADP time frames (gece boyunca,
öğleden sonra, hasattan önce, akşama kadar, sabaha karşı);
bare-time + erken adverb frames (sabah erken topladı); light-verb
predicates (tedavi etti); material-noun juxtapositions feeding
case-marked hosts (cam tezgahta, taş köprüden, cam kavanozda);
spatial relational nouns (yağmur altında); hafta-sonu time adjuncts;
Gen-possessor objects under kadar ADPs (gelinliğin eteğini akşama
kadar); passive -mIş participle relatives (kurutulmuş yaprakları);
Dat-izafet obliques (ihtiyaç sahiplerine).  Natural inventory probes
(verbs possibly unlisted): daralttı, geçirdi, ilaçladı, ulaştırdı.

Convention notes made BEFORE scoring, where the list is silent:
'sabah erken' reads sabah as the bare time oblique and erken as advmod
on the verb (the blind-43 convention); 'hafta sonu' is the burned
nmod+obl time adjunct; material nouns (cam, taş) modify as NOUN+nmod
per the blind-43 material-class convention; 'kurutulmuş' is VERB+acl
per the participle-relative convention.
"""
from typing import List

BLIND44: List[dict] = [
    dict(
        text="Çiçekçi taze gülleri vitrine yerleştirdi.",
        tokens=["Çiçekçi", "taze", "gülleri", "vitrine", "yerleştirdi",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Belediye ekipleri kaldırımları gece boyunca onardı.",
        tokens=["Belediye", "ekipleri", "kaldırımları", "gece",
                "boyunca", "onardı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 6, 6, 6, 4, 0, 6],
        deprels=["nmod", "nsubj", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Müze ziyaretçileri antika saatleri uzun süre inceledi.",
        tokens=["Müze", "ziyaretçileri", "antika", "saatleri", "uzun",
                "süre", "inceledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 7, 4, 7, 6, 7, 0, 7],
        deprels=["nmod", "nsubj", "amod", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Terzi gelinliğin eteğini akşama kadar daralttı.",
        tokens=["Terzi", "gelinliğin", "eteğini", "akşama", "kadar",
                "daralttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 4, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Balıkçılar ağları sabah erken topladı.",
        tokens=["Balıkçılar", "ağları", "sabah", "erken", "topladı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Gazeteci röportajın kayıtlarını dergiye teslim etti.",
        tokens=["Gazeteci", "röportajın", "kayıtlarını", "dergiye",
                "teslim", "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Dağcılar zirveye yağmur altında ulaştı.",
        tokens=["Dağcılar", "zirveye", "yağmur", "altında", "ulaştı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Fırıncı simitleri cam tezgahta sergiledi.",
        tokens=["Fırıncı", "simitleri", "cam", "tezgahta", "sergiledi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Okul müdürü toplantı tutanağını velilere okudu.",
        tokens=["Okul", "müdürü", "toplantı", "tutanağını", "velilere",
                "okudu", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Yüzücü antrenmanı havuzun derin kulvarında tamamladı.",
        tokens=["Yüzücü", "antrenmanı", "havuzun", "derin",
                "kulvarında", "tamamladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 5, 5, 6, 0, 6],
        deprels=["nsubj", "obj", "nmod", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Çiftçi buğday tarlasını hasattan önce ilaçladı.",
        tokens=["Çiftçi", "buğday", "tarlasını", "hasattan", "önce",
                "ilaçladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 4, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Sanatçı yeni albümünü hayranlarına imzaladı.",
        tokens=["Sanatçı", "yeni", "albümünü", "hayranlarına",
                "imzaladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Kargo şirketi paketleri öğleden sonra dağıttı.",
        tokens=["Kargo", "şirketi", "paketleri", "öğleden", "sonra",
                "dağıttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 6, 6, 6, 4, 0, 6],
        deprels=["nmod", "nsubj", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Veteriner yaralı kediyi klinikte tedavi etti.",
        tokens=["Veteriner", "yaralı", "kediyi", "klinikte", "tedavi",
                "etti", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Turist rehberi kafileyi taş köprüden geçirdi.",
        tokens=["Turist", "rehberi", "kafileyi", "taş", "köprüden",
                "geçirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="İtfaiye ekibi depo yangınını sabaha karşı söndürdü.",
        tokens=["İtfaiye", "ekibi", "depo", "yangınını", "sabaha",
                "karşı", "söndürdü", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB",
              "PUNCT"],
        heads=[2, 7, 4, 7, 7, 5, 0, 7],
        deprels=["nmod", "nsubj", "nmod", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Anaokulu öğretmeni oyuncakları renkli kutularda sakladı.",
        tokens=["Anaokulu", "öğretmeni", "oyuncakları", "renkli",
                "kutularda", "sakladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Komşular apartmanın bahçesini hafta sonu düzenledi.",
        tokens=["Komşular", "apartmanın", "bahçesini", "hafta", "sonu",
                "düzenledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Baharatçı kurutulmuş yaprakları cam kavanozda saklıyor.",
        tokens=["Baharatçı", "kurutulmuş", "yaprakları", "cam",
                "kavanozda", "saklıyor", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "acl", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Dernek üyeleri bağışları ihtiyaç sahiplerine ulaştırdı.",
        tokens=["Dernek", "üyeleri", "bağışları", "ihtiyaç",
                "sahiplerine", "ulaştırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
]
