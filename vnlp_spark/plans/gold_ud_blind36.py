"""Thirty-sixth BLIND gold split — round 4, attempt 1 of the restarted
consecutive representative series (blind-35 scored 0.900; this split was
frozen AFTER the valency-inventory sweep commit).

Protocol (same as gold_ud_blind{,2..35}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (the established protocol; zero out-of-lexicon words);
the parser was not run on any candidate sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: plural subjects with Acc-homograph objects
and double obliques (kovanları yayladan ovaya); zero-copula kapalı
with plural time izafet (pazartesi günleri); izafet subjects with Dat
goals and bare objects (Gençlik merkezi ... sertifika dağıttı);
genitive possessors inside Ins obliques (yönetmenin uzun
uğraşlarıyla); double-izafet -IncA clauses (Kayak sezonu kar
kalınlığı artınca); purposive için over infinitives with idiom-like
bare objects (yükselmek için ter döktü); Gen-possessor objects
(batığın yerini); boyunca duration frames under copular kal-
(üç gün boyunca açık kalacak); -Ip converbs with own objects (kale
yapıp); manner -lI adverbs (dönüşümlü çalışıyor); izafet passive
subjects with nested izafet obliques (Sel suları tahliye
kanallarıyla); genitive-subject Inf2 ccomps (akademisyenlerin ...
gitmesini); plural time izafet under passives (salı günleri
kuruluyor); possessed-title flat names (Başkan yardımcısı Tunç);
infinitive csubj under zero-copula yasak with terrain -lIk hosts
(Ormanlık alanda ... yakmak yasak); Narr-participle relatives
(kurutulmuş bitkileri); -DAki adjectives over Acc objects
(çatılardaki panelleri).

Convention notes made BEFORE scoring, where the list is silent:
"pazartesi günleri" / "salı günleri" plural time izafet is obl with
the weekday as nmod (the gece-yarısı shape); "ter döktü" keeps ter
as obj (bare-object activity, the frozen light-verb obj
convention); "cam kavanozlarda" is a material nmod (cam stays
NOUN); the infinitive subject of zero-copula yasak is csubj (the
blind-16 Yürümek precedent).
"""
from typing import List

BLIND36: List[dict] = [
    dict(
        text="Arıcılar kovanları yayladan ovaya taşıdı.",
        tokens=["Arıcılar", "kovanları", "yayladan", "ovaya", "taşıdı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Müze pazartesi günleri kapalı.",
        tokens=["Müze", "pazartesi", "günleri", "kapalı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Gençlik merkezi kursiyerlere sertifika dağıttı.",
        tokens=["Gençlik", "merkezi", "kursiyerlere", "sertifika",
                "dağıttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Belgesel yönetmenin uzun uğraşlarıyla tamamlandı.",
        tokens=["Belgesel", "yönetmenin", "uzun", "uğraşlarıyla",
                "tamamlandı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Kayak sezonu kar kalınlığı artınca açıldı.",
        tokens=["Kayak", "sezonu", "kar", "kalınlığı", "artınca",
                "açıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[2, 6, 4, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "nsubj", "advcl", "root",
                 "punct"],
    ),
    dict(
        text="Aşevi ihtiyaç sahiplerine sıcak yemek ulaştırıyor.",
        tokens=["Aşevi", "ihtiyaç", "sahiplerine", "sıcak", "yemek",
                "ulaştırıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obl", "amod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Yarışmacılar finale yükselmek için ter döktü.",
        tokens=["Yarışmacılar", "finale", "yükselmek", "için", "ter",
                "döktü", "."],
        upos=["NOUN", "NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "case", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Dalgıçlar batığın yerini sonarla belirledi.",
        tokens=["Dalgıçlar", "batığın", "yerini", "sonarla",
                "belirledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Fuar ziyaretçilere üç gün boyunca açık kalacak.",
        tokens=["Fuar", "ziyaretçilere", "üç", "gün", "boyunca",
                "açık", "kalacak", "."],
        upos=["NOUN", "NOUN", "NUM", "NOUN", "ADP", "ADJ", "VERB",
              "PUNCT"],
        heads=[7, 7, 4, 7, 4, 7, 0, 7],
        deprels=["nsubj", "obl", "nummod", "obl", "case", "compound",
                 "root", "punct"],
    ),
    dict(
        text="Kurul itirazı oybirliğiyle reddetti.",
        tokens=["Kurul", "itirazı", "oybirliğiyle", "reddetti", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Çocuklar kumsalda kale yapıp denize girdi.",
        tokens=["Çocuklar", "kumsalda", "kale", "yapıp", "denize",
                "girdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[6, 4, 4, 6, 6, 0, 6],
        deprels=["nsubj", "obl", "obj", "advcl", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Hemşireler gece vardiyasında dönüşümlü çalışıyor.",
        tokens=["Hemşireler", "gece", "vardiyasında", "dönüşümlü",
                "çalışıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Sel suları tahliye kanallarıyla denize yönlendirildi.",
        tokens=["Sel", "suları", "tahliye", "kanallarıyla", "denize",
                "yönlendirildi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "obl", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Gazete seçim sonuçlarını manşetten duyurdu.",
        tokens=["Gazete", "seçim", "sonuçlarını", "manşetten",
                "duyurdu", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Üniversite akademisyenlerin yurtdışına gitmesini kolaylaştırdı.",
        tokens=["Üniversite", "akademisyenlerin", "yurtdışına",
                "gitmesini", "kolaylaştırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nsubj", "obl", "ccomp", "root", "punct"],
    ),
    dict(
        text="Kasaba pazarı salı günleri kuruluyor.",
        tokens=["Kasaba", "pazarı", "salı", "günleri", "kuruluyor",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Başkan yardımcısı Tunç basın mensuplarını bilgilendirdi.",
        tokens=["Başkan", "yardımcısı", "Tunç", "basın", "mensuplarını",
                "bilgilendirdi", "."],
        upos=["NOUN", "NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 2, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "flat", "nmod", "obj", "root",
                 "punct"],
        ner=["O", "O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Ormanlık alanda piknik ateşi yakmak yasak.",
        tokens=["Ormanlık", "alanda", "piknik", "ateşi", "yakmak",
                "yasak", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "ADJ", "PUNCT"],
        heads=[2, 5, 4, 5, 6, 0, 6],
        deprels=["amod", "obl", "nmod", "obj", "csubj", "root",
                 "punct"],
    ),
    dict(
        text="Aktarlar kurutulmuş bitkileri cam kavanozlarda saklıyor.",
        tokens=["Aktarlar", "kurutulmuş", "bitkileri", "cam",
                "kavanozlarda", "saklıyor", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "acl", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Rüzgar çatılardaki panelleri yerinden söktü.",
        tokens=["Rüzgar", "çatılardaki", "panelleri", "yerinden",
                "söktü", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
]
