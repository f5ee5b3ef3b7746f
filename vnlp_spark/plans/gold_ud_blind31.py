"""Thirty-first BLIND gold split — round 4, second candidate of the
restarted consecutive representative series (blind-30 cleared the gate
at 0.950 first-run; three consecutive ≥0.95 first-runs are required, so
blind-31 and blind-32 must also clear).

Protocol (same as gold_ud_blind{,2..30}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (the established protocol): it swapped the out-of-lexicon
`yürüyüş` for fresh vocabulary; the parser was not run on any candidate
sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: agent-noun homograph subjects (Yazar);
clause-initial locatives with izafet subjects; genitive-subject FutPart
ccomps with temporal adjectives (enflasyonun gelecek yıl düşeceğini);
passive acl participles (müzede sergilenen); bare-Nom objects (voleybol
oynadı, alarm veriyor, tepki gösterdi); itibaren after ablative
relational nouns; copular predicative complements (geçerli olacak,
yüksek kaldı, belli olacak); -ArAk converbs with own objects; -IncA
own-subject converbs with genitive-chain matrix subjects; title flat
names (Profesör Yıldız); için obliques under passives; Inf2 ccomps with
embedded Acc objects; clause coordination with ama; spatial altında;
temin-LVC with Abl source obliques; participle subjects with own
objects (ödülü kazanan yönetmen); possessed-Nom izafet objects (basın
toplantısı düzenledi); akşam-saatlerinde time NPs; nedeniyle causal
ADPs under adjective-modified hosts.

Convention notes made BEFORE scoring, where the list is silent: in a
bare-modifier izafet chain the genitive possessor and the bare nominal
both attach to the possessed head (barajın doluluk ORANI — barajın
nmod → oranı, doluluk nmod → oranı); `itibaren` is ADP case on its
ablative complement, which itself is obl on the matrix predicate (yıl
başından İTİBAREN geçerli olacak), matching the önce/sonra precedent.
"""
from typing import List

BLIND31: List[dict] = [
    dict(
        text="Yazar yeni romanını sonbaharda yayımlayacak.",
        tokens=["Yazar", "yeni", "romanını", "sonbaharda",
                "yayımlayacak", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Kentte hava kirliliği alarm veriyor.",
        tokens=["Kentte", "hava", "kirliliği", "alarm", "veriyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["obl", "nmod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Uzmanlar enflasyonun gelecek yıl düşeceğini öngörüyor.",
        tokens=["Uzmanlar", "enflasyonun", "gelecek", "yıl",
                "düşeceğini", "öngörüyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 4, 5, 6, 0, 6],
        deprels=["nsubj", "nsubj", "amod", "obl", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Müzede sergilenen eserler yurt dışından getirildi.",
        tokens=["Müzede", "sergilenen", "eserler", "yurt", "dışından",
                "getirildi", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 5, 6, 0, 6],
        deprels=["obl", "acl", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Gençler sahilde voleybol oynadı.",
        tokens=["Gençler", "sahilde", "voleybol", "oynadı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Yeni düzenleme yıl başından itibaren geçerli olacak.",
        tokens=["Yeni", "düzenleme", "yıl", "başından", "itibaren",
                "geçerli", "olacak", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "ADP", "ADJ", "VERB",
              "PUNCT"],
        heads=[2, 7, 4, 7, 4, 7, 0, 7],
        deprels=["amod", "nsubj", "nmod", "obl", "case", "compound",
                 "root", "punct"],
    ),
    dict(
        text="Şehir merkezinde trafik yoğunluğu azaldı.",
        tokens=["Şehir", "merkezinde", "trafik", "yoğunluğu", "azaldı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Takım savunmasını güçlendirerek zafere ulaştı.",
        tokens=["Takım", "savunmasını", "güçlendirerek", "zafere",
                "ulaştı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "advcl", "obl", "root", "punct"],
    ),
    dict(
        text="Yağışlar başlayınca barajın doluluk oranı yükseldi.",
        tokens=["Yağışlar", "başlayınca", "barajın", "doluluk", "oranı",
                "yükseldi", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 5, 5, 6, 0, 6],
        deprels=["nsubj", "advcl", "nmod", "nmod", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Profesör Yıldız konferansta iklim değişikliğini anlattı.",
        tokens=["Profesör", "Yıldız", "konferansta", "iklim",
                "değişikliğini", "anlattı", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 6, 5, 6, 0, 6],
        deprels=["nsubj", "flat", "obl", "nmod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Engelli vatandaşlar için yeni rampa yapıldı.",
        tokens=["Engelli", "vatandaşlar", "için", "yeni", "rampa",
                "yapıldı", "."],
        upos=["ADJ", "NOUN", "ADP", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 2, 5, 6, 0, 6],
        deprels=["amod", "obl", "case", "amod", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Banka kredi faizlerini düşürmeyi değerlendiriyor.",
        tokens=["Banka", "kredi", "faizlerini", "düşürmeyi",
                "değerlendiriyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Sanatçı albümünü dijital platformlarda yayınladı.",
        tokens=["Sanatçı", "albümünü", "dijital", "platformlarda",
                "yayınladı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Ekonomi büyüdü ama işsizlik yüksek kaldı.",
        tokens=["Ekonomi", "büyüdü", "ama", "işsizlik", "yüksek",
                "kaldı", "."],
        upos=["NOUN", "VERB", "CCONJ", "NOUN", "ADJ", "VERB", "PUNCT"],
        heads=[2, 0, 6, 6, 6, 2, 2],
        deprels=["nsubj", "root", "cc", "nsubj", "compound", "conj",
                 "punct"],
    ),
    dict(
        text="Köprü altında yeni bisiklet yolu açıldı.",
        tokens=["Köprü", "altında", "yeni", "bisiklet", "yolu",
                "açıldı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 5, 5, 6, 0, 6],
        deprels=["nmod", "obl", "amod", "nmod", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Firma hammaddeyi yerel üreticilerden temin ediyor.",
        tokens=["Firma", "hammaddeyi", "yerel", "üreticilerden",
                "temin", "ediyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 4, 6, 6, 0, 6],
        deprels=["nsubj", "obj", "amod", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Ödülü kazanan yönetmen basın toplantısı düzenledi.",
        tokens=["Ödülü", "kazanan", "yönetmen", "basın", "toplantısı",
                "düzenledi", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 6, 5, 6, 0, 6],
        deprels=["obj", "acl", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Seçim sonuçları akşam saatlerinde belli olacak.",
        tokens=["Seçim", "sonuçları", "akşam", "saatlerinde", "belli",
                "olacak", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADJ", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Veliler servis ücretlerine tepki gösterdi.",
        tokens=["Veliler", "servis", "ücretlerine", "tepki", "gösterdi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Yoğun kar nedeniyle dağ yolu ulaşıma kapandı.",
        tokens=["Yoğun", "kar", "nedeniyle", "dağ", "yolu", "ulaşıma",
                "kapandı", "."],
        upos=["ADJ", "NOUN", "ADP", "NOUN", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[2, 7, 2, 5, 7, 7, 0, 7],
        deprels=["amod", "obl", "case", "nmod", "nsubj", "obl", "root",
                 "punct"],
    ),
]
