"""Thirty-fifth BLIND gold split — round 4, attempt 1 of the (again)
restarted consecutive representative series (blind-34 scored 0.850 and
reset the series; this split was frozen AFTER the second fresh-sentence
probe-sweep hardening commit).

Protocol (same as gold_ud_blind{,2..34}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (the established protocol; zero out-of-lexicon words this
time); the parser was not run on any candidate sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: Gen-Loc time izafet with kadar-bounded
double obliques (sabahtan akşama kadar); sentence-initial temporal
subjects (Kış ... sert geçti); coordinated Acc-homograph objects
(fidanları ve çiçekleri); loan-î attributive resmi before Ins hosts;
adnominal yüzde frames (yüzde elli indirim); institutional plural
izafet subjects (Öğretmenler odası); open-class plural subjects with
Acc-homograph objects (Denetçiler raporu); -IncA own-subject converbs
with two nominals (satıcılar kalabalık dağılınca); -DIktAn sonra with
unaccusative hosts (Tadilat bittikten sonra); genitive-subject
PastPart ccomps (görüşmelerin tıkandığını); tarafından agentive
passives; zero-copula değil predicates with artık; var existentials
with izafet obliques; hem...hem Dat conjuncts; hasar-gören acl
participles under passive futures; emphatic de on focused subjects;
Inf2 ccomps with embedded objects and doğrudan; title flat names
(Doçent Arslan); izafet passive subjects with double obliques
(Yardım malzemeleri gemilerle adalara); nedeniyle causal ADPs with
attributive -lI (Şiddetli lodos nedeniyle).

Convention notes made BEFORE scoring, where the list is silent:
"doğrudan" in preverbal manner function is ADV advmod (the
lexicalized-adverb precedent: yeniden, yakında); "sabahtan akşama
kadar" is two obliques with kadar as case on the Dat bound (the
gold_ud.py hafta-sonuna-kadar precedent); "ürünleri" inside the Inf2
clause is that clause's obj whichever of Acc/izafet morphology is
chosen (same head either way).
"""
from typing import List

BLIND35: List[dict] = [
    dict(
        text="Çiftçiler hasat mevsiminde sabahtan akşama kadar çalışıyor.",
        tokens=["Çiftçiler", "hasat", "mevsiminde", "sabahtan",
                "akşama", "kadar", "çalışıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 7, 7, 5, 0, 7],
        deprels=["nsubj", "nmod", "obl", "obl", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Kış bu yıl sert geçti.",
        tokens=["Kış", "bu", "yıl", "sert", "geçti", "."],
        upos=["NOUN", "DET", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "det", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Bahçıvanlar fidanları ve çiçekleri suladı.",
        tokens=["Bahçıvanlar", "fidanları", "ve", "çiçekleri",
                "suladı", "."],
        upos=["NOUN", "NOUN", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 2, 0, 5],
        deprels=["nsubj", "obj", "cc", "conj", "root", "punct"],
    ),
    dict(
        text="Sergi resmi açılışla başladı.",
        tokens=["Sergi", "resmi", "açılışla", "başladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Market yüzde elli indirim duyurdu.",
        tokens=["Market", "yüzde", "elli", "indirim", "duyurdu", "."],
        upos=["NOUN", "NOUN", "NUM", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 2, 5, 0, 5],
        deprels=["nsubj", "nmod", "nummod", "obj", "root", "punct"],
    ),
    dict(
        text="Öğretmenler odası yeni mobilyalarla donatıldı.",
        tokens=["Öğretmenler", "odası", "yeni", "mobilyalarla",
                "donatıldı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Denetçiler raporu ayrıntılı biçimde inceledi.",
        tokens=["Denetçiler", "raporu", "ayrıntılı", "biçimde",
                "inceledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Seyyar satıcılar kalabalık dağılınca tezgahları topladı.",
        tokens=["Seyyar", "satıcılar", "kalabalık", "dağılınca",
                "tezgahları", "topladı", "."],
        upos=["ADJ", "NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["amod", "nsubj", "nsubj", "advcl", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Tadilat bittikten sonra dükkan yeniden açıldı.",
        tokens=["Tadilat", "bittikten", "sonra", "dükkan", "yeniden",
                "açıldı", "."],
        upos=["NOUN", "VERB", "ADP", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 6, 2, 6, 6, 0, 6],
        deprels=["nsubj", "advcl", "case", "nsubj", "advmod", "root",
                 "punct"],
    ),
    dict(
        text="Sendika görüşmelerin tıkandığını duyurdu.",
        tokens=["Sendika", "görüşmelerin", "tıkandığını", "duyurdu",
                "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nsubj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Yeni hastane hayırseverler tarafından yaptırıldı.",
        tokens=["Yeni", "hastane", "hayırseverler", "tarafından",
                "yaptırıldı", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Eski yöntem artık geçerli değil.",
        tokens=["Eski", "yöntem", "artık", "geçerli", "değil", "."],
        upos=["ADJ", "NOUN", "ADV", "ADJ", "AUX", "PUNCT"],
        heads=[2, 4, 4, 0, 4, 4],
        deprels=["amod", "nsubj", "advmod", "root", "cop", "punct"],
    ),
    dict(
        text="Sahil kasabasında küçük bir balıkçı limanı var.",
        tokens=["Sahil", "kasabasında", "küçük", "bir", "balıkçı",
                "limanı", "var", "."],
        upos=["NOUN", "NOUN", "ADJ", "DET", "NOUN", "NOUN", "ADJ",
              "PUNCT"],
        heads=[2, 7, 6, 6, 6, 7, 0, 7],
        deprels=["nmod", "obl", "amod", "det", "nmod", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Firma hem yurtiçine hem yurtdışına ürün gönderiyor.",
        tokens=["Firma", "hem", "yurtiçine", "hem", "yurtdışına",
                "ürün", "gönderiyor", "."],
        upos=["NOUN", "CCONJ", "NOUN", "CCONJ", "NOUN", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 5, 3, 7, 0, 7],
        deprels=["nsubj", "cc", "obl", "cc", "conj", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Depremde hasar gören binalar güçlendirilecek.",
        tokens=["Depremde", "hasar", "gören", "binalar",
                "güçlendirilecek", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 4, 5, 0, 5],
        deprels=["obl", "obj", "acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Küçük işletmeler de destekten yararlanacak.",
        tokens=["Küçük", "işletmeler", "de", "destekten",
                "yararlanacak", "."],
        upos=["ADJ", "NOUN", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 2, 5, 0, 5],
        deprels=["amod", "nsubj", "advmod", "obl", "root", "punct"],
    ),
    dict(
        text="Kooperatif ürünleri doğrudan tüketiciye ulaştırmayı hedefliyor.",
        tokens=["Kooperatif", "ürünleri", "doğrudan", "tüketiciye",
                "ulaştırmayı", "hedefliyor", "."],
        upos=["NOUN", "NOUN", "ADV", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[6, 5, 5, 5, 6, 0, 6],
        deprels=["nsubj", "obj", "advmod", "obl", "ccomp", "root",
                 "punct"],
    ),
    dict(
        text="Doçent Arslan yeni bulguları kongrede sundu.",
        tokens=["Doçent", "Arslan", "yeni", "bulguları", "kongrede",
                "sundu", "."],
        upos=["NOUN", "PROPN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 4, 6, 6, 0, 6],
        deprels=["nsubj", "flat", "amod", "obj", "obl", "root",
                 "punct"],
        ner=["O", "PER", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Yardım malzemeleri gemilerle adalara ulaştırıldı.",
        tokens=["Yardım", "malzemeleri", "gemilerle", "adalara",
                "ulaştırıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Şiddetli lodos nedeniyle vapur seferleri durduruldu.",
        tokens=["Şiddetli", "lodos", "nedeniyle", "vapur", "seferleri",
                "durduruldu", "."],
        upos=["ADJ", "NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 2, 5, 6, 0, 6],
        deprels=["amod", "obl", "case", "nmod", "nsubj", "root",
                 "punct"],
    ),
]
