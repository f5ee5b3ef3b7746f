"""Fourth BLIND gold split — round 3, third-generation generalization probe.

Protocol (same as gold_ud_blind{,2,3}.py): blind-3 (commit 3e3d69d) was
scored ONCE at triple P/R 0.789/0.750, its miss categories were fixed
with general rules pinned by fresh tuning sentences (commit fc12c8a),
and it is thereby burned as a blind instrument.  These 20 NEW sentences
were written and UD-annotated by hand AFTER those fixes landed and are
COMMITTED BEFORE the engine runs on them even once.  Only the
tokenizer (deterministic, parity-tested) was run on these texts before
freezing, to pin the token column; no annotator component has seen
them.  Fresh lexemes and constructions: reported-speech `-DIk+Acc`
complements with genitive subjects, locative-gap relatives, ADJ-as-ADV
manner modifiers, `tarafından` agent passives (following the tuning
split's NOUN-obl convention), `içinde` temporal frames with numerals,
interrogative `neden` + `?` sentences, reduplicated `yavaş yavaş`,
ORG mention runs, `-Ip` clause chains feeding light-verb objects,
verbless locative predicates, `daha` comparatives, 1st-person
possessive objects with pro-drop, volitional `-mAk istiyor`, the
Dat-governing postposition `karşı`, overt pronoun subjects, plural
compound objects, ordinal numerals, impersonal passives, and `-mIş`
evidential support-verb predicates.  The first-run score is recorded
as-is in BENCH.md regardless of outcome.

Annotation conventions: universaldependencies.org/tr, same as
gold_ud.py (first-clause root, amod on the compound head, existential/
adjectival zero-copula predicates keep their lexical UPOS, subtypes
collapsed to base relations).
"""
from typing import List

BLIND4: List[dict] = [
    dict(
        text="Bakan görüşmelerin sürdüğünü söyledi.",
        tokens=["Bakan", "görüşmelerin", "sürdüğünü", "söyledi", "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nsubj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Sanatçının yaşadığı şehir kalabalıktı.",
        tokens=["Sanatçının", "yaşadığı", "şehir", "kalabalıktı", "."],
        upos=["NOUN", "VERB", "NOUN", "ADJ", "PUNCT"],
        heads=[2, 3, 4, 0, 4],
        deprels=["nsubj", "acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Uzmanlar konuyu basına ayrıntılı anlattı.",
        tokens=["Uzmanlar", "konuyu", "basına", "ayrıntılı", "anlattı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Yasa tasarısı meclis tarafından onaylandı.",
        tokens=["Yasa", "tasarısı", "meclis", "tarafından", "onaylandı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Proje iki yıl içinde tamamlanacak.",
        tokens=["Proje", "iki", "yıl", "içinde", "tamamlanacak", "."],
        upos=["NOUN", "NUM", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nummod", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Toplantı neden ertelendi?",
        tokens=["Toplantı", "neden", "ertelendi", "?"],
        upos=["NOUN", "ADV", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Yeni düzenleme esnafa kolaylık sağladı.",
        tokens=["Yeni", "düzenleme", "esnafa", "kolaylık", "sağladı", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Misafirler yavaş yavaş salona geçti.",
        tokens=["Misafirler", "yavaş", "yavaş", "salona", "geçti", "."],
        upos=["NOUN", "ADV", "ADV", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "advmod", "compound", "obl", "root", "punct"],
    ),
    dict(
        text="Merkez Bankası faiz kararını açıkladı.",
        tokens=["Merkez", "Bankası", "faiz", "kararını", "açıkladı", "."],
        upos=["PROPN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obj", "root", "punct"],
        ner=["ORG", "ORG", "O", "O", "O", "O"],
    ),
    dict(
        text="Ekipler bölgeye gidip hasar tespiti yaptı.",
        tokens=["Ekipler", "bölgeye", "gidip", "hasar", "tespiti",
                "yaptı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Müze şehrin merkezinde.",
        tokens=["Müze", "şehrin", "merkezinde", "."],
        upos=["NOUN", "NOUN", "NOUN", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "nmod", "root", "punct"],
    ),
    dict(
        text="Yeni model eskisinden daha hızlı.",
        tokens=["Yeni", "model", "eskisinden", "daha", "hızlı", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Başvurumu dün gönderdim.",
        tokens=["Başvurumu", "dün", "gönderdim", "."],
        upos=["NOUN", "ADV", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Gençler yurtdışında çalışmak istiyor.",
        tokens=["Gençler", "yurtdışında", "çalışmak", "istiyor", "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "obl", "ccomp", "root", "punct"],
    ),
    dict(
        text="Taraftarlar karara karşı tepki gösterdi.",
        tokens=["Taraftarlar", "karara", "karşı", "tepki", "gösterdi", "."],
        upos=["NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "obj", "root", "punct"],
    ),
    dict(
        text="Onlar sonucu zaten biliyordu.",
        tokens=["Onlar", "sonucu", "zaten", "biliyordu", "."],
        upos=["PRON", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Dernek üyelere yeni kimlik kartları dağıttı.",
        tokens=["Dernek", "üyelere", "yeni", "kimlik", "kartları",
                "dağıttı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 5, 5, 6, 0, 6],
        deprels=["nsubj", "obl", "amod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Takım sezonun üçüncü galibiyetini aldı.",
        tokens=["Takım", "sezonun", "üçüncü", "galibiyetini", "aldı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Akşam saatlerinde sağanak bekleniyor.",
        tokens=["Akşam", "saatlerinde", "sağanak", "bekleniyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Komşular gürültüden rahatsız olmuş.",
        tokens=["Komşular", "gürültüden", "rahatsız", "olmuş", "."],
        upos=["NOUN", "NOUN", "ADJ", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "compound", "root", "punct"],
    ),
]

for _g in BLIND4:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
