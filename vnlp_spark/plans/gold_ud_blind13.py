"""Thirteenth BLIND gold split — round 3, post-blind-12 generalization check.

Protocol (same as gold_ud_blind{,2..12}.py): blind-12 (commit 1c0aac1)
was scored ONCE at triple P/R 0.900 and its one engine category was
fixed with a general rule and pinned, burning it.  These 20 NEW
sentences were written and UD-annotated by hand AFTER that fix landed
and are COMMITTED BEFORE the engine touches them in any way (the
tokenizations below are hand-written).  The first-run score is
recorded as-is in BENCH.md regardless of outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes of the blind-12 burn category — role-noun/adjective
homographs sentence-initially before Dat and Acc complements
(``Yetkili belgeleri``, ``Sorumlu açıklamayı``, ``Görevli
ziyaretçilere``, ``Usta çırağına``) — plus constructions never probed
before: a participial relative with its own oblique (``Toplantıya
katılan üyeler``), a zincirleme possessive chain (``Okul müdürünün
odası``), an ``-ArAk`` converb (``düşürerek``), a comma-and-``ve``
conjunct chain (``elma , armut ve üzüm``), a passive ``-mAdAn``
converb (``arıtılmadan``), a P1sg-possessed subject with a 1pl matrix
(``Kardeşim ... sevindik``), and fresh members of burned classes
(negative FutPart ``kiralamayacağını``, manner-frame ``belirgin
biçimde``, ``kal-`` copular ``ücretsiz kalacak``, title-flat
``Müzisyen Deniz``, possessed-Nom-vs-Acc double ambiguity ``eski
sokakları turistleri çekiyor``).

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py and the earlier splits (participle relatives: VERB + acl).
"""
from typing import List

BLIND13: List[dict] = [
    dict(
        text="Yetkili belgeleri bastı ve dağıttı.",
        tokens=["Yetkili", "belgeleri", "bastı", "ve", "dağıttı", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "VERB", "PUNCT"],
        heads=[3, 3, 0, 5, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "conj", "punct"],
    ),
    dict(
        text="Sorumlu açıklamayı geciktirdi.",
        tokens=["Sorumlu", "açıklamayı", "geciktirdi", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Görevli ziyaretçilere yol gösterdi.",
        tokens=["Görevli", "ziyaretçilere", "yol", "gösterdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Usta çırağına tekniği gösterdi.",
        tokens=["Usta", "çırağına", "tekniği", "gösterdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Toplantıya katılan üyeler raporu onayladı.",
        tokens=["Toplantıya", "katılan", "üyeler", "raporu",
                "onayladı", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 5, 5, 0, 5],
        deprels=["obl", "acl", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Okul müdürünün odası yenilendi.",
        tokens=["Okul", "müdürünün", "odası", "yenilendi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 4, 0, 4],
        deprels=["nmod", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Şirket maliyetleri düşürerek kârını artırdı.",
        tokens=["Şirket", "maliyetleri", "düşürerek", "kârını",
                "artırdı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "advcl", "obj", "root", "punct"],
    ),
    dict(
        text="Pazarda elma, armut ve üzüm satılıyor.",
        tokens=["Pazarda", "elma", ",", "armut", "ve", "üzüm",
                "satılıyor", "."],
        upos=["NOUN", "NOUN", "PUNCT", "NOUN", "CCONJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 7, 4, 2, 6, 2, 0, 7],
        deprels=["obl", "nsubj", "punct", "conj", "cc", "conj", "root",
                 "punct"],
    ),
    dict(
        text="Müzisyen Deniz konserde şarkılarını seslendirdi.",
        tokens=["Müzisyen", "Deniz", "konserde", "şarkılarını",
                "seslendirdi", "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["nsubj", "flat", "obl", "obj", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="Atıklar arıtılmadan denize bırakıldı.",
        tokens=["Atıklar", "arıtılmadan", "denize", "bırakıldı", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "obl", "root", "punct"],
    ),
    dict(
        text="Kardeşim sınavı kazanınca hepimiz sevindik.",
        tokens=["Kardeşim", "sınavı", "kazanınca", "hepimiz",
                "sevindik", "."],
        upos=["NOUN", "NOUN", "VERB", "PRON", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Yeni düzenleme küçük esnafı rahatlatacak.",
        tokens=["Yeni", "düzenleme", "küçük", "esnafı", "rahatlatacak",
                "."],
        upos=["ADJ", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Hava sıcaklığı yarın belirgin biçimde düşecek.",
        tokens=["Hava", "sıcaklığı", "yarın", "belirgin", "biçimde",
                "düşecek", "."],
        upos=["NOUN", "NOUN", "ADV", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "advmod", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Kulüp genç oyuncularını kiralamayacağını açıkladı.",
        tokens=["Kulüp", "genç", "oyuncularını", "kiralamayacağını",
                "açıkladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Sergi hafta boyunca ücretsiz kalacak.",
        tokens=["Sergi", "hafta", "boyunca", "ücretsiz", "kalacak",
                "."],
        upos=["NOUN", "NOUN", "ADP", "ADJ", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "compound", "root", "punct"],
    ),
    dict(
        text="Savcılar delilleri yeniden değerlendirdi.",
        tokens=["Savcılar", "delilleri", "yeniden", "değerlendirdi",
                "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Kentin eski sokakları turistleri çekiyor.",
        tokens=["Kentin", "eski", "sokakları", "turistleri", "çekiyor",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nmod", "amod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Üç okul depremden sonra onarıldı.",
        tokens=["Üç", "okul", "depremden", "sonra", "onarıldı", "."],
        upos=["NUM", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[2, 5, 5, 3, 0, 5],
        deprels=["nummod", "nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Şef çorbayı tattı ve beğendi.",
        tokens=["Şef", "çorbayı", "tattı", "ve", "beğendi", "."],
        upos=["NOUN", "NOUN", "VERB", "CCONJ", "VERB", "PUNCT"],
        heads=[3, 3, 0, 5, 3, 3],
        deprels=["nsubj", "obj", "root", "cc", "conj", "punct"],
    ),
    dict(
        text="Firmanın yeni ürünleri piyasada ilgi gördü.",
        tokens=["Firmanın", "yeni", "ürünleri", "piyasada", "ilgi",
                "gördü", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 6, 6, 6, 0, 6],
        deprels=["nmod", "amod", "nsubj", "obl", "obj", "root",
                 "punct"],
    ),
]

for _g in BLIND13:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
