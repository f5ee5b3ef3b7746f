"""Eighteenth BLIND gold split — round 3, post-blind-17 generalization check.

Protocol (same as gold_ud_blind{,2..17}.py): blind-17 (commit 2c9f9d1's
record) was scored ONCE at triple P 1.000 / R 0.950 and its engine
categories were fixed with general rules and pinned, burning it.
These 20 NEW sentences were written and UD-annotated by hand AFTER
those fixes landed and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes of the blind-17 fixes: a dative 3pl pronoun
(``Onlara``), a demonstrative subject over a genitive pronoun (``Bu
hepimizin başarısı``), an ambiguous-izafet object (``fiyat artışı
duyurdu``), and a fresh zero-copula ``çünkü`` clause (``kısaydı``).
Virgin constructions: a P1sg participle relative (``Aldığım``), the
``-DIr`` copula (``kesindir``), an impersonal ``gerek-`` frame, a
fronted (OSV) object (``Kitabı çocuk okudu``), an Aorist apodosis
(``düşerse ... artar``), an infinitive complement (``artırmak
istiyor``), ``Herkes``, a genitive-subject relative over a
zero-copula predicate (``Komşunun yaptığı kek lezzetliydi``), a NOUN
zero-copula-past root (``öğretmendi``), and a triple-voice chain
(``derinleştirildi``).

Annotation conventions: the authoritative list in gold_ud.py's
docstring, identical to every earlier split.
"""
from typing import List

BLIND18: List[dict] = [
    dict(
        text="Onlara durum anlatıldı.",
        tokens=["Onlara", "durum", "anlatıldı", "."],
        upos=["PRON", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Bu hepimizin başarısı.",
        tokens=["Bu", "hepimizin", "başarısı", "."],
        upos=["PRON", "PRON", "NOUN", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "nmod", "root", "punct"],
    ),
    dict(
        text="Firma fiyat artışı duyurdu.",
        tokens=["Firma", "fiyat", "artışı", "duyurdu", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Seyirciler ayrıldı çünkü konser kısaydı.",
        tokens=["Seyirciler", "ayrıldı", "çünkü", "konser", "kısaydı",
                "."],
        upos=["NOUN", "VERB", "CCONJ", "NOUN", "ADJ", "PUNCT"],
        heads=[2, 0, 5, 5, 2, 2],
        deprels=["nsubj", "root", "cc", "nsubj", "conj", "punct"],
    ),
    dict(
        text="Aldığım bilet kayboldu.",
        tokens=["Aldığım", "bilet", "kayboldu", "."],
        upos=["VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 0, 3],
        deprels=["acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Sonuç kesindir.",
        tokens=["Sonuç", "kesindir", "."],
        upos=["NOUN", "ADJ", "PUNCT"],
        heads=[2, 0, 2],
        deprels=["nsubj", "root", "punct"],
    ),
    dict(
        text="Projeye onay gerekiyor.",
        tokens=["Projeye", "onay", "gerekiyor", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["obl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Karara itiraz edildi.",
        tokens=["Karara", "itiraz", "edildi", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["obl", "compound", "root", "punct"],
    ),
    dict(
        text="Kitabı çocuk okudu.",
        tokens=["Kitabı", "çocuk", "okudu", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["obj", "nsubj", "root", "punct"],
    ),
    dict(
        text="Fiyat düşerse talep artar.",
        tokens=["Fiyat", "düşerse", "talep", "artar", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Şirket üretimi artırmak istiyor.",
        tokens=["Şirket", "üretimi", "artırmak", "istiyor", "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Herkes sonucu merak ediyor.",
        tokens=["Herkes", "sonucu", "merak", "ediyor", "."],
        upos=["PRON", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "compound", "root", "punct"],
    ),
    dict(
        text="Yarın kar bekleniyor.",
        tokens=["Yarın", "kar", "bekleniyor", "."],
        upos=["ADV", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["advmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Komşunun yaptığı kek lezzetliydi.",
        tokens=["Komşunun", "yaptığı", "kek", "lezzetliydi", "."],
        upos=["NOUN", "VERB", "NOUN", "ADJ", "PUNCT"],
        heads=[2, 3, 4, 0, 4],
        deprels=["nsubj", "acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Dedem eski bir öğretmendi.",
        tokens=["Dedem", "eski", "bir", "öğretmendi", "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "amod", "det", "root", "punct"],
    ),
    dict(
        text="Sanatçılar eserlerini fuarda tanıttı.",
        tokens=["Sanatçılar", "eserlerini", "fuarda", "tanıttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Gönüllüler yaşlılara yemek dağıttı.",
        tokens=["Gönüllüler", "yaşlılara", "yemek", "dağıttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Kütüphane yeni kitaplar aldı.",
        tokens=["Kütüphane", "yeni", "kitaplar", "aldı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Soruşturma derinleştirildi.",
        tokens=["Soruşturma", "derinleştirildi", "."],
        upos=["NOUN", "VERB", "PUNCT"],
        heads=[2, 0, 2],
        deprels=["nsubj", "root", "punct"],
    ),
    dict(
        text="Ödüller törenle sahiplerine verildi.",
        tokens=["Ödüller", "törenle", "sahiplerine", "verildi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obl", "root", "punct"],
    ),
]

for _g in BLIND18:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
