"""Fifteenth BLIND gold split — round 3, post-blind-14 generalization check.

Protocol (same as gold_ud_blind{,2..14}.py): blind-14 (commit 7b44d6e's
record) was scored ONCE at triple P/R 0.950 — the gate — and its one
residual category was fixed with a general rule and pinned, burning
it.  These 20 NEW sentences were written and UD-annotated by hand
AFTER that fix landed and are COMMITTED BEFORE the engine touches
them in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes: the ablative-comparative homograph with a fresh
material noun and standard (``Bu deri benzerlerinden daha sağlam``),
a fresh stem-list-absent ``-CI`` agentive (``çaycıları``), plus
constructions never probed before — an Aorist conditional
(``yağarsa``), a genitive-subject ``-DIK`` relative (``Uzmanların
hazırladığı rapor``), ``gibi`` and ``kadar`` postpositions, a 3pl
pronoun subject (``Onlar``), a numeric year (``1973 yılında``), the
``arasında`` spatial frame under a numeral, a P2pl-possessed
zero-copula subject (``Arabanız serviste hazır``), the emphatic
``de`` particle, a ``-ki`` locative relative (``Masadaki``,
``Kütüphanedeki``), a THREE-token title flat (``Doçent Ece Aydın``),
a sentence-initial ``Ancak``, and an adnominal ordinal with ``kez``.

Annotation conventions: universaldependencies.org/tr, identical to
gold_ud.py and the earlier splits (emphatic de: CCONJ attached advmod
to the preceding word; sentence-initial contrastive Ancak: CCONJ cc
to the predicate; subtypes collapsed to base relations).
"""
from typing import List

BLIND15: List[dict] = [
    dict(
        text="Bu deri benzerlerinden daha sağlam.",
        tokens=["Bu", "deri", "benzerlerinden", "daha", "sağlam", "."],
        upos=["DET", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["det", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Patron çaycıları işe aldı.",
        tokens=["Patron", "çaycıları", "işe", "aldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Yağmur yağarsa maç ertelenecek.",
        tokens=["Yağmur", "yağarsa", "maç", "ertelenecek", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Uzmanların hazırladığı rapor yayımlandı.",
        tokens=["Uzmanların", "hazırladığı", "rapor", "yayımlandı",
                "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 4, 0, 4],
        deprels=["nsubj", "acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Salon ayna gibi parlıyordu.",
        tokens=["Salon", "ayna", "gibi", "parlıyordu", "."],
        upos=["NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[4, 4, 2, 0, 4],
        deprels=["nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Fuar akşama kadar açık kalacak.",
        tokens=["Fuar", "akşama", "kadar", "açık", "kalacak", "."],
        upos=["NOUN", "NOUN", "ADP", "ADJ", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "compound", "root", "punct"],
    ),
    dict(
        text="Banka müşterilere yeni kartlar gönderdi.",
        tokens=["Banka", "müşterilere", "yeni", "kartlar", "gönderdi",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Onlar sonucu önceden biliyordu.",
        tokens=["Onlar", "sonucu", "önceden", "biliyordu", "."],
        upos=["PRON", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Köprü 1973 yılında açıldı.",
        tokens=["Köprü", "1973", "yılında", "açıldı", "."],
        upos=["NOUN", "NUM", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nummod", "obl", "root", "punct"],
    ),
    dict(
        text="Görüşmeler iki ülke arasında sürüyor.",
        tokens=["Görüşmeler", "iki", "ülke", "arasında", "sürüyor",
                "."],
        upos=["NOUN", "NUM", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nummod", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Arabanız serviste hazır.",
        tokens=["Arabanız", "serviste", "hazır", "."],
        upos=["NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Veliler de karara itiraz etti.",
        tokens=["Veliler", "de", "karara", "itiraz", "etti", "."],
        upos=["NOUN", "CCONJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["nsubj", "advmod", "obl", "compound", "root", "punct"],
    ),
    dict(
        text="Masadaki belgeler imzalandı.",
        tokens=["Masadaki", "belgeler", "imzalandı", "."],
        upos=["ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 0, 3],
        deprels=["amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Doçent Ece Aydın ders verdi.",
        tokens=["Doçent", "Ece", "Aydın", "ders", "verdi", "."],
        upos=["NOUN", "PROPN", "PROPN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 1, 5, 0, 5],
        deprels=["nsubj", "flat", "flat", "obj", "root", "punct"],
        ner=["O", "PER", "PER", "O", "O", "O"],
    ),
    dict(
        text="Çiftçilerin ürünleri pazarda satıldı.",
        tokens=["Çiftçilerin", "ürünleri", "pazarda", "satıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Ancak sonuç değişmedi.",
        tokens=["Ancak", "sonuç", "değişmedi", "."],
        upos=["CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["cc", "nsubj", "root", "punct"],
    ),
    dict(
        text="Müdür toplantıyı yarına erteledi.",
        tokens=["Müdür", "toplantıyı", "yarına", "erteledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Şehirde yeni bir hastane yapılacak.",
        tokens=["Şehirde", "yeni", "bir", "hastane", "yapılacak", "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["obl", "amod", "det", "nsubj", "root", "punct"],
    ),
    dict(
        text="Takım kupayı üçüncü kez kazandı.",
        tokens=["Takım", "kupayı", "üçüncü", "kez", "kazandı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Kütüphanedeki kitaplar yeniden düzenlendi.",
        tokens=["Kütüphanedeki", "kitaplar", "yeniden", "düzenlendi",
                "."],
        upos=["ADJ", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["amod", "nsubj", "advmod", "root", "punct"],
    ),
]

for _g in BLIND15:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
