"""Nineteenth BLIND gold split — round 3, post-blind-18 generalization check.

Protocol (same as gold_ud_blind{,2..18}.py): blind-18 (commit aef8d8f's
record) was scored ONCE at triple P/R 0.895/0.850 and its four
categories were fixed with general rules and pinned, burning it.
These 20 NEW sentences were written and UD-annotated by hand AFTER
those fixes landed and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: representative web-news, fresh content lexemes.  Unseen-
member probes of the blind-18 fixes: an impersonal-passive light verb
(``yardım edildi``), an OSV object (``Soruyu genç öğrenci``), a
pronoun over a genitive pronoun (``O hepinizin görevi``), and a
Become+Caus+Pass chain (``sadeleştirildi``).  Virgin constructions:
``rağmen``, equative ``kadar`` under a zero-copula past, a ``-ken``
converb WITH its own overt subject (``Yağmur yağarken maç durdu``),
``Birçok`` and ``Hiçbir`` determiners, ability ``-Abil`` and
negative-ability ``-AmA``, necessitative ``-mAlI``, possessive
existential (``Kulübün yeni planları var``), bare evidential
``-mIş``, a double-izafet passive (``Konferans salonunda basın
toplantısı düzenlendi``), and a participle-headed OSV object
(``Kazanan takımı taraftarlar kutladı``).

Annotation conventions: the authoritative list in gold_ud.py's
docstring, identical to every earlier split.
"""
from typing import List

BLIND19: List[dict] = [
    dict(
        text="Komşulara yardım edildi.",
        tokens=["Komşulara", "yardım", "edildi", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["obl", "compound", "root", "punct"],
    ),
    dict(
        text="Soruyu genç öğrenci yanıtladı.",
        tokens=["Soruyu", "genç", "öğrenci", "yanıtladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["obj", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="O hepinizin görevi.",
        tokens=["O", "hepinizin", "görevi", "."],
        upos=["PRON", "PRON", "NOUN", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "nmod", "root", "punct"],
    ),
    dict(
        text="Kurallar sadeleştirildi.",
        tokens=["Kurallar", "sadeleştirildi", "."],
        upos=["NOUN", "VERB", "PUNCT"],
        heads=[2, 0, 2],
        deprels=["nsubj", "root", "punct"],
    ),
    dict(
        text="Yağmura rağmen maç oynandı.",
        tokens=["Yağmura", "rağmen", "maç", "oynandı", "."],
        upos=["NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[4, 1, 4, 0, 4],
        deprels=["obl", "case", "nsubj", "root", "punct"],
    ),
    dict(
        text="Salon okul kadar kalabalıktı.",
        tokens=["Salon", "okul", "kadar", "kalabalıktı", "."],
        upos=["NOUN", "NOUN", "ADP", "ADJ", "PUNCT"],
        heads=[4, 4, 2, 0, 4],
        deprels=["nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Yağmur yağarken maç durdu.",
        tokens=["Yağmur", "yağarken", "maç", "durdu", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Birçok yatırımcı piyasadan çekildi.",
        tokens=["Birçok", "yatırımcı", "piyasadan", "çekildi", "."],
        upos=["DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["det", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Yolcular biletlerini kolayca alabilir.",
        tokens=["Yolcular", "biletlerini", "kolayca", "alabilir", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Sürücüler kurallara uymalı.",
        tokens=["Sürücüler", "kurallara", "uymalı", "."],
        upos=["NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Kulübün yeni planları var.",
        tokens=["Kulübün", "yeni", "planları", "var", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADJ", "PUNCT"],
        heads=[3, 3, 4, 0, 4],
        deprels=["nmod", "amod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Fiyatlar yine artmış.",
        tokens=["Fiyatlar", "yine", "artmış", "."],
        upos=["NOUN", "ADV", "VERB", "PUNCT"],
        heads=[3, 3, 0, 3],
        deprels=["nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Konferans salonunda basın toplantısı düzenlendi.",
        tokens=["Konferans", "salonunda", "basın", "toplantısı",
                "düzenlendi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Kazanan takımı taraftarlar kutladı.",
        tokens=["Kazanan", "takımı", "taraftarlar", "kutladı", "."],
        upos=["VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["acl", "obj", "nsubj", "root", "punct"],
    ),
    dict(
        text="Artık herkes sonucu biliyor.",
        tokens=["Artık", "herkes", "sonucu", "biliyor", "."],
        upos=["ADV", "PRON", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["advmod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Hiçbir aday yeterli oy alamadı.",
        tokens=["Hiçbir", "aday", "yeterli", "oy", "alamadı", "."],
        upos=["DET", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["det", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Festival bu yıl üç gün sürecek.",
        tokens=["Festival", "bu", "yıl", "üç", "gün", "sürecek", "."],
        upos=["NOUN", "DET", "NOUN", "NUM", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "det", "obl", "nummod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Gazeteciler açıklamayı dikkatle dinledi.",
        tokens=["Gazeteciler", "açıklamayı", "dikkatle", "dinledi",
                "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "advmod", "root", "punct"],
    ),
    dict(
        text="Ekipler hasarlı binaları işaretledi.",
        tokens=["Ekipler", "hasarlı", "binaları", "işaretledi", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Müdür yarın izinli olacak.",
        tokens=["Müdür", "yarın", "izinli", "olacak", "."],
        upos=["NOUN", "ADV", "ADJ", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "advmod", "compound", "root", "punct"],
    ),
]

for _g in BLIND19:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
