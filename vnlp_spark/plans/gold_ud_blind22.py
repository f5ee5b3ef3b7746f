"""Twenty-second BLIND gold split — round 4, first of the floor-raising
series VERDICT r03 item #3 demands (three consecutive new frozen splits
scoring >=0.95 first-run, at least one deliberately hard).

Protocol (same as gold_ud_blind{,2..21}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: REPRESENTATIVE web-news prose (the capstone claim's register)
with everyday verb frames: plain transitives with time/place obliques,
a -IncA converb hosting its own subject, two light-verb passives (iptal
edildi / tatil edildi), a tarafından agent frame, an -AcAk ccomp, an
-An participle relative with its own object, finite-clause "ve"
coordination, a zero-copula ADJ predicate, izafet compounds under amod
(yeni bir tedavi yöntemi), and one apostrophe proper noun.

Annotation conventions: the authoritative list in gold_ud.py's
docstring, identical to every earlier split.
"""
from typing import List

BLIND22: List[dict] = [
    dict(
        text="Yetkililer akşam yeni kararları açıkladı.",
        tokens=["Yetkililer", "akşam", "yeni", "kararları", "açıkladı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Şirket geçen ay üç yeni mağaza açtı.",
        tokens=["Şirket", "geçen", "ay", "üç", "yeni", "mağaza", "açtı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NUM", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[7, 3, 7, 6, 6, 7, 0, 7],
        deprels=["nsubj", "amod", "obl", "nummod", "amod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Öğrenciler kütüphanede sınava hazırlanıyor.",
        tokens=["Öğrenciler", "kütüphanede", "sınava", "hazırlanıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Festival bu yıl Antalya'da düzenlenecek.",
        tokens=["Festival", "bu", "yıl", "Antalya'da", "düzenlenecek", "."],
        upos=["NOUN", "DET", "NOUN", "PROPN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "det", "obl", "obl", "root", "punct"],
        ner=["O", "O", "O", "LOC", "O", "O"],
    ),
    dict(
        text="Araştırmacılar yeni bir tedavi yöntemi geliştirdi.",
        tokens=["Araştırmacılar", "yeni", "bir", "tedavi", "yöntemi",
                "geliştirdi", "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 5, 5, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "det", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Takım sezonun ilk maçını kaybetti.",
        tokens=["Takım", "sezonun", "ilk", "maçını", "kaybetti", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Yağışlar nedeniyle bazı seferler iptal edildi.",
        tokens=["Yağışlar", "nedeniyle", "bazı", "seferler", "iptal",
                "edildi", "."],
        upos=["NOUN", "ADP", "DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 4, 6, 6, 0, 6],
        deprels=["obl", "case", "det", "nsubj", "compound", "root", "punct"],
    ),
    dict(
        text="Sanatçı konserde sevilen şarkılarını seslendirdi.",
        tokens=["Sanatçı", "konserde", "sevilen", "şarkılarını",
                "seslendirdi", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "acl", "obj", "root", "punct"],
    ),
    dict(
        text="Uzmanlar fiyatların yeniden artacağını söylüyor.",
        tokens=["Uzmanlar", "fiyatların", "yeniden", "artacağını",
                "söylüyor", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nsubj", "advmod", "ccomp", "root", "punct"],
    ),
    dict(
        text="Kardan dolayı okullar tatil edildi.",
        tokens=["Kardan", "dolayı", "okullar", "tatil", "edildi", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["obl", "case", "nsubj", "compound", "root", "punct"],
    ),
    dict(
        text="Gençler sosyal medyada daha fazla vakit geçiriyor.",
        tokens=["Gençler", "sosyal", "medyada", "daha", "fazla", "vakit",
                "geçiriyor", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADV", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[7, 3, 7, 5, 6, 7, 0, 7],
        deprels=["nsubj", "amod", "obl", "advmod", "amod", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Müze hafta sonu ziyaretçilere açık.",
        tokens=["Müze", "hafta", "sonu", "ziyaretçilere", "açık", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Belediye eski binayı kültür merkezine dönüştürdü.",
        tokens=["Belediye", "eski", "binayı", "kültür", "merkezine",
                "dönüştürdü", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Yarışmaya birçok genç başvurdu.",
        tokens=["Yarışmaya", "birçok", "genç", "başvurdu", "."],
        upos=["NOUN", "DET", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["obl", "det", "nsubj", "root", "punct"],
    ),
    dict(
        text="Kitap kısa sürede çok satıldı.",
        tokens=["Kitap", "kısa", "sürede", "çok", "satıldı", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Hastalar randevularını internetten alabiliyor.",
        tokens=["Hastalar", "randevularını", "internetten", "alabiliyor",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Fırtına çıkınca tekneler limana döndü.",
        tokens=["Fırtına", "çıkınca", "tekneler", "limana", "döndü", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nsubj", "advcl", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Ekipler bölgede arama yaptı ve kayıpları buldu.",
        tokens=["Ekipler", "bölgede", "arama", "yaptı", "ve", "kayıpları",
                "buldu", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "CCONJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[4, 4, 4, 0, 7, 7, 4, 4],
        deprels=["nsubj", "obl", "obj", "root", "cc", "obj", "conj",
                 "punct"],
    ),
    dict(
        text="Köprü yabancı mühendisler tarafından inşa edildi.",
        tokens=["Köprü", "yabancı", "mühendisler", "tarafından", "inşa",
                "edildi", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 4, 6, 6, 0, 6],
        deprels=["nsubj", "amod", "nmod", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Kenti ziyaret eden turistler müzeleri gezdi.",
        tokens=["Kenti", "ziyaret", "eden", "turistler", "müzeleri",
                "gezdi", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 4, 6, 6, 0, 6],
        deprels=["obj", "compound", "acl", "nsubj", "obj", "root", "punct"],
    ),
]
