"""Sixth BLIND gold split — round 3, post-blind-5-fix validation probe.

Protocol (same as gold_ud_blind{,2,3,4,5}.py): blind-5 (commit 721611e)
was scored ONCE at triple P/R 0.800 — it deliberately probed known
frontiers — and its categories were fixed and pinned (commit f70ba13),
burning it.  These 20 NEW sentences were written and UD-annotated by
hand AFTER those fixes landed and are COMMITTED BEFORE the engine
touches them in any way.  This split returns to a REPRESENTATIVE
web-news register (the blind-4 style) rather than adversarial
frontier-probing: everyday SOV clauses, possessive compounds, light
verbs, -ki adjectives, titles, LOC/PER/ORG mentions, purpose clauses,
nominalized complements with genitive subjects, compound tenses and
caused/passive predicates, with entirely fresh lexemes.  The first-run
score is recorded as-is in BENCH.md regardless of outcome.

Annotation conventions: universaldependencies.org/tr, same as
gold_ud.py (first-clause root, title-headed flat names, amod on the
compound head, yap/göster-light-verb nominals as obj, subtypes
collapsed to base relations).
"""
from typing import List

BLIND6: List[dict] = [
    dict(
        text="Hemşireler hastalara ilaçlarını dağıttı.",
        tokens=["Hemşireler", "hastalara", "ilaçlarını", "dağıttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Belediye başkanı yeni projeyi duyurdu.",
        tokens=["Belediye", "başkanı", "yeni", "projeyi", "duyurdu", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Öğrenciler sınav sonuçlarını merakla bekliyor.",
        tokens=["Öğrenciler", "sınav", "sonuçlarını", "merakla",
                "bekliyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Hava sıcaklığı yarın artacak.",
        tokens=["Hava", "sıcaklığı", "yarın", "artacak", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Kütüphanedeki kitaplar yeniden düzenlendi.",
        tokens=["Kütüphanedeki", "kitaplar", "yeniden", "düzenlendi", "."],
        upos=["ADJ", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["amod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Şarkıcı konserde eski şarkılarını söyledi.",
        tokens=["Şarkıcı", "konserde", "eski", "şarkılarını",
                "söyledi", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Yetkililer salgının yayılmasını önlemeye çalışıyor.",
        tokens=["Yetkililer", "salgının", "yayılmasını", "önlemeye",
                "çalışıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Market sabah saatlerinde açıldı.",
        tokens=["Market", "sabah", "saatlerinde", "açıldı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Yazar son romanını köyde yazmıştı.",
        tokens=["Yazar", "son", "romanını", "köyde", "yazmıştı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Çocuk parktaki salıncaktan düştü.",
        tokens=["Çocuk", "parktaki", "salıncaktan", "düştü", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Firma çalışanlarına ek ödeme yapmadı.",
        tokens=["Firma", "çalışanlarına", "ek", "ödeme", "yapmadı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Konser biletleri iki saatte tükendi.",
        tokens=["Konser", "biletleri", "iki", "saatte", "tükendi", "."],
        upos=["NOUN", "NOUN", "NUM", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nummod", "obl", "root", "punct"],
    ),
    dict(
        text="Gazeteci olayları yerinde inceledi.",
        tokens=["Gazeteci", "olayları", "yerinde", "inceledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Takım antrenmanı yağmur nedeniyle iptal etti.",
        tokens=["Takım", "antrenmanı", "yağmur", "nedeniyle", "iptal",
                "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obj", "obl", "case", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Mühendis Aslan köprü projesini üstlendi.",
        tokens=["Mühendis", "Aslan", "köprü", "projesini", "üstlendi",
                "."],
        upos=["NOUN", "PROPN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 4, 5, 0, 5],
        deprels=["nsubj", "flat", "nmod", "obj", "root", "punct"],
        ner=["O", "PER", "O", "O", "O", "O"],
    ),
    dict(
        text="İzmir limanına yeni vinçler kuruldu.",
        tokens=["İzmir", "limanına", "yeni", "vinçler", "kuruldu", "."],
        upos=["PROPN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "amod", "nsubj", "root", "punct"],
        ner=["LOC", "O", "O", "O", "O", "O"],
    ),
    dict(
        text="Hastane yönetimi ek personel talep etti.",
        tokens=["Hastane", "yönetimi", "ek", "personel", "talep",
                "etti", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "amod", "obj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Sporcular turnuvaya hazırlanmak için kampa girdi.",
        tokens=["Sporcular", "turnuvaya", "hazırlanmak", "için", "kampa",
                "girdi", "."],
        upos=["NOUN", "NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "case", "obl", "root", "punct"],
    ),
    dict(
        text="Film eleştirmenlerden olumlu tepkiler aldı.",
        tokens=["Film", "eleştirmenlerden", "olumlu", "tepkiler",
                "aldı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Kar yağışı nedeniyle okullar tatil edildi.",
        tokens=["Kar", "yağışı", "nedeniyle", "okullar", "tatil",
                "edildi", "."],
        upos=["NOUN", "NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 2, 6, 6, 0, 6],
        deprels=["nmod", "obl", "case", "nsubj", "compound", "root",
                 "punct"],
    ),
]

for _g in BLIND6:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
