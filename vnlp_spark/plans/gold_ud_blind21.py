"""Twenty-first BLIND gold split — round 3, post-blind-20 generalization check.

Protocol (same as gold_ud_blind{,2..20}.py): blind-20 (commit 779a0fa's
record) was scored ONCE at triple P/R 0.833/0.750 and its seven
categories were fixed with general rules and pinned, burning it.
These 20 NEW sentences were written and UD-annotated by hand AFTER
those fixes landed and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: deliberately REPRESENTATIVE web-news throughout (the
capstone claim is about this register), with unseen members of the
blind-20 fixes woven in naturally: a fresh ``-DIkçA`` converb
(``ilerledikçe``), a PASSIVE ``-mAktAdIr`` (``sürdürülmektedir`` — a
deliberate product-gap probe: the Prog2 family is new and its passive
product untested), a fresh ``-mIş`` participle (``Yıkılmış``),
quantifier ``Bazı``, passive later-subject izafet (``Hastane
bahçesine çocuk parkı yapıldı``), an OSV object under a determiner
(``Sezonu görkemli bir açılış başlattı``), a reduplicated ``tek
tek``, an Agt zero-copula predicate (``şikayetçi``), and a
``nedeniyle`` zero-copula (``kapalı``).

Annotation conventions: the authoritative list in gold_ud.py's
docstring, identical to every earlier split.
"""
from typing import List

BLIND21: List[dict] = [
    dict(
        text="Gün ilerledikçe sıcaklık arttı.",
        tokens=["Gün", "ilerledikçe", "sıcaklık", "arttı", "."],
        upos=["NOUN", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nsubj", "advcl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Kazı çalışmaları özenle sürdürülmektedir.",
        tokens=["Kazı", "çalışmaları", "özenle", "sürdürülmektedir",
                "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Yıkılmış duvarlar onarıldı.",
        tokens=["Yıkılmış", "duvarlar", "onarıldı", "."],
        upos=["VERB", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 0, 3],
        deprels=["acl", "nsubj", "root", "punct"],
    ),
    dict(
        text="Bazı yollar trafiğe kapatıldı.",
        tokens=["Bazı", "yollar", "trafiğe", "kapatıldı", "."],
        upos=["DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["det", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Belediye parklara çöp kutuları yerleştirdi.",
        tokens=["Belediye", "parklara", "çöp", "kutuları",
                "yerleştirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Öğrenciler deney sonuçlarını raporladı.",
        tokens=["Öğrenciler", "deney", "sonuçlarını", "raporladı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Şirket çalışanlarına ek ödeme yapacak.",
        tokens=["Şirket", "çalışanlarına", "ek", "ödeme", "yapacak",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Sel suları köprüyü yıktı.",
        tokens=["Sel", "suları", "köprüyü", "yıktı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Turnuva finali yarın oynanacak.",
        tokens=["Turnuva", "finali", "yarın", "oynanacak", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "advmod", "root", "punct"],
    ),
    dict(
        text="Hastane bahçesine çocuk parkı yapıldı.",
        tokens=["Hastane", "bahçesine", "çocuk", "parkı", "yapıldı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "obl", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Yazar yeni romanında savaşı anlatıyor.",
        tokens=["Yazar", "yeni", "romanında", "savaşı", "anlatıyor",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Takımlar kupa için yarışacak.",
        tokens=["Takımlar", "kupa", "için", "yarışacak", "."],
        upos=["NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[4, 4, 2, 0, 4],
        deprels=["nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Bakanlık okullara kaynak ayırdı.",
        tokens=["Bakanlık", "okullara", "kaynak", "ayırdı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Yangın kısa sürede söndürüldü.",
        tokens=["Yangın", "kısa", "sürede", "söndürüldü", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Sezonu görkemli bir açılış başlattı.",
        tokens=["Sezonu", "görkemli", "bir", "açılış", "başlattı",
                "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["obj", "amod", "det", "nsubj", "root", "punct"],
    ),
    dict(
        text="Komite başvuruları tek tek inceledi.",
        tokens=["Komite", "başvuruları", "tek", "tek", "inceledi",
                "."],
        upos=["NOUN", "NOUN", "ADV", "ADV", "VERB", "PUNCT"],
        heads=[5, 5, 5, 3, 0, 5],
        deprels=["nsubj", "obj", "advmod", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Vatandaşlar gürültü kirliliğinden şikayetçi.",
        tokens=["Vatandaşlar", "gürültü", "kirliliğinden",
                "şikayetçi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Cadde ağaçlandırma çalışması nedeniyle kapalı.",
        tokens=["Cadde", "ağaçlandırma", "çalışması", "nedeniyle",
                "kapalı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "ADJ", "PUNCT"],
        heads=[5, 3, 5, 3, 0, 5],
        deprels=["nsubj", "nmod", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Müzayedede tablo yüksek fiyata satıldı.",
        tokens=["Müzayedede", "tablo", "yüksek", "fiyata", "satıldı",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["obl", "nsubj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Festival programı bugün açıklandı.",
        tokens=["Festival", "programı", "bugün", "açıklandı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "advmod", "root", "punct"],
    ),
]

for _g in BLIND21:
    _g.setdefault("ner", ["O"] * len(_g["tokens"]))
