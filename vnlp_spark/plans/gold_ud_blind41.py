"""Forty-first BLIND gold split — round 4, the CLOSER of the restarted
consecutive representative series (blind-39 and blind-40 cleared the
gate at 1.000 and 0.950 first-run; a third consecutive ≥0.95 first-run
here completes the VERDICT r03 criterion).

Protocol (same as gold_ud_blind{,2..40}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (zero out-of-lexicon words); the parser was not run on
any candidate sentence.

Register: REPRESENTATIVE web-news prose, everyday vocabulary in fresh
combinations across burned categories: boyunca duration ADPs (yaz
boyunca bastı); Dat-goal objects (sondaj kulesini sahaya kurdu);
izafet subjects with izafet objects (meclisi bütçe görüşmelerini);
genitive-subject Inf2 ccomps (alanların korunmasını); Ins instrument
obliques (tabletle alıyor); Dat + bare-object distributions
(üreticilere fide dağıttı); three-element izafet obliques (milli
takım kampına); genitive-possessor objects under futures (şairlerin
eserlerini basacak); Dat-goal unaccusatives (mevsim normallerine
döndü); Dat + Acc et-complexes (yolculara iniş saatini anons etti);
Ins-comitative masaya-otur frames; izafet passive-ish middles
(yurtları ... doldu); Gen objects (albümün müjdesini verdi); Loc +
bare-object finds (kazı alanında mozaik buldu); object-predicative
sabit-tut frames (faizlerini sabit tuttu); Dat-goal participations
(sahil temizliğine katıldı); Acc updates (kurallarını güncelledi);
Dat + amod-object sales (ziyaretçilere organik süt satıyor).

Convention notes made BEFORE scoring, where the list is silent:
'sabit tuttu' is the copular-class predicative complement (sabit
ADJ compound on tuttu — the ol-/kal- precedent extended to tut- in
its keep-sense); 'masaya oturdu' reads masaya as the verb's own
oblique; 'anons etti' is an et-complex with the outside object
(iniş saatini) as obj.
"""
from typing import List

BLIND41: List[dict] = [
    dict(
        text="Matbaa ders kitaplarını yaz boyunca bastı.",
        tokens=["Matbaa", "ders", "kitaplarını", "yaz", "boyunca",
                "bastı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 4, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "case", "root",
                 "punct"],
    ),
    dict(
        text="Mühendisler sondaj kulesini sahaya kurdu.",
        tokens=["Mühendisler", "sondaj", "kulesini", "sahaya", "kurdu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Belediye meclisi bütçe görüşmelerini tamamladı.",
        tokens=["Belediye", "meclisi", "bütçe", "görüşmelerini",
                "tamamladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Çevreciler sulak alanların korunmasını savundu.",
        tokens=["Çevreciler", "sulak", "alanların", "korunmasını",
                "savundu", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "nsubj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Garsonlar siparişleri tabletle alıyor.",
        tokens=["Garsonlar", "siparişleri", "tabletle", "alıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Kargo şirketi teslimat sürelerini kısalttı.",
        tokens=["Kargo", "şirketi", "teslimat", "sürelerini",
                "kısalttı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Ziraat odası üreticilere fide dağıttı.",
        tokens=["Ziraat", "odası", "üreticilere", "fide", "dağıttı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Sporcular milli takım kampına katıldı.",
        tokens=["Sporcular", "milli", "takım", "kampına", "katıldı",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Yayınevi genç şairlerin eserlerini basacak.",
        tokens=["Yayınevi", "genç", "şairlerin", "eserlerini",
                "basacak", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Hava sıcaklığı mevsim normallerine döndü.",
        tokens=["Hava", "sıcaklığı", "mevsim", "normallerine", "döndü",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Kaptan yolculara iniş saatini anons etti.",
        tokens=["Kaptan", "yolculara", "iniş", "saatini", "anons",
                "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 6, 4, 6, 6, 0, 6],
        deprels=["nsubj", "obl", "nmod", "obj", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Sendika temsilcileri işverenle masaya oturdu.",
        tokens=["Sendika", "temsilcileri", "işverenle", "masaya",
                "oturdu", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "obl", "root", "punct"],
    ),
    dict(
        text="Noter satış sözleşmesini onayladı.",
        tokens=["Noter", "satış", "sözleşmesini", "onayladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Öğrenci yurtları kayıt döneminde doldu.",
        tokens=["Öğrenci", "yurtları", "kayıt", "döneminde", "doldu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nmod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Şarkıcı yeni albümün müjdesini verdi.",
        tokens=["Şarkıcı", "yeni", "albümün", "müjdesini", "verdi",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "amod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Arkeologlar kazı alanında mozaik buldu.",
        tokens=["Arkeologlar", "kazı", "alanında", "mozaik", "buldu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Bankalar kredi faizlerini sabit tuttu.",
        tokens=["Bankalar", "kredi", "faizlerini", "sabit", "tuttu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "nmod", "obj", "compound", "root", "punct"],
    ),
    dict(
        text="Gönüllü gençler sahil temizliğine katıldı.",
        tokens=["Gönüllü", "gençler", "sahil", "temizliğine",
                "katıldı", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["amod", "nsubj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Hakemler turnuva kurallarını güncelledi.",
        tokens=["Hakemler", "turnuva", "kurallarını", "güncelledi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Çiftlik ziyaretçilere organik süt satıyor.",
        tokens=["Çiftlik", "ziyaretçilere", "organik", "süt",
                "satıyor", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obj", "root", "punct"],
    ),
]
