"""Thirty-seventh BLIND gold split — round 4, attempt 1 of the restarted
consecutive representative series (blind-36 scored 0.778; this split was
frozen AFTER its eight category fixes were pinned).

Protocol (same as gold_ud_blind{,2..36}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (zero out-of-lexicon words); the parser was not run on
any candidate sentence.

Register: REPRESENTATIVE web-news prose, fresh content vocabulary
across burned categories: plain transitive clauses with duration
obliques (üç haftada dikti); plural-possessed izafet subjects with
month obliques (Yayla şenlikleri temmuzda); Ins obliques; zincirleme
compound objects (konut kredisi faizlerini); genitive-subject Inf2
ccomps (yollarının asfaltlanmasını); göre/rağmen ADPs; spatial izafet
obliques (dere kenarına); agentive subjects with -lA transitives
(Marangoz ... cilaladı); izafet passive subjects (Tiyatro oyunu
sahnelenecek); adjective-homograph subjects with ver-LVCs (Göçmen
kuşlar ... mola verdi); possessed time obliques (imza gününde, son
anda); fixed 'bir araya getirdi' frames; attributive -lI objects
(tartışmalı golü) under et-LVCs; future passives (kayıtları
haziranda alınacak); NomP-chained Acc objects under causatives
(fabrikası üretimi iki katına çıkardı).

Convention notes made BEFORE scoring, where the list is silent:
'göçmen kuşlar' is ADJ amod (dictionary adjective 'migratory');
'bir araya getirdi' is DET + Dat oblique on the verb (the spatial
noun keeps its literal frame); 'mola/mola verdi' keeps the LVC
nominal as obj (frozen light-verb convention).
"""
from typing import List

BLIND37: List[dict] = [
    dict(
        text="Terzi gelinliği üç haftada dikti.",
        tokens=["Terzi", "gelinliği", "üç", "haftada", "dikti", "."],
        upos=["NOUN", "NOUN", "NUM", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "nummod", "obl", "root", "punct"],
    ),
    dict(
        text="Yayla şenlikleri temmuzda başlıyor.",
        tokens=["Yayla", "şenlikleri", "temmuzda", "başlıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Nakliyeciler eşyaları asansörle indirdi.",
        tokens=["Nakliyeciler", "eşyaları", "asansörle", "indirdi",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Banka konut kredisi faizlerini düşürdü.",
        tokens=["Banka", "konut", "kredisi", "faizlerini", "düşürdü",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "nmod", "obj", "root", "punct"],
    ),
    dict(
        text="Orkestra turneye yeni eserlerle çıkıyor.",
        tokens=["Orkestra", "turneye", "yeni", "eserlerle", "çıkıyor",
                "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obl", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Muhtarlar köy yollarının asfaltlanmasını istedi.",
        tokens=["Muhtarlar", "köy", "yollarının", "asfaltlanmasını",
                "istedi", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "VERB", "PUNCT"],
        heads=[5, 3, 4, 5, 0, 5],
        deprels=["nsubj", "nmod", "nsubj", "ccomp", "root", "punct"],
    ),
    dict(
        text="Eczaneler nöbet çizelgesine göre açılıyor.",
        tokens=["Eczaneler", "nöbet", "çizelgesine", "göre",
                "açılıyor", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[5, 3, 5, 3, 0, 5],
        deprels=["nsubj", "nmod", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Yüzücüler soğuk suya rağmen yarışı tamamladı.",
        tokens=["Yüzücüler", "soğuk", "suya", "rağmen", "yarışı",
                "tamamladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "amod", "obl", "case", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Kampçılar çadırları dere kenarına kurdu.",
        tokens=["Kampçılar", "çadırları", "dere", "kenarına", "kurdu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Marangoz eski dolapları cilaladı.",
        tokens=["Marangoz", "eski", "dolapları", "cilaladı", "."],
        upos=["NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[4, 3, 4, 0, 4],
        deprels=["nsubj", "amod", "obj", "root", "punct"],
    ),
    dict(
        text="Tiyatro oyunu başkentte sahnelenecek.",
        tokens=["Tiyatro", "oyunu", "başkentte", "sahnelenecek", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Göçmen kuşlar gölde mola verdi.",
        tokens=["Göçmen", "kuşlar", "gölde", "mola", "verdi", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obl", "obj", "root", "punct"],
    ),
    dict(
        text="Kaleci penaltıyı son anda kurtardı.",
        tokens=["Kaleci", "penaltıyı", "son", "anda", "kurtardı", "."],
        upos=["NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "amod", "obl", "root", "punct"],
    ),
    dict(
        text="Yazar yeni romanını imza gününde tanıttı.",
        tokens=["Yazar", "yeni", "romanını", "imza", "gününde",
                "tanıttı", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "amod", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="İtfaiye ekipleri alevleri kısa sürede söndürdü.",
        tokens=["İtfaiye", "ekipleri", "alevleri", "kısa", "sürede",
                "söndürdü", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Pilav günü mezunları bir araya getirdi.",
        tokens=["Pilav", "günü", "mezunları", "bir", "araya",
                "getirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "DET", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "det", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Müzayedede nadide halılar satışa sunuldu.",
        tokens=["Müzayedede", "nadide", "halılar", "satışa", "sunuldu",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["obl", "amod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Hakem tartışmalı golü iptal etti.",
        tokens=["Hakem", "tartışmalı", "golü", "iptal", "etti", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "compound", "root", "punct"],
    ),
    dict(
        text="Anaokulu kayıtları haziranda alınacak.",
        tokens=["Anaokulu", "kayıtları", "haziranda", "alınacak", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Buzdolabı fabrikası üretimi iki katına çıkardı.",
        tokens=["Buzdolabı", "fabrikası", "üretimi", "iki", "katına",
                "çıkardı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NUM", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "nummod", "obl", "root",
                 "punct"],
    ),
]
