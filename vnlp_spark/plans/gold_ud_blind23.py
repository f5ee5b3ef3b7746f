"""Twenty-third BLIND gold split — round 4, the DELIBERATELY HARD
probe the floor-raising series requires (VERDICT r03 item #3: three
consecutive fresh splits scoring >=0.95 first-run, at least one
deliberately hard).

Protocol (same as gold_ud_blind{,2..22}.py): these 20 NEW sentences
were written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches
them in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: HARD territory chosen to be virgin — constructions never
probed by any earlier split, plus fresh members of burned categories,
each carrying a deliberate homograph trap:

- fresh case-governing postpositions: PCAbl `itibaren`, `dolayı`,
  `beri`; PCDat `doğru` (ADJ homograph), `karşın`, purpose `üzere`
- finite conditional `-sA` advcl; comma parataxis (mining-path probe)
- clausal subject csubj (`bitmesi ... sevindirdi`) — a relation no
  split has used
- embedded wh complement (`fiyatların neden arttığını açıkladı`)
- `-AcAk` participle relative (`Yapılacak yatırımlar`) and `-DIk`
  genitive-subject relative (`Bakanlığın hazırladığı rapor`)
- ADV reduplication (`yavaş yavaş` — NUM reduplication is burned,
  ADV is virgin)
- correlative coordination `hem ... hem` and `ne ... ne`
- percentage numeral frame (`yüzde on`)
- negative existential `yok` as root (possessive `var` is burned)
- `-DIr` nominal predicate with the `tarihi` ADJ/izafet garden path
  (`Bu anlaşma tarihi bir adımdır`)
- pronominal partitive `çoğu` with genitive host (DET `Çoğu` is
  burned; PRON partitive is virgin)
- comparative `eskisinden daha` with a derived-nominal ablative
- homograph traps woven in: `Ekip` (ek+Ip converb), `kapakları` /
  `kararı` (izafet-vs-Acc), `ek` (ADJ vs NOUN), `sürerse` (sür/süre)

Annotation conventions: the authoritative list in gold_ud.py's
docstring, identical to every earlier split.  Convention notes made
BEFORE scoring, where the list is silent: `yüzde` heads its numeral
(`on` nummod) and attaches obl, matching the bare-measure-noun obl
convention; reduplicated adverbs attach second-to-first as compound
(subtype compound:redup collapsed to base, same as every subtype);
correlative `hem`/`ne` are CCONJ cc on their own conjunct; partitive
`çoğu` is PRON with its genitive host as nmod; `karşın`/`itibaren`/
`dolayı`/`beri`/`doğru`/`üzere` are ADP/case per the grammaticalized-
postposition convention.
"""
from typing import List

BLIND23: List[dict] = [
    # PCAbl itibaren + copular ol- compound
    dict(
        text="Yeni tarife pazartesiden itibaren geçerli olacak.",
        tokens=["Yeni", "tarife", "pazartesiden", "itibaren", "geçerli",
                "olacak", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADP", "ADJ", "VERB", "PUNCT"],
        heads=[2, 6, 6, 3, 6, 0, 6],
        deprels=["amod", "nsubj", "obl", "case", "compound", "root",
                 "punct"],
    ),
    # PCAbl dolayı + light-verb passive + DET tüm
    dict(
        text="Fırtınadan dolayı tüm seferler iptal edildi.",
        tokens=["Fırtınadan", "dolayı", "tüm", "seferler", "iptal",
                "edildi", "."],
        upos=["NOUN", "ADP", "DET", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 1, 4, 6, 6, 0, 6],
        deprels=["obl", "case", "det", "nsubj", "compound", "root",
                 "punct"],
    ),
    # PCDat doğru (ADJ homograph) + Ekip (ek+Ip converb homograph)
    dict(
        text="Ekip sınıra doğru yola çıktı.",
        tokens=["Ekip", "sınıra", "doğru", "yola", "çıktı", "."],
        upos=["NOUN", "NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 2, 5, 0, 5],
        deprels=["nsubj", "obl", "case", "obl", "root", "punct"],
    ),
    # PCAbl beri
    dict(
        text="Sabahtan beri kentte yağmur yağıyor.",
        tokens=["Sabahtan", "beri", "kentte", "yağmur", "yağıyor", "."],
        upos=["NOUN", "ADP", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 1, 5, 5, 0, 5],
        deprels=["obl", "case", "obl", "nsubj", "root", "punct"],
    ),
    # finite conditional -sA advcl + izafet subject (kapakları)
    dict(
        text="Yağış sürerse baraj kapakları açılacak.",
        tokens=["Yağış", "sürerse", "baraj", "kapakları", "açılacak", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nsubj", "advcl", "nmod", "nsubj", "root", "punct"],
    ),
    # clausal subject csubj; zamanında = NOUN obl per conventions
    dict(
        text="Projenin zamanında bitmesi herkesi sevindirdi.",
        tokens=["Projenin", "zamanında", "bitmesi", "herkesi",
                "sevindirdi", "."],
        upos=["NOUN", "NOUN", "VERB", "PRON", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "csubj", "obj", "root", "punct"],
    ),
    # embedded wh complement: neden inside a -DIk ccomp
    dict(
        text="Uzmanlar fiyatların neden arttığını açıkladı.",
        tokens=["Uzmanlar", "fiyatların", "neden", "arttığını",
                "açıkladı", "."],
        upos=["NOUN", "NOUN", "ADV", "VERB", "VERB", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["nsubj", "nsubj", "advmod", "ccomp", "root", "punct"],
    ),
    # -AcAk participle relative + -ki adjectivizer
    dict(
        text="Yapılacak yatırımlar önümüzdeki hafta açıklanacak.",
        tokens=["Yapılacak", "yatırımlar", "önümüzdeki", "hafta",
                "açıklanacak", "."],
        upos=["VERB", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["acl", "nsubj", "amod", "obl", "root", "punct"],
    ),
    # ADV reduplication (compound:redup -> compound)
    dict(
        text="Piyasa yavaş yavaş toparlanıyor.",
        tokens=["Piyasa", "yavaş", "yavaş", "toparlanıyor", "."],
        upos=["NOUN", "ADV", "ADV", "VERB", "PUNCT"],
        heads=[4, 4, 2, 0, 4],
        deprels=["nsubj", "advmod", "compound", "root", "punct"],
    ),
    # correlative hem ... hem
    dict(
        text="Şirket hem üretimi hem ihracatı artırdı.",
        tokens=["Şirket", "hem", "üretimi", "hem", "ihracatı", "artırdı",
                "."],
        upos=["NOUN", "CCONJ", "NOUN", "CCONJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 3, 0, 6],
        deprels=["nsubj", "cc", "obj", "cc", "conj", "root", "punct"],
    ),
    # correlative ne ... ne with ek ADJ homograph
    dict(
        text="Yönetim ne zam ne ek ödeme önerdi.",
        tokens=["Yönetim", "ne", "zam", "ne", "ek", "ödeme", "önerdi",
                "."],
        upos=["NOUN", "CCONJ", "NOUN", "CCONJ", "ADJ", "NOUN", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 6, 6, 3, 0, 7],
        deprels=["nsubj", "cc", "obj", "cc", "amod", "conj", "root",
                 "punct"],
    ),
    # percentage frame: yüzde heads its numeral, attaches obl
    dict(
        text="İhracat geçen yıla göre yüzde on arttı.",
        tokens=["İhracat", "geçen", "yıla", "göre", "yüzde", "on",
                "arttı", "."],
        upos=["NOUN", "ADJ", "NOUN", "ADP", "NOUN", "NUM", "VERB",
              "PUNCT"],
        heads=[7, 3, 7, 3, 7, 5, 0, 7],
        deprels=["nsubj", "amod", "obl", "case", "obl", "nummod", "root",
                 "punct"],
    ),
    # negative existential yok as ADJ root
    dict(
        text="Raporda somut bir öneri yok.",
        tokens=["Raporda", "somut", "bir", "öneri", "yok", "."],
        upos=["NOUN", "ADJ", "DET", "NOUN", "ADJ", "PUNCT"],
        heads=[5, 4, 4, 5, 0, 5],
        deprels=["obl", "amod", "det", "nsubj", "root", "punct"],
    ),
    # -DIr nominal predicate; tarihi ADJ vs izafet garden path
    dict(
        text="Bu anlaşma tarihi bir adımdır.",
        tokens=["Bu", "anlaşma", "tarihi", "bir", "adımdır", "."],
        upos=["DET", "NOUN", "ADJ", "DET", "NOUN", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["det", "nsubj", "amod", "det", "root", "punct"],
    ),
    # pronominal partitive çoğu with genitive host
    dict(
        text="Katılımcıların çoğu öneriyi destekledi.",
        tokens=["Katılımcıların", "çoğu", "öneriyi", "destekledi", "."],
        upos=["NOUN", "PRON", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obj", "root", "punct"],
    ),
    # comparative: derived-nominal ablative + daha + zero-copula ADJ
    dict(
        text="Yeni sistem eskisinden daha hızlı.",
        tokens=["Yeni", "sistem", "eskisinden", "daha", "hızlı", "."],
        upos=["ADJ", "NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["amod", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    # PCDat karşın (concessive; rağmen is burned, karşın virgin)
    dict(
        text="Uyarılara karşın üretim sürdü.",
        tokens=["Uyarılara", "karşın", "üretim", "sürdü", "."],
        upos=["NOUN", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[4, 1, 4, 0, 4],
        deprels=["obl", "case", "nsubj", "root", "punct"],
    ),
    # purpose üzere over an infinitive advcl with its own dative obl
    dict(
        text="Heyet görüşmelere katılmak üzere Ankara'ya gitti.",
        tokens=["Heyet", "görüşmelere", "katılmak", "üzere", "Ankara'ya",
                "gitti", "."],
        upos=["NOUN", "NOUN", "VERB", "ADP", "PROPN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "case", "obl", "root", "punct"],
        ner=["O", "O", "O", "O", "LOC", "O", "O"],
    ),
    # -DIk genitive-subject relative
    dict(
        text="Bakanlığın hazırladığı rapor kamuoyuna sunuldu.",
        tokens=["Bakanlığın", "hazırladığı", "rapor", "kamuoyuna",
                "sunuldu", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 3, 5, 5, 0, 5],
        deprels=["nsubj", "acl", "nsubj", "obl", "root", "punct"],
    ),
    # comma parataxis (the mining path) + kararı Acc-vs-izafet trap
    dict(
        text="Genel müdür istifasını yönetim kuruluna sundu, kurul kararı onayladı.",
        tokens=["Genel", "müdür", "istifasını", "yönetim", "kuruluna",
                "sundu", ",", "kurul", "kararı", "onayladı", "."],
        upos=["ADJ", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT",
              "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 10, 10, 10, 6, 6],
        deprels=["amod", "nsubj", "obj", "nmod", "obl", "root", "punct",
                 "nsubj", "obj", "parataxis", "punct"],
    ),
]
