"""Twenty-sixth BLIND gold split — round 4, the DELIBERATELY HARD slot
of the restarted consecutive gate series (VERDICT r03 item #3: three
consecutive fresh splits scoring >=0.95 first-run, at least one
deliberately hard; blind-24 missed at 0.800, blind-25 at 0.900, so the
series restarts here with the hard probe first).

Protocol (same as gold_ud_blind{,2..25}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.

Register: HARD territory — constructions never probed by any earlier
split, each a known parser trap, plus fresh members of burned
categories carrying homograph traps:

- verb-initial inverted (devrik) clause with a postposed subject
  (`Geldi sonunda beklenen haber`)
- `ki` complement clause (`diyor ki fiyatlar ... düşecek`)
- aspectual verb reduplication `gelir gelmez` (as-soon-as)
- `-DIkçA` converb with an izafet subject in the matrix clause
- abilitative `-Abil` under the question particle (burned category
  `mı`, fresh member `kazanabilir mi`)
- negative copula `değil` over a nominal predicate, with the same
  noun appearing as subject and predicate (`karar ... karar değil`)
- causative with dative causee (`duvarı işçilere boyattı`)
- passive `-mAdAn önce` converb (fresh member; passive subject inside
  the converb clause)
- `olarak` secondary predicate over a pronoun object
- partitive indefinite `hiçbiri` with genitive host
- `gibi` simile under an ADJ+past-copula root (`kuş gibi hafifti`)
- evidential copula ADJ root with the `Yazar` aorist homograph
- `-mAksIzIn` converb (`danışmaksızın`)
- pronominal headless `-ki` in an ablative comparative
  (`bizimkinden daha yeni`)
- correlative `ya ... ya da` finite coordination (the two-token
  second correlative is the ADVICE-flagged bigram)
- `-Iş` deverbal nominalization as genitive-subject izafet nsubj
  (`Ekonominin toparlanışı`)
- `yerine` over an infinitive clause (`artırmak yerine`)
- plural possessive nominal predicate with past copula
  (`sakinleriydi`) under a PRON subject
- `yüz` homograph family (`Yüzücü ... yüzdü`) with PCDat `doğru`
- `bin` homograph (`trene bindi`)

Annotation conventions: the authoritative list in gold_ud.py's
docstring.  Convention notes made BEFORE scoring, where the list is
silent, following the nearest precedent in the frozen corpus:

- complementizer `ki` is SCONJ, `mark` on the complement clause's
  predicate; the clause is ccomp of the saying verb
- aspectual verb reduplication (`gelir gelmez`) heads on the FIRST
  element (advcl), second element `compound` — same head direction as
  the burned `yavaş yavaş` adverb reduplication
- question/negative copular particles are AUX: `mi` aux (burned
  precedent gold_ud.py:783), `değil` cop on the nominal-predicate
  root (UD nonverbal-predicate analysis; subtypes collapsed)
- `olarak` is grammaticalized ADP, `case` on its bare nominal, host
  `obl` (secondary predicate) — parallel to the PCAbl/PCDat class
- `yerine` over an infinitive clause is ADP `case` with the clause as
  advcl — same shape as the frozen `-mAdAn önce` precedent
  (gold_ud.py:1151 annotates önce as case on the converb)
- correlative `ya` is CCONJ `cc` on its own conjunct (the burned
  hem/ne convention); the bigram second correlative `ya da` keeps
  `ya` as cc and attaches `da` to it as `fixed`
- headless possessive `-ki` pronouns (`bizimkinden`) are PRON; the
  comparative standard is obl with `daha` advmod on the ADJ root
  (the burned `eskisinden daha` shape)
"""
from typing import List

BLIND26: List[dict] = [
    dict(
        text="Geldi sonunda beklenen haber.",
        tokens=["Geldi", "sonunda", "beklenen", "haber", "."],
        upos=["VERB", "ADV", "VERB", "NOUN", "PUNCT"],
        heads=[0, 1, 4, 1, 1],
        deprels=["root", "advmod", "acl", "nsubj", "punct"],
    ),
    dict(
        text="Uzmanlar diyor ki fiyatlar yakında düşecek.",
        tokens=["Uzmanlar", "diyor", "ki", "fiyatlar", "yakında",
                "düşecek", "."],
        upos=["NOUN", "VERB", "SCONJ", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[2, 0, 6, 6, 6, 2, 2],
        deprels=["nsubj", "root", "mark", "nsubj", "advmod", "ccomp",
                 "punct"],
    ),
    dict(
        text="Müdür ofise gelir gelmez toplantıyı başlattı.",
        tokens=["Müdür", "ofise", "gelir", "gelmez", "toplantıyı",
                "başlattı", "."],
        upos=["NOUN", "NOUN", "VERB", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obl", "advcl", "compound", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Yağmur yağdıkça nehrin suyu yükseliyordu.",
        tokens=["Yağmur", "yağdıkça", "nehrin", "suyu", "yükseliyordu",
                "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 4, 5, 0, 5],
        deprels=["nsubj", "advcl", "nmod", "nsubj", "root", "punct"],
    ),
    dict(
        text="Takım bu maçı kazanabilir mi?",
        tokens=["Takım", "bu", "maçı", "kazanabilir", "mi", "?"],
        upos=["NOUN", "DET", "NOUN", "VERB", "AUX", "PUNCT"],
        heads=[4, 3, 4, 0, 4, 4],
        deprels=["nsubj", "det", "obj", "root", "aux", "punct"],
    ),
    dict(
        text="Bu karar kolay bir karar değil.",
        tokens=["Bu", "karar", "kolay", "bir", "karar", "değil", "."],
        upos=["DET", "NOUN", "ADJ", "DET", "NOUN", "AUX", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5, 5],
        deprels=["det", "nsubj", "amod", "det", "root", "cop", "punct"],
    ),
    dict(
        text="Patron duvarı işçilere boyattı.",
        tokens=["Patron", "duvarı", "işçilere", "boyattı", "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Karar açıklanmadan önce piyasalar dalgalanıyordu.",
        tokens=["Karar", "açıklanmadan", "önce", "piyasalar",
                "dalgalanıyordu", "."],
        upos=["NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[2, 5, 2, 5, 0, 5],
        deprels=["nsubj", "advcl", "case", "nsubj", "root", "punct"],
    ),
    dict(
        text="Kurul onu başkan olarak seçti.",
        tokens=["Kurul", "onu", "başkan", "olarak", "seçti", "."],
        upos=["NOUN", "PRON", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[5, 5, 5, 3, 0, 5],
        deprels=["nsubj", "obj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Davetlilerin hiçbiri törene katılmadı.",
        tokens=["Davetlilerin", "hiçbiri", "törene", "katılmadı", "."],
        upos=["NOUN", "PRON", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Çocuk kuş gibi hafifti.",
        tokens=["Çocuk", "kuş", "gibi", "hafifti", "."],
        upos=["NOUN", "NOUN", "ADP", "ADJ", "PUNCT"],
        heads=[4, 4, 2, 0, 4],
        deprels=["nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Yazar gençliğinde çok yoksulmuş.",
        tokens=["Yazar", "gençliğinde", "çok", "yoksulmuş", "."],
        upos=["NOUN", "NOUN", "ADV", "ADJ", "PUNCT"],
        heads=[4, 4, 4, 0, 4],
        deprels=["nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Şirket kimseye danışmaksızın fabrikayı kapattı.",
        tokens=["Şirket", "kimseye", "danışmaksızın", "fabrikayı",
                "kapattı", "."],
        upos=["NOUN", "PRON", "VERB", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "obl", "advcl", "obj", "root", "punct"],
    ),
    dict(
        text="Komşunun arabası bizimkinden daha yeniydi.",
        tokens=["Komşunun", "arabası", "bizimkinden", "daha", "yeniydi",
                "."],
        upos=["NOUN", "NOUN", "PRON", "ADV", "ADJ", "PUNCT"],
        heads=[2, 5, 5, 5, 0, 5],
        deprels=["nmod", "nsubj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Yönetim ya fabrikayı satacak ya da üretimi durduracak.",
        tokens=["Yönetim", "ya", "fabrikayı", "satacak", "ya", "da",
                "üretimi", "durduracak", "."],
        upos=["NOUN", "CCONJ", "NOUN", "VERB", "CCONJ", "CCONJ",
              "NOUN", "VERB", "PUNCT"],
        heads=[4, 4, 4, 0, 8, 5, 8, 4, 4],
        deprels=["nsubj", "cc", "obj", "root", "cc", "fixed", "obj",
                 "conj", "punct"],
    ),
    dict(
        text="Ekonominin toparlanışı uzmanları şaşırttı.",
        tokens=["Ekonominin", "toparlanışı", "uzmanları", "şaşırttı",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 4, 4, 0, 4],
        deprels=["nmod", "nsubj", "obj", "root", "punct"],
    ),
    dict(
        text="Hükümet vergileri artırmak yerine harcamaları kıstı.",
        tokens=["Hükümet", "vergileri", "artırmak", "yerine",
                "harcamaları", "kıstı", "."],
        upos=["NOUN", "NOUN", "VERB", "ADP", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 3, 6, 0, 6],
        deprels=["nsubj", "obj", "advcl", "case", "obj", "root",
                 "punct"],
    ),
    dict(
        text="Onlar bu mahallenin en eski sakinleriydi.",
        tokens=["Onlar", "bu", "mahallenin", "en", "eski",
                "sakinleriydi", "."],
        upos=["PRON", "DET", "NOUN", "ADV", "ADJ", "NOUN", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "det", "nmod", "advmod", "amod", "root",
                 "punct"],
    ),
    dict(
        text="Yüzücü kıyıya doğru yüzdü.",
        tokens=["Yüzücü", "kıyıya", "doğru", "yüzdü", "."],
        upos=["NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[4, 4, 2, 0, 4],
        deprels=["nsubj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Yolcular son anda trene bindi.",
        tokens=["Yolcular", "son", "anda", "trene", "bindi", "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obl", "obl", "root", "punct"],
    ),
]
