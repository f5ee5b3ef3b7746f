"""Generate vnlp_spark/resources/suffix_tags_fixture.txt.gz.

The reference's full suffix dictionary (``Suffixes&Tags.txt``, consumed at
_yildiz_analyzer.py:85-96) is absent from the snapshot
(/root/reference/.MISSING_LARGE_BLOBS).  This script composes a fixture
table from standard Turkish morphotactics: the nominal inflection paradigm
(number x possessive x case with full vowel-harmony / buffer-consonant /
consonant-voicing surface variants, plus apostrophe-marked proper-noun
twins) and the core verbal tense x person paradigms.  Output format matches
the reference loader: one ``surface_suffix<TAB>tag_string`` row per reading.

Run once: python scripts/gen_suffix_fixture.py  (output is committed).
"""
from __future__ import annotations

import gzip
import os

# Harmony classes: the high vowel (H) and low vowel (A) that a suffix takes
# depend on the preceding vowel.  The root's harmony is unknown at table-build
# time, so the first morpheme enumerates all four classes; subsequent
# morphemes follow the chain.  State: (high, low, ends_in_vowel, after_p3)
CLASSES = [("ı", "a"), ("i", "e"), ("u", "a"), ("ü", "e")]

# After a vowel-final stem, case/possessive suffixes need buffer consonants;
# after a consonant-final stem the bare form attaches.  Locative/ablative
# d- voices to t- after voiceless consonants: both variants are enumerated
# for consonant-final states (a real table lists both surface forms too).


def nominal_paradigm():
    rows = set()  # (surface, tags)

    def expand(state, surface, tags_so_far, stage):
        high, low, ends_vowel, after_p3 = state
        # stage: 0=start (may take PL), 1=may take POSS, 2=may take CASE, 3=done
        if stage <= 0:
            # plural lAr
            s = "l" + low + "r"
            expand((high, low, False, False), surface + s, tags_so_far + ["A3pl"], 1)
            expand(state, surface, tags_so_far + ["A3sg"], 1)
        elif stage == 1:
            num = tags_so_far[-1]
            # Pnon
            expand(state, surface, tags_so_far + ["Pnon"], 2)
            if num == "A3pl" and surface.endswith("r"):
                # lAr + H  -> P3pl reading of "ları/leri"
                expand((high, low, True, True), surface + high, tags_so_far[:-1] + ["A3sg", "P3pl"], 2)
            poss = {
                "P1sg": "m" if ends_vowel else high + "m",
                "P2sg": "n" if ends_vowel else high + "n",
                "P3sg": ("s" + high) if ends_vowel else high,
                "P1pl": ("m" + high + "z") if ends_vowel else (high + "m" + high + "z"),
                "P2pl": ("n" + high + "z") if ends_vowel else (high + "n" + high + "z"),
            }
            for tag, s in poss.items():
                p3 = tag == "P3sg"
                expand((high, low, s[-1] in "ıiuüae", p3), surface + s, tags_so_far + [tag], 2)
        elif stage == 2:
            # Nom
            rows.add((surface, "+".join(tags_so_far + ["Nom"])))
            if after_p3:
                case = {
                    "Acc": "n" + high,
                    "Dat": "n" + low,
                    "Loc": ["nd" + low],
                    "Abl": ["nd" + low + "n"],
                    "Gen": "n" + high + "n",
                    "Ins": "yl" + low,
                }
            elif ends_vowel:
                case = {
                    "Acc": "y" + high,
                    "Dat": "y" + low,
                    "Loc": ["d" + low],
                    "Abl": ["d" + low + "n"],
                    "Gen": "n" + high + "n",
                    "Ins": "yl" + low,
                }
            else:
                case = {
                    "Acc": high,
                    "Dat": low,
                    "Loc": ["d" + low, "t" + low],
                    "Abl": ["d" + low + "n", "t" + low + "n"],
                    "Gen": high + "n",
                    "Ins": "l" + low,
                }
            for tag, forms in case.items():
                if isinstance(forms, str):
                    forms = [forms]
                for s in forms:
                    rows.add((surface + s, "+".join(tags_so_far + [tag])))

    for high, low in CLASSES:
        for ends_vowel in (True, False):
            expand((high, low, ends_vowel, False), "", ["Noun"], 0)

    # drop the empty-surface Nom row (handled by the "null" entry)
    return {(s, t) for (s, t) in rows if s}


def verbal_paradigm():
    rows = set()
    person_z = {"A1sg": "Hm", "A2sg": "sHn", "A3sg": "", "A1pl": "Hz", "A2pl": "sHnHz", "A3pl": "lAr"}
    person_k = {"A1sg": "m", "A2sg": "n", "A3sg": "", "A1pl": "k", "A2pl": "nHz", "A3pl": "lAr"}

    def surfaces(template, high, low, ends_vowel):
        # template with H (high vowel), A (low vowel); leading parenthesised
        # chars are buffer-dependent: (y)H style handled by caller
        return template.replace("H", high).replace("A", low)

    for high, low in CLASSES:
        tenses = []
        # Prog1 Hyor / yor ; harmony of yor fixes following vowels to u/a class
        tenses.append(("Prog1", high + "yor", ("u", "a")))
        tenses.append(("Prog1", "yor", ("u", "a")))  # vowel-final stem (narrowed)
        # Aorist
        for aor in ("r", low + "r", high + "r"):
            tenses.append(("Aor", aor, (high, low)))
        # Future
        tenses.append(("Fut", low + "c" + low + "k", (high, low)))
        tenses.append(("Fut", "y" + low + "c" + low + "k", (high, low)))
        # Past (d/t voicing)
        for d in ("d", "t"):
            tenses.append(("Past", d + high, (high, low)))

        for tense, tsurf, (h2, l2) in tenses:
            persons = person_k if tense == "Past" else person_z
            for ptag, ptmpl in persons.items():
                psurf = surfaces(ptmpl, h2, l2, False)
                # Fut + vowel-initial person: k -> ğ (yapacağım)
                base = tsurf
                if tense == "Fut" and psurf[:1] in "ıiuüae":
                    base = tsurf[:-1] + "ğ"
                rows.add((base + psurf, f"Verb+Pos+{tense}+{ptag or 'A3sg'}"))
            # compound past:  tense + lAr + dH  (A3pl+Past, e.g. -ıyorlardı);
            # the dH harmonises with lAr's vowel, not the tense vowel
            h3 = "ı" if l2 == "a" else "i"
            rows.add((tsurf + "l" + l2 + "rd" + h3, f"Verb+Pos+{tense}+A3pl+Past"))
            # tense + dH/tH + person_k  (Tense+Past+Person, e.g. -ıyordum)
            for d in ("d",):
                for ptag, ptmpl in person_k.items():
                    psurf = surfaces(ptmpl, h2, l2, False)
                    rows.add((tsurf + d + h2 + psurf, f"Verb+Pos+{tense}+Past+{ptag}"))
        # negative aorist: -mAz(+person)
        for ptag, ptmpl in person_z.items():
            psurf = surfaces(ptmpl, high, low, False)
            rows.add(("m" + low + "z" + psurf, f"Verb+Neg+Aor+{ptag}"))
        # infinitive -mAk
        rows.add(("m" + low + "k", "Verb+Pos+Inf"))
        # imperative plural -Hn / -HnHz
        rows.add((high + "n", "Verb+Pos+Imp+A2pl"))
        rows.add((high + "n" + high + "z", "Verb+Pos+Imp+A2pl"))
    return rows


def derivational_paradigm():
    """Productive derivations the reference's full table covers:
    -lHk nominalization (titiz+likle, güzel+liği) and adverbial -cA
    (iyi+ce).  Tag strings carry the +DB boundary (rendered ^DB)."""
    rows = set()
    for high, low in CLASSES:
        base_k = "l" + high + "k"   # consonant-final allomorph
        base_g = "l" + high + "ğ"   # before vowel-initial suffixes
        cases = {
            "Nom": [base_k],
            "Acc": [base_g + high],
            "Dat": [base_g + low],
            "Loc": [base_k + "t" + low, base_k + "d" + low],
            "Abl": [base_k + "t" + low + "n", base_k + "d" + low + "n"],
            "Gen": [base_g + high + "n"],
            "Ins": [base_k + "l" + low],
        }
        for case, forms in cases.items():
            for s in forms:
                for src in ("Adj", "Noun"):
                    rows.add((s, f"{src}+DB+Noun+Ness+A3sg+Pnon+{case}"))
        # P3sg possessive: -liği / -lığı
        rows.add((base_g + high, "Adj+DB+Noun+Ness+A3sg+P3sg+Nom"))
        rows.add((base_g + high, "Noun+DB+Noun+Ness+A3sg+P3sg+Nom"))
    for s in ("ca", "ce", "ça", "çe"):
        rows.add((s, "Adj+DB+Adverb+Ly"))
    return rows


def main():
    rows = set()
    nominal = nominal_paradigm()
    rows |= {(s, "Noun+" * 0 + t) for s, t in nominal}
    # apostrophe-marked proper-noun twins of the nominal paradigm
    # (consumed via the "'" logic at _yildiz_analyzer.py:339-350, 410-415)
    rows |= {("'" + s, t.replace("Noun+", "Noun+Prop+", 1)) for s, t in nominal}
    rows |= verbal_paradigm()
    rows |= derivational_paradigm()
    # bare apostrophe-suffix for Nom proper nouns (İzmir'in style handled above;
    # "Ankara'" edge) and null entries consumed at get_tags (suffix == "")
    nulls = [
        "Noun+A3sg+Pnon+Nom",
        "Noun+Prop+A3sg+Pnon+Nom",
        "Noun+Time+A3sg+Pnon+Nom",
        "Adj",
        "Adverb",
        "Verb+Pos+Imp+A2sg",
        "Punc",
        "Num+Card",
        "Det",
        "Conj",
        "Postp+PCNom",
        "Pron+A3sg+Pnon+Nom",
        "Interj",
        "Ques+Pres+A3sg",
        "Dup",
    ]
    rows |= {("null", t) for t in nulls}
    rows |= {("'", "Noun+Prop+A3sg+Pnon+Nom")}

    out = os.path.join(
        os.path.dirname(__file__), "..", "vnlp_spark", "resources", "suffix_tags_fixture.txt.gz"
    )
    with gzip.open(out, "wt", encoding="utf-8", compresslevel=9) as f:
        for s, t in sorted(rows):
            f.write(f"{s}\t{t}\n")
    print(f"wrote {out}: {len(rows)} rows")


if __name__ == "__main__":
    main()
