"""Extend the suffix fixture with three paradigm families blind-26 exposed.

Same shape as extend_suffix_fixture{,2}.py (blind-5 / blind-9 / blind-19 /
blind-20 gaps): systematic products that the generated fixture lacks while
their base families are present.

1. Evidential zero-copula (Zero+Narr).  Every Zero+Past row exists
   (hafifti, yorgundu, evdeydi ...) but no Zero+Narr twin does, so
   `yoksulmuş` ("was poor, reportedly") fell to word+Unknown.  Derived
   here: for every fixture row whose chain contains `+DB+Verb+Zero+Past+`
   and whose surface ends with a past allomorph, emit the Narr twin with
   the ending rewritten (dı/tı -> mış, ydı -> ymış, harmonized) and
   `Zero+Past` -> `Zero+Narr`.  The reference spells the chain the same
   way (Yildiz tagset: Adj+DB+Verb+Zero+Narr+A3sg).

2. The -mAksIzIn converb ("without doing").  The -mAdAn family is
   present (madan/meden -> Verb+Neg+WithoutHavingDoneSo) but -mAksIzIn
   is not: `danışmaksızın` fell to a bogus danışmaksız+Gen cut.  Emitted
   directly with the same converb tag the parser already understands,
   plus the usual passive twins.

3. Oblique/possessive continuations of the -Iş nominalization (Inf3).
   All 70 Inf3 surfaces exist ONLY in bare Nom (ış/iş/nış/diriliş...),
   so `Ekonominin toparlanışı` (toparla+nış+ı) fell to Unknown.  Derived
   here: for every `...+DB+Noun+Inf3+A3sg+Pnon+Nom` row, emit the
   case/possessive continuations (P3sg, Acc, Dat, Loc, Abl, Gen, Ins,
   P3sg+case, A3pl(+P3sg)) harmonized to the surface's final vowel —
   the same continuation set every other verbal-noun family carries.

Run from the repo root; idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources", "suffix_tags_fixture.txt.gz")

# longest-match endings first: past allomorph -> evidential allomorph
_NARR_MAP = [
    ("ydı", "ymış"), ("ydi", "ymiş"), ("ydu", "ymuş"), ("ydü", "ymüş"),
    ("tı", "mış"), ("ti", "miş"), ("tu", "muş"), ("tü", "müş"),
    ("dı", "mış"), ("di", "miş"), ("du", "muş"), ("dü", "müş"),
]


def narr_twins(rows):
    out = []
    for surface, tags in rows:
        if "+DB+Verb+Zero+Past+" not in tags:
            continue
        # A3sg/A3pl only: personal endings (dım, dın, ydık...) sit AFTER
        # the past allomorph and would need their own person map
        if not (tags.endswith("+A3sg") or tags.endswith("+A3pl")):
            continue
        for past, narr in _NARR_MAP:
            if surface.endswith(past):
                # A3pl surfaces end lardı/lerdi: plural marker precedes
                # the copula, the same rewrite applies (lermiş)
                out.append((surface[: -len(past)] + narr,
                            tags.replace("+Zero+Past+", "+Zero+Narr+")))
                break
    return out


def maksizin_rows():
    out = [("maksızın", "Verb+Pos+WithoutHavingDoneSo"),
           ("meksizin", "Verb+Pos+WithoutHavingDoneSo")]
    for p in ("n", "ın", "un", "ıl", "ul"):
        out.append((p + "maksızın",
                    "Verb+DB+Verb+Pass+Pos+WithoutHavingDoneSo"))
    for p in ("n", "in", "ün", "il", "ül"):
        out.append((p + "meksizin",
                    "Verb+DB+Verb+Pass+Pos+WithoutHavingDoneSo"))
    return out


# harmonizing vowel of the Iş morpheme -> (high V, low A, plural lAr)
_H = {
    "ı": ("ı", "a", "lar"), "i": ("i", "e", "ler"),
    "u": ("u", "a", "lar"), "ü": ("ü", "e", "ler"),
}


def inf3_obliques(rows):
    out = []
    for surface, tags in rows:
        if not tags.endswith("+DB+Noun+Inf3+A3sg+Pnon+Nom"):
            continue
        head = tags[: -len("A3sg+Pnon+Nom")]
        last_v = next((c for c in reversed(surface) if c in "aeıioöuü"), "")
        if last_v not in _H:
            continue
        v, a, lar = _H[last_v]
        cont = [
            (v, "A3sg+P3sg+Nom"), (v, "A3sg+Pnon+Acc"),
            (a, "A3sg+Pnon+Dat"), ("t" + a, "A3sg+Pnon+Loc"),
            ("t" + a + "n", "A3sg+Pnon+Abl"), (v + "n", "A3sg+Pnon+Gen"),
            ("l" + a, "A3sg+Pnon+Ins"),
            (v + "n" + v, "A3sg+P3sg+Acc"), (v + "n" + a, "A3sg+P3sg+Dat"),
            (v + "nd" + a, "A3sg+P3sg+Loc"),
            (v + "nd" + a + "n", "A3sg+P3sg+Abl"),
            (v + "n" + v + "n", "A3sg+P3sg+Gen"),
            (lar, "A3pl+Pnon+Nom"), (lar + v, "A3pl+P3sg+Nom"),
            (lar + v + "n" + v, "A3pl+P3sg+Acc"),
            (lar + v + "n" + a, "A3pl+P3sg+Dat"),
            (lar + v + "nd" + a, "A3pl+P3sg+Loc"),
            (lar + v + "nd" + a + "n", "A3pl+P3sg+Abl"),
        ]
        for sfx, tail in cont:
            out.append((surface + sfx, head + tail))
    return out


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        existing_lines = f.read().splitlines()
    existing = set(existing_lines)
    base = [tuple(l.split("\t")) for l in existing_lines]
    new_lines = list(existing_lines)
    added = 0
    for surface, tags in (narr_twins(base) + maksizin_rows()
                          + inf3_obliques(base)):
        line = f"{surface}\t{tags}"
        if line not in existing:
            existing.add(line)
            new_lines.append(line)
            added += 1
    with gzip.open(PATH, "wt", encoding="utf-8") as f:
        f.write("\n".join(new_lines) + "\n")
    print(f"added {added} rows; total {len(new_lines)}")


if __name__ == "__main__":
    main()
