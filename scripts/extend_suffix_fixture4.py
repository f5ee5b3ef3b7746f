"""Extend the suffix fixture with PLURAL-possessor twins of the
participle / verbal-noun possessive paradigms (blind-27: `ulaştıklarında`
— ulaş+tık+ları+nda, "when THEY arrived" — fell to a bogus
ulaştıkların+Loc cut because every PastPart/FutPart/Inf2 possessive row
exists only in P3sg).

Derived here: for every row whose chain contains
`(PastPart|FutPart|Inf2)+A3sg+P3sg`, emit the P3pl twin with the
possessive slot pluralized in the surface:

- PastPart  ığı -> ıkları, iği -> ikleri, uğu -> ukları, üğü -> ükleri
  (yaptığında -> yaptıklarında; the ğ devoices back to k before -lAr)
- FutPart   ağı -> akları, eği -> ekleri (yapacağını -> yapacaklarını)
- Inf2      ması -> maları, mesi -> meleri (bitmesi -> bitmeleri)

applied at the RIGHTMOST occurrence, so voice-stacked rows derive their
twins too (dirildiğinde -> dirildiklerinde).  Same shape as
extend_suffix_fixture{,2,3}.py; run from the repo root; idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources", "suffix_tags_fixture.txt.gz")

_MAPS = {
    "PastPart": [("ığı", "ıkları"), ("iği", "ikleri"),
                 ("uğu", "ukları"), ("üğü", "ükleri")],
    "FutPart": [("ağı", "akları"), ("eği", "ekleri")],
    "Inf2": [("ması", "maları"), ("mesi", "meleri")],
}


def plural_twins(rows):
    out = []
    for surface, tags in rows:
        for fam, maps in _MAPS.items():
            if f"{fam}+A3sg+P3sg" not in tags:
                continue
            hit = None
            for frm, to in maps:
                p = surface.rfind(frm)
                if p >= 0 and (hit is None or p > hit[0]):
                    hit = (p, frm, to)
            if hit:
                p, frm, to = hit
                out.append((surface[:p] + to + surface[p + len(frm):],
                            tags.replace(f"{fam}+A3sg+P3sg",
                                         f"{fam}+A3sg+P3pl")))
            break
    return out


def ir_caus_passives(rows):
    """Passive products of the -Ir causative allomorph (blind-28 pinning:
    `artırıldı` = art+ır+ıl+dı fell to Unknown — dır/tır causatives carry
    full passive families, the bare -Ir causative carries none).  Derived
    by stripping the leading d from every dırıl/diril/durul/dürül row:
    the -Ir causative is the d-less allomorph of the same morpheme."""
    out = []
    for surface, tags in rows:
        if (surface[:4] in ("dırı", "diri", "duru", "dürü")
                and surface[4:5] == "l"
                and tags.startswith("Verb+DB+Verb+Caus+DB+Verb+Pass+")):
            out.append((surface[1:], tags))
    return out


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        existing_lines = f.read().splitlines()
    existing = set(existing_lines)
    base = [tuple(l.split("\t")) for l in existing_lines]
    new_lines = list(existing_lines)
    added = 0
    for surface, tags in plural_twins(base) + ir_caus_passives(base):
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
