"""Extend the suffix fixture with NEGATIVE compound-tense paradigms.

The reference snapshot lacks Suffixes&Tags.txt (.MISSING_LARGE_BLOBS),
so the repo ships a hand-built fixture.  Blind-5 exposed a systematic
gap: every POSITIVE compound tense is present (arsa, ardı, mıştı,
ıyorsa, acaktı...) but their NEGATIVE twins (mazsa, mazdı, mamıştı,
mıyorsa, mayacaktı...) are absent, so frequent finite negatives like
"alınmazsa" fell to word+Unknown.  This script derives the negative
rows from the standard paradigm (neg stem mA + tense, with the Aorist's
irregular -mAz and Prog1's elided m-Iyor) and appends any that are
missing.  Run from the repo root; idempotent.
"""
import gzip
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources", "suffix_tags_fixture.txt.gz")

# (back surface, front surface, tag chain) — persons appended below
PERSONS = [("", "A3sg"), ("m", "A1sg"), ("n", "A2sg"), ("k", "A1pl")]


def rows():
    out = []

    def fam(back, front, chain, a2pl=("nız", "niz"), a3pl=None):
        for psfx, ptag in PERSONS:
            out.append((back + psfx, f"Verb+Neg+{chain}+{ptag}"))
            out.append((front + psfx, f"Verb+Neg+{chain}+{ptag}"))
        out.append((back + a2pl[0], f"Verb+Neg+{chain}+A2pl"))
        out.append((front + a2pl[1], f"Verb+Neg+{chain}+A2pl"))
        if a3pl:
            out.append((a3pl[0], f"Verb+Neg+{chain}+A3pl"))
            out.append((a3pl[1], f"Verb+Neg+{chain}+A3pl"))

    # Aorist negative is irregular -mAz
    fam("mazsa", "mezse", "Aor+Cond", a3pl=("mazlarsa", "mezlerse"))
    fam("mazdı", "mezdi", "Aor+Past", a3pl=("mazlardı", "mezlerdi"))
    out += [("mazmış", "Verb+Neg+Aor+Narr+A3sg"),
            ("mezmiş", "Verb+Neg+Aor+Narr+A3sg"),
            ("mazlarmış", "Verb+Neg+Aor+Narr+A3pl"),
            ("mezlermiş", "Verb+Neg+Aor+Narr+A3pl")]
    # evidential negative (gelmemiş) and its compounds
    out += [("mamış", "Verb+Neg+Narr+A3sg"), ("memiş", "Verb+Neg+Narr+A3sg"),
            ("mamışım", "Verb+Neg+Narr+A1sg"), ("memişim", "Verb+Neg+Narr+A1sg"),
            ("mamışsın", "Verb+Neg+Narr+A2sg"), ("memişsin", "Verb+Neg+Narr+A2sg"),
            ("mamışız", "Verb+Neg+Narr+A1pl"), ("memişiz", "Verb+Neg+Narr+A1pl"),
            ("mamışsınız", "Verb+Neg+Narr+A2pl"), ("memişsiniz", "Verb+Neg+Narr+A2pl"),
            ("mamışlar", "Verb+Neg+Narr+A3pl"), ("memişler", "Verb+Neg+Narr+A3pl")]
    fam("mamıştı", "memişti", "Narr+Past", a3pl=("mamışlardı", "memişlerdi"))
    fam("mamışsa", "memişse", "Narr+Cond", a3pl=("mamışlarsa", "memişlerse"))
    fam("madıysa", "mediyse", "Past+Cond", a3pl=("madıysalar", "mediyseler"))
    # Prog1 negative elides the neg vowel: m + Iyor (fourfold harmony)
    for b, f2 in (("mıyor", "miyor"), ("muyor", "müyor")):
        fam(b + "sa", f2 + "sa", "Prog1+Cond",
            a3pl=(b + "larsa", f2 + "larsa"))
        fam(b + "du", f2 + "du", "Prog1+Past",
            a2pl=("nuz", "nuz"), a3pl=(b + "lardı", f2 + "lardı"))
        out += [(b + "muş", "Verb+Neg+Prog1+Narr+A3sg"),
                (f2 + "muş", "Verb+Neg+Prog1+Narr+A3sg"),
                (b + "larmış", "Verb+Neg+Prog1+Narr+A3pl"),
                (f2 + "larmış", "Verb+Neg+Prog1+Narr+A3pl")]
    # Future negative: mA + y + AcAk
    fam("mayacaksa", "meyecekse", "Fut+Cond",
        a3pl=("mayacaklarsa", "meyeceklerse"))
    fam("mayacaktı", "meyecekti", "Fut+Past",
        a3pl=("mayacaklardı", "meyeceklerdi"))
    out += [("mayacakmış", "Verb+Neg+Fut+Narr+A3sg"),
            ("meyecekmiş", "Verb+Neg+Fut+Narr+A3sg"),
            ("mayacaklarmış", "Verb+Neg+Fut+Narr+A3pl"),
            ("meyeceklermiş", "Verb+Neg+Fut+Narr+A3pl"),
            # future negative person basics (voiced k->ğ)
            ("mayacağım", "Verb+Neg+Fut+A1sg"), ("meyeceğim", "Verb+Neg+Fut+A1sg"),
            ("mayacaksın", "Verb+Neg+Fut+A2sg"), ("meyeceksin", "Verb+Neg+Fut+A2sg"),
            ("mayacağız", "Verb+Neg+Fut+A1pl"), ("meyeceğiz", "Verb+Neg+Fut+A1pl"),
            ("mayacaksınız", "Verb+Neg+Fut+A2pl"), ("meyeceksiniz", "Verb+Neg+Fut+A2pl"),
            ("mayacaklar", "Verb+Neg+Fut+A3pl"), ("meyecekler", "Verb+Neg+Fut+A3pl")]
    # negative -(y)IncA converb (gelmeyince)
    out += [("mayınca", "Verb+Neg+When"), ("meyince", "Verb+Neg+When")]
    return out


def main():
    existing = {}
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    for l in lines:
        k, v = l.split("\t")
        existing.setdefault(k, set()).add(v)
    added = 0
    for sfx, tag in rows():
        if tag not in existing.get(sfx, set()):
            lines.append(f"{sfx}\t{tag}")
            existing.setdefault(sfx, set()).add(tag)
            added += 1
    lines.sort()
    with gzip.open(PATH, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"added {added} rows, total {len(lines)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
