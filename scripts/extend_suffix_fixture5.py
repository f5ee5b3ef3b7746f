"""Extend the suffix fixture with the INFLECTED denominal-agentive
paradigm (blind-36: sentence-initial `Arıcılar` fell to the lexicon's
Prop homograph because the only -CI rows were bare A3sg+Nom, so the
common 'beekeepers' reading had no candidate at all).

Derived here: for every agentive onset (cı/ci/cu/cü and the devoiced
çı/çi/çu/çü twins), the plural, case, and P3sg rows of the nominal
paradigm (arıcılar, arıcıya, sözcüsü, sözcüsünü, balıkçıların, …).
Same shape as extend_suffix_fixture{,2,3,4}.py; run from the repo
root; idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources",
                    "suffix_tags_fixture.txt.gz")

BASE = "Noun+DB+Noun+Agt"

ONSETS = []
for c in ("c", "ç"):
    for h in ("ı", "i", "u", "ü"):
        ONSETS.append((c + h, h, "a" if h in "ıu" else "e"))


def rows_for(onset: str, h: str, a: str):
    rows = []

    def add(sfx, tags):
        rows.append((onset + sfx, BASE + "+" + tags))

    # singular cases (vowel-final stem: y/n buffers)
    add("", "A3sg+Pnon+Nom")
    add("y" + h, "A3sg+Pnon+Acc")
    add("y" + a, "A3sg+Pnon+Dat")
    add("d" + a, "A3sg+Pnon+Loc")
    add("d" + a + "n", "A3sg+Pnon+Abl")
    add("n" + h + "n", "A3sg+Pnon+Gen")
    add("yl" + a, "A3sg+Pnon+Ins")
    # singular possessed (sözcüsü, sözcüsünü, ...)
    add("s" + h, "A3sg+P3sg+Nom")
    add("s" + h + "n" + h, "A3sg+P3sg+Acc")
    add("s" + h + "n" + a, "A3sg+P3sg+Dat")
    add("s" + h + "nd" + a, "A3sg+P3sg+Loc")
    add("s" + h + "nd" + a + "n", "A3sg+P3sg+Abl")
    add("s" + h + "yl" + a, "A3sg+P3sg+Ins")
    # plural (arıcılar, arıcıları, ...)
    pl = "l" + a + "r"
    add(pl, "A3pl+Pnon+Nom")
    add(pl + h, "A3pl+Pnon+Acc")
    add(pl + h, "A3pl+P3sg+Nom")
    add(pl + h + "n" + h, "A3pl+P3sg+Acc")
    add(pl + a, "A3pl+Pnon+Dat")
    add(pl + "d" + a, "A3pl+Pnon+Loc")
    add(pl + "d" + a + "n", "A3pl+Pnon+Abl")
    add(pl + h + "n", "A3pl+Pnon+Gen")
    add(pl + "l" + a, "A3pl+Pnon+Ins")
    return rows


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        existing = set(f.read().splitlines())
    new = []
    for onset, h, a in ONSETS:
        for sfx, tags in rows_for(onset, h, a):
            row = f"{sfx}\t{tags}"
            if row not in existing:
                new.append(row)
    if not new:
        print("nothing to add")
        return
    all_rows = sorted(existing | set(new))
    with gzip.open(PATH, "wt", encoding="utf-8") as f:
        f.write("\n".join(all_rows) + "\n")
    print(f"added {len(new)} rows -> {len(all_rows)} total")


if __name__ == "__main__":
    main()
