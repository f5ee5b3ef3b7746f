"""Extend the suffix fixture with the missing -mAlArI readings
(blind-50: `Kurum YAZIŞMALARI güvenlik için şifreledi` fell to the
izafet-subject reading because the only 'maları'/'meleri' row was
Inf2+A3sg+P3pl+Nom — the surface is three-ways ambiguous and the
plural-Acc object reading (yazışma+lar+ı) had no candidate at all, so
the Acc/P3sg+Nom re-read machinery never saw the token as ambiguous).

Derived here: maları/meleri with the two missing tag rows
(Inf2+A3pl+Pnon+Acc and Inf2+A3pl+P3sg+Nom), so the disambiguator and
the parser's re-read can weigh the object reading by clause context
exactly as they do for plain nominal -lArI surfaces.  Same shape as
extend_suffix_fixture{,2..6}.py; idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources",
                    "suffix_tags_fixture.txt.gz")

NEW = [
    "maları\tVerb+Pos+DB+Noun+Inf2+A3pl+Pnon+Acc",
    "maları\tVerb+Pos+DB+Noun+Inf2+A3pl+P3sg+Nom",
    "meleri\tVerb+Pos+DB+Noun+Inf2+A3pl+Pnon+Acc",
    "meleri\tVerb+Pos+DB+Noun+Inf2+A3pl+P3sg+Nom",
]


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        existing = set(f.read().splitlines())
    add = [r for r in NEW if r not in existing]
    if not add:
        print("nothing to add")
        return
    with gzip.open(PATH, "at", encoding="utf-8") as f:
        for r in add:
            f.write(r + "\n")
    print(f"added {len(add)} rows")


if __name__ == "__main__":
    main()
