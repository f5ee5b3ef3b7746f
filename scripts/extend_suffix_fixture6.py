"""Extend the suffix fixture with the deverbal -mAlI adjectivizer
(blind-37: `tartışmalı golü` fell to the Neces finite reading because
the only 'malı'/'meli' rows were the necessitative — the Inf2+With
adjective chain (tartışma+lı 'disputed', anlaşmalı, planlamalı,
bağlantılı-style) had no candidate at all).

Derived here: malı/meli (and their case-marked hosts stay ordinary —
only the bare attributive form is needed) with the full derivation
chain Verb+Pos+DB+Noun+Inf2+A3sg+Pnon+Nom+DB+Adj+With, so the
disambiguator can weigh the adjective against the necessitative by
context.  Same shape as extend_suffix_fixture{,2..5}.py; idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources",
                    "suffix_tags_fixture.txt.gz")

CHAIN = "Verb+Pos+DB+Noun+Inf2+A3sg+Pnon+Nom+DB+Adj+With"

NEW = [f"malı\t{CHAIN}", f"meli\t{CHAIN}"]


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        existing = set(f.read().splitlines())
    add = [r for r in NEW if r not in existing]
    if not add:
        print("nothing to add")
        return
    all_rows = sorted(existing | set(add))
    with gzip.open(PATH, "wt", encoding="utf-8") as f:
        f.write("\n".join(all_rows) + "\n")
    print(f"added {len(add)} rows -> {len(all_rows)} total")


if __name__ == "__main__":
    main()
