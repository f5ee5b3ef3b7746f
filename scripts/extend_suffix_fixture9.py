"""Extend the suffix fixture with the ROUNDED-vowel causative allomorph
twins (blind-57 pinning: `üretimi DURDURMADI` fell to Unknown — the
fixture carries dırmadı/dirmedi/tırmadı Caus+Neg+Past rows but not
durmadı/dürmedi/turmadı/türmedi, and the same u/ü gap runs through a
slice of the Caus products).  For every dır/dir/tır/tir-initial row
whose tags open with the Caus derivation, emit the u/ü twin when it is
missing.  Idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources",
                    "suffix_tags_fixture.txt.gz")

_TWIN = {"dır": "dur", "dir": "dür", "tır": "tur", "tir": "tür"}


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        rows = f.read().splitlines()
    existing = set(rows)
    surfaces = {r.split("\t")[0] for r in rows}
    add = []
    for r in rows:
        surf, tags = r.split("\t", 1)
        pre = surf[:3]
        if pre not in _TWIN:
            continue
        if not tags.startswith("Verb+DB+Verb+Caus"):
            continue
        twin = _TWIN[pre] + surf[3:]
        row = f"{twin}\t{tags}"
        if row not in existing and row not in add:
            add.append(row)
    if not add:
        print("nothing to add")
        return
    with gzip.open(PATH, "at", encoding="utf-8") as f:
        for r in add:
            f.write(r + "\n")
    print(f"added {len(add)} rounded-causative twin rows")


if __name__ == "__main__":
    main()
