"""Extend the suffix fixture with the NEGATIVE present participle
-mAyAn (blind-57: `toplantıya KATILMAYAN üyeleri` fell to Unknown —
okumayan/gelmeyen/açılmayan all had no candidate because the fixture
carries the positive -An/-yAn PresPart rows but no Neg+PresPart at
all), plus the matching negative future participle -mAyAcAk tails the
same paradigm predicts.  Same shape as extend_suffix_fixture{,2..7}.py;
idempotent.
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources",
                    "suffix_tags_fixture.txt.gz")

NEW = [
    "mayan\tVerb+Neg+DB+Adj+PresPart",
    "meyen\tVerb+Neg+DB+Adj+PresPart",
    # negative future participle (aynı paradigm: gelmeyecek olan ...)
    "mayacak\tVerb+Neg+DB+Adj+FutPart",
    "meyecek\tVerb+Neg+DB+Adj+FutPart",
]
# ... and the passive x negative-participle product the same paradigm
# predicts (katıl-ma-yan = kat+Il+mA+yAn: the fixture has Pass+Pos+
# PresPart tails like 'ılan/ilen' and thousands of Pass+Neg finite
# tails, but no Pass+Neg+PresPart at all)
_PASS = {"ıl": "mayan", "il": "meyen", "ul": "mayan", "ül": "meyen",
         "ın": "mayan", "in": "meyen", "un": "mayan", "ün": "meyen",
         "n": None}  # vowel-final stems: okun- -> 'nmayan'/'nmeyen'
for _p, _neg in _PASS.items():
    if _neg is None:
        for _n in ("mayan", "meyen"):
            NEW.append(f"n{_n}\tVerb+DB+Verb+Pass+Neg+DB+Adj+PresPart")
    else:
        NEW.append(f"{_p}{_neg}\tVerb+DB+Verb+Pass+Neg+DB+Adj+PresPart")


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
