"""Extend the suffix fixture with PASSIVE x NEGATIVE and -lAn+DIr families.

Blind-9 exposed two systematic paradigm gaps, the same shape as the
blind-5 negative-compound-tense gap `extend_suffix_fixture.py` closed:

1. Passive x negative.  Every plain negative family is present
   (mazsa/mezse, madı/medi, mamış/memiş...) and every passive POSITIVE
   family is present (nmez, ndi, ilecek...), but their product is not:
   `yenilenmezse` (yenile+n+mezse, "if it is not renewed") fell to
   word+Unknown.  Derived here: for every fixture row whose tag chain
   starts `Verb+Neg+`, emit five passive twins (allomorphs n / In / Il
   in both harmonies matching the negative marker's harmony) with the
   chain rewritten to `Verb+DB+Verb+Pass+Neg+...` — exactly the tag
   shape the fixture already uses for passive positives (`nmez` ->
   Verb+DB+Verb+Pass+Neg+Aor+A3sg is the one pre-existing member).

2. Acquire-causative (-lAn+DIr).  `lAn` denominal verbs are present
   (landı/lendi -> Noun+DB+Verb+Acquire+...) and `DIr` causatives of
   verbs are present (dırdı/dirdi -> Verb+DB+Verb+Caus+...), but the
   productive composition is not: `bilgilendirdi` (bilgi+lendir+di,
   "informed") fell to Unknown.  Derived here: for every row whose
   surface starts dır/dir and whose chain starts `Verb+DB+Verb+Caus+`,
   emit lan/len-prefixed twins with the chain rewritten to
   `Noun+DB+Verb+Acquire+DB+Verb+Caus+...` (plus the Adj+DB variant,
   mirroring how every existing Acquire row carries both).  Because the
   dır/dir family already contains its own passives and participles,
   bilgilendirildi / bilgilendiren etc. come out of the same product.

Run from the repo root; idempotent.  Reference semantics matched:
vnlp's Yildiz-tagset analyses (e.g. README examples
`/root/reference/vnlp/stemmer_morph_analyzer/ReadMe.md`) spell these
chains the same way; the fixture stands in for the snapshot's missing
Suffixes&Tags.txt (.MISSING_LARGE_BLOBS).
"""
import gzip
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "vnlp_spark", "resources", "suffix_tags_fixture.txt.gz")

_BACK_V = set("aıou")
_FRONT_V = set("eiöü")
_PASS_BACK = ["n", "ın", "un", "ıl", "ul"]
_PASS_FRONT = ["n", "in", "ün", "il", "ül"]

# negative-insertion maps for participle morphemes: matched portion ->
# (replacement, tail-vowel re-harmonization).  FutPart is twofold, no
# re-harmonization; round PastPart variants re-harmonize their tail.
_FUT_MAP = {
    "acağ": ("mayacağ", None), "acak": ("mayacak", None),
    "eceğ": ("meyeceğ", None), "ecek": ("meyecek", None),
    # y-buffer variants after vowel-final stems (bekle+YECEĞini ->
    # bekle+MEYECEĞini: the buffer is absorbed by the -mA vowel)
    "yacağ": ("mayacağ", None), "yacak": ("mayacak", None),
    "yeceğ": ("meyeceğ", None), "yecek": ("meyecek", None),
}
_PAST_MAP = {
    "dığ": ("madığ", None), "dık": ("madık", None),
    "duğ": ("madığ", ("u", "ı")), "duk": ("madık", ("u", "ı")),
    "diğ": ("mediğ", None), "dik": ("medik", None),
    "düğ": ("mediğ", ("ü", "i")), "dük": ("medik", ("ü", "i")),
    # voiceless-initial variants (yapTIĞI): the negative always yields
    # the d-form after the -mA vowel (yap+maDIĞI)
    "tığ": ("madığ", None), "tık": ("madık", None),
    "tuğ": ("madığ", ("u", "ı")), "tuk": ("madık", ("u", "ı")),
    "tiğ": ("mediğ", None), "tik": ("medik", None),
    "tüğ": ("mediğ", ("ü", "i")), "tük": ("medik", ("ü", "i")),
}


def _first_vowel(s):
    for ch in s:
        if ch in _BACK_V:
            return "back"
        if ch in _FRONT_V:
            return "front"
    return None


def derive(rows):
    out = []
    for surface, tags in rows:
        # 1b. passive x Prog2 (sürdür+ül+mektedir)
        if tags.startswith("Verb+Pos+Prog2") and surface.startswith("m"):
            harmony = _first_vowel(surface)
            if harmony:
                allo = _PASS_BACK if harmony == "back" else _PASS_FRONT
                new_tags = ("Verb+DB+Verb+Pass+Pos+Prog2"
                            + tags[len("Verb+Pos+Prog2"):])
                for pp in allo:
                    out.append((pp + surface, new_tags))
        # 1. passive x negative
        if tags.startswith("Verb+Neg+") and surface.startswith("m"):
            harmony = _first_vowel(surface)
            if harmony:
                allo = _PASS_BACK if harmony == "back" else _PASS_FRONT
                new_tags = "Verb+DB+Verb+Pass+Neg+" + tags[len("Verb+Neg+"):]
                for p in allo:
                    out.append((p + surface, new_tags))
        # 3. negative participle/nominalization families (blind-11:
        #    `unutmayacağını` fell to Unknown — positive FutPart/PastPart
        #    nominalizations were present, their negatives were not).
        #    The negative marker slots in directly before the participle
        #    morpheme, after any voice stack (artır+MA+yacağını), with
        #    the y-buffer before vowel-initial FutPart.
        for probe, fam in (("+Pos+DB+Noun+FutPart", "fut"),
                           ("+Pos+DB+Adj+FutPart", "fut"),
                           ("+Pos+DB+Noun+PastPart", "past"),
                           ("+Pos+DB+Adj+PastPart", "past")):
            if probe not in tags:
                continue
            new_tags = tags.replace(probe, probe.replace("+Pos+", "+Neg+"))
            table = _FUT_MAP if fam == "fut" else _PAST_MAP
            # rightmost morpheme match; on equal END prefer the longer
            # key so the y-buffer variant wins over its bare substring
            hit = None
            for key in table:
                p = surface.rfind(key)
                if p >= 0 and (hit is None
                               or (p + len(key), len(key))
                               > (hit[0] + len(hit[1]), len(hit[1]))):
                    hit = (p, key)
            if hit:
                p, key = hit
                repl, vmap = table[key]
                tail = surface[p + len(key):]
                if vmap:
                    # the negative marker re-harmonizes the round high
                    # vowels of the tail (olduğunu -> olmadığını)
                    tail = tail.replace(vmap[0], vmap[1])
                out.append((surface[:p] + repl + tail, new_tags))
            break
        # 4. vowel-stem allomorphs of the 1st/2nd-plural possessives:
        #    after a vowel-final stem the buffer vowel drops
        #    (iki+miz, araba+nız) — derive the short twin from every
        #    vowel-initial ImIz/InIz row
        if tags.startswith("Noun+") and ("P1pl" in tags or "P2pl" in tags):
            for pre in ("ımız", "imiz", "umuz", "ümüz",
                        "ınız", "iniz", "unuz", "ünüz"):
                if surface.startswith(pre):
                    out.append((surface[1:], tags))
                    break
            # numeral stems take the same possessive plurals as
            # collective pronouns (iki+miz, üçü+nüz): give the bare Nom
            # rows a Num-initial twin so Num stems can reach them
            if tags in ("Noun+A3sg+P1pl+Nom", "Noun+A3sg+P2pl+Nom"):
                out.append((surface, "Num" + tags[len("Noun"):]))
                for pre in ("ımız", "imiz", "umuz", "ümüz",
                            "ınız", "iniz", "unuz", "ünüz"):
                    if surface.startswith(pre):
                        out.append((surface[1:], "Num" + tags[len("Noun"):]))
                        break
        # 5. zero-copula past over -lI/-sIz denominal adjectives
        #    (hava yağışLIYDI, kaygıSIZDI): the With/Without rows exist
        #    bare, their copular-past twins do not
        if tags.endswith("+With") or tags.endswith("+Without"):
            zp = "+DB+Verb+Zero+Past+A3sg"
            last_v = next((c for c in reversed(surface)
                           if c in "aeıioöuü"), "")
            if last_v:
                past_v = {"a": "dı", "ı": "dı", "o": "du", "u": "du",
                          "e": "di", "i": "di", "ö": "dü", "ü": "dü"}[last_v]
                buf = "y" if surface[-1] in "aeıioöuü" else ""
                out.append((surface + buf + past_v, tags + zp))
        # 6. Become+Caus+Pass product (derin+leş+tir+il+di): the
        #    Become+Caus rows exist (leştirdi), their passives do not
        if tags.startswith("Verb+DB+Verb+Caus+DB+Verb+Pass+"):
            rest6 = tags[len("Verb+DB+Verb+Caus+DB+Verb+Pass+"):]
            pre6 = ("laş" if surface.startswith("tırıl")
                    else "leş" if surface.startswith("tiril") else None)
            if pre6:
                for base in ("Noun", "Adj"):
                    out.append((pre6 + surface,
                                base + "+DB+Verb+Become+DB+Verb+Caus"
                                "+DB+Verb+Pass+" + rest6))
        # 2. -lAn+DIr acquire-causative product
        if tags.startswith("Verb+DB+Verb+Caus+"):
            rest = tags[len("Verb+DB+Verb+Caus+"):]
            if surface.startswith("dır"):
                pre = "lan"
            elif surface.startswith("dir"):
                pre = "len"
            else:
                continue
            for base in ("Noun", "Adj"):
                out.append((pre + surface,
                            base + "+DB+Verb+Acquire+DB+Verb+Caus+" + rest))
    return out


def modal_converb_rows():
    """-DIkçA converbs and the formal -mAktA(dIr) progressive (blind-20:
    `arttıkça` and `sürmektedir` fell to Unknown — no base rows exist)."""
    out = []
    for b, f in (("dıkça", "dikçe"), ("tıkça", "tikçe"),
                 ("dukça", "dükçe"), ("tukça", "tükçe")):
        out.append((b, "Verb+Pos+AsLongAs"))
        out.append((f, "Verb+Pos+AsLongAs"))
    out.append(("madıkça", "Verb+Neg+AsLongAs"))
    out.append(("medikçe", "Verb+Neg+AsLongAs"))
    for b, f, atag in (("", "", "A3sg"), ("yım", "yim", "A1sg"),
                       ("sın", "sin", "A2sg"), ("yız", "yiz", "A1pl"),
                       ("lar", "ler", "A3pl")):
        out.append(("makta" + b, f"Verb+Pos+Prog2+{atag}"))
        out.append(("mekte" + f, f"Verb+Pos+Prog2+{atag}"))
    out.append(("maktadır", "Verb+Pos+Prog2+Cop+A3sg"))
    out.append(("mektedir", "Verb+Pos+Prog2+Cop+A3sg"))
    out.append(("maktaydı", "Verb+Pos+Prog2+Past+A3sg"))
    out.append(("mekteydi", "Verb+Pos+Prog2+Past+A3sg"))
    out.append(("maktadırlar", "Verb+Pos+Prog2+Cop+A3pl"))
    out.append(("mektedirler", "Verb+Pos+Prog2+Cop+A3pl"))
    # causative and causative-passive products of the Prog2 family
    # (yap+tırmaktadır, sürdür+ülmektedir ~ sür+dürülmektedir)
    voiced = []
    for surface, tags in out:
        if not tags.startswith("Verb+Pos+Prog2"):
            continue
        rest = tags[len("Verb+Pos"):]
        back = surface.startswith("makta")
        caus = (("dır", "dur", "tır", "tur") if back
                else ("dir", "dür", "tir", "tür"))
        cpass = (("dırıl", "durul", "tırıl", "turul", "tıl", "tul")
                 if back
                 else ("diril", "dürül", "tiril", "türül", "til",
                       "tül"))
        for c in caus:
            voiced.append((c + surface, "Verb+DB+Verb+Caus+Pos" + rest))
        for c in cpass:
            voiced.append((c + surface,
                           "Verb+DB+Verb+Caus+DB+Verb+Pass+Pos" + rest))
    return out + voiced


def necessitative_rows():
    """The -mAlI necessitative paradigm (blind-19: `uymalı` fell to the
    Unknown fallback — no base row exists to derive from, so the family
    is emitted directly: positive + negative, all persons, plus the
    copular past)."""
    out = []
    pers = [("yım", "yim", "A1sg"), ("sın", "sin", "A2sg"),
            ("", "", "A3sg"), ("yız", "yiz", "A1pl"),
            ("sınız", "siniz", "A2pl"), ("lar", "ler", "A3pl")]
    for bneg, fneg, pol in (("malı", "meli", "Pos"),
                            ("mamalı", "memeli", "Neg")):
        for bp, fp, atag in pers:
            out.append((bneg + bp, f"Verb+{pol}+Neces+{atag}"))
            out.append((fneg + fp, f"Verb+{pol}+Neces+{atag}"))
        out.append((bneg + "ydı", f"Verb+{pol}+Neces+Past+A3sg"))
        out.append((fneg + "ydi", f"Verb+{pol}+Neces+Past+A3sg"))
        # passive twins (alınmalı, edilmemeli)
        for pb in ("n", "ın", "un", "ıl", "ul"):
            out.append((pb + bneg, f"Verb+DB+Verb+Pass+{pol}+Neces+A3sg"))
        for pf in ("n", "in", "ün", "il", "ül"):
            out.append((pf + fneg, f"Verb+DB+Verb+Pass+{pol}+Neces+A3sg"))
    return out


def main():
    with gzip.open(PATH, "rt", encoding="utf-8") as f:
        existing_lines = f.read().splitlines()
    existing = set(existing_lines)
    added = 0
    new_lines = list(existing_lines)
    # iterate to a fixpoint so the products compose (a rule-3 negative
    # participle then gains its rule-1 passive twins: taşınmayacağı)
    frontier = [tuple(l.split("\t")) for l in existing_lines]
    frontier += necessitative_rows() + modal_converb_rows()
    for surface, tags in necessitative_rows() + modal_converb_rows():
        line = f"{surface}\t{tags}"
        if line not in existing:
            existing.add(line)
            new_lines.append(line)
            added += 1
    while frontier:
        fresh = []
        for surface, tags in derive(frontier):
            line = f"{surface}\t{tags}"
            if line not in existing:
                existing.add(line)
                new_lines.append(line)
                fresh.append((surface, tags))
                added += 1
        frontier = fresh
    if added:
        with gzip.open(PATH, "wt", encoding="utf-8", newline="\n") as f:
            f.write("\n".join(new_lines) + "\n")
    print(f"added {added} rows (total {len(new_lines)})")


if __name__ == "__main__":
    main()
