"""Data-file loader for blind gold splits (round-5 #8).

Rounds 2-4 accumulated one near-identical python module per frozen blind
split (gold_ud_blind{,2..50}.py).  From blind-51 on, new splits land as
CoNLL-U-style DATA files under ``plans/gold_blind/`` — same git-freeze
semantics (the file is committed before the engine touches the
sentences), one loader, no further module-count growth.

File format (a pragmatic CoNLL-U subset, one sentence block per
``# text =`` header, blank-line separated)::

    # text = Tersane işçileri kaynak dikişlerini kontrol etti.
    1\tTersane\tNOUN\t2\tnmod
    2\tişçileri\tNOUN\t6\tnsubj
    ...

Columns: ID, FORM, UPOS, HEAD, DEPREL (tab-separated).  The loader
returns the same ``List[dict]`` shape the legacy modules export
(text / tokens / upos / heads / deprels), so the scorer and the error
analyzer run unchanged.
"""
from __future__ import annotations

import os
from typing import List

_DATA_DIR = os.path.join(os.path.dirname(__file__), "gold_blind")


def available_splits() -> List[str]:
    """Sorted split names (file stems) present in the data directory."""
    if not os.path.isdir(_DATA_DIR):
        return []
    names = [
        f[: -len(".conllu")]
        for f in os.listdir(_DATA_DIR) if f.endswith(".conllu")
    ]

    def _key(n: str):
        digits = "".join(ch for ch in n if ch.isdigit())
        return (int(digits) if digits else 0, n)

    return sorted(names, key=_key)


def load_split(name: str) -> List[dict]:
    """Parse ``plans/gold_blind/{name}.conllu`` into the legacy shape."""
    path = os.path.join(_DATA_DIR, name + ".conllu")
    entries: List[dict] = []
    cur_text = None
    toks: List[str] = []
    upos: List[str] = []
    heads: List[int] = []
    rels: List[str] = []

    def _flush():
        nonlocal cur_text, toks, upos, heads, rels
        if cur_text is not None and toks:
            entries.append(
                dict(text=cur_text, tokens=toks, upos=upos, heads=heads,
                     deprels=rels)
            )
        cur_text, toks, upos, heads, rels = None, [], [], [], []

    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n")
            if not line.strip():
                _flush()
                continue
            if line.startswith("# text ="):
                _flush()
                cur_text = line.split("=", 1)[1].strip()
                continue
            if line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 5:
                raise ValueError(
                    f"{path}: bad line (need 5 tab-separated cols): {line!r}"
                )
            idx, form, pos, head, rel = parts
            if int(idx) != len(toks) + 1:
                raise ValueError(f"{path}: non-sequential token id: {line!r}")
            toks.append(form)
            upos.append(pos)
            heads.append(int(head))
            rels.append(rel)
    _flush()
    if not entries:
        raise ValueError(f"{path}: no sentences parsed")
    return entries
