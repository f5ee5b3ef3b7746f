"""Held-out student↔teacher agreement (VERDICT r04 #3).

The five distilled students' agreement numbers in
bench_artifacts/students_agreement.json are TRANSDUCTIVE — measured on
the same 1,407 gold-corpus sentences the students were distilled over.
This script scores the PINNED students against the CURRENT teachers on
sentences that were **excluded from distillation**: the data-file blind
splits (plans/gold_blind/*.conllu), which `students.all_gold_texts()`
never collects (it globs only the legacy gold_ud*.py modules).

Usage: python scripts/score_students_heldout.py [split ...]
Defaults to every available data-file split.  Appends a "heldout" block
to bench_artifacts/students_agreement.json next to the transductive
numbers (per the verdict: report both, done = each ≥0.99).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vnlp_spark.operators import students as S
from vnlp_spark.operators.spu_context import SPUContextModel

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts", "students_agreement.json")


def main() -> None:
    from vnlp_spark.plans.gold_ud_blind_data import available_splits, load_split

    names = sys.argv[1:] or available_splits()
    texts = []
    for name in names:
        texts.extend(e["text"] for e in load_split(name))
    # defence: drop anything that somehow is in the training-text set
    train = set(S.all_gold_texts())
    texts = [t for t in texts if t not in train]
    print(f"held-out splits: {names} -> {len(texts)} sentences")

    silver = S.silver_sets(texts)
    n_tok = sum(len(t) for t in silver["tokens"])

    from vnlp_spark.operators.ner import py_ner_tags
    from vnlp_spark.operators.spu_context_train import NER_LABEL_IDS

    ner_labels = [[NER_LABEL_IDS[t] for t in py_ner_tags(toks)]
                  for toks in silver["tokens"]]

    result = {"splits": names, "sentences": len(texts), "tokens": n_tok}
    for name, labels in [("pos", silver["pos"]), ("rel", silver["rel"]),
                         ("arc", silver["arc"]), ("ner", ner_labels)]:
        arrays, vmap, _ = S.load_payload(
            os.path.join(S.STUDENTS_DIR, f"{name}.npz"))
        mapped = [np.asarray(S.remap_pieces(sent, vmap), dtype=np.int64)
                  for sent in silver["pieces"]]
        model = SPUContextModel.from_arrays(arrays)
        preds = model.tag_sentences(mapped, sentence_max_len=8)
        ok = sum(a == b for p, l in zip(preds, labels)
                 for a, b in zip(p, l))
        agr = ok / max(1, n_tok)
        print(f"  {name}: held-out agreement {agr:.4f}")
        result[name] = round(agr, 4)

    # morph: token-level teacher-vs-student-selector agreement
    from vnlp_spark.operators.morphology import py_analyze_tokens

    payloads = S.load_students()
    models = S.build_student_models(payloads)
    ok = tot = 0
    for toks in silver["tokens"]:
        teacher = py_analyze_tokens(toks)
        student = py_analyze_tokens(toks, selector=models["selector"])
        for a, b in zip(teacher, student):
            tot += 1
            ok += a == b
    result["morph_token_level"] = round(ok / max(1, tot), 4)
    print(f"  morph token-level: {result['morph_token_level']:.4f}")

    summary = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            summary = json.load(f)
    summary["heldout"] = result
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"appended heldout block -> {OUT}")


if __name__ == "__main__":
    main()
