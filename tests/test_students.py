"""Trained students for PoS / dependency arcs+labels / morph
disambiguation / NER (VERDICT r03 #4).

The pinned npz payloads (vnlp_spark/resources/students/, trained by
scripts/distill_students.py over all 1,238 frozen gold texts with
teacher labels) must keep >=0.99 transductive agreement with their
teachers, and the full student annotate path must reproduce the
heuristic path's gold triple P/R (done bar: within 1 pt).

Full-corpus agreement record (bench_artifacts/students_agreement.json):
pos 0.9979, rel 0.9995, arc 0.9969, ner 0.9988, morph 1.0000 on 2,015
ambiguous decisions.  The tests below re-verify on a seeded sample so
the suite stays fast; thresholds leave head-room for sample noise."""
import numpy as np
import pytest

from vnlp_spark.operators import students as S


@pytest.fixture(scope="module")
def payloads():
    return S.load_students()


@pytest.fixture(scope="module")
def sample_texts():
    texts = S.all_gold_texts()
    rng = np.random.default_rng(41)
    idx = rng.choice(len(texts), size=150, replace=False)
    return [texts[i] for i in sorted(idx)]


@pytest.fixture(scope="module")
def enc():
    from vnlp_spark.operators.subword import SpmUnigramEncoder

    return SpmUnigramEncoder.from_model_file()


def test_sequence_student_agreement_sampled(payloads, sample_texts, enc):
    from vnlp_spark.operators.dep_parser import py_parse_tokens
    from vnlp_spark.operators.ner import py_ner_tags
    from vnlp_spark.operators.pos import py_pos_tags
    from vnlp_spark.operators.spu_context import SPUContextModel
    from vnlp_spark.operators.spu_context_train import NER_LABEL_IDS
    from vnlp_spark.operators.subword import spm_tokenize_tokens
    from vnlp_spark.functions.tokenizer import py_treebank_tokenize

    models = {n: SPUContextModel.from_arrays(payloads[n]["arrays"])
              for n in ("pos", "arc", "rel", "ner")}
    vmaps = {n: payloads[n]["vmap"] for n in ("pos", "arc", "rel", "ner")}
    ok = {n: 0 for n in models}
    tot = 0
    for text in sample_texts:
        toks = py_treebank_tokenize(text)
        if not toks or len(toks) >= S.ARC_CLASSES - 1:
            continue
        arcs = py_parse_tokens(toks)
        if arcs is None:
            continue
        pieces = spm_tokenize_tokens(toks, enc)
        silver = {
            "pos": [S._UPOS_ID.get(u, S._UPOS_ID["X"])
                    for u in py_pos_tags(toks)],
            "arc": [h + 1 for (_, _, h, _) in arcs],
            "rel": [S._REL_ID.get(r, S._REL_ID["dep"])
                    for (_, _, _, r) in arcs],
            "ner": [NER_LABEL_IDS[t] for t in py_ner_tags(toks)],
        }
        tot += len(toks)
        for n, m in models.items():
            mapped = S.remap_pieces(pieces, vmaps[n])
            pred = m.tag_sentences([mapped], sentence_max_len=8)[0]
            ok[n] += sum(a == b for a, b in zip(pred, silver[n]))
    assert tot > 700
    for n in models:
        agr = ok[n] / tot
        assert agr >= 0.98, f"{n} student sampled agreement {agr:.4f}"


def test_morph_selector_agreement_sampled(payloads, sample_texts):
    from vnlp_spark.functions.tokenizer import py_treebank_tokenize
    from vnlp_spark.operators.morphology import py_analyze_tokens

    ranker = S.MorphRanker.from_arrays(payloads["morph"]["arrays"])
    selector = ranker.make_selector()
    ok = tot = 0
    for text in sample_texts:
        toks = py_treebank_tokenize(text)
        if not toks:
            continue
        teacher = py_analyze_tokens(toks)
        student = py_analyze_tokens(toks, selector=selector)
        tot += len(toks)
        ok += sum(a == b for a, b in zip(teacher, student))
    assert tot > 700
    assert ok / tot >= 0.995, f"morph selector agreement {ok / tot:.4f}"


def test_full_student_annotator_matches_gold_triples(payloads, enc):
    """End-to-end: the student-annotated arcs yield the SAME gold triple
    P/R as the heuristic path on the frozen held-out split (both 1.000
    at pinning time; the assert allows the 1-pt done bar)."""
    from scripts.gold_error_analysis import predicted_triples
    from vnlp_spark.plans.gold_ud import gold_triples_for
    from vnlp_spark.plans.gold_ud_heldout import HELD_OUT

    models = S.build_student_models(payloads)
    pred_rels = ("root", "parataxis")

    def student_triples(tokens):
        _, _, arcs = S.py_annotate_tokens_students(tokens, models, enc)
        if arcs is None:
            return []
        out = []
        for (idx, tok, head, rel) in arcs:
            if rel not in pred_rels:
                continue
            child = {}
            for (i, t, h, r) in arcs:
                if h == idx and r not in child:
                    child[r] = t
            s, o, ob = child.get("nsubj"), child.get("obj"), child.get("obl")
            if s is not None or o is not None or ob is not None:
                out.append((s, tok, o, ob))
        return out

    def prf(fn):
        tp = fp = fnn = 0
        for e in HELD_OUT:
            gold = {(s, p, o) for (s, p, o, _ob) in gold_triples_for(e)}
            pred = {(s, p, o) for (s, p, o, _ob) in fn(e["tokens"])}
            tp += len(pred & gold)
            fp += len(pred - gold)
            fnn += len(gold - pred)
        return tp / max(1, tp + fp), tp / max(1, tp + fnn)

    sp, sr = prf(student_triples)
    hp, hr = prf(predicted_triples)
    assert abs(sp - hp) <= 0.01 and abs(sr - hr) <= 0.01, (
        f"students P/R {sp:.3f}/{sr:.3f} vs heuristic {hp:.3f}/{hr:.3f}")
    assert sp >= 0.99 and sr >= 0.99


def test_annotate_stage_students_spark(spark):
    """model='students' on the production plan: heuristic-identical
    schema, deterministic, one fused ArrowEvalPython node."""
    import io
    from contextlib import redirect_stdout

    from vnlp_spark.plans.corpus import generate_web_pages
    from vnlp_spark.plans.pipeline import annotate_stage, sentences_stage

    docs = generate_web_pages(spark, 12)
    sents = sentences_stage(docs)
    ann = annotate_stage(sents, model="students")
    heur = annotate_stage(sents, model="heuristic")
    assert ann.schema == heur.schema
    rows = ann.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["tokens"] is not None
        assert len(r["analyses"]) == len(r["tokens"])
        if len(r["tokens"]) <= 40:
            assert r["arcs"] is not None and len(r["arcs"]) == len(r["tokens"])
    rows2 = ann.collect()
    assert sorted(map(repr, rows)) == sorted(map(repr, rows2))
    buf = io.StringIO()
    with redirect_stdout(buf):
        ann.explain("formatted")
    # sentence split + fused student annotate = two python nodes total
    import re

    nodes = set(re.findall(r"\((\d+)\) ArrowEvalPython", buf.getvalue()))
    assert len(nodes) <= 2, buf.getvalue()[:500]


def test_payload_roundtrip_and_pos_student_fn(payloads, enc):
    toks = ["Galatasaray", "dün", "İstanbul'da", "yeni", "mağaza", "açtı",
            "."]
    tags = S.pos_tags_students(toks, S.build_student_models(payloads), enc)
    assert len(tags) == len(toks)
    assert all(t in S.UPOS_LABELS for t in tags)
