"""Physical-plan assertions: the scale-critical optimizations must be
visible in the plans, not just intended."""
import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from vnlp_spark.plans.corpus import generate_web_pages
from vnlp_spark.plans.pipeline import run_kg_pipeline


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_documents_scan_pushdown(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("lang") == "tr").select("doc_id", F.length("text").alias("len"))
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,tr)]" in plan
    # column pruning: the scan reads only the referenced columns
    assert "n_chars" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_edges_plan_broadcasts_entities(spark):
    kg = run_kg_pipeline(generate_web_pages(spark, 50))
    plan = _plan(kg.edges)
    assert "BroadcastHashJoin" in plan, "entity lookups must be broadcast joins"
    assert "SortMergeJoin" not in plan, "triple stream must not shuffle for entity lookup"


def test_annotation_is_single_python_node(spark):
    kg = run_kg_pipeline(generate_web_pages(spark, 50))
    plan = _plan(kg.annotated)
    assert plan.count("ArrowEvalPython (") == 1, (
        "split+tokenize+morph+NER+parse must fuse into ONE ArrowEvalPython node"
    )
    assert "Exchange" not in plan, "annotation must be a narrow (shuffle-free) lineage"


def test_triples_extraction_stays_native(spark):
    kg = run_kg_pipeline(generate_web_pages(spark, 50))
    plan = _plan(kg.triples)
    # one python node (annotation); triple extraction adds no python
    assert plan.count("ArrowEvalPython (") == 1


def test_edges_salted_fallback_matches_broadcast(spark):
    """entity_join='salted' (the too-big-to-broadcast path) must produce
    byte-identical edges with no broadcast of the entity table."""
    from vnlp_spark.plans.pipeline import edges_stage

    kg = run_kg_pipeline(generate_web_pages(spark, 80), persist=True)
    try:
        bcast = edges_stage(kg.triples, kg.entities, entity_join="broadcast")
        salted = edges_stage(kg.triples, kg.entities, entity_join="salted")
        # emulate an entities table too big for auto-broadcast (at test
        # scale Catalyst would otherwise auto-broadcast the salted side)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(salted)
            assert "BroadcastHashJoin" not in plan, (
                "salted mode must not plan a broadcast entity join"
            )
            cols = bcast.columns
            b = sorted(map(tuple, salted.select(*cols).collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        a = sorted(map(tuple, bcast.select(*cols).collect()))
        assert a == b and len(a) > 0
    finally:
        for df in (kg.annotated, kg.triples, kg.entities):
            df.unpersist()


def test_edges_auto_switch(spark):
    from vnlp_spark.plans.pipeline import edges_stage

    kg = run_kg_pipeline(generate_web_pages(spark, 50), persist=True)
    try:
        # tiny entity table -> auto picks broadcast
        auto_small = edges_stage(kg.triples, kg.entities, entity_join="auto")
        assert "BroadcastHashJoin" in _plan(auto_small)
        # force the over-threshold branch via the caller-supplied count
        auto_big = edges_stage(
            kg.triples, kg.entities, entity_join="auto", entities_rows=10_000_000
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert "BroadcastHashJoin" not in _plan(auto_big)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        for df in (kg.annotated, kg.triples, kg.entities):
            df.unpersist()


def test_gru_annotate_path(spark):
    """model='gru' routes NER through the AutoregressiveTagger harness on
    the production plan: same schema, shuffle-free stage, deterministic."""
    from vnlp_spark.plans.pipeline import annotate_stage, sentences_stage

    docs = generate_web_pages(spark, 30)
    ann = annotate_stage(sentences_stage(docs), model="gru")
    plan = _plan(ann)
    assert "Exchange" not in plan, "GRU annotation must stay a narrow map"
    assert "ArrowEvalPython" in plan
    heur = annotate_stage(sentences_stage(docs))
    assert ann.schema == heur.schema

    def snap(df):
        return sorted(
            (r["url"], r["sent_id"], r["m"])
            for r in df.select("url", "sent_id", F.to_json("mentions").alias("m")).collect()
        )

    first = snap(ann)
    second = snap(annotate_stage(sentences_stage(docs), model="gru"))
    assert first == second and len(first) > 0


def test_pos_tags_gru_shape(spark):
    from vnlp_spark.functions.tokenizer import treebank_tokenize
    from vnlp_spark.operators.pos import pos_tags_gru, upos_label_names

    # the label space is the reference's REAL PoS tokenizer id order
    names = upos_label_names()
    assert names[1] == "NOUN" and names[2] == "PUNCT" and names[3] == "VERB"
    docs = generate_web_pages(spark, 20)
    df = docs.select(treebank_tokenize("text").alias("tokens"))
    out = df.select("tokens", pos_tags_gru("tokens", spark).alias("upos")).collect()
    assert len(out) > 0
    for r in out:
        assert len(r["upos"]) == len(r["tokens"])
        assert set(r["upos"]) <= set(names)
