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
