"""Benchmark harness.

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints EXACTLY ONE
JSON line to stdout:

    {"metric": "total_bench_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "kg_docs": N, "kg_triples": N, "triples_per_sec": N, ...}

All Spark/log noise goes to stderr.

--scaling additionally runs the KG pipeline at local[8] and local[32] on
the SAME generated input and reports throughput at both plus the scaling
efficiency (throughput_32 / throughput_8) / 4 — the sandbox protocol for
the north rule's two-cluster-size criterion (see BENCH.md).
"""
from __future__ import annotations

import json
import os
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def build_spark(cores: int):
    from vnlp_spark.session import get_spark

    return get_spark(f"vnlp-bench-{cores}", cores=cores)


def kg_docs_for_sf(sf: float) -> int:
    return max(500, int(sf * 200_000))


def run_kg(spark, n_docs: int) -> tuple[float, int]:
    """Returns (elapsed_sec, n_triples) for the full KG pipeline, entities
    and edges materialized too (counts forced)."""
    from vnlp_spark.plans.corpus import generate_web_pages
    from vnlp_spark.plans.pipeline import run_kg_pipeline

    docs = generate_web_pages(spark, n_docs)
    t0 = time.monotonic()
    kg = run_kg_pipeline(docs, persist=True, dedup_sentences=True)
    n_triples = kg.triples.count()
    kg.entities.count()
    kg.edges.count()
    elapsed = time.monotonic() - t0
    for df in (kg.annotated, kg.triples, kg.entities):
        df.unpersist()
    return elapsed, n_triples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    do_scaling = "--scaling" in sys.argv

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    spark = build_spark(cores)
    results: dict[str, float] = {}
    extras: dict = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        results[name] = round(dt, 3)
        log(f"[bench] {name}: {dt:.2f}s")
        return out

    qs = entry_mod.queries()

    # 1. KG pipeline on the synthetic web corpus (the headline)
    n_docs = kg_docs_for_sf(sf)
    kg_sec, n_triples = run_kg(spark, n_docs)
    results["kg_pipeline"] = round(kg_sec, 3)
    extras["kg_docs"] = n_docs
    extras["kg_triples"] = n_triples
    extras["triples_per_sec"] = round(n_triples / kg_sec, 1) if kg_sec > 0 else None
    log(f"[bench] kg_pipeline: {kg_sec:.2f}s, {n_triples} triples, "
        f"{extras['triples_per_sec']} triples/s")

    # 2. annotation-layer throughput on the driver's documents table
    timed("morph_analyses", lambda: qs["morph_analyses"](spark, sf_dir).count())
    timed("sentence_split", lambda: qs["sentence_split"](spark, sf_dir).count())

    # 3. dedup + similarity
    timed("minhash_dedup", lambda: qs["minhash_dedup"](spark, sf_dir).count())
    timed("dedup_exact", lambda: qs["dedup_exact"](spark, sf_dir).count())
    timed("knn_bruteforce", lambda: qs["knn_bruteforce"](spark, sf_dir).count())
    timed("knn_lsh", lambda: qs["knn_lsh"](spark, sf_dir).count())

    # 4. relational baseline
    timed("pricing_summary", lambda: qs["pricing_summary"](spark, sf_dir).count())
    timed("token_frequency_topk", lambda: qs["token_frequency_topk"](spark, sf_dir).count())
    timed("events_user_deltas", lambda: qs["events_user_deltas"](spark, sf_dir).count())

    if do_scaling:
        spark.stop()
        scaling = {}
        for c in (8, 32):
            s = build_spark(c)
            # warm up JVM/python workers once, then measure
            run_kg(s, max(200, n_docs // 10))
            sec, n_tr = run_kg(s, n_docs)
            scaling[f"local[{c}]"] = {
                "sec": round(sec, 3),
                "triples": n_tr,
                "triples_per_sec": round(n_tr / sec, 1),
            }
            log(f"[bench-scaling] local[{c}]: {sec:.2f}s, {n_tr / sec:.1f} triples/s")
            s.stop()
        t8 = scaling["local[8]"]["triples_per_sec"]
        t32 = scaling["local[32]"]["triples_per_sec"]
        scaling["efficiency_8_to_32"] = round((t32 / t8) / 4.0, 3)
        extras["scaling"] = scaling
    else:
        spark.stop()

    total = round(sum(results.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
