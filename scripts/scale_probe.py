"""One scaling measurement: run the KG job at a given core count and print
a single JSON line.  Invoked under ``taskset -c 0-(N-1)`` by bench.py so
the WHOLE process tree (JVM + python workers) is confined to N cores —
local[N] alone does not bound python-UDF workers, which would otherwise
overlap the JVM's cores and overstate small-N throughput.

The input corpus is materialized to parquet BEFORE timing starts: both
cluster sizes read the identical files, and corpus generation cost stays
out of the measured window.  Two warm-up passes retire python-worker
spin-up and JVM codegen; best-of-2 is reported.
"""
import json
import os
import shutil
import sys
import tempfile
import time


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vnlp_spark.session import get_spark
    from vnlp_spark.plans.corpus import generate_web_pages
    from vnlp_spark.plans.pipeline import run_kg_pipeline

    s = get_spark(f"scale-{cores}", cores=cores)
    tmp = tempfile.mkdtemp(prefix="scale_corpus_")
    try:
        path = os.path.join(tmp, "docs")
        generate_web_pages(
            s, n_docs, unique_tail=True, n_partitions=cores * 4
        ).write.parquet(path)
        docs = s.read.parquet(path)

        def job(d):
            t0 = time.monotonic()
            ntr = run_kg_pipeline(d, dedup_sentences=False).triples.count()
            return time.monotonic() - t0, ntr

        warm = docs.limit(max(500, n_docs // 10))
        job(warm)
        job(warm)
        best, ntr = None, 0
        for _ in range(2):
            sec, ntr = job(docs)
            best = sec if best is None else min(best, sec)
        print(json.dumps({"cores": cores, "sec": round(best, 3), "triples": ntr,
                          "triples_per_sec": round(ntr / best, 1)}))
        s.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
