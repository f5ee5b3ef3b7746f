"""Bit-for-bit validation of the pure-python Spark-xxhash64 twin and the
pure-python corpus generator — the two independence anchors behind the
pinned-fixture oracles (scripts/gen_oracle_fixtures.py)."""
import pytest
from pyspark.sql import functions as F

from vnlp_spark.functions.hashing import spark_xxhash64


def test_xxhash64_strings_match_spark(spark):
    rows = [
        ("istanbul", "LOC"),
        ("türkiye İş bankası", "ORG"),
        ("", "PER"),
        ("a" * 100, "x"),          # >32-byte stripe path
        ("çğüşöı ĞÜŞİÖÇ", ""),     # multi-byte UTF-8
        ("x", "y"),
    ]
    df = spark.createDataFrame(rows, ["k", "t"]).select(
        "k", "t", F.xxhash64("k", "t").alias("h2"), F.xxhash64("k").alias("h1")
    )
    for r in df.collect():
        assert spark_xxhash64(r.k, r.t) == r.h2
        assert spark_xxhash64(r.k) == r.h1


def test_xxhash64_numeric_paths_match_spark(spark):
    df = spark.createDataFrame(
        [(5,), (123456789012345,), (-7,), (0,)], ["v"]
    ).select(
        "v",
        F.xxhash64(F.col("v").cast("long")).alias("hl"),
        # ANSI-safe: int fast-path only for values that fit
        F.xxhash64(F.expr("try_cast(v AS int)")).alias("hi"),
    )
    for r in df.collect():
        assert spark_xxhash64(r.v) == r.hl
        if abs(r.v) < 2**31:
            assert spark_xxhash64(("int", r.v)) == r.hi
    # the corpus generator's exact chain: xxhash64(id, lit(seed), lit(j))
    chain = spark.range(5).select(
        "id", F.xxhash64(F.col("id"), F.lit(42), F.lit(7)).alias("h")
    )
    for r in chain.collect():
        assert spark_xxhash64(r.id, ("int", 42), ("int", 7)) == r.h


def test_xxhash64_null_skipped(spark):
    df = spark.createDataFrame([("a", None)], "k string, t string").select(
        F.xxhash64("k", "t").alias("h")
    )
    assert spark_xxhash64("a", None) == df.collect()[0].h


def test_pure_python_corpus_matches_spark_generator(spark):
    from scripts.gen_oracle_fixtures import pure_python_web_pages
    from vnlp_spark.plans.corpus import generate_web_pages

    want = {
        r["url"]: (int(r["epoch"]), r["text"], r["lang"])
        for r in generate_web_pages(spark, 60)
        .select(
            "url", "text", "lang", F.col("warc_ts").cast("long").alias("epoch")
        )
        .collect()
    }
    got = {
        p["url"]: (p["warc_epoch"], p["text"], p["lang"])
        for p in pure_python_web_pages(60)
    }
    assert got == want


def test_entity_id_map_matches_spark_xxhash64(spark):
    import duckdb
    import os

    fx = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "entity_ids.parquet",
    )
    if not os.path.exists(fx):
        pytest.skip("fixtures not generated")
    rows = duckdb.connect().execute(
        f"SELECT canon_key, type, entity_id FROM read_parquet('{fx}')"
    ).fetchall()
    assert rows, "entity_ids fixture is empty"
    df = spark.createDataFrame(
        [(k, t) for k, t, _ in rows], ["k", "t"]
    ).select(F.xxhash64("k", "t").alias("h"))
    assert [r.h for r in df.collect()] == [e for _, _, e in rows]
