"""Self-check of the driver contract: every ``oracle_sql`` query must agree
with its Spark twin on row count, column names, and (order-insensitive,
column-name-sorted) values — mirroring the driver's CORRECTNESS harness."""
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry_mod._TABLES:
        path = os.path.join(ORACLE_SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, ORACLE_SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column sets differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    sc = _canon(spark_rows, spark_cols)
    dc = _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "url", "sent_id", "subj", "pred", "obj", "obl", "subj_type", "obj_type",
    ]


def test_rows_only_queries_run(spark):
    for name, q in entry_mod.queries().items():
        if name in entry_mod.oracle_sql():
            continue
        df = q(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
