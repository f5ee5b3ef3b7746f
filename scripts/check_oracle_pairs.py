"""Targeted Spark-vs-DuckDB oracle comparison for selected queries.

Usage: python scripts/check_oracle_pairs.py [sf_dir] [query ...]
Mimics the driver: runs the Spark query and the oracle SQL on the same
parquet tables, sorts columns by name, and diffs values exactly.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from vnlp_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if not names:
        names = [n for n in qs if n in oracles]
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE")
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
            odf = odf[sorted(odf.columns)].reset_index(drop=True)
            rows = len(sdf) == len(odf)
            schema = list(sdf.columns) == list(odf.columns)
            if rows and schema:
                try:
                    pd.testing.assert_frame_equal(
                        sdf, odf, check_dtype=False, check_exact=True
                    )
                    print(f"{name}: OK ({len(sdf)} rows)")
                    continue
                except AssertionError as e:
                    print(f"{name}: VALUE MISMATCH rows={len(sdf)}")
                    print(str(e)[:2000])
            else:
                print(f"{name}: rows {len(sdf)} vs {len(odf)}, schema {list(sdf.columns)} vs {list(odf.columns)}")
                merged = sdf.merge(odf, how="outer", indicator=True)
                print(merged[merged["_merge"] != "both"].head(20))
            failed.append(name)
        except Exception as ex:
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:1500]}")
            failed.append(name)
    print("FAILED:" if failed else "ALL OK", failed)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
