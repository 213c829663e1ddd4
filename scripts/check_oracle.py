#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: register the sfDir
parquet tables as DuckDB views, run the oracle SQL, load the Spark
parquet result, sort columns by name, sort rows, and compare values.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp, got = canon(exp), canon(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} "
                      f"got={list(got.columns)}")
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                continue
            mismatch = None
            for c in exp.columns:
                a, b = exp[c], got[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    eq = np.isclose(a.astype(float), b.astype(float),
                                    rtol=0, atol=0, equal_nan=True)
                    exact = eq.all()
                    if not exact:
                        mismatch = (c, a[~eq].head(3).tolist(),
                                    b[~eq].head(3).tolist())
                        break
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        ne = a.astype(str) != b.astype(str)
                        mismatch = (c, a[ne].head(3).tolist(),
                                    b[ne].head(3).tolist())
                        break
            if mismatch:
                print(f"FAIL {name}: col {mismatch[0]} exp={mismatch[1]} "
                      f"got={mismatch[2]}")
            else:
                print(f"OK   {name} ({len(exp)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
    print(f"{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main()
