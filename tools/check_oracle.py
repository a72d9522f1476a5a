#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracle SQL on the same parquet tables and diff.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duck={list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} duck={len(want)}")
            n_bad += 1
            continue
        # Mirror the driver's authoritative gate: exact canonical-string
        # compare (no allclose, no dtype coercion) — an int64 "1" vs a
        # float64 "1.0" MUST be flagged, because the driver's hash compare
        # flags it (see ADVICE.md round 1 / q_sessionize HUGEINT case).
        mismatch = None
        for c in got.columns:
            a, b = got[c].astype(str).values, want[c].astype(str).values
            if not (a == b).all():
                mismatch = c
                break
        if mismatch:
            print(f"VALUES   {name}: column {mismatch} differs")
            print("  spark:", got.head(3).to_dict("records"))
            print("  duck :", want.head(3).to_dict("records"))
            n_bad += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
