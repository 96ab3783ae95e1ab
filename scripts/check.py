#!/usr/bin/env python3
"""Local pre-validation mimicking the driver's correctness gate:
runs graft.Verify at a given SF, then replays every oracle SQL in
DuckDB over the same parquet tables and compares (rows, schema names,
value hash) per query. Driver-side only (python/duckdb are not
available to the Spark library itself)."""
import json, subprocess, sys, glob, os
import duckdb
import pandas as pd
import hashlib

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

def table_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize: stringify everything cell-by-cell
    s = df.astype(str).to_csv(index=False)
    return hashlib.md5(s.encode()).hexdigest()

def main():
    con = duckdb.connect()
    for t in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{OUT}/{name}"
        if not os.path.isdir(spark_dir):
            results[name] = "MISSING spark output"
            continue
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        want = con.sql(sql).df()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and table_hash(got) != table_hash(want):
            problems.append("hash mismatch")
            # show first differing row for debug
            g = got.reindex(sorted(got.columns), axis=1).astype(str)
            w = want.reindex(sorted(want.columns), axis=1).astype(str)
            for i in range(min(len(g), len(w))):
                if not g.iloc[i].equals(w.iloc[i]):
                    problems.append(f"first diff row {i}: got={g.iloc[i].to_dict()} want={w.iloc[i].to_dict()}")
                    break
        results[name] = "OK" if not problems else "; ".join(problems)
    # queries without oracle: rows-only
    for name in os.listdir(OUT):
        p = os.path.join(OUT, name)
        if os.path.isdir(p) and name not in oracle:
            n = len(con.sql(f"SELECT * FROM '{p}/*.parquet'").df())
            results[name] = f"rows-only: {n} rows"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'INFO' if v.startswith('rows-only') else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(oracle)} oracled queries match")
    return 0 if ok == len(oracle) else 1

sys.exit(main())
