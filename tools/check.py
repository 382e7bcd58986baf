#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mirroring the driver's t2 gate:
run graft.Verify first (writes <out>/<query>/ parquet + oracle_sql.json), then
this script executes each oracle SQL in DuckDB over the same sf tables and
compares row-for-row (columns sorted by name, values rounded-stringified).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {qdir}")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            n_fail += 1
        elif s != d:
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            for i, (a, b) in enumerate(zip(s, d)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
