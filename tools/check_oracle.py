#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify.scala parquet
dumps (sort columns by name, sort rows, hash values). Dev tool only."""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def hash_df(df: pd.DataFrame) -> str:
    # stringify everything deterministically
    s = df.astype(str).to_csv(index=False)
    return hashlib.sha256(s.encode()).hexdigest()

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: schema {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        if hash_df(a) != hash_df(b):
            diff = (a.astype(str) != b.astype(str))
            bad = diff.any(axis=1)
            print(f"FAIL {name}: hash mismatch ({bad.sum()}/{len(a)} rows differ)")
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  duck :", b[bad].head(3).to_dict("records"))
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
