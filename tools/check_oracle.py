#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify.scala parquet
dumps (sort columns by name, sort rows, hash values). Dev tool only.

Usage: check_oracle.py [sf_dir] [out_dir] [--json PATH]

--json writes the per-query result map in the driver's CORRECTNESS_r*
schema ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}, plus an oracle_sec timing field) so every session
commits a durable, driver-independent correctness artifact
(CORRECTNESS_local.json) — VERDICT r9 item 1: the driver's round-9
artifact arrived empty and the round's hard signal nearly vanished."""
import sys, json, glob, hashlib, time
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

def main(sf_dir: str, out_dir: str, json_out: str | None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        r = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None,
             "oracle_sec": None}
        results[name] = r
        def fail(msg):
            nonlocal n_fail
            r["err"] = msg
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fail("no spark output"); continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            t0 = time.monotonic()
            duck_df = con.sql(sql).df()
            r["oracle_sec"] = round(time.monotonic() - t0, 3)
        except Exception as e:
            fail(str(e)[:500]); continue
        a, b = canon(spark_df), canon(duck_df)
        r["spark_rows"], r["oracle_rows"] = len(a), len(b)
        if list(a.columns) != list(b.columns):
            fail(f"schema {list(a.columns)} vs {list(b.columns)}"); continue
        r["schema_match"] = True
        if len(a) != len(b):
            fail(f"rows {len(a)} vs {len(b)}"); continue
        r["rows_match"] = True
        if hash_df(a) != hash_df(b):
            diff = (a.astype(str) != b.astype(str))
            bad = diff.any(axis=1)
            fail(f"hash mismatch ({bad.sum()}/{len(a)} rows differ)")
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  duck :", b[bad].head(3).to_dict("records"))
            continue
        r["hash_match"] = True
        print(f"PASS {name} ({len(a)} rows, oracle {r['oracle_sec']:.2f}s)")
        n_pass += 1
    if json_out:
        json.dump(results, open(json_out, "w"), indent=1)
        print(f"wrote {json_out}")
    slow = sorted(((r["oracle_sec"], n) for n, r in results.items()
                   if r["oracle_sec"]), reverse=True)[:10]
    total = sum(r["oracle_sec"] or 0 for r in results.values())
    print(f"\noracle wall: {total:.1f}s total; slowest: "
          + ", ".join(f"{n}={s:.1f}s" for s, n in slow[:5]))
    print(f"{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(
        description="Replay oracle_sql.json in DuckDB and hash-compare "
                    "against the Spark parquet dumps (the driver gate).")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01",
                    help="testdata scale-factor dir the queries ran on")
    ap.add_argument("out_dir", nargs="?", default="/tmp/verify_out",
                    help="graft.Verify output dir (parquet dumps + oracle_sql.json)")
    ap.add_argument("--json", nargs="?", const="CORRECTNESS_local.json",
                    default=None, metavar="PATH", dest="json_out",
                    help="also write the per-query result map as JSON "
                         "(driver schema + oracle wall times); "
                         "PATH defaults to CORRECTNESS_local.json")
    ns = ap.parse_args()
    main(ns.sf_dir, ns.out_dir, ns.json_out)
