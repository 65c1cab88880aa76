#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfdir> <outdir>"`, run
    python3 dev/check.py <sfdir> <outdir>
Compares each <outdir>/<name> parquet against the DuckDB oracle in
<outdir>/oracle_sql.json: columns sorted by name, rows sorted, exact values.
"""
import duckdb
import json
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            continue
        srec, drec = s.to_dict("records"), d.to_dict("records")
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srec, drec))
               if repr(sorted(a.items())) != repr(sorted(b.items()))]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
            continue
        print(f"OK   {name} ({len(s)} rows)")
        n_ok += 1
    print(f"\n{n_ok}/{len(oracle)} queries match")
    # Exit non-zero on any mismatch so dev/roundclose.sh's `|| fail` can
    # actually refuse a red round (it previously always saw rc 0).
    if n_ok < len(oracle):
        sys.exit(1)


if __name__ == "__main__":
    main()
