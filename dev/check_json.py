#!/usr/bin/env python3
"""Dev-only JSON-emitting variant of dev/check.py (r18 verdict ask #1:
a committed CORRECTNESS-style artifact at sf0.1).

Usage: python3 dev/check_json.py <sfdir> <outdir> <artifact.json>

Emits the driver's CORRECTNESS shape: one entry per query dumped by
graft.Verify — oracle-compared entries get rows/schema/hash match flags,
registered rows-only queries get err: "no_oracle" with the dumped row
count (the same contract CORRECTNESS_r17.json records). Exit 1 on any
oracle mismatch or Verify-recorded error.
"""
import duckdb
import json
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir, out, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    with open(f"{out}/errors.json") as f:
        verify_errors = json.load(f)
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    names = sorted(set(names) | set(verify_errors))
    result, n_ok, n_fail = {}, 0, 0
    for name in names:
        ent = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        result[name] = ent
        if name in verify_errors:
            ent["err"] = "verify: " + verify_errors[name]
            n_fail += 1
            print(f"FAIL {name}: verify error {verify_errors[name]}")
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        except Exception as e:
            ent["err"] = f"read: {e}"
            n_fail += 1
            print(f"FAIL {name}: {e}")
            continue
        ent["spark_rows"] = len(spark_df)
        if name not in oracle:
            ent["err"] = "no_oracle"
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            ent["err"] = f"oracle: {e}"
            n_fail += 1
            print(f"FAIL {name}: oracle {e}")
            continue
        ent["oracle_rows"] = len(duck_df)
        s, d = canon(spark_df), canon(duck_df)
        ent["rows_match"] = len(s) == len(d)
        ent["schema_match"] = list(s.columns) == list(d.columns)
        if not ent["schema_match"]:
            n_fail += 1
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if not ent["rows_match"]:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            continue
        srec, drec = s.to_dict("records"), d.to_dict("records")
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srec, drec))
               if repr(sorted(a.items())) != repr(sorted(b.items()))]
        if bad:
            i, a, b = bad[0]
            n_fail += 1
            print(f"FAIL {name}: {len(bad)}/{len(s)} rows differ; first at {i}:\n"
                  f"  spark={a}\n  duck ={b}")
            continue
        ent["hash_match"] = True
        n_ok += 1
        print(f"OK   {name} ({len(s)} rows)")
    with open(artifact, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    n_no_oracle = sum(1 for e in result.values() if e["err"] == "no_oracle")
    print(f"\n{n_ok}/{len(oracle)} oracle queries match; "
          f"{n_no_oracle} rows-only; {n_fail} failures; "
          f"{len(result)} total → {artifact}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
