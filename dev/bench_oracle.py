#!/usr/bin/env python3
"""Time the DuckDB oracle SQL of every registered query at a scale factor.

The reference (uktrade/matchbox) executes its compute through DuckDB over
Polars frames on a single node; the oracle SQL strings are the semantic
twins of graft's queries, so their DuckDB runtime is the closest available
proxy for "the reference's single-node throughput at the same data scale".

Usage: python3 dev/bench_oracle.py <sfDir> <oracle_sql.json from graft.Verify>
Prints one JSON line: {"total": sec, "queries": {name: sec}, "threads": N}
"""
import json
import sys
import time

import duckdb


def main(sf_dir: str, oracle_json: str) -> None:
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    threads = con.sql("SELECT current_setting('threads')").fetchone()[0]
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.sql(oracles[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"[oracle-bench] {name} FAILED: {e}", file=sys.stderr)
    out = {"total": round(sum(t for t in times.values() if t >= 0), 2),
           "queries": times, "threads": int(threads)}
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
