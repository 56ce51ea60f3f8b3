#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given scale → the empirical bench
baseline (BASELINE.md: "established empirically at first bench run").

Usage: python3 tools/baseline.py <sfDir> <oracle_sql.json> [threads]
Prints one JSON line: {"query": sec, ...} plus a total.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, threads=8):
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            out[name] = round(time.time() - t0, 4)
        except Exception as e:
            out[name] = -1.0
            print(f"# {name} failed: {e}", file=sys.stderr)
    out["_total"] = round(sum(v for v in out.values() if v > 0), 4)
    print(json.dumps({"sf": sf_dir, "threads": threads, "duckdb_sec": out}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 8)
