#!/usr/bin/env python3
"""(Re)measure DuckDB oracle wall-clocks at sf0.1 for named queries and
merge them into tools/duckdb_times_sf01.json (the BASELINE table's
denominator column). Median of 3 runs per query, same fixture views the
driver compare uses.

Usage: python3 tools/duck_times.py <oracle_sql.json> <q1,q2,...>
"""
import json
import os
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
SF = "/root/testdata/sf0.1"


def main(oracle_path, names):
    sql = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM read_parquet('{SF}/{t}.parquet')")
    out_path = "tools/duckdb_times_sf01.json"
    blob = json.load(open(out_path))
    for n in names:
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql[n]).fetchall()
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        blob["duckdb_sec"][n] = round(med, 4)
        print(f"{n}: {med:.3f}s  (runs: {', '.join(f'{t:.3f}' for t in ts)})")
    # atomic replace: a crash mid-dump must not truncate the blessed
    # table's only DuckDB baseline
    tmp_path = out_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(blob, f, indent=1, sort_keys=True)
    os.replace(tmp_path, out_path)
    print(f"merged into {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2].split(","))
