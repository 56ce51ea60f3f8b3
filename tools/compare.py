#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
fixture tables. Canonicalizes both sides (columns sorted by name, rows
sorted, floats rounded to 1e-6, timestamps to µs UTC) and diffs.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if isinstance(v, bool):
            return "b:" + str(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "f:nan"
            return "f:%.6f" % round(v, 6)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cv(x) for x in v) + "]"
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return "f:%.6f" % round(float(v), 6)
        except Exception:
            pass
        import datetime
        if isinstance(v, datetime.datetime):
            return "t:" + v.replace(tzinfo=None).isoformat()
        return repr(v)

    return sorted(tuple(cv(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            diff_g = [r for r in got if r not in exp][:3]
            diff_e = [r for r in exp if r not in got][:3]
            print(f"  spark-only: {diff_g}")
            print(f"  duck-only:  {diff_e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
