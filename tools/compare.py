#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
fixture tables. Canonicalizes both sides (columns sorted by name, rows
sorted, floats rounded to 1e-6, timestamps to µs UTC) and diffs.

Also LINTS result dtypes for shapes the DRIVER harness cannot
canonicalize even when values match (round-3 post-mortem):
  * DuckDB HUGEINT/DECIMAL oracle columns — the driver's pandas layer
    renders them float64 (dtype drift vs Spark's int64, and outright
    value corruption above 2^53). Fix: CAST(... AS BIGINT) in the SQL.
  * array/map/struct columns on EITHER side — the driver's pandas
    sort_values throws "unhashable type: numpy.ndarray". Fix: declare
    sortable scalar shapes (explode, or positional checksums).
A dtype-lint hit is a FAIL even if the value compare passes.
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


ORACLE_BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")
UNSORTABLE = ("[]", "MAP(", "STRUCT(", "UNION(")


def dtype_lint(name, rel, side):
    """Driver-harness canonicalization hazards; returns list of msgs."""
    msgs = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if side == "oracle" and any(t.startswith(b) for b in ORACLE_BAD):
            msgs.append(
                f"oracle column {col} is {t} — pandas renders float64 "
                f"(dtype drift, >2^53 corruption); CAST(... AS BIGINT/DOUBLE)")
        if any(m in t for m in UNSORTABLE):
            msgs.append(
                f"{side} column {col} is {t} — driver pandas sort crashes "
                f"on array/map/struct cells; emit sortable scalars")
    return msgs


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # subset Verify runs (SPARK_GRAFT_ONLY) dump only some queries;
        # compare what's there instead of erroring on the rest
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
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
        lint = dtype_lint(name, got_rel, "spark") + dtype_lint(name, exp_rel, "oracle")
        if lint:
            n_fail += 1
            print(f"FAIL {name}: dtype lint")
            for m in lint:
                print(f"  {m}")
        elif sorted(got_cols) != sorted(exp_cols):
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
    print(f"== {n_pass} pass, {n_fail} fail"
          + (f", {n_skip} not dumped (skipped)" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
