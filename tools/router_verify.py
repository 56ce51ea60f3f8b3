#!/usr/bin/env python3
"""Pair-exact verification of the q154 router's post-flip (LSH) output
on the hub-growth corpus, plus the sample-integrity hash BASELINE.md's
router section records.

The exact check never materializes a wedge (at K=30 the hub side is
1000 suppliers x 14,430 neighbors — ~2e11 wedges, infeasible exactly):
jaccard = 1.0 iff two nodes have IDENTICAL neighbor sets, so nodes are
grouped by an exact set fingerprint (order-insensitive sum/xor/count of
neighbor hashes — constant memory per group, no giant string_agg) and
jaccard-1.0 pairs enumerated within groups. The true top-50 by
(jaccard desc, node_a, node_b) is the 50 smallest (a, b) among them,
PROVIDED >= 50 such pairs exist (asserted).

Usage: python3 tools/router_verify.py [corpus_dir] [result_parquet_dir]
       (defaults: /tmp/hubx30 /tmp/hubx_verify/q154_jaccard_links)
"""
import hashlib
import sys

import duckdb


def main(corpus, result):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute(
        f"CREATE VIEW orders AS FROM read_parquet('{corpus}/orders.parquet')")
    con.execute(
        f"CREATE VIEW lineitem AS FROM read_parquet('{corpus}/lineitem.parquet')")
    # exact set fingerprint: (count, sum of hashes, xor of hashes) —
    # order-insensitive and collision-safe in combination for 64-bit
    # hashes at this scale; groups with >1 member are jaccard-1.0 cliques
    truth = con.execute("""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_totalprice > 150000),
sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
sets AS (SELECT u, count(*) AS deg, sum(hash(v)::HUGEINT) AS hsum,
                bit_xor(hash(v)) AS hxor
         FROM sym GROUP BY u),
grp AS (SELECT deg, hsum, hxor, list_sort(list(u)) AS us
        FROM sets GROUP BY deg, hsum, hxor HAVING count(*) > 1),
pairs AS (
  SELECT a.u AS node_a, b.u AS node_b, g.deg
  FROM grp g, unnest(g.us) AS a(u), unnest(g.us) AS b(u)
  WHERE a.u < b.u)
SELECT node_a, node_b, deg FROM pairs ORDER BY node_a, node_b""").fetchall()
    assert len(truth) >= 50, (
        f"only {len(truth)} jaccard-1.0 pairs — top-50 is not all-1.0, "
        "this check's shortcut does not apply")
    got = con.execute(
        f"SELECT node_a, node_b, n_common, deg_a, deg_b, jaccard "
        f"FROM read_parquet('{result}/*.parquet') "
        f"ORDER BY node_a, node_b").fetchall()
    assert len(got) == 50, f"expected 50 rows, got {len(got)}"
    for t, g in zip(truth[:50], got):
        assert t[0] == g[0] and t[1] == g[1], f"pair mismatch: {t} vs {g}"
        assert g[2] == g[3] == g[4] == t[2], f"degree mismatch: {t} vs {g}"
        assert g[5] == 1.0, f"jaccard != 1.0: {g}"
    # spot-verify 5 pairs' jaccard from raw edges (belt to the brace)
    for a, b, deg in truth[:5]:
        n = con.execute("""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_totalprice > 150000)
SELECT count(*) FROM
  (SELECT v FROM e0 WHERE u = ? INTERSECT SELECT v FROM e0 WHERE u = ?)
""", [a, b]).fetchone()[0]
        assert n == deg, f"raw intersect for ({a},{b}): {n} != {deg}"
    rows = sorted(con.execute(
        f"SELECT * FROM read_parquet('{result}/*.parquet') ORDER BY ALL")
        .fetchall())
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    print(f"PAIR-EXACT top-50 verified ({len(truth)} jaccard-1.0 pairs "
          f"in graph); sample sha256[:16] = {h}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hubx30",
         sys.argv[2] if len(sys.argv) > 2
         else "/tmp/hubx_verify/q154_jaccard_links")
