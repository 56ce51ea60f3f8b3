#!/usr/bin/env python3
"""Build a K× scale corpus from sf0.1 by unioning id-shifted copies.

Used for the round-9 empirical scale validation: every table is K
self-consistent shards (copy i's foreign keys all point into copy i),
so every join in the suite behaves as on a K×-bigger dataset.

Design choices that keep the scaling measurement honest:
- Key shifts are chosen per key DOMAIN so no shifted id collides with
  another domain a query mixes (q154 maps suppkey -> suppkey + 1e6
  into the custkey node space, so custkey copies shift by 1e9 while
  suppkey copies shift by 1e4).
- Document text in copy i > 0 has every token suffixed with "~i":
  within-copy duplicate/shingle structure replicates the sf0.1 corpus
  exactly, but cross-copy shingles never match — total near-dup pair
  mass scales by K, not K·(K+1)/2, which is what "K× more data" means.
  n_chars is recomputed to stay consistent with the perturbed text.
- Embeddings in copy i > 0 get small seeded Gaussian noise so exact
  cross-copy duplicate vectors don't fabricate giant semantic-dedup
  clusters; norms and cluster geometry stay essentially unchanged.

Usage: python3 tools/scale_corpus.py [K] [outdir] [--hub-growth]
       (default 10 /tmp/sfx10)

--hub-growth builds the HUB-GROWTH variant instead: only orders +
lineitem, with l_suppkey UNSHIFTED so all K copies' customers attach to
the same 1,000 supplier nodes — q154's supplier hubs then hold K·481
neighbors and the jaccardLinksAuto degree probe crosses its 2^13 bound
at K >= 18. This is the social/web-shaped regime the router's LSH path
exists for; the default (disjoint-copy) corpus reproduces TPC-H-shaped
growth, where per-supplier degree is CONSTANT and the exact path is
the linear answer at every K (BASELINE.md round-11 correction).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

HUB_GROWTH = "--hub-growth" in sys.argv
argv = [a for a in sys.argv if a != "--hub-growth"]
K = int(argv[1]) if len(argv) > 1 else 10
OUT = argv[2] if len(argv) > 2 else "/tmp/sfx10"
SRC = "/root/testdata/sf0.1"

# per-domain shift units (copy i shifts by i * unit)
NATION = 100          # nationkey / regionkey (25 rows)
CUST = 1_000_000_000  # custkey — q154 maps suppkey+1e6 into this space
SUPP = 10_000         # suppkey (1000 rows; +1e6 in q154 stays << CUST)
PART = 1_000_000      # partkey
ORDER = 100_000_000   # orderkey
EVENT = 10_000_000    # event_id
USER = 1_000_000      # user_id
DOC = 1_000_000       # doc_id / vec_id (q94 etc. use doc_id < 5 queries)

SHIFTS = {
    "region": {"r_regionkey": NATION},
    "nation": {"n_nationkey": NATION, "n_regionkey": NATION},
    "customer": {"c_custkey": CUST, "c_nationkey": NATION},
    "supplier": {"s_suppkey": SUPP, "s_nationkey": NATION},
    "part": {"p_partkey": PART},
    "orders": {"o_orderkey": ORDER, "o_custkey": CUST},
    "lineitem": {"l_orderkey": ORDER, "l_partkey": PART, "l_suppkey": SUPP},
    "events": {"event_id": EVENT, "user_id": USER},
    "documents": {"doc_id": DOC},
    "embeddings": {"vec_id": DOC},
}


def shifted(tbl: pa.Table, shifts: dict, i: int) -> pa.Table:
    for col, unit in shifts.items():
        idx = tbl.schema.get_field_index(col)
        arr = pc.add(tbl.column(col), i * unit).cast(tbl.schema.field(col).type)
        tbl = tbl.set_column(idx, tbl.schema.field(col), arr)
    return tbl


def perturb_part_names(tbl: pa.Table, i: int) -> pa.Table:
    # p_name feeds the string-similarity queries (q99 FastSS edit join,
    # q110/q125 Jaro-Winkler blocking, Linkage) — identical names
    # repeated K times across copies would fabricate cross-copy
    # near-dup pairs a real Kx corpus would not have (first 10x run:
    # q99 exponent 2.06, pure clone-pair mass). Prefixing the FIRST
    # token with a copy tag keeps within-copy structure byte-identical
    # while separating copies in both the first-token block key and
    # every edit-distance neighborhood.
    if i == 0:
        return tbl
    # doubled copy digit: tags of different copies are >= 2 edits apart,
    # so the q99 edit-distance (<= 1) join cannot match across copies —
    # a single-char tag left cross-copy names one SUBSTITUTION apart,
    # which is a real dist-1 match and fabricated a quadratic output
    names = tbl.column("p_name").to_pylist()
    new = pa.array([f"c{i}{i}{s}" for s in names])
    return tbl.set_column(tbl.schema.get_field_index("p_name"),
                          pa.field("p_name", pa.string()), new)


def perturb_documents(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    suf = f"~{i}"
    new = [" ".join(t + suf for t in s.split(" ")) for s in texts]
    tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                         pa.field("text", pa.string()), pa.array(new))
    nc = pa.array([len(s) for s in new], type=pa.int64())
    return tbl.set_column(tbl.schema.get_field_index("n_chars"),
                          pa.field("n_chars", pa.int64()), nc)


def perturb_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    col = tbl.column("embedding").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(1000 + i)
    noisy = (flat + rng.normal(0.0, 0.05, flat.shape)).astype(np.float32)
    arr = pa.ListArray.from_arrays(col.offsets, pa.array(noisy, type=pa.float32()))
    return tbl.set_column(tbl.schema.get_field_index("embedding"),
                          tbl.schema.field("embedding"), arr)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    shifts_by_table = SHIFTS
    if HUB_GROWTH:
        shifts_by_table = {
            "orders": SHIFTS["orders"],
            "lineitem": {k: v for k, v in SHIFTS["lineitem"].items()
                         if k != "l_suppkey"},
        }
    for name, shifts in shifts_by_table.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        copies = []
        for i in range(K):
            t = shifted(src, shifts, i)
            if name == "documents":
                t = perturb_documents(t, i)
            elif name == "part":
                t = perturb_part_names(t, i)
            elif name == "embeddings":
                t = perturb_embeddings(t, i)
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{OUT}/{name}.parquet")
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
