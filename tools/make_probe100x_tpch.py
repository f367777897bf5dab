#!/usr/bin/env python3
"""Build the 100x TPC-H probe slice (lake/join family rung of the
r13 probe ladder).

Usage: python3 tools/make_probe100x_tpch.py [srcSfDir] [dstDir] [reps]

Same disjoint-key-universe recipe as make_probe10x.py, reps=100 by
default: every fact/dim replica shifts its key columns by i*<per-table
shift>, foreign keys by the SAME constant as their referenced primary
key — referential integrity holds within each replica, join outputs
grow linearly, key skew is unchanged. nation/region stay symlinked
(broadcast-sized dims), as do documents/embeddings/events (the
dedup and ANN/streaming families have their own 100x slices,
make_probe100x.py and make_probe100x_ee.py).
"""
import glob
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe100x_tpch"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 100
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
OSHIFT, CSHIFT, PSHIFT, SSHIFT = 1_000_000, 100_000, 100_000, 10_000
tpch = {
    "orders": [("o_orderkey", OSHIFT), ("o_custkey", CSHIFT)],
    "lineitem": [("l_orderkey", OSHIFT), ("l_partkey", PSHIFT),
                 ("l_suppkey", SSHIFT)],
    "customer": [("c_custkey", CSHIFT)],
    "part": [("p_partkey", PSHIFT)],
    "supplier": [("s_suppkey", SSHIFT)],
}
for table, keys in tpch.items():
    for colname, shift in keys:
        mxk = con.execute(
            f"SELECT MAX({colname}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        assert mxk is not None and mxk < shift, \
            f"{table}.{colname}: max {mxk} not in [0, {shift})"
    repl = ", ".join(f"t.{c} + r.i*{s} AS {c}" for c, s in keys)
    con.execute(f"""
      COPY (SELECT t.* REPLACE ({repl})
            FROM read_parquet('{src}/{table}.parquet') t,
                 range(0,{REPS}) r(i))
      TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: x{REPS} written ({n} rows, "
          f"shifted {[c for c, _ in keys]})")

for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if os.path.splitext(name)[0] in tpch:
        continue
    tgt = os.path.join(dst, name)
    if not os.path.exists(tgt):
        os.symlink(p, tgt)
print("done:", dst)
