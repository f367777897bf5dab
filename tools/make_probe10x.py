#!/usr/bin/env python3
"""Build the adversarial 10x probe corpus (SURVEY.md 6.1/6.2).

Usage: python3 tools/make_probe10x.py [srcSfDir] [dstDir]

documents/embeddings/events are replicated 10x with shifted ids — every
source row becomes a 10-clique of exact duplicates, the duplication-heavy
shape corpus dedup exists for.

The TPC-H fact/dim tables (lineitem, orders, customer, part, supplier)
are ALSO replicated 10x, each replica a disjoint key universe (every key
column shifted by i*<per-table shift>), so the lake-join probes
(bloom/DPP/bigbig/salted) are measured on grown inputs instead of
symlinked originals — referential integrity holds within each replica,
join outputs grow ~linearly, and key skew is unchanged. nation/region
stay symlinked (broadcast-sized dims; scaling them probes nothing).

events.parquet is copied via pyarrow, not DuckDB, to preserve the
physical TIMESTAMP(NANOS) column the nanos-scan path must keep seeing.
"""
import glob
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT = 10_000_000

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe10x"
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
for table, idcol in (("documents", "doc_id"), ("embeddings", "vec_id")):
    # ids must stay unique and order-meaningful after shifting: every
    # query treats the id as a total-order tie-break
    mx = con.execute(
        f"SELECT MAX({idcol}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    assert mx is not None and mx < SHIFT, \
        f"{table}: max {idcol} {mx} not in [0, {SHIFT})"
    # d.* REPLACE — a bare * would leak the replication counter i as an
    # extra column into the probe corpus (schema drift vs production)
    con.execute(f"""
      COPY (SELECT d.* REPLACE (d.{idcol} + t.i*{SHIFT} AS {idcol})
            FROM read_parquet('{src}/{table}.parquet') d, range(0,10) t(i))
      TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
    print(f"{table}: x10 written")

t = pq.read_table(f"{src}/events.parquet")
mx_ev = pa.compute.max(t.column("event_id")).as_py()
assert mx_ev is not None and mx_ev < SHIFT, \
    f"events: max event_id {mx_ev} not in [0, {SHIFT})"
shifted = []
for i in range(10):
    ids = pa.compute.add(t.column("event_id"), i * SHIFT)
    shifted.append(t.set_column(t.schema.get_field_index("event_id"),
                                t.schema.field("event_id"), ids))
pq.write_table(pa.concat_tables(shifted), f"{dst}/events.parquet")
print("events: x10 written (nanos preserved:",
      pq.read_schema(f"{dst}/events.parquet").field("ts").type, ")")

# TPC-H side: 10 disjoint key universes. Shifts exceed each key's max
# (asserted) so replicas never collide; foreign keys shift by the SAME
# per-table constant as their referenced primary key, so every join
# keeps its per-replica matches.
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
            FROM read_parquet('{src}/{table}.parquet') t, range(0,10) r(i))
      TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
    print(f"{table}: x10 written (shifted: {[c for c, _ in keys]})")

for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name in ("documents.parquet", "embeddings.parquet", "events.parquet") \
            or os.path.splitext(name)[0] in tpch:
        continue
    tgt = os.path.join(dst, name)
    if not os.path.exists(tgt):
        os.symlink(p, tgt)
print("done:", dst)
