#!/usr/bin/env python3
"""Build the adversarial SKEW probe corpus (SURVEY.md 6.3).

Usage: python3 tools/make_probe_skew.py [srcSfDir] [dstDir]

The 10x-replication shape of make_probe10x.py (documents/embeddings/
events x10, shifted ids) PLUS realistic hot keys the uniform replication
cannot produce:

  - documents: ~92% of rows relabeled lang='en' (every doc_id % 12 != 0;
    the rest keep their source language) - the dominant-language shape a
    real crawl has, which turns any Window.partitionBy(lang) into a
    single task holding 92% of the corpus;
  - events: ~50% of rows re-keyed user_id=1500 (every event_id % 2 = 0;
    1500 is above the source's max user_id, so the hot user is disjoint
    from the organic ones) - the hot-entity shape per-user windows and
    sessionization see in production clickstreams.

TPC-H tables are symlinked unchanged (make_probe10x.py now scales those;
this probe isolates the skew dimension). events goes through pyarrow to
preserve the physical TIMESTAMP(NANOS) column the nanos-scan path must
keep seeing.
"""
import glob
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 10_000_000
HOT_USER = 1500

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_skew"
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
mx = con.execute(
    f"SELECT MAX(doc_id) FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]
assert mx is not None and mx < SHIFT
con.execute(f"""
  COPY (SELECT d.* REPLACE (
          d.doc_id + t.i*{SHIFT} AS doc_id,
          CASE WHEN d.doc_id % 12 <> 0 THEN 'en' ELSE d.lang END AS lang)
        FROM read_parquet('{src}/documents.parquet') d, range(0,10) t(i))
  TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
share = con.execute(f"""
  SELECT COUNT(*) FILTER (lang = 'en') * 100 / COUNT(*)
  FROM read_parquet('{dst}/documents.parquet')""").fetchone()[0]
print(f"documents: x10 written, en share {share}%")

con.execute(f"""
  COPY (SELECT e.* REPLACE (e.vec_id + t.i*{SHIFT} AS vec_id)
        FROM read_parquet('{src}/embeddings.parquet') e, range(0,10) t(i))
  TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
print("embeddings: x10 written")

t = pq.read_table(f"{src}/events.parquet")
mx_ev = pc.max(t.column("event_id")).as_py()
assert mx_ev is not None and mx_ev < SHIFT
mx_user = pc.max(t.column("user_id")).as_py()
assert mx_user < HOT_USER, f"hot user {HOT_USER} collides (max {mx_user})"
hot = pc.if_else(
    pc.equal(pc.bit_wise_and(t.column("event_id"), 1), 0),
    pa.scalar(HOT_USER, type=t.schema.field("user_id").type),
    t.column("user_id"))
t = t.set_column(t.schema.get_field_index("user_id"),
                 t.schema.field("user_id"), hot)
shifted = []
for i in range(10):
    ids = pc.add(t.column("event_id"), i * SHIFT)
    shifted.append(t.set_column(t.schema.get_field_index("event_id"),
                                t.schema.field("event_id"), ids))
pq.write_table(pa.concat_tables(shifted), f"{dst}/events.parquet")
print("events: x10 written, hot user =", HOT_USER, "(nanos preserved:",
      pq.read_schema(f"{dst}/events.parquet").field("ts").type, ")")

for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        continue
    tgt = os.path.join(dst, name)
    if not os.path.exists(tgt):
        os.symlink(p, tgt)
print("done:", dst)
