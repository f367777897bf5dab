#!/usr/bin/env python3
"""Build the 100x documents-only probe slice (r11 verdict #3).

Usage: python3 tools/make_probe100x.py [srcSfDir] [dstDir]

The dedup/cluster family is proven to 10x (SURVEY 6.4); the bar says
"survive 100x". This slice replicates documents 100x while preserving
the 10-CLIQUE duplicate shape the family is measured on:

  - replica i (0..99) shifts doc_id by i*SHIFT (ids stay unique and
    order-meaningful — every query tie-breaks on the id);
  - replicas are grouped into DECADES d = i // 10; within a decade the
    10 replicas share exact content (a 10-clique, as in the 10x probe);
  - across decades every WORD is suffixed with the decade ('w' ->
    'w~d'), so decades share ZERO shingles — exact-Jaccard pairs can
    never bridge decades and cliques stay size 10 (a light suffix on
    the TEXT would leave shingle Jaccard ~0.97 and fuse all 100
    replicas into one clique, the wrong shape: real corpora grow more
    cliques, not bigger ones). Word count per doc is unchanged, so
    per-doc shingle workload matches the 10x probe exactly.

Every other table is symlinked from the source dir (the measured
queries — pipeline_dedup_keep_best / pipeline_dedup_clusters /
pipeline_corpus_clean — read documents only).
"""
import glob
import os
import sys

import duckdb

SHIFT = 10_000_000

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe100x"
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
mx = con.execute(
    f"SELECT MAX(doc_id) FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]
assert mx is not None and mx < SHIFT, f"max doc_id {mx} not in [0, {SHIFT})"
con.execute(f"""
  COPY (SELECT d.* REPLACE (
          d.doc_id + t.i*{SHIFT} AS doc_id,
          array_to_string(list_transform(string_split(d.text, ' '),
            w -> w || '~' || CAST(t.i // 10 AS VARCHAR)), ' ') AS text,
          CAST(len(array_to_string(list_transform(string_split(d.text, ' '),
            w -> w || '~' || CAST(t.i // 10 AS VARCHAR)), ' ')) AS BIGINT)
            AS n_chars)
        FROM read_parquet('{src}/documents.parquet') d, range(0,100) t(i))
  TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
# shape check: each decade carries its own vocabulary, so the distinct
# content count must be exactly 10x the source's (the source itself
# plants a few exact-dup pairs — those become 20-cliques, as they are
# 2-cliques in the source; everything else is a clean 10-clique)
src_distinct = con.execute(f"""
  SELECT COUNT(DISTINCT text)
  FROM read_parquet('{src}/documents.parquet')""").fetchone()[0]
n, cliques = con.execute(f"""
  SELECT COUNT(*), COUNT(DISTINCT text)
  FROM read_parquet('{dst}/documents.parquet')""").fetchone()
assert cliques == src_distinct * 10, \
    f"clique shape broken: {cliques} contents vs {src_distinct}x10"
print(f"documents: x100 written ({n} rows, {cliques} content cliques, "
      f"clique size = 10 x source multiplicity)")

for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name == "documents.parquet":
        continue
    tgt = os.path.join(dst, name)
    if not os.path.exists(tgt):
        os.symlink(p, tgt)
print("done:", dst)
