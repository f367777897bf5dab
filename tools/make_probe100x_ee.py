#!/usr/bin/env python3
"""Build the 100x embeddings+events probe slice (r12 verdict #3).

Usage: python3 tools/make_probe100x_ee.py [srcSfDir] [dstDir] [reps]

reps defaults to 100; pass 10 to build the matching 10x rung of the
ladder (same shape recipe, so sf0.1 -> 10x -> 100x is like-for-like).

SURVEY 6.5 proves the dedup/cluster family at 100x; this slice extends
the probe ladder to the ANN/embedding family and the streaming
window/join family, again SHAPE-PRESERVING rather than naively
replicated:

  - embeddings x100: replica i shifts vec_id by i*SHIFT and JITTERS
    every coordinate by +-1% of the corpus coordinate std (seeded RNG,
    deterministic) — real embedding corpora grow with more DISTINCT
    points drawn from the same distribution, and a naive copy would
    hand IVF/kmeans 100 coincident points per cell centroid (zero
    distances, degenerate assignment ties) while the jittered replicas
    keep cell occupancy, distance spectra, and near-dup structure
    realistic (each replica is a tight near-dup cluster of its source,
    the semantic-dedup adversarial shape, mirroring the 10-clique text
    corpus);
  - events x100: replica i shifts event_id by i*SHIFT and user_id by
    i*USHIFT — DISJOINT user universes, so per-user event density and
    the signup-purchase join fan-out stay exactly the source's and
    output grows 100x linearly (keeping user_ids would multiply join
    pairs by 100^2 = a quadratic OUTPUT blow-up, which is the skew
    corpus's job to probe, not the scale ladder's; real 100x traffic
    is more users, not every user 100x denser). The time range is
    unchanged: arrival density grows 100x per window, which is what a
    bigger deployment actually looks like to the windowed operators.
    ts stays physically TIMESTAMP(NANOS)/MICROS as in the source (the
    pyarrow copy preserves it for the nanos-scan path).

Every other table is symlinked from the source dir.
"""
import glob
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 10_000_000
USHIFT = 1_000_000

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe100x_ee"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 100
os.makedirs(dst, exist_ok=True)

# --- embeddings: jittered replicas -----------------------------------
t = pq.read_table(f"{src}/embeddings.parquet")
mx = pc.max(t.column("vec_id")).as_py()
assert mx is not None and mx < SHIFT, f"max vec_id {mx} not in [0, {SHIFT})"
vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
n, dim = vecs.shape
eps = 0.01 * float(vecs.std())
rng = np.random.default_rng(20260814)  # pinned: probe corpora are fixtures
ids = np.asarray(t.column("vec_id"))
labels = np.asarray(t.column("label"))
out_ids, out_vecs, out_labels = [], [], []
for i in range(REPS):
    jitter = np.zeros_like(vecs) if i == 0 else \
        rng.uniform(-eps, eps, size=vecs.shape).astype(np.float32)
    out_ids.append(ids + i * SHIFT)
    out_vecs.append(vecs + jitter)
    out_labels.append(labels)
emb = pa.table({
    "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
    "embedding": pa.array(list(np.concatenate(out_vecs)),
                          type=pa.list_(pa.float32())),
    "label": pa.array(np.concatenate(out_labels), type=pa.int32()),
})
pq.write_table(emb, f"{dst}/embeddings.parquet")
print(f"embeddings: x{REPS} written ({emb.num_rows} rows, dim {dim}, "
      f"jitter +-{eps:.4f})")

# --- events: disjoint user universes ---------------------------------
ev = pq.read_table(f"{src}/events.parquet")
mx_ev = pc.max(ev.column("event_id")).as_py()
mx_u = pc.max(ev.column("user_id")).as_py()
assert mx_ev is not None and mx_ev < SHIFT, \
    f"max event_id {mx_ev} not in [0, {SHIFT})"
assert mx_u is not None and mx_u < USHIFT, \
    f"max user_id {mx_u} not in [0, {USHIFT})"
shifted = []
for i in range(REPS):
    rep = ev.set_column(ev.schema.get_field_index("event_id"),
                        ev.schema.field("event_id"),
                        pc.add(ev.column("event_id"), i * SHIFT))
    rep = rep.set_column(rep.schema.get_field_index("user_id"),
                         rep.schema.field("user_id"),
                         pc.add(rep.column("user_id"), i * USHIFT))
    shifted.append(rep)
pq.write_table(pa.concat_tables(shifted), f"{dst}/events.parquet")
print(f"events: x{REPS} written "
      f"({sum(s.num_rows for s in shifted)} rows, ts type "
      f"{pq.read_schema(f'{dst}/events.parquet').field('ts').type})")

for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name in ("embeddings.parquet", "events.parquet"):
        continue
    tgt = os.path.join(dst, name)
    if not os.path.exists(tgt):
        os.symlink(p, tgt)
print("done:", dst)
