#!/usr/bin/env python3
"""Local replica of the driver's correctness gate, plus the bench
regression gate (r11 verdict #6).

Usage:
  python3 tools/check.py [sfDir] [outDir]
      correctness: compare graft.Verify parquet dumps against the DuckDB
      oracle replay (per-query PASS/FAIL with diff samples).

  python3 tools/check.py --bench-diff PREV_DETAIL.json [CUR_DETAIL.json]
      regression: compare two BENCH_DETAIL.json files (CUR defaults to
      ./BENCH_DETAIL.json). Per-query minimums are the stable signal
      (machine noise is ±15%, documented SURVEY §6); FAIL any query
      whose current time exceeds 1.5x its prior minimum, or that failed
      (-1) now but not before. New/removed queries are reported, not
      failed. Typical close-out invocation:
        git show HEAD:BENCH_DETAIL.json > /tmp/prev_detail.json
        python3 tools/check.py --bench-diff /tmp/prev_detail.json
"""
import json, sys, glob, os
import numpy as np


def bench_diff(prev_path, cur_path):
    prev = json.load(open(prev_path))["queries"]
    cur = json.load(open(cur_path))["queries"]
    fails = 0
    new = sorted(set(cur) - set(prev))
    gone = sorted(set(prev) - set(cur))
    if new:
        print(f"note: {len(new)} new queries (no prior minimum): {new}")
    if gone:
        print(f"note: {len(gone)} queries removed: {gone}")
    rows = []
    for name in sorted(set(cur) & set(prev)):
        p, c = prev[name], cur[name]
        if c < 0 and p >= 0:
            print(f"FAIL {name}: failed now (prior {p:.3f}s)")
            fails += 1
            continue
        if p <= 0:   # prior failure or zero: no usable baseline
            continue
        ratio = c / p
        rows.append((ratio, name, p, c))
        # ratio gate with an absolute floor: sub-second rows carry
        # +-0.2s scheduler/JIT jitter that dwarfs any 1.5x ratio (a
        # 0.2s->0.35s blip is noise; a 2s->3.5s move is not)
        if ratio > 1.5 and c - p > 0.5:
            print(f"FAIL {name}: {c:.3f}s vs prior {p:.3f}s ({ratio:.2f}x)")
            fails += 1
    rows.sort(reverse=True)
    print("\nworst movers (ratio, prev s, cur s):")
    for ratio, name, p, c in rows[:10]:
        print(f"  {ratio:5.2f}x  {name}  {p:.3f} -> {c:.3f}")
    tp = sum(v for v in prev.values() if v > 0)
    tc = sum(v for v in cur.values() if v > 0)
    print(f"\ntotals: prev {tp:.1f}s ({len(prev)} q) -> cur {tc:.1f}s "
          f"({len(cur)} q)")
    print("BENCH-DIFF " + ("PASS" if fails == 0 else f"{fails} FAILURES"))
    return 1 if fails else 0


if len(sys.argv) > 1 and sys.argv[1] == "--bench-diff":
    cur = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DETAIL.json"
    sys.exit(bench_diff(sys.argv[2], cur))

import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# tolerance-mode oracles (opt-in epsilon compare, r13 verdict #6):
# name -> {"sql": ..., "rtol": ...}; float columns compared with a
# relative bound, everything else exactly. Hash-equality stays default.
tol_path = f"{out_dir}/tolerance_oracle_sql.json"
tolerance = json.load(open(tol_path)) if os.path.exists(tol_path) else {}
rtols = {name: spec["rtol"] for name, spec in tolerance.items()}
oracle = dict(oracle, **{n: spec["sql"] for n, spec in tolerance.items()})
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.execute(sql).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            fails += 1
            continue
        # order-sensitive compare (queries ORDER BY a unique key)
        ok = True
        for c in got.columns:
            g, e = got[c].values, exp[c].values
            if g.dtype != e.dtype:
                print(f"  note {name}.{c}: dtype {g.dtype} vs {e.dtype}")
            gn, en = pd.isna(got[c]), pd.isna(exp[c])
            if not (gn == en).all():
                ok = False
                print(f"FAIL {name}.{c}: null mask differs")
                continue
            m = ~gn
            gv, ev = got[c][m].values, exp[c][m].values
            if name in rtols and np.issubdtype(np.asarray(ev).dtype,
                                               np.floating):
                rt = rtols[name]
                bad_mask = ~np.isclose(gv.astype(float), ev.astype(float),
                                       rtol=rt, atol=0.0)
                if bad_mask.any():
                    ok = False
                    bad = np.nonzero(bad_mask)[0][:3]
                    print(f"FAIL {name}.{c}: {bad_mask.sum()} beyond "
                          f"rtol={rt}, e.g. rows {bad}:")
                    for i in bad:
                        print(f"    got={gv[i]!r} exp={ev[i]!r}")
                continue
            if not (gv == ev).all():
                ok = False
                bad = np.nonzero(gv != ev)[0][:3]
                print(f"FAIL {name}.{c}: {len(np.nonzero(gv != ev)[0])} mismatches, e.g. rows {bad}:")
                for i in bad:
                    print(f"    got={gv[i]!r} exp={ev[i]!r}")
        if ok:
            mode = f" [rtol={rtols[name]}]" if name in rtols else ""
            print(f"PASS {name} ({len(got)} rows){mode}")
        else:
            fails += 1
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}")
        fails += 1

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} queries with oracle)")
sys.exit(1 if fails else 0)
