#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each parquet result written by graft.Verify from outDir/<name>/,
runs the matching oracle SQL from outDir/oracle_sql.json in DuckDB (tables
registered as views over sfDir/*.parquet), sorts columns by name, and
compares values exactly. Prints per-query PASS/FAIL with diff samples.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
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
            if not (got[c][m].values == exp[c][m].values).all():
                ok = False
                bad = np.nonzero(got[c][m].values != exp[c][m].values)[0][:3]
                print(f"FAIL {name}.{c}: {len(np.nonzero(got[c][m].values != exp[c][m].values)[0])} mismatches, e.g. rows {bad}:")
                for i in bad:
                    print(f"    got={got[c][m].values[i]!r} exp={exp[c][m].values[i]!r}")
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            fails += 1
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}")
        fails += 1

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} queries with oracle)")
sys.exit(1 if fails else 0)
