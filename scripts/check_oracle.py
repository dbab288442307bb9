#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool, not engine code).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares values column-name-sorted, like the driver does.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.read_parquet(files[0])
    want = con.execute(oracle[name]).df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    ok = True
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        ok = False
    elif len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        ok = False
    else:
        # Driver-faithful: the driver hashes TYPED values, so an int64 spark
        # column vs a float64/object oracle column hash-mismatches even when
        # every value compares equal (this is exactly how q_session_events
        # stayed red for two rounds while this mirror said PASS).  Compare
        # dtype KIND per column: int-vs-float, numeric-vs-object etc. = FAIL.
        for c in got.columns:
            ka, kb = got[c].dtype.kind, want[c].dtype.kind
            # normalize int flavors (i/u) together; datetimes (M) together
            norm = lambda k: {"u": "i"}.get(k, k)
            if norm(ka) != norm(kb):
                print(f"FAIL {name}.{c}: dtype {got[c].dtype} (spark) vs "
                      f"{want[c].dtype} (oracle) — driver hash would diverge")
                ok = False
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                a = a.astype(float).to_numpy()
                b = b.astype(float).to_numpy()
                same = (np.isclose(a, b, rtol=0, atol=0, equal_nan=True)) | (
                    np.isnan(a) & np.isnan(b))
                if not same.all():
                    i = int(np.argmin(same))
                    print(f"FAIL {name}.{c}: row {i}: {a[i]!r} != {b[i]!r}")
                    ok = False
            else:
                if not (a.astype(str).to_numpy() == b.astype(str).to_numpy()).all():
                    m = a.astype(str).to_numpy() != b.astype(str).to_numpy()
                    i = int(np.argmax(m))
                    print(f"FAIL {name}.{c}: row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}")
                    ok = False
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fails += 1
print(f"{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
