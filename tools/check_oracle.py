#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part of
the library): compare Verify output parquet against DuckDB oracle SQL run on
the same sf tables. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{out}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetch_df()
        want = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fails += 1
        continue

    # NO canonicalization of array cells: the driver's gate sorts raw
    # frames with pandas and THROWS on array columns (unhashable ndarray).
    # This replica must fail the same way, or a non-scalar output shape
    # passes locally and errors in the driver (exactly the r2 q_media_features
    # miss). Queries must emit scalar columns only.
    try:
        g = got[gc].sort_values(gc).reset_index(drop=True)
        w = want[wc].sort_values(wc).reset_index(drop=True)
    except TypeError as e:
        print(f"FAIL {name}: unsortable (non-scalar?) column: {e}")
        fails += 1
        continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        fails += 1
        continue
    eq = g.equals(w)
    if not eq:
        diff = (g != w).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} differing rows of {len(g)}")
        print("spark:", g[diff].head(3).to_dict("records"))
        print("duck :", w[diff].head(3).to_dict("records"))
        fails += 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
sys.exit(1 if fails else 0)
