#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: after `graft.Verify`
dumps each query's result parquet + oracle_sql.json, run every oracle in
DuckDB over the same sf tables and diff (columns sorted by name, rows
sorted by all columns, exact value equality).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{outdir}/{name}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)] if set(got.columns) == set(exp.columns) else got
    if set(got.columns) != set(exp.columns):
        print(f"FAIL {name}: columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
        fail += 1
        continue
    got = got.sort_values(by=sorted(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        fail += 1
        continue
    # report dtype mismatches (value compare below is dtype-lenient, but
    # a strict driver compare might not be)
    for c in sorted(exp.columns):
        de, dg = str(exp[c].dtype), str(got[c].dtype)
        if de != dg and not (de.startswith("datetime") and dg.startswith("datetime")):
            print(f"  warn {name}.{c}: spark dtype {dg} vs oracle {de}")
    # normalize dtypes for comparison (timestamps → ns, numeric exact)
    mismatch = None
    for c in sorted(exp.columns):
        e, g = exp[c], got[c]
        if str(e.dtype).startswith("datetime") or str(g.dtype).startswith("datetime"):
            e = pd.to_datetime(e).astype("datetime64[us]")
            g = pd.to_datetime(g).astype("datetime64[us]")
        eq = (e.isna() & g.isna()) | (e == g)
        if not eq.all():
            i = (~eq).idxmax()
            mismatch = f"col {c} row {i}: spark={got[c][i]!r} oracle={exp[c][i]!r} (dtypes {g.dtype}/{e.dtype})"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fail += 1
    else:
        print(f"ok   {name} ({len(exp)} rows)")
        ok += 1

# rows-only queries (no oracle): just report row counts
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracle:
        try:
            n = len(pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")]))
            print(f"rows {name}: {n}")
        except Exception as e:
            print(f"FAIL {name}: rows-only read error: {e}")
            fail += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracled")
sys.exit(1 if fail else 0)
