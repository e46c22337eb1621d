#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query
dumped by graft.Verify, run its oracleSql in DuckDB over the same
parquet corpus and diff (columns sorted by name, rows sorted)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    d = f"{outdir}/{name}"
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        ok.append(f"{name}: rows-only ({len(spark_df)} rows)")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        bad.append(f"{name}: ORACLE SQL ERROR: {e}"); continue
    a, b = spark_df, duck_df
    if sorted(a.columns) != sorted(b.columns):
        bad.append(f"{name}: COLUMN MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}"); continue
    cols = sorted(a.columns)
    a, b = a[cols], b[cols]
    if len(a) != len(b):
        bad.append(f"{name}: ROWCOUNT spark={len(a)} duck={len(b)}"); continue
    a = a.sort_values(cols).reset_index(drop=True)
    b = b.sort_values(cols).reset_index(drop=True)
    diffs = []
    for c in cols:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                eq = (av.isna() & bv.isna()) | (av == bv)
            elif str(av.dtype).startswith('datetime') or str(bv.dtype).startswith('datetime'):
                eq = pd.to_datetime(av).eq(pd.to_datetime(bv)) | (av.isna() & bv.isna())
            else:
                eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
        except Exception as e:
            diffs.append((c, f"cmp error {e}")); continue
        if not eq.all():
            i = int(np.argmin(eq.values))
            diffs.append((c, f"{int((~eq).sum())} rows differ, first@{i}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"))
    if diffs: bad.append(f"{name}: VALUE MISMATCH {diffs[:3]}")
    else: ok.append(f"{name}: OK ({len(a)} rows)")
print(f"=== {len(ok)} ok, {len(bad)} bad ===")
for l in ok: print("  ", l)
for l in bad: print("XX", l)
sys.exit(1 if bad else 0)
