#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF dir, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact values)."""
import json, math, subprocess, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RUN_VERIFY = os.environ.get("SKIP_VERIFY") != "1"

if RUN_VERIFY:
    # stale per-query dirs from a previous run would mask a query that now
    # fails in Verify — always start clean
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
                       capture_output=True, text=True, cwd="/root/repo")
    with open("/tmp/verify_sbt.log", "w") as f:   # full log for codegen-error hunting
        f.write(r.stdout + r.stderr)
    errs = [l for l in (r.stdout + r.stderr).splitlines()
            if "[verify]" in l or "error]" in l.lower() or "Code grows beyond" in l]
    for l in errs[:40]:
        print(l)

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted([os.path.basename(d) for d in glob.glob(f"{OUT}/*") if os.path.isdir(d)])
ok = fail = 0
for name in names:
    try:
        got = pd.read_parquet(f"{OUT}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}"); fail += 1; continue
    if name not in oracle:
        print(f"SKIP {name}: rows-only ({len(got)} rows)"); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                m = ~((gv.isna() & ev.isna()) | (gv == ev))
            else:
                m = ~((gv.isna() & ev.isna()) | (gv.astype(object) == ev.astype(object)))
        except Exception as ex:
            bad = (c, f"compare error {ex}"); break
        if m.any():
            i = m.idxmax()
            bad = (c, f"row {i}: got={gv[i]!r} exp={ev[i]!r} ({int(m.sum())} diffs)")
            break
    # the driver hashes values dtype-sensitively: an int64 Spark column vs a
    # float64 oracle column (e.g. DuckDB HUGEINT sums) is value-equal here
    # but hash-red there — surface it as a failure locally too
    if bad is None:
        for c in g.columns:
            gk, ek = g[c].dtype.kind, e[c].dtype.kind
            if gk != ek and {gk, ek} & {'f'} and {gk, ek} & {'i', 'u'}:
                bad = (c, f"dtype kind mismatch: spark={g[c].dtype} oracle={e[c].dtype} (driver hash would differ)")
                break
    if bad:
        print(f"FAIL {name}: col {bad[0]}: {bad[1]}"); fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail, {len(names)} total")
