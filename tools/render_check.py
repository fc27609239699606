#!/usr/bin/env python3
"""DuckDB half of the duckdb-dialect render round trip: RenderDump (Scala)
generated the fuzz corpus, rendered every walkable query in the duckdb
dialect and dumped the ENGINE's results; this executes each rendering in a
real DuckDB over the same fixture tables and value-compares (columns
sorted, rows sorted — same shape as check.py). A failure means the duckdb
renderer emitted text that parses but computes something else there.

Usage: python3 tools/render_check.py [outDir]   (default /tmp/render_rt)
Pass SKIP_DUMP=1 to reuse an existing dump without re-running Spark."""
import glob, json, os, subprocess, sys
import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/render_rt"

if os.environ.get("SKIP_DUMP") != "1":
    r = subprocess.run(["sbt", "-batch", f"runMain graft.tools.RenderDump {OUT}"],
                       capture_output=True, text=True, cwd="/root/repo")
    for l in (r.stdout + r.stderr).splitlines():
        if "[render-dump]" in l or "error]" in l.lower():
            print(l)

con = duckdb.connect()
for t in ("ft1", "ft2"):
    (p,) = glob.glob(f"{OUT}/_fixtures/{t}/*.parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

rendered = json.load(open(f"{OUT}/render_duckdb.json"))
ok = fail = 0
for name in sorted(rendered):
    got = pd.read_parquet(f"{OUT}/{name}")
    try:
        exp = con.execute(rendered[name]).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {str(e)[:200]}\n  SQL: {rendered[name]}")
        fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}\n"
              f"  SQL: {rendered[name]}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}\n  SQL: {rendered[name]}")
        fail += 1
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        # the round trip asserts VALUE equality across engines; dtype width
        # may legitimately differ (DuckDB HUGEINT sums → float64), so
        # numeric columns compare as floats
        try:
            if gv.dtype.kind in "ifu" and ev.dtype.kind in "ifu":
                gv = gv.astype("float64")
                ev = ev.astype("float64")
                m = ~((gv.isna() & ev.isna()) | (gv == ev))
            else:
                m = ~((gv.isna() & ev.isna()) | (gv.astype(object) == ev.astype(object)))
        except Exception as ex:
            bad = (c, f"compare error {ex}")
            break
        if m.any():
            i = m.idxmax()
            bad = (c, f"row {i}: got={g[c][i]!r} exp={e[c][i]!r} ({int(m.sum())} diffs)")
            break
    if bad:
        print(f"FAIL {name}: col {bad[0]}: {bad[1]}\n  SQL: {rendered[name]}")
        fail += 1
    else:
        ok += 1
print(f"\nduckdb render round trip: {ok} ok, {fail} fail, {len(rendered)} rendered")
sys.exit(1 if fail else 0)
