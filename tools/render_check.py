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

def frames_equal(got, exp):
    """(ok, msg) — columns sorted by name, rows sorted, values exact
    (numeric compared as float64: dtype width legitimately differs,
    DuckDB HUGEINT sums → float64)."""
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return False, f"columns {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"rows {len(got)} vs {len(exp)}"
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype.kind in "ifu" and ev.dtype.kind in "ifu":
                gv = gv.astype("float64")
                ev = ev.astype("float64")
                m = ~((gv.isna() & ev.isna()) | (gv == ev))
            else:
                # normalize date-ish objects to strings so datetime64 vs
                # object-date compares by value (a DATE arrives as a
                # midnight Timestamp through pandas — drop the zero time)
                def norm(x):
                    s = str(x)
                    return s[:-9] if s.endswith(" 00:00:00") else s
                go = gv.astype(object).map(norm)
                eo = ev.astype(object).map(norm)
                m = ~((gv.isna() & ev.isna()) | (go == eo))
        except Exception as ex:
            return False, f"col {c}: compare error {ex}"
        if m.any():
            i = m.idxmax()
            return False, (f"col {c} row {i}: got={g[c][i]!r} exp={e[c][i]!r} "
                           f"({int(m.sum())} diffs)")
    return True, ""

rendered = json.load(open(f"{OUT}/render_duckdb.json"))
ok = fail = 0
rt_ok = rt_fail = rt_missing = 0
for name in sorted(rendered):
    got = pd.read_parquet(f"{OUT}/{name}")
    try:
        exp = con.execute(rendered[name]).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {str(e)[:200]}\n  SQL: {rendered[name]}")
        fail += 1
        continue
    good, msg = frames_equal(got, exp)
    if not good:
        print(f"FAIL {name}: {msg}\n  SQL: {rendered[name]}")
        fail += 1
    else:
        ok += 1
    # reverse direction: the duckdb text fed back through
    # parse_sql(dialect="duckdb") and executed in the ENGINE (<name>_rt)
    # must match DuckDB's own values for the same text
    rt_dir = f"{OUT}/{name}_rt"
    if not os.path.isdir(rt_dir):
        rt_missing += 1  # RenderDump logged the REVERSE-FAIL reason
        continue
    rt = pd.read_parquet(rt_dir)
    good, msg = frames_equal(rt, exp)
    if not good:
        print(f"RT-FAIL {name}: {msg}\n  SQL: {rendered[name]}")
        rt_fail += 1
    else:
        rt_ok += 1
print(f"\nduckdb render round trip: {ok} ok, {fail} fail, {len(rendered)} rendered")
print(f"reverse (duckdb text -> engine): {rt_ok} ok, {rt_fail} fail, "
      f"{rt_missing} refused/missing of {len(rendered)}")
sys.exit(1 if (fail or rt_fail) else 0)
