#!/usr/bin/env python3
"""Time the bench headline queries in DuckDB over the same parquet dir the
Spark bench reads (BASELINE.md methodology: same machine, same files, warm =
best of N). Writes bench/duckdb_<tag>.json, which graft.Bench embeds into
its JSON line as the baseline side of the 2x ratio gate.

Usage: python3 tools/bench_duckdb.py <sfDir> <tag> [passes]
       (passes defaults to 3; use 1-2 at sf100 where single queries run
        minutes — the relative GC/IO noise a multi-pass min protects
        against is proportionally tiny there)
       (oracle SQL map is dumped via: sbt "runMain graft.tools.DumpOracle ALL /tmp/oracle_all.json")
"""
import duckdb, glob, json, os, subprocess, sys, time

SF = sys.argv[1]
TAG = sys.argv[2] if len(sys.argv) > 2 else "sf1"
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 3
ONLY = sys.argv[4].split(",") if len(sys.argv) > 4 else None  # merge-update just these

HEADLINE = [
    "q01_agg", "q03_join_agg_top", "q12_window_rank", "q19_asof_join",
    "q37_mode", "q60b_text_stats_full", "q63_dedup_keep_first", "q65_minhash_pairs",
    "q68_embedding_topk", "q71_quality_pipeline", "q80_tumble", "q82_session",
    "q101_tpch5_local_volume", "q103_tpch13_custdist",
    "q202_ds27_rollup_avgs", "q204_ds47_yoy_monthly"]

# Controls are timed but kept OUT of the ratio geomean: q80_control is the
# bare-groupBy floor measurement for q80; the q114 pair measures salted vs
# plain join on a 90%-hot key (the DuckDB number is the same query once —
# it has no salting concept).
CONTROLS = ["q80_control", "q101_control", "q101b_tpch5_bucketed",
            "q103_control", "q103b_tpch13_bucketed", "q114_skew_hot_salted",
            "q202_control", "q202b_ds27_bucketed", "q204_control"]

# Note on what the ratio compares (round-12 advice): the Spark side of
# q202/q204 (and q03/q101) runs a hand-pre-aggregated eager-agg plan, while
# the DuckDB side intentionally runs the NAIVE join-then-rollup/window SQL
# from the oracle map — the ratio is "our best plan vs DuckDB's own
# optimizer on the declarative query", not plan-for-plan. Results are
# value-identical (the same SQL is the correctness oracle).

if not os.path.exists("/tmp/oracle_all.json"):
    subprocess.run(["sbt", "-batch", "runMain graft.tools.DumpOracle ALL /tmp/oracle_all.json"],
                   capture_output=True, cwd="/root/repo")
oracle = json.load(open("/tmp/oracle_all.json"))

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def best_of(sql, n):
    times = []
    for _ in range(n):
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    return round(min(times), 3)

out = {}
prev_path = f"bench/duckdb_{TAG}.json"
if ONLY and os.path.exists(prev_path):
    prev = json.load(open(prev_path))
    out.update({k: v for k, v in next(v for k, v in prev.items() if k.startswith("warm_min_of")).items()})
    controls_prev = prev.get("controls", {})
else:
    controls_prev = {}
for q in HEADLINE:
    if q not in oracle or (ONLY and q not in ONLY):
        continue
    out[q] = best_of(oracle[q], PASSES)
    print(q, out[q])

controls = dict(controls_prev)
for q in CONTROLS:
    if q in oracle and (not ONLY or q in ONLY):
        controls[q] = best_of(oracle[q], PASSES)
        print("control", q, controls[q])

os.makedirs("bench", exist_ok=True)
with open(f"bench/duckdb_{TAG}.json", "w") as f:
    json.dump({"sf_dir": SF, "unit": "sec", f"warm_min_of_{PASSES}": out,
               "controls": controls}, f, indent=1)
print("wrote", f"bench/duckdb_{TAG}.json")
