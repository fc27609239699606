#!/usr/bin/env python3
"""Conf-regression sweep diff (verdict r14 #3).

Compares two Verify timings.json dumps — a baseline run and a run with
SPARK_GRAFT_BENCH_CONFS=1 — and reports every query whose wall time
regressed beyond a threshold under the bench plan-shape confs. This is
the guard the round-14 q202b thrash showed was missing: a conf adopted
from a headline A/B win can destabilize a non-headline query, and only
a full-corpus sweep notices before a human does.

Usage: diff_timings.py baseline/timings.json benchconfs/timings.json [ratio=2.0] [floor_sec=2.0]

Queries faster than floor_sec in BOTH runs are ignored: at sf0.01 the
sub-second corpus queries swing ±50% on JVM noise alone, and a 0.3s →
0.7s "regression" is not a conf interaction. Exit 1 if any regression.
"""
import json
import sys


def main() -> int:
    base = json.load(open(sys.argv[1]))
    conf = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    bad = []
    for name, b in sorted(base.items()):
        c = conf.get(name)
        if c is None:
            print(f"[diff] {name}: missing from bench-confs run")
            continue
        if b < floor and c < floor:
            continue
        if b > 0 and c / b > ratio:
            bad.append((name, b, c, c / b))
    only_conf = sorted(set(conf) - set(base))
    for name in only_conf:
        print(f"[diff] {name}: missing from baseline run")
    if bad:
        print(f"[diff] {len(bad)} queries regressed >{ratio}x under bench confs:")
        for name, b, c, r in sorted(bad, key=lambda x: -x[3]):
            print(f"[diff]   {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
        return 1
    print(f"[diff] OK: no query regressed >{ratio}x "
          f"(compared {len(base)} queries, floor {floor}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
