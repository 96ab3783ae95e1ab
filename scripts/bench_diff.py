#!/usr/bin/env python3
"""Diff a Bench JSON line against BENCH_ANCHOR.json.

Usage:
    SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Bench" 2>&1 \
        | grep -F '"metric"' > /tmp/bench.out
    python3 scripts/bench_diff.py /tmp/bench.out

Flags any query slower than REGRESSION_X times its anchor, and prints
new/removed queries. Exit code 1 on regression, 0 otherwise.
"""
import json
import re
import sys

REGRESSION_X = 1.5   # per-query slowdown that counts as a regression
MIN_DELTA_S = 0.35   # ... but only when the absolute slowdown exceeds
                     # this (sub-second queries jitter 2x run-to-run)

anchor = json.load(open("BENCH_ANCHOR.json"))["queries"]
raw = open(sys.argv[1]).read()
m = re.search(r'\{"metric".*\}', raw)
if not m:
    sys.exit("no bench JSON line found in " + sys.argv[1])
bench = json.loads(m.group(0))
cur = bench["queries"]
# r18: the bench line self-reports hypervisor steal sampled around
# each query's timed window — a flag whose window saw steal is a
# contended read, not a plan regression (the r17 adjudication rule,
# now machine-checkable)
steal = bench.get("steal", {})
STEAL_NOTE = 0.5  # percent of the query window under steal worth noting

regressions = []
for name, secs in sorted(cur.items()):
    base = anchor.get(name)
    note = f"  [steal {steal[name]:.1f}%]" if steal.get(name, 0) >= STEAL_NOTE else ""
    if base is None:
        print(f"NEW      {name}: {secs:.2f}s (no anchor){note}")
    elif secs > base * REGRESSION_X and secs - base > MIN_DELTA_S:
        regressions.append(name)
        print(f"REGRESS  {name}: {secs:.2f}s vs anchor {base:.2f}s "
              f"({secs / base:.1f}x){note}")
for name in sorted(set(anchor) - set(cur)):
    print(f"REMOVED  {name}: was {anchor[name]:.2f}s")

total = bench["value"]
stolen = [n for n in regressions if steal.get(n, 0) >= STEAL_NOTE]
run_steal = bench.get("run_steal")
run_note = f"; run steal {run_steal:.2f}%" if run_steal is not None else ""
print(f"total {total:.1f}s over {len(cur)} queries; "
      f"{len(regressions)} regression(s) at >{REGRESSION_X}x "
      f"({len(stolen)} under measured steal){run_note}")
sys.exit(1 if regressions else 0)
