#!/usr/bin/env python3
"""Diff two PlanLedger snapshots (round-over-round plan regressions).

Usage: python3 tools/plan_diff.py PLAN_LEDGER_r10.json target/plan_ledger.json

Prints one line per query whose structural plan counts changed, plus
queries added/removed. Exit code 1 if any REGRESSION-class change is
present (exchange/sort/cartesian/BNL count grew, or a pushed/narrow
scan count shrank) so the diff can gate a consolidation.
"""
import json, sys

GROW_IS_BAD = ["exchanges", "range_exchanges", "single_partition",
               "sorts", "bnl_joins", "cartesian"]
SHRINK_IS_BAD = ["pushed_scans", "narrow_scans"]
# the newly-memoized waiver may excuse ONLY scan-derived shrinkage (the
# scan health moved into the memo:<label> row) — never any other field
# that later joins SHRINK_IS_BAD (r11 advice: a broadcast degradation in
# the same round a query was memoized must stay REGRESS)
SCAN_FIELDS = {"scans", "pushed_scans", "narrow_scans"}

def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = json.loads(open(sys.argv[1]).read())
    new = json.loads(open(sys.argv[2]).read())
    regressions = 0
    for k in sorted(set(old) | set(new)):
        if k not in old:
            print(f"ADDED   {k}: {new[k]}")
            continue
        if k not in new:
            print(f"REMOVED {k}")
            continue
        o, n = old[k], new[k]
        # a field absent from the OLD snapshot is a ledger-schema
        # addition (e.g. file_scans/via_memo in r11), not a plan change
        # — comparing it against a default would flood the diff
        deltas = [(f, o.get(f, 0), n.get(f, 0))
                  for f in sorted(set(o) | set(n))
                  if f in o and o.get(f, 0) != n.get(f, 0)]
        if not deltas:
            continue
        # a query newly routed through a memoized exchange legitimately
        # loses its direct scan rows — the scan health now lives in the
        # memo:<label> row (which this diff covers separately). Only
        # applies when ALL direct scans moved (scans==0 in the new
        # plan): a query that still scans directly can lose pushdown on
        # those scans and that stays a regression.
        newly_memoized = ("via_memo" in n and "via_memo" not in o
                          and n.get("scans", 0) == 0)
        # the r12 tail-sort rewrite replaces a root range exchange with
        # a single-partition round-robin exchange (same rows, same
        # order, no bounds-sampling job) — a single_partition growth is
        # excused ONE-FOR-ONE by a range_exchange shed, never beyond
        range_shed = max(0, o.get("range_exchanges", 0)
                         - n.get("range_exchanges", 0))
        def grew_bad(f, ov, nv):
            if f == "single_partition":
                return nv > ov + range_shed
            return nv > ov
        bad = any((f in GROW_IS_BAD and grew_bad(f, ov, nv)) or
                  (f in SHRINK_IS_BAD and nv < ov and
                   not (newly_memoized and f in SCAN_FIELDS))
                  for f, ov, nv in deltas)
        tag = "REGRESS" if bad else "changed"
        regressions += bad
        detail = " ".join(f"{f}:{ov}->{nv}" for f, ov, nv in deltas)
        print(f"{tag} {k}: {detail}")
    print(f"\n{regressions} regression-class changes")
    sys.exit(1 if regressions else 0)

main()
