#!/usr/bin/env python3
"""Round-over-round per-query wall regression gate.

Compares a fresh Bench run (BENCH.json, written by `runMain graft.Bench`)
against the committed prior-round archive (BENCH_wall_r0{N-1}.json) at the
same sf and exits non-zero if any query regressed beyond the gate — the
check VERDICT.md round 7 asked for, run at end-of-round right before the
new wall map is committed as BENCH_wall_r0N.json.

Gate rule: a query FAILS if
    new_wall > RATIO * old_wall  AND  new_wall - old_wall > ABS_FLOOR
The absolute floor keeps sub-second queries out of the gate: the host
shows multi-second scheduling jitter and a 0.2 s -> 0.35 s swing is noise,
not a regression (both runs are min-of-N for the same reason). Queries
present only in one file are reported informationally (new queries are
expected every round; removed queries fail the CORRECTNESS gate first).

Usage: python3 tools/bench_gate.py NEW.json OLD.json [ratio=1.5] [floor=1.0]
"""
import json
import sys


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    new_path, old_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    if new.get("sf") != old.get("sf"):
        print(f"FAIL: sf mismatch ({new.get('sf')} vs {old.get('sf')}) — "
              "wall comparisons across scale factors are meaningless")
        sys.exit(1)
    nq, oq = new["queries"], old["queries"]
    if new.get("errors"):
        print(f"FAIL: new run has errors: {sorted(new['errors'])}")
        sys.exit(1)
    bad, added = [], sorted(set(nq) - set(oq))
    for name in sorted(set(nq) & set(oq)):
        nv, ov = nq[name], oq[name]
        if nv < 0 or ov < 0:
            continue
        if nv > ratio * ov and nv - ov > floor:
            bad.append((name, ov, nv))
    for name in added:
        print(f"  new query (no prior wall): {name} = {nq[name]:.2f}s")
    if bad:
        print(f"FAIL: {len(bad)} quer{'y' if len(bad)==1 else 'ies'} regressed "
              f">{ratio}x (+{floor}s floor) vs {old_path}:")
        for name, ov, nv in sorted(bad, key=lambda b: b[2] - b[1], reverse=True):
            print(f"  {name}: {ov:.2f}s -> {nv:.2f}s ({nv/ov:.2f}x)")
        sys.exit(1)
    common = len(set(nq) & set(oq))
    print(f"OK: {common} common queries within {ratio}x(+{floor}s) of {old_path}; "
          f"{len(added)} new")


if __name__ == "__main__":
    main()
