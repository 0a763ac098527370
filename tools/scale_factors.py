#!/usr/bin/env python3
"""Per-decade wall scaling table from two bench artifacts.

Usage: python3 tools/scale_factors.py SF1.json SF10.json [threshold=3.0]

Prints a markdown table of per-query wall ratios (sf10/sf1 — one data
decade), worst first, with rows above the threshold marked for
adjudication in docs/SCALE.md. Streams also show the sec_per_batch
ratio where both artifacts carry it (the signal that actually scales
with data volume; drain wall carries fixed startup overhead that makes
small-wall stream ratios look better than they are and big ones worse).
"""
import json
import sys


def main():
    sf1 = json.load(open(sys.argv[1]))
    sf10 = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    q1, q10 = sf1["queries"], sf10["queries"]
    b1 = sf1.get("sec_per_batch", {})
    b10 = sf10.get("sec_per_batch", {})
    rows = []
    for name in sorted(set(q1) & set(q10)):
        w1, w10 = q1[name], q10[name]
        if w1 <= 0 or w10 <= 0:
            continue
        ratio = w10 / w1
        spb = ""
        if name in b1 and name in b10 and b1[name] > 0:
            spb = f"{b10[name] / b1[name]:.2f}"
        rows.append((name, w1, w10, ratio, spb))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > thr]
    print("| query | sf1 s | sf10 s | wall x/decade | spb x/decade |")
    print("|---|---|---|---|---|")
    for name, w1, w10, ratio, spb in rows:
        mark = " **(adjudicate)**" if ratio > thr else ""
        print(f"| {name}{mark} | {w1:.2f} | {w10:.2f} | {ratio:.2f} | {spb} |")
    print(f"\n{len(rows)} common queries; {len(flagged)} above "
          f"{thr}x/decade", file=sys.stderr)
    missing10 = sorted(set(q1) - set(q10))
    if missing10:
        print(f"missing from sf10: {missing10}", file=sys.stderr)


if __name__ == "__main__":
    main()
