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

Streaming rows (those carrying "batches" in the NEW file) are split into
two signals, because their drain wall is ~90% fixed startup/checkpoint
overhead at test SFs (round-8 lesson: the RocksDB flip moved q_hll_stream
2.4->3.7 s purely in per-batch commit overhead on a <=64-row state):
  - wall uses a RAISED absolute floor (STREAM_FLOOR, default 2.5 s) —
    fixed overhead drift is not a scaling property;
  - sec_per_batch (the part that scales with data volume) gets its own
    TIGHTER gate: new > RATIO * old AND new - old > BATCH_FLOOR (0.25 s),
    compared only when both files carry the field AND the new run has
    >= 2 micro-batches for the query — a single-batch drain's
    sec_per_batch IS the drain (startup + checkpoint + the one trigger),
    i.e. the fixed overhead the raised stream WALL floor already
    absorbs, not a marginal-batch cost; gating it at 0.25 s just
    re-fails the wall rule's exemption (observed: a 1-batch stream's
    spb tracking host fixed-overhead 2.85->4.47 s across boxes while
    its multi-batch siblings stayed within envelope).

Row-set parity (--correctness CORRECTNESS_rN.json): the gate HARD-FAILS
when the new bench artifact's query set differs from the correctness
gate's row set. Two consecutive rounds lost the newest catalog row from
the wall archive (r9: q_ann_index_roundtrip; r10: q_ann_index_add_chain
was in NO bench artifact) — the gate cannot catch a regression in a row
it never sees, and human memory demonstrably does not enforce the
parity. Pass the round's correctness file whenever archiving.

Adjudicated waivers (--waive "query:kind=reason", repeatable): a flagged
signal whose isolated re-measure retired it (the SCALE.md rule) is
downgraded to a loud WAIVED line instead of a permanent red exit on the
committed archive pair. kind is "wall" or "sec/batch"; the reason is
REQUIRED and should cite the isolated number + the docs/SCALE.md
adjudication. A waiver only suppresses the named signal — anything else
still fails — and an unused waiver is itself an error (stale waivers
must not outlive the drift they excused).

Gate manifest (--manifest GATES.json): the per-round adjudication as
version-controlled DATA instead of waiver strings quoted from SCALE.md
prose — the round-11 lesson that reproducing an exit-0 gate run must
not require copying arguments out of docs. The manifest records the
archive pair, the correctness file and the round's waivers:
    {"round": "r12", "new": "BENCH_wall_r12.json",
     "old": "BENCH_wall_r11.json", "correctness": "CORRECTNESS_r12.json",
     "waivers": ["q_x:sec/batch=isolated 0.69 s/batch ≈ baseline, docs/SCALE.md:520"],
     "notes": "optional free text"}
Relative paths resolve against the manifest's own directory. Positional
NEW/OLD override the manifest's (so a fresh BENCH.json can be gated
against the recorded pair); CLI --waive/--correctness merge with (and
win over) the manifest's. Manifest waivers obey every waiver rule —
reason required, single-signal, stale ⇒ fail.

Usage: python3 tools/bench_gate.py NEW.json OLD.json [ratio=1.5] [floor=1.0]
       [stream_floor=2.5] [batch_floor=0.25] [--correctness FILE]
       [--manifest GATES.json] [--waive "query:kind=reason"]...
"""
import json
import os
import sys


def parse_waiver(spec, source):
    if "=" not in spec or ":" not in spec.split("=", 1)[0]:
        print(f"FAIL: malformed {source} {spec!r} "
              "(want query:kind=reason, kind in wall|sec/batch)")
        sys.exit(2)
    key, reason = spec.split("=", 1)
    if not reason.strip():
        print(f"FAIL: {source} {key} carries no reason — a waiver "
              "must cite its isolated re-measure")
        sys.exit(2)
    name, kind = key.rsplit(":", 1)
    if kind not in ("wall", "sec/batch"):
        print(f"FAIL: malformed {source} {spec!r} — kind {kind!r} "
              "not in wall|sec/batch")
        sys.exit(2)
    return (name, kind), reason


def main():
    argv = list(sys.argv[1:])
    correctness = None
    if "--correctness" in argv:
        i = argv.index("--correctness")
        correctness = argv[i + 1]
        del argv[i:i + 2]
    waivers = {}
    manifest_waivers = {}
    if "--manifest" in argv:
        i = argv.index("--manifest")
        mpath = argv[i + 1]
        del argv[i:i + 2]
        mdir = os.path.dirname(os.path.abspath(mpath))
        manifest = json.load(open(mpath))

        def mp(p):
            return p if os.path.isabs(p) else os.path.join(mdir, p)
        for spec in manifest.get("waivers", []):
            key, reason = parse_waiver(spec, f"manifest waiver ({mpath})")
            manifest_waivers[key] = reason
        if correctness is None and manifest.get("correctness"):
            correctness = mp(manifest["correctness"])
        # positionals win; the manifest fills in whatever is missing
        if len(argv) == 0 and manifest.get("new"):
            argv.insert(0, mp(manifest["new"]))
        if len(argv) == 1 and manifest.get("old"):
            argv.insert(1, mp(manifest["old"]))
    while "--waive" in argv:
        i = argv.index("--waive")
        spec = argv[i + 1]
        del argv[i:i + 2]
        key, reason = parse_waiver(spec, "--waive")
        waivers[key] = reason
    waivers = {**manifest_waivers, **waivers}
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    new_path, old_path = argv[0], argv[1]
    ratio = float(argv[2]) if len(argv) > 2 else 1.5
    floor = float(argv[3]) if len(argv) > 3 else 1.0
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    if correctness:
        want = set(json.load(open(correctness)))
        have = set(new["queries"])
        missing, extra = sorted(want - have), sorted(have - want)
        if missing or extra:
            print(f"FAIL: bench row set != correctness row set "
                  f"({correctness}):")
            for q in missing:
                print(f"  missing from bench: {q}")
            for q in extra:
                print(f"  benched but not correctness-gated: {q}")
            sys.exit(1)
        print(f"OK: row-set parity with {correctness} ({len(want)} queries)")
    if new.get("sf") != old.get("sf"):
        print(f"FAIL: sf mismatch ({new.get('sf')} vs {old.get('sf')}) — "
              "wall comparisons across scale factors are meaningless")
        sys.exit(1)
    stream_floor = float(argv[4]) if len(argv) > 4 else 2.5
    batch_floor = float(argv[5]) if len(argv) > 5 else 0.25
    nq, oq = new["queries"], old["queries"]
    nb, ob = new.get("sec_per_batch", {}), old.get("sec_per_batch", {})
    if new.get("errors"):
        print(f"FAIL: new run has errors: {sorted(new['errors'])}")
        sys.exit(1)
    # Host provenance: each round's sessions land on different boxes and
    # walls do not reproduce cross-host (2-9x observed). When the two
    # artifacts carry different fingerprints, every comparison below is
    # cross-host — annotate it (WARN, not fail: the gate still catches
    # order-of-magnitude breaks) and point at the isolated-re-measure
    # rule. Artifacts older than round 10 carry no fingerprint.
    cross_host = False
    ne, oe = new.get("env", {}), old.get("env", {})
    if ne.get("host_id") and oe.get("host_id"):
        # host_id is the stable fingerprint; the cpu MODEL NAME string is
        # informational only — hypervisors restate the advertised base
        # frequency inside an identical box across reboots (observed
        # r12: same host_id, '@ 2.70GHz' -> '@ 2.10GHz'), and warning on
        # it would mark genuinely same-host pairs as unprovenanced.
        if ne["host_id"] != oe["host_id"]:
            cross_host = True
            print(f"WARN: cross-host comparison — new host_id={ne['host_id']}"
                  f" cpu={ne.get('host_cpu')!r} vs old host_id={oe['host_id']}"
                  f" cpu={oe.get('host_cpu')!r}. Per-query walls are not"
                  " comparable across hosts (docs/SCALE.md: re-measure any"
                  " flagged query in isolation with SPARK_GRAFT_ONLY +"
                  " SPARK_GRAFT_REPEATS=5 before believing a regression).")
        elif ne.get("host_cpu") != oe.get("host_cpu"):
            print(f"  info: same host_id={ne['host_id']}, cpu model string"
                  f" drifted ({oe.get('host_cpu')!r} -> {ne.get('host_cpu')!r})"
                  " — hypervisor restatement, not a host change.")
    elif ne.get("host_id") or oe.get("host_id"):
        print("WARN: only one artifact carries a host fingerprint —"
              " provenance unknown; treat flagged drift as possibly"
              " cross-host (docs/SCALE.md isolated re-measure rule).")
    bad, added = [], sorted(set(nq) - set(oq))
    for name in sorted(set(nq) & set(oq)):
        nv, ov = nq[name], oq[name]
        if nv < 0 or ov < 0:
            continue
        f = stream_floor if name in new.get("batches", {}) else floor
        if nv > ratio * ov and nv - ov > f:
            bad.append((name, "wall", ov, nv))
    for name in sorted(set(nb) & set(ob)):
        nv, ov = nb[name], ob[name]
        if new.get("batches", {}).get(name, 0) < 2:
            # a drain that took >=2 batches before but collapsed to 1 is
            # itself a behavioral signal (trigger/file-split change), not
            # a quiet exemption — say so distinctly
            ob_count = old.get("batches", {}).get(name, 0)
            if ob_count >= 2:
                print(f"  WARN: {name} batch count collapsed "
                      f"{ob_count} -> {new.get('batches', {}).get(name, 0)}"
                      f" across runs — sec/batch not comparable; check the"
                      f" drain's trigger/file-split behavior")
            else:
                print(f"  info: {name} sec/batch not gated (single-batch"
                      f" drain — spb is fixed overhead, wall rule applies)")
            continue
        if nv > ratio * ov and nv - ov > batch_floor:
            bad.append((name, "sec/batch", ov, nv))
    for name in added:
        print(f"  new query (no prior wall): {name} = {nq[name]:.2f}s")
    used = set()
    kept = []
    for name, kind, ov, nv in bad:
        if (name, kind) in waivers:
            used.add((name, kind))
            print(f"  WAIVED: {name} [{kind}] {ov:.2f}s -> {nv:.2f}s — "
                  f"{waivers[(name, kind)]}")
        else:
            kept.append((name, kind, ov, nv))
    bad = kept
    stale = sorted(set(waivers) - used)
    if stale:
        print(f"FAIL: {len(stale)} waiver(s) no longer match any flagged "
              f"signal — drop them: " +
              ", ".join(f"{n}:{k}" for n, k in stale))
        sys.exit(1)
    if bad:
        print(f"FAIL: {len(bad)} signal{'' if len(bad)==1 else 's'} regressed "
              f">{ratio}x vs {old_path}:")
        for name, kind, ov, nv in sorted(bad, key=lambda b: b[3] - b[2],
                                         reverse=True):
            suffix = "  [cross-host: re-measure in isolation first]" \
                if cross_host else ""
            print(f"  {name} [{kind}]: {ov:.2f}s -> {nv:.2f}s "
                  f"({nv/ov:.2f}x){suffix}")
        sys.exit(1)
    common = len(set(nq) & set(oq))
    nbatch = len(set(nb) & set(ob))
    print(f"OK: {common} common queries within {ratio}x(+{floor}s wall, "
          f"+{stream_floor}s stream wall) of {old_path}; {nbatch} per-batch "
          f"signals within {ratio}x(+{batch_floor}s); {len(added)} new")


if __name__ == "__main__":
    main()
