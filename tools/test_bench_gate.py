#!/usr/bin/env python3
"""Self-test for tools/bench_gate.py — the gate is load-bearing (it
hard-fails archive commits on regression or row-set mismatch), so its
own behavior is pinned here: run `python3 tools/test_bench_gate.py`,
expect "all N gate self-tests OK" and exit 0.

Each case builds two tiny artifacts in a temp dir and asserts the
gate's exit code and the marker lines of its output.
"""
import json
import os
import subprocess
import sys
import tempfile

GATE = os.path.join(os.path.dirname(__file__), "bench_gate.py")


def run(td, new, old, *extra):
    np, op = os.path.join(td, "new.json"), os.path.join(td, "old.json")
    json.dump(new, open(np, "w"))
    json.dump(old, open(op, "w"))
    r = subprocess.run([sys.executable, GATE, np, op, *extra],
                       capture_output=True, text=True)
    return r.returncode, r.stdout


def art(queries, sf="sf0.1", batches=None, spb=None, env=None, errors=None):
    a = {"queries": queries, "sf": sf, "errors": errors or {}}
    if batches is not None:
        a["batches"] = batches
    if spb is not None:
        a["sec_per_batch"] = spb
    if env is not None:
        a["env"] = env
    return a


CASES = []


def case(name):
    def deco(fn):
        CASES.append((name, fn))
        return fn
    return deco


@case("clean run passes")
def _(td):
    code, out = run(td, art({"q_a": 1.0}), art({"q_a": 1.0}))
    assert code == 0 and out.startswith("OK:"), (code, out)


@case("wall regression beyond ratio+floor fails")
def _(td):
    code, out = run(td, art({"q_a": 4.0}), art({"q_a": 2.0}))
    assert code == 1 and "q_a [wall]" in out, (code, out)


@case("sub-floor swings are not regressions")
def _(td):
    code, _ = run(td, art({"q_a": 0.35}), art({"q_a": 0.2}))
    assert code == 0


@case("--correctness: missing bench row hard-fails")
def _(td):
    cp = os.path.join(td, "corr.json")
    json.dump({"q_a": {}, "q_b": {}}, open(cp, "w"))
    code, out = run(td, art({"q_a": 1.0}), art({"q_a": 1.0}),
                    "--correctness", cp)
    assert code == 1 and "missing from bench: q_b" in out, (code, out)


@case("--correctness: extra bench row hard-fails")
def _(td):
    cp = os.path.join(td, "corr.json")
    json.dump({"q_a": {}}, open(cp, "w"))
    code, out = run(td, art({"q_a": 1.0, "q_x": 1.0}),
                    art({"q_a": 1.0}), "--correctness", cp)
    assert code == 1 and "benched but not correctness-gated: q_x" in out


@case("--correctness: exact parity passes and says so")
def _(td):
    cp = os.path.join(td, "corr.json")
    json.dump({"q_a": {}}, open(cp, "w"))
    code, out = run(td, art({"q_a": 1.0}), art({"q_a": 1.0}),
                    "--correctness", cp)
    assert code == 0 and "row-set parity" in out


@case("errors in the new run fail regardless of walls")
def _(td):
    code, out = run(td, art({"q_a": 1.0}, errors={"q_b": "boom"}),
                    art({"q_a": 1.0}))
    assert code == 1 and "has errors" in out


@case("sf mismatch fails")
def _(td):
    code, out = run(td, art({"q_a": 1.0}, sf="sf1"), art({"q_a": 1.0}))
    assert code == 1 and "sf mismatch" in out


@case("multi-batch sec/batch regression fails")
def _(td):
    code, out = run(td,
                    art({"q_s": 3.0}, batches={"q_s": 4}, spb={"q_s": 2.0}),
                    art({"q_s": 3.0}, batches={"q_s": 4}, spb={"q_s": 1.0}))
    assert code == 1 and "q_s [sec/batch]" in out


@case("batch-count collapse prints a distinct WARN, not the silent exemption")
def _(td):
    code, out = run(td,
                    art({"q_s": 3.0}, batches={"q_s": 1}, spb={"q_s": 9.0}),
                    art({"q_s": 3.0}, batches={"q_s": 4}, spb={"q_s": 1.0}))
    assert code == 0 and "batch count collapsed 4 -> 1" in out, (code, out)


@case("steady single-batch drain keeps the info exemption")
def _(td):
    code, out = run(td,
                    art({"q_s": 3.0}, batches={"q_s": 1}, spb={"q_s": 9.0}),
                    art({"q_s": 3.0}, batches={"q_s": 1}, spb={"q_s": 1.0}))
    assert code == 0 and "not gated (single-batch" in out


@case("cross-host fingerprints print the WARN")
def _(td):
    e1 = {"host_id": "aaaa", "host_cpu": "X"}
    e2 = {"host_id": "bbbb", "host_cpu": "Y"}
    code, out = run(td, art({"q_a": 1.0}, env=e1), art({"q_a": 1.0}, env=e2))
    assert code == 0 and "cross-host comparison" in out


@case("same host_id with a drifted cpu model string is NOT cross-host")
def _(td):
    # hypervisors restate the advertised frequency across reboots
    # (r12: '@ 2.70GHz' -> '@ 2.10GHz' on one box) — the WARN keys on
    # host_id; the cpu string drift prints as info only
    e1 = {"host_id": "aaaa", "host_cpu": "Xeon @ 2.10GHz"}
    e2 = {"host_id": "aaaa", "host_cpu": "Xeon @ 2.70GHz"}
    code, out = run(td, art({"q_a": 1.0}, env=e1), art({"q_a": 1.0}, env=e2))
    assert code == 0 and "cross-host comparison" not in out
    assert "cpu model string drifted" in out


@case("waived signal passes with a loud WAIVED line")
def _(td):
    code, out = run(td, art({"q_a": 4.0}), art({"q_a": 2.0}),
                    "--waive", "q_a:wall=isolated min-of-5 at baseline")
    assert code == 0 and "WAIVED: q_a [wall]" in out, (code, out)


@case("a waiver only covers its named signal")
def _(td):
    code, out = run(td, art({"q_a": 4.0, "q_b": 4.0}),
                    art({"q_a": 2.0, "q_b": 2.0}),
                    "--waive", "q_a:wall=isolated re-measure clean")
    assert code == 1 and "q_b [wall]" in out and "q_a [wall]: " not in out


@case("a stale waiver (nothing flagged) fails the run")
def _(td):
    code, out = run(td, art({"q_a": 1.0}), art({"q_a": 1.0}),
                    "--waive", "q_a:wall=old excuse")
    assert code == 1 and "no longer match" in out, (code, out)


@case("a reason-less waiver is rejected")
def _(td):
    code, out = run(td, art({"q_a": 4.0}), art({"q_a": 2.0}),
                    "--waive", "q_a:wall=")
    assert code == 2 and "no reason" in out


@case("a waiver kind outside wall|sec/batch is rejected at parse time")
def _(td):
    code, out = run(td, art({"q_a": 4.0}), art({"q_a": 2.0}),
                    "--waive", "q_a:secbatch=typo'd kind")
    assert code == 2 and "not in wall|sec/batch" in out, (code, out)


def manifest(td, **kw):
    mp = os.path.join(td, "GATES.json")
    json.dump(kw, open(mp, "w"))
    return mp


@case("--manifest supplies old, correctness and waivers (relative paths)")
def _(td):
    cp = os.path.join(td, "corr.json")
    json.dump({"q_a": {}}, open(cp, "w"))
    mp = manifest(td, old="old.json", correctness="corr.json",
                  waivers=["q_a:wall=isolated min-of-5 at baseline, SCALE.md"])
    code, out = run(td, art({"q_a": 4.0}), art({"q_a": 2.0}),
                    "--manifest", mp)
    assert code == 0 and "WAIVED: q_a [wall]" in out \
        and "row-set parity" in out, (code, out)


@case("a stale manifest waiver fails the run")
def _(td):
    mp = manifest(td, waivers=["q_a:wall=an excuse that outlived its drift"])
    code, out = run(td, art({"q_a": 1.0}), art({"q_a": 1.0}),
                    "--manifest", mp)
    assert code == 1 and "no longer match" in out, (code, out)


@case("a reason-less manifest waiver is rejected at parse time")
def _(td):
    mp = manifest(td, waivers=["q_a:wall="])
    code, out = run(td, art({"q_a": 4.0}), art({"q_a": 2.0}),
                    "--manifest", mp)
    assert code == 2 and "no reason" in out, (code, out)


@case("manifest new/old fill missing positionals")
def _(td):
    np_, op = os.path.join(td, "mnew.json"), os.path.join(td, "mold.json")
    json.dump(art({"q_a": 4.0}), open(np_, "w"))
    json.dump(art({"q_a": 2.0}), open(op, "w"))
    mp = manifest(td, new="mnew.json", old="mold.json")
    r = subprocess.run([sys.executable, GATE, "--manifest", mp],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "q_a [wall]" in r.stdout, \
        (r.returncode, r.stdout)


def main():
    bad = 0
    for name, fn in CASES:
        with tempfile.TemporaryDirectory() as td:
            try:
                fn(td)
                print(f"OK   {name}")
            except AssertionError as e:
                print(f"FAIL {name}: {e}")
                bad += 1
    if bad:
        print(f"{bad} gate self-tests FAILED")
        return 1
    print(f"all {len(CASES)} gate self-tests OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
