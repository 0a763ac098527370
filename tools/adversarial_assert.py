#!/usr/bin/env python3
"""Boundary-exercise assertions over an adversarial-fixture verify dump.

oracle_check.py proves engine == oracle; this proves the fixture actually
EXERCISED each planted boundary and that both engines decided it per the
documented rule (a fixture that silently stops covering the boundary —
e.g. a pair that no longer band-collides after a constant change — must
fail here, not pass vacuously). Run after tools/make_adversarial.py +
graft.Verify + tools/oracle_check.py:

    python3 tools/adversarial_assert.py /tmp/adv_out
"""
import sys

import pandas as pd

CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn
    return deco


@check("sessions: exactly-gap adjacency MERGES (diff > gap rule)")
def _(out):
    df = pd.read_parquet(f"{out}/q_event_sessions")
    by = {t: sorted(g.n_events.tolist())
          for t, g in df.groupby("event_type")}
    assert by["adv_exact"] == [5], by["adv_exact"]       # touch -> one session
    assert by["adv_plus"] == [1] * 5, by["adv_plus"]     # gap+1us -> all split
    assert by["adv_minus"] == [5], by["adv_minus"]       # gap-1us -> merged
    assert by["adv_mixed"] == [2, 3], by["adv_mixed"]    # split only at +1us


@check("stream sessions: end+gap EXACTLY at watermark emits (<= rule)")
def _(out):
    df = pd.read_parquet(f"{out}/q_event_sessions_stream")
    types = set(df.event_type)
    assert "adv_wm_eq" in types, "end==wm session was NOT emitted"
    assert "adv_wm_minus" in types
    assert "adv_wm_plus" not in types, "end==wm+1ms session leaked out"
    assert "adv_horizon" not in types
    # the gap-boundary families survive the stream identically
    s = df[df.event_type == "adv_exact"]
    assert s.n_events.tolist() == [5]


@check("embed near-dup: rounded cos EXACTLY 0.45 included (>= rule)")
def _(out):
    for q in ("q_embed_neardup", "q_embed_stream"):
        df = pd.read_parquet(f"{out}/{q}")
        pairs = set(zip(df.vec_a, df.vec_b))
        eq = df[(df.vec_a == 400) & (df.vec_b == 401)]
        assert len(eq) == 1 and eq.cos_sim.iloc[0] == 0.45, \
            f"{q}: threshold-equal pair missing or wrong cos"
        assert (410, 411) not in pairs, f"{q}: below-threshold pair leaked"
        assert (420, 421) in pairs, f"{q}: above-threshold pair missing"


@check("embed capped stream: cap binds on arrival cap+1, not cap")
def _(out):
    df = pd.read_parquet(f"{out}/q_embed_stream_capped")
    fam_a = df[(df.vec_a >= 200) & (df.vec_b <= 230)]
    fam_b = df[(df.vec_a >= 300) & (df.vec_b <= 329)]
    # 31-clone family: the 31st arrival (vec 230) finds 30 prior home
    # arrivals == cap -> suppressed; all C(30,2) earlier pairs emitted
    assert not ((fam_a.vec_a == 230) | (fam_a.vec_b == 230)).any(), \
        "pair involving the cap-tripping arrival leaked"
    assert len(fam_a) == 30 * 29 // 2, len(fam_a)
    # 30-clone family: last arrival has cap-1 priors -> nothing suppressed
    assert len(fam_b) == 30 * 29 // 2, len(fam_b)


@check("minhash near-dup: Jaccard EXACTLY 0.5 included (>= rule)")
def _(out):
    df = pd.read_parquet(f"{out}/q_doc_minhash_neardup")
    # the five planted pairs are docs (1,2)..(9,10); all 5 band-collide
    # in the committed fixture (build-time assert) and sit AT threshold
    planted = df[(df.doc_a <= 9) & (df.doc_b <= 10)]
    assert len(planted) >= 1, "no threshold-equal jaccard pair surfaced"
    assert (planted.jaccard == 0.5).all(), planted
    # just-below control (docs 11,12): excluded even where banded
    assert not ((df.doc_a == 11) & (df.doc_b == 12)).any()


@check("exact dedup: clone families + shingle-set twins collapse")
def _(out):
    df = pd.read_parquet(f"{out}/q_doc_exact_dedup")
    fams = df[df.n_docs > 1].sort_values("n_docs")
    # 4-clone family, 5-clone family, and the 2-doc different-raw-text /
    # same-word-set pair (n_distinct_texts == 2: the key is the BAG, not
    # the bytes — pinned so a "helpful" switch to raw-text keys fails)
    assert fams.n_docs.tolist() == [2, 4, 5], fams.n_docs.tolist()
    twins = fams[fams.n_docs == 2]
    assert twins.n_distinct_texts.iloc[0] == 2


def main(out):
    failed = 0
    for name, fn in CHECKS:
        try:
            fn(out)
            print(f"OK       {name}")
        except AssertionError as e:
            print(f"FAIL     {name}: {e}")
            failed += 1
    print(f"\n{len(CHECKS) - failed} OK, {failed} BAD")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
