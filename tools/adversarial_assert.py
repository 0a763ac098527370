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


@check("index delete: tombstoned exact twin masked; survivor twin tops q1")
def _(out):
    df = pd.read_parquet(f"{out}/q_ann_index_delete")
    assert not (df.neighbor_id % 10 == 1).any(), \
        "a tombstoned (residue-1) id surfaced as neighbor"
    q1 = df[df.q_id == 1].sort_values("rank")
    # 901 (deleted exact copy of q1) is masked; its twin 900 carries the
    # top slot — the mask visibly changed the ranking, not vacuous
    assert q1.neighbor_id.iloc[0] == 900, q1.head().to_dict("records")
    # unknown-id deletes (the row also tombstones two never-indexed
    # sentinel ids) were no-ops: the oracle hash already proves it, this
    # pin is that the output is non-empty at all
    assert len(df) > 0


@check("index rank ties: equal approx_sim broken by neighbor_id ASC (440 before 442)")
def _(out):
    for q in ("q_ann_index_delete", "q_ann_index_masked_sql"):
        df = pd.read_parquet(f"{out}/{q}")
        q0 = df[df.q_id == 0].sort_values("rank")
        sub = q0[q0.neighbor_id.isin((440, 442))]
        assert len(sub) == 2, \
            f"{q}: tie clones missing from q0 top-k: {q0.to_dict('records')}"
        a, b = sub.iloc[0], sub.iloc[1]
        assert a.approx_sim == b.approx_sim, \
            f"{q}: identical vectors scored differently"
        assert abs(int(a["rank"]) - int(b["rank"])) == 1, \
            f"{q}: tie rows not adjacent in rank"
        assert a.neighbor_id == 440 and b.neighbor_id == 442, \
            f"{q}: tie not broken by neighbor_id ASC"


@check("masked delta-union SQL: delta twin tops q2 with from_delta; mask holds over the union")
def _(out):
    df = pd.read_parquet(f"{out}/q_ann_index_masked_sql")
    assert not (df.neighbor_id % 10 == 1).any(), \
        "mask lost over the base∪delta union"
    q2 = df[df.q_id == 2].sort_values("rank")
    top = q2.iloc[0]
    assert top.neighbor_id == 447 and bool(top.from_delta), \
        f"delta twin not ranked through the SQL union: {q2.head().to_dict('records')}"


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


@check("delivery fee: tier bounds inclusive (>=), surcharge off at weight exactly 3.0kg")
def _(out):
    df = pd.read_parquet(f"{out}/q_margin_by_sku").set_index("sku")
    # single-line, zero-discount skus: margin == price - fee, so the fee
    # is read straight off the output
    expect = {9001: 15000.0,   # price exactly 15000 -> fee 0 (>= rule)
              9002: 14300.0,   # 14999 -> 699
              9003: 9301.0,    # exactly 10000 -> 699
              9004: 9200.0,    # 9999 -> 799
              9005: 4201.0,    # exactly 5000 -> 799
              9006: 4000.0,    # 4999 -> 999
              9007: 15000.0,   # weight exactly 3.0 -> ceil(3.0)-3 = 0
              9008: 14601.0}   # weight 3.3 -> ceil->4 -> +399
    got = {s: df.margin_kzt[s] for s in expect}
    assert got == expect, got


@check("target price: |target-current| EXACTLY == step keeps current (<= rule)")
def _(out):
    df = pd.read_parquet(f"{out}/q_target_prices").set_index("sku")
    assert df.target_price[9101] == 10000.0, df.target_price[9101]  # == 50: keep
    assert df.target_price[9102] == 10051.0, df.target_price[9102]  # 51: move
    assert df.target_price[9103] == 10000.0, df.target_price[9103]  # 49: keep
    assert df.target_price[9104] == 8000.0, df.target_price[9104]   # clamp+move


@check("bot flags: delta==nearAbs, delta/min==nearPct, median-min==tight all EXACT")
def _(out):
    df = pd.read_parquet(f"{out}/q_bot_flags")
    flag = {(r.sku, r.seller): r.is_bot for r in df.itertuples()
            if 9200 <= r.sku <= 9299}
    assert flag[(9201, 2)], "delta == 100 exactly must flag (<= rule)"
    assert not flag[(9202, 2)], "delta == 101 leaked in"
    assert flag[(9203, 2)], "delta/min == 0.0025 exactly must flag (<= rule)"
    assert not flag[(9204, 2)], "one KZT past the pct bound leaked in"
    assert flag[(9205, 1)], "median-min == 3000 exactly must flag (<= rule)"
    assert not flag[(9206, 1)], "median-min == 3001 leaked in"


@check("sliding undercut: value EXACTLY min+50 counts; EXACTLY 3 of 5 trips the bot")
def _(out):
    df = pd.read_parquet(f"{out}/q_sliding_undercut")
    u1 = df[df.user_id == 9001].sort_values("event_id")
    assert u1.undercut.tolist() == [1, 1, 0, 0, 1], u1.undercut.tolist()
    assert u1.sliding_hits.tolist()[-1] == 3 and bool(u1.is_bot.iloc[-1]), \
        "exactly-3-of-5 window did not trip is_bot (>= rule)"
    u2 = df[df.user_id == 9002].sort_values("event_id")
    assert u2.sliding_hits.tolist()[-1] == 2 and not u2.is_bot.any(), \
        "2-of-5 control tripped"


@check("daily demand: shipdate EXACTLY anchor-30d is inside the window (>= rule)")
def _(out):
    df = pd.read_parquet(f"{out}/q_daily_demand")
    skus = set(df.sku)
    assert 9301 in skus and 9304 in skus
    assert 9302 in skus, "shipdate == anchor - 30 days fell out of the window"
    assert 9303 not in skus, "anchor - 31 days leaked into the window"


@check("price floor: floors drop at EXACTLY 2 bots (>= rule) and clamp at 0")
def _(out):
    df = pd.read_parquet(f"{out}/q_price_floor").set_index("sku")
    assert df.n_bots[9201] == 2, df.n_bots[9201]
    assert df.predicted_min_24h[9201] == 9800.0 \
        and df.predicted_min_7d[9201] == 9600.0, \
        "exactly-2-bots sku did not drop its floors (>= rule)"
    assert df.n_bots[9202] == 1 and df.predicted_min_24h[9202] == 10000.0 \
        and df.predicted_min_7d[9202] == 10000.0, \
        "one-bot sku's floor moved"
    assert df.n_bots[9207] == 2 and df.predicted_min_24h[9207] == 0.0 \
        and df.predicted_min_7d[9207] == 0.0, \
        "predicted floor did not clamp at max(0, min - drop)"


@check("stability: stddev/min EXACTLY 1 scores 0; ratio 2 clamps to 0, not -100")
def _(out):
    df = pd.read_parquet(f"{out}/q_seller_stats").set_index("sku")
    # the ratio is exactly 1 by construction — assert the inputs too, so
    # a fixture drift cannot turn this check vacuous
    assert df.stddev_price[9401] == 1000.0 == df.min_price[9401]
    assert df.stability[9401] == 0, "ratio exactly 1 must score 0 (>= rule)"
    assert df.stability[9402] == 0, "ratio 2 must clamp to 0 (min() rule)"
    assert df.stability[9403] == 50, df.stability[9403]


@check("reorder point: ceil at EXACTLY integral 0.0 demand is 0 (not floor+1)")
def _(out):
    df = pd.read_parquet(f"{out}/q_inventory_reorder").set_index("sku")
    assert df.daily_demand[9501] == 0.0 and df.reorder_point[9501] == 0, \
        (df.daily_demand[9501], df.reorder_point[9501])
    assert bool(df.need_reorder[9501]), "qty == reorder_point must flag (<=)"
    assert df.daily_demand[9502] == 0.0001 and df.reorder_point[9502] == 1, \
        "just-past-integral ceil argument did not round up"
    assert bool(df.need_reorder[9502])


@check("export filter drops the EXACT out-of-stock pair, not the name alone")
def _(out):
    df = pd.read_parquet(f"{out}/q_parse_sellers")
    oos = df[df.seller == "Out of stock"]
    assert len(oos) == 1 and oos.price.iloc[0] == 7500, \
        "positively-priced seller named 'Out of stock' was dropped (or the zero-price pair leaked)"
    assert (df.price > 0).all()


@check("repricer cadence: eligible at EXACTLY interval elapsed; gated at 30s")
def _(out):
    df = pd.read_parquet(f"{out}/q_repricer_stream")
    a = df[df.sku == 9601].sort_values("batch_id")
    assert a.batch_id.tolist() == [0, 2], a.batch_id.tolist()
    assert a.action_ts.iloc[1] - a.action_ts.iloc[0] == 60000, \
        "re-eligibility was not at exactly interval_min elapsed (>= rule)"
    b = df[df.sku == 9602]
    assert b.batch_id.tolist() == [1], \
        f"cohort-1/2 sku not gated at 30s elapsed: {b.batch_id.tolist()}"


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
