#!/usr/bin/env python3
"""Adversarial boundary-corpus generator.

Generalizes the round-9 exact-gap session find (Spark `session_window`
merges ranges that TOUCH; the `>=` oracle form lived 9 rounds because no
corpus contained an exactly-gap adjacency): every threshold comparison in
the engine has the same latent risk, so this writes a small corpus where
the THRESHOLD-EQUAL case of each boundary rule actually occurs, plus both
one-ulp-ish neighbors. Run the affected catalog rows over it with the
normal verify + oracle pipeline:

    SPARK_GRAFT_ONLY=q_event_sessions,q_event_sessions_stream,\
q_embed_neardup,q_embed_stream,q_embed_stream_capped,q_doc_exact_dedup,\
q_doc_minhash_neardup,q_dedup_stream,q_neardup_stream,q_target_prices,\
q_bot_flags,q_margin_by_sku,q_sliding_undercut,q_daily_demand,\
q_price_floor,q_seller_stats,q_inventory_reorder,q_parse_sellers,\
q_repricer_stream,q_ann_index_delete,q_ann_index_masked_sql \
      sbt -batch "runMain graft.Verify fixtures/adversarial /tmp/adv_out"
    python3 tools/oracle_check.py fixtures/adversarial /tmp/adv_out <same list>
    python3 tools/adversarial_assert.py /tmp/adv_out

(q_minhash_neardup_sql is the one minhash row excluded: its SQL surface
registers the whole table catalog, and the fixture ships only the three
boundary tables — the identical banding math is covered by
q_doc_minhash_neardup.)

Planted boundaries (each asserted PRESENT at build time, so the fixture
cannot silently stop exercising them):
  events      — consecutive events EXACTLY SessionGap apart (merge: the
                r9 rule), gap+1us (split), gap-1us (merge), a mixed chain;
                sessions whose end+gap is EXACTLY the final ms-floored
                watermark (emit per `<=`), +1ms (hold), -1ms (emit).
  embeddings  — pair with left-to-right f32-widened dot rounding to
                EXACTLY NearDupCosine=0.45 (include per `>=`), one just
                below (exclude), one just above (include), all within
                Hamming<=1 of each other's LSH bucket so both engines
                actually compare them; exact-clone families of exactly
                CappedResidents and CappedResidents+1 vectors (the
                binding-cap rule's two sides in q_embed_stream_capped).
  documents   — pairs whose distinct 3-shingle sets have Jaccard EXACTLY
                0.5 == JaccardThreshold (include per `>=`; banding
                verified at build time by replaying the md5 minhash/band
                chain), one just below; exact-clone text families; a
                same-shingle-set/different-text pair (identical dedup key
                and signature, different raw bytes).
  lineitem +  — the MONEY-PATH thresholds (round-10 verdict task 4), one
  part          planted sku family per rule, each with both neighbors:
                X1 delivery tiers at price EXACTLY 15000/10000/5000 KZT
                (>= includes) and the per-kg surcharge at weight exactly
                integral (ceil boundary); X18 hysteresis at
                |target - current| EXACTLY == step (keep per <=); X19 bot
                flags at delta == nearAbs exactly, delta/min == nearPct
                exactly, median - min == tight exactly; F2 recency window
                at shipdate EXACTLY anchor - 30 days (>= includes).
  events (+)  — W6 sliding undercut: value EXACTLY min+50 counts (<=),
                and a 5-window with EXACTLY 3 hits trips is_bot (>= 3)
                beside a 2-hit control.
  round-12 additions (the last unpinned `>=`-vs-`>` class):
  lineitem (+)— X20 price floor: skus at EXACTLY 2 bots (floors drop per
                >= 2) and EXACTLY 1 (no drop), plus a 2-bot family whose
                predicted floors clamp at max(0, ...); X21 stability:
                stddev_pop/min EXACTLY 1 (score 0), 2 (the min() clamp)
                and 0.5 (50); X2 reorder: zero-demand part composes
                ceil(0.0) == 0 — the integral-argument ceil — beside a
                tiny-demand neighbor that lands at 1; T5 cadence: sku in
                all three mod-3 cohorts re-acts at EXACTLY interval_min
                elapsed (>=) while a cohort-1/2-only sku stays gated at
                30 s (Repricer.StreamTimes' batch 2 = t0 + 60 000 ms).
  page fixture— F7 export drop keys on the EXACT pair name == 'Out of
                stock' AND price == 0: a positively-priced seller
                CARRYING that name survives (fixtures/product_page.html,
                pinned via q_parse_sellers).
  round-13 additions (the persisted-index boundary class):
  embeddings(+)— 8 query vectors (ids 0-7: the ANN rows probe
                vec_id < NQueries, else the index rows are vacuous
                here); RANK-TIE clones 440/442 = exact copies of q0
                (identical vectors quantize identically in any trained
                index -> exactly equal approx_sim, adjacent top ranks,
                ORDER BY neighbor_id ASC decides); DELETE-MASK twins
                900/901 = copies of q1 (901 % 10 == 1 is tombstoned,
                900 must carry the top slot — a lost or over-matching
                mask flips a visible ranking); DELTA twin 447 = copy of
                q2 (447 % 10 == 7 arrives through the ADD delta in
                q_ann_index_masked_sql and must top q2 with
                from_delta=true). Unknown-id delete and empty-delta
                compact ride INSIDE the gated rows themselves
                (ivfPqIndexDelete tombstones two never-indexed
                sentinels; ivfPqIndexCompact re-compacts the already-
                folded deltas) so those no-op laws are hash-checked at
                every scale, not just here.

Constants replicated from the engine (kept in lockstep by the build-time
asserts, which fail loudly if the Scala side changes):
  Sessions.GapMicros=30min, watermark 2h, ms-floored; VectorOps: Dim=64,
  NPlanes=4 (corpus kept <= 2048 so derivedPlanes=4), NearDupCosine=0.45,
  planes md5(f"{p}_{d}")[:4hex] % 1001 - 500 over 500.0, strict dot>0;
  StreamEmbed.CappedResidents=30; TextOps: MinhashK=16, Bands=8, r=2,
  prime 2^31-1, perms md5(f"perm_{a|b}_{p}")[:14hex] % prime (a floored
  to >=1), base hash md5(shingle)[:15hex] % prime, band key md5 of
  '_'-joined band slice, JaccardThreshold=0.5;
  Relational/F: deliveryFee tiers >=15000->0 / >=10000->699 /
  >=5000->799 / else 999 plus max(0, ceil(p_size*0.3) - 3)*399
  (F.scala:72-79); targetPrice clamp [rnd2(0.8c), rnd2(1.2c)], step 50,
  hysteresis |target-cur| <= 50 keeps current (F.scala:141-147);
  isPriceBot nearAbs=100, nearPct=0.0025, tight=3000 over per-(sku,
  seller) min-price offers (Relational.scala:521-531); dailyDemand
  shipdate >= max - INTERVAL 30 DAY (Relational.scala:85-95);
  slidingUndercut value <= user-min + 50, bot when >= 3 of last 5
  (Relational.scala:295-306).
"""
import hashlib
import math
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "adversarial")

# ---------------------------------------------------------------- shared
GAP_US = 30 * 60 * 1000000
WM_DELAY_MS = 2 * 3600 * 1000
DIM = 64
N_PLANES = 4
NEAR_DUP_COS = 0.45
CAPPED_RESIDENTS = 30
MINHASH_K = 16
BANDS = 8
ROWS_PER_BAND = 2
PRIME = 2147483647
JACCARD_T = 0.5


def md5hex(s):
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def round6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def ltr_dot(a, b):
    """Left-to-right double accumulation — the engine's VectorDot order."""
    d = 0.0
    for x, y in zip(a, b):
        d += float(x) * float(y)
    return d


# ---------------------------------------------------------------- events
def build_events():
    rows = []  # (event_id, ts_us, user_id, event_type, value, props)
    eid = [1]

    def ev(ts_us, etype, uid=1):
        rows.append((eid[0], ts_us, uid, etype, 1.0, "{}"))
        eid[0] += 1

    def chain(t0, etype, diffs):
        t = t0
        ev(t, etype)
        for d in diffs:
            t += d
            ev(t, etype)

    may1 = 1746057600000000  # 2025-05-01T00:00:00Z in us
    day = 86400 * 1000000
    # exact-gap adjacency: ONE session of 5 (merge on touch — the r9 rule)
    chain(may1, "adv_exact", [GAP_US] * 4)
    # one microsecond past the gap: every event its own session (5)
    chain(may1 + day, "adv_plus", [GAP_US + 1] * 4)
    # one microsecond inside the gap: ONE session of 5
    chain(may1 + 2 * day, "adv_minus", [GAP_US - 1] * 4)
    # mixed chain: splits only at the +1us step -> sessions of 3 and 2
    chain(may1 + 3 * day, "adv_mixed",
          [GAP_US, GAP_US + 1, GAP_US, GAP_US - 1])
    # hold out the watermark-equality family around the horizon: whole-ms
    # timestamps so the ms-floored watermark arithmetic is exact
    horizon = 1748736000000000  # 2025-06-01T00:00:00Z
    wm = horizon - WM_DELAY_MS * 1000
    ev(horizon, "adv_horizon")
    # session end (= last event + gap) EXACTLY the watermark: emit per <=
    ev(wm - GAP_US, "adv_wm_eq")
    # end 1ms past the watermark: held open (not emitted by the stream)
    ev(wm - GAP_US + 1000, "adv_wm_plus")
    # end 1ms before: emitted
    ev(wm - GAP_US - 1000, "adv_wm_minus")

    # W6 sliding-undercut boundaries (price_watch.ts:31-52 shape): the
    # undercut rule is value <= user-min + 50 (the EXACTLY min+50 value
    # must count), the bot rule is >= 3 hits in the last-5 window (the
    # EXACTLY-3 window must trip). event_ids are appended in value
    # order, so the per-user sequence below is the window order.
    def undercut_user(uid, values):
        t = may1 + 10 * day
        flags = []
        mn = min(values)
        for v in values:
            rows.append((eid[0], t, uid, f"adv_uc{uid % 10}", float(v), "{}"))
            eid[0] += 1
            t += 1000000
            flags.append(1 if v <= mn + 50 else 0)
        return flags

    # exactly 3 of 5 at the last event -> is_bot TRUE at the boundary;
    # value 150 == min(100)+50 is the <= equality that must count
    f1 = undercut_user(9001, [100, 150, 151, 151, 150])
    assert f1 == [1, 1, 0, 0, 1] and sum(f1) == 3
    # exactly 2 of 5 -> is_bot FALSE one below the boundary
    f2 = undercut_user(9002, [100, 151, 151, 151, 150])
    assert f2 == [1, 0, 0, 0, 1] and sum(f2) == 2

    assert max(r[1] for r in rows) == horizon
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(t, os.path.join(OUT, "events.parquet"))
    return len(rows)


# ------------------------------------------------------------ embeddings
def planes():
    ps = []
    for p in range(N_PLANES):
        ps.append([(int(md5hex(f"{p}_{d}")[:4], 16) % 1001 - 500) / 500.0
                   for d in range(DIM)])
    return ps


PLANES = planes()


def bucket(v32):
    b = 0
    for p in range(N_PLANES):
        if ltr_dot(v32, PLANES[p]) > 0:
            b |= 1 << p
    return b


def hamming(a, b):
    return bin(a ^ b).count("1")


def unit(rng):
    v = np.array([rng.gauss(0, 1) for _ in range(DIM)], dtype=np.float64)
    return v / math.sqrt(ltr_dot(v, v))


def pair_at(rng, target, accept):
    """A unit pair whose f32-widened left-to-right dot satisfies `accept`,
    with buckets within Hamming<=1 (so the multi-probe chain compares it)."""
    for _ in range(50000):
        v1 = unit(rng)
        u = unit(rng)
        u = u - ltr_dot(u, v1) * v1
        u = u / math.sqrt(ltr_dot(u, u))
        v2 = target * v1 + math.sqrt(1 - target * target) * u
        v2 = v2 / math.sqrt(ltr_dot(v2, v2))
        f1 = np.asarray(v1, dtype=np.float32)
        f2 = np.asarray(v2, dtype=np.float32)
        d = ltr_dot(f1, f2)
        if accept(d) and hamming(bucket(f1), bucket(f2)) <= 1:
            return f1, f2, d
    raise AssertionError(f"no pair found at target {target}")


def build_embeddings():
    rng = random.Random(20260815)
    vids, vecs = [], []

    def add(vid, v32):
        vids.append(vid)
        vecs.append(np.asarray(v32, dtype=np.float32))

    # clone family of EXACTLY CappedResidents+1: the binding cap trips on
    # the last arrival (31st has nprior=30, cut; all earlier pairs emit)
    fam_a = np.asarray(np.full(DIM, 0.125), dtype=np.float32)
    for i in range(CAPPED_RESIDENTS + 1):
        add(200 + i, fam_a)
    # clone family of EXACTLY CappedResidents: the cap never quite trips
    # (last arrival has nprior=29 < 30) — all pairs emit
    fb = np.array([0.125 if i % 2 == 0 else -0.125 for i in range(DIM)])
    fam_b = np.asarray(fb, dtype=np.float32)
    for i in range(CAPPED_RESIDENTS):
        add(300 + i, fam_b)

    fam_buckets = {bucket(fam_a), bucket(fam_b)}

    # threshold-equality pairs, each forced into compared buckets that do
    # not share the clone families' buckets (keeps the capped row's
    # suppression away from the threshold signal)
    def clear_of_fams(f1, f2):
        return bucket(f1) not in fam_buckets and bucket(f2) not in fam_buckets

    p_eq = pair_at(rng, NEAR_DUP_COS,
                   lambda d: round6(d) == NEAR_DUP_COS)
    p_below = pair_at(rng, NEAR_DUP_COS - 0.0004,
                      lambda d: 0 < NEAR_DUP_COS - round6(d) <= 0.001)
    p_above = pair_at(rng, NEAR_DUP_COS + 0.0004,
                      lambda d: 0 < round6(d) - NEAR_DUP_COS <= 0.001)
    for p in (p_eq, p_below, p_above):
        assert clear_of_fams(p[0], p[1])
    add(400, p_eq[0]); add(401, p_eq[1])
    add(410, p_below[0]); add(411, p_below[1])
    add(420, p_above[0]); add(421, p_above[1])

    # background: isolated random unit vectors (pairwise cos far below
    # threshold w.h.p.; they exist so bucket occupancy is not degenerate)
    for i in range(100):
        add(1000 + i, np.asarray(unit(rng), dtype=np.float32))

    # --- r13: ANN/index boundary plants (q_ann_index_delete,
    # q_ann_index_masked_sql run over this fixture too) ---
    # query vectors: the ANN rows probe vec_id < NQueries=8; without
    # them the index rows would be green-but-vacuous here
    queries = [np.asarray(unit(rng), dtype=np.float32) for _ in range(8)]
    for i, qv in enumerate(queries):
        add(i, qv)
    # RANK-TIE family: two exact copies of query 0's vector (ids chosen
    # clear of the delete residue 1 and the add residue 7 mod 10).
    # Identical vectors quantize to identical PQ codes in ANY trained
    # index -> exactly equal approx_sim for q0, adjacent top ranks, and
    # the ORDER BY approx_sim DESC, neighbor_id ASC tie-break decides:
    # 440 must precede 442 on both engines.
    add(440, queries[0])
    add(442, queries[0])
    # DELETE-MASK twins: exact copies of query 1's vector; 901 % 10 == 1
    # is tombstoned by the delete rows' residue rule, 900 survives — the
    # mask visibly flips the TOP neighbor, so a lost mask (or an
    # over-matching one) cannot pass vacuously.
    add(900, queries[1])
    add(901, queries[1])
    # DELTA twin: 447 % 10 == 7 == AddResidue — arrives through the ADD
    # delta in q_ann_index_masked_sql and, as an exact copy of query 2,
    # must surface as q2's top neighbor with from_delta=true: the SQL
    # union's delta scan provably feeds the ranking.
    add(447, queries[2])

    n = len(vids)
    assert n <= 2048, "corpus must keep derivedPlanes at NPlanes=4"
    t = pa.table({
        "vec_id": pa.array(vids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([int(v % 10) for v in vids], pa.int32()),
    })
    pq.write_table(t, os.path.join(OUT, "embeddings.parquet"))
    return n, round6(p_eq[2]), round6(p_below[2]), round6(p_above[2])


# ------------------------------------------------------------- documents
def shingle_set(text):
    ws = text.split(" ")
    return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)} \
        if len(ws) >= 3 else set()


def minhash_sig(shingles):
    hs = [int(md5hex(s)[:15], 16) % PRIME for s in shingles]
    sig = []
    for p in range(MINHASH_K):
        a = max(1, int(md5hex(f"perm_a_{p}")[:14], 16) % PRIME)
        b = int(md5hex(f"perm_b_{p}")[:14], 16) % PRIME
        sig.append(min((a * h + b) % PRIME for h in hs))
    return sig


def band_keys(sig):
    return {md5hex("_".join(str(sig[b * ROWS_PER_BAND + i])
                            for i in range(ROWS_PER_BAND)))
            for b in range(BANDS)}


def jaccard_pair(tag):
    """Two 11-token docs sharing an 8-token prefix: 9 distinct shingles
    each, 6 shared -> Jaccard 6/12 = 0.5 EXACTLY (= JaccardThreshold)."""
    pre = [f"{tag}s{i}" for i in range(8)]
    a = pre + [f"{tag}a{i}" for i in range(3)]
    b = pre + [f"{tag}b{i}" for i in range(3)]
    ta, tb = " ".join(a), " ".join(b)
    sa, sb = shingle_set(ta), shingle_set(tb)
    assert len(sa) == 9 and len(sb) == 9 and len(sa & sb) == 6
    assert len(sa & sb) / len(sa | sb) == JACCARD_T
    return ta, tb, bool(band_keys(minhash_sig(sa)) &
                        band_keys(minhash_sig(sb)))


def build_documents():
    rng = random.Random(31337)
    rows = []  # (doc_id, text)
    did = [1]

    def doc(text):
        rows.append((did[0], text))
        did[0] += 1

    # Jaccard exactly at threshold: several pairs; >=1 must band-collide
    # (P(collide) ~= 0.90/pair at J=0.5) so the >= comparison is EXERCISED
    banded = 0
    for k in range(5):
        ta, tb, collides = jaccard_pair(f"p{k}")
        doc(ta)
        doc(tb)
        banded += collides
    assert banded >= 1, "no threshold-equal pair band-collides; re-tag"
    # just-below control: 7-token shared prefix -> 5 shared of 13 united
    pre = [f"q0s{i}" for i in range(7)]
    doc(" ".join(pre + [f"q0a{i}" for i in range(4)]))
    doc(" ".join(pre + [f"q0b{i}" for i in range(4)]))
    # exact-clone text families (collapse machinery + exact dedup)
    clone_a = "c1 c2 c3 c4 c5 c6 c7 c8"
    clone_b = "d1 d2 d3 d4 d5 d6 d7 d8"
    for _ in range(5):
        doc(clone_a)
    for _ in range(4):
        doc(clone_b)
    # same distinct-shingle-set AND same distinct-word-set, different raw
    # text: the signature/dedup keys call these clones, bytes disagree
    doc("r1 r2 r3 r1 r2 r3")
    doc("r1 r2 r3 r1 r2 r3 r1 r2 r3")
    # background
    for i in range(50):
        n = rng.randint(6, 20)
        doc(" ".join(f"w{rng.randint(0, 400)}" for _ in range(n)))

    langs = ["en", "de", "fr", "ru", "es"]
    srcs = ["web", "wiki", "news"]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([langs[r[0] % len(langs)] for r in rows],
                         pa.string()),
        "source": pa.array([srcs[r[0] % len(srcs)] for r in rows],
                           pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(OUT, "documents.parquet"))
    return len(rows), banded


# --------------------------------------------------- lineitem + part
# Money-path boundary skus. Integral prices and midnight timestamps
# keep every comparison exact in IEEE doubles on both engines; the
# deltas below are chosen so each rule is met with EQUALITY on one row
# and missed by exactly 1 unit on its neighbor.
ANCHOR_US = 1748736000000000        # 2025-06-01T00:00:00Z, = max shipdate
DAY_US = 86400 * 1000000
FILL_DATE = ANCHOR_US - 5 * DAY_US  # in-window filler for non-F2 skus


def build_lineitem_part():
    li = []    # (orderkey, sku, seller, price, ship_us)
    parts = {}  # sku -> (size, retail)
    okey = [1]

    def row(sku, seller, price, ship=FILL_DATE, size=1, retail=10000.0,
            qty=30.0):
        li.append((okey[0], sku, seller, float(price), ship, float(qty)))
        okey[0] += 1
        parts.setdefault(sku, (size, retail))

    # X1 delivery tiers: single-line skus at discount 0 so
    # margin == price - fee surfaces the fee itself. Equality rows sit
    # exactly ON each >= tier bound; neighbors 1 KZT below.
    for sku, price in [(9001, 15000), (9002, 14999), (9003, 10000),
                       (9004, 9999), (9005, 5000), (9006, 4999)]:
        row(sku, 90, price)
    # surcharge boundary at weight EXACTLY integral: p_size*0.3 must be
    # the integral double (both engines fold the same IEEE multiply —
    # asserted here, not assumed). ceil(3.0)-3 = 0 vs ceil(3.3)-3 = 1.
    assert 10 * 0.3 == 3.0 and math.ceil(10 * 0.3) == 3
    assert math.ceil(11 * 0.3) == 4
    row(9007, 90, 15000, size=10)   # weight 3.0 exactly -> no surcharge
    row(9008, 90, 15000, size=11)   # weight 3.3 -> ceil 4 -> +399

    # X18 hysteresis: current 10000, step 50, bounds [8000, 12000];
    # chased = lowest_comp - 50. |chased - current| == step EXACTLY must
    # KEEP current (PRICEBOT_SPEC_V2.md:98's no-op rule).
    row(9101, 91, 10100, retail=10000.0)   # |10050-10000| == 50 -> keep
    row(9102, 91, 10101, retail=10000.0)   # 51 -> move to 10051
    row(9103, 91, 10099, retail=10000.0)   # 49 -> keep
    row(9104, 91, 3000, retail=10000.0)    # clamp to minP 8000 -> move

    # X19 bot boundaries: 3-seller groups (odd -> median is the middle
    # offer), one rule isolated per sku.
    for sku, prices in [
            (9201, [10000, 10100, 10200]),  # delta == nearAbs exactly
            (9202, [10000, 10101, 10200]),  # delta == nearAbs + 1
            (9203, [80000, 80200, 80400]),  # delta/min == nearPct exactly
            (9204, [80000, 80201, 80400]),  # one KZT past the pct bound
            (9205, [10000, 13000, 13500]),  # median-min == tight exactly
            (9206, [10000, 13001, 13500])]:  # tight + 1
        for s, price in enumerate(prices, start=1):
            row(sku, s, price)
    assert 200 / 80000 == 0.0025  # the pct equality is IEEE-exact

    # F2 recency window: anchor = max shipdate (sku 9301 defines it);
    # shipdate EXACTLY anchor - 30 days is IN per >=.
    row(9301, 93, 10000, ship=ANCHOR_US)
    row(9302, 93, 10000, ship=ANCHOR_US - 30 * DAY_US)  # == bound: in
    row(9303, 93, 10000, ship=ANCHOR_US - 31 * DAY_US)  # out
    row(9304, 93, 10000, ship=ANCHOR_US - 29 * DAY_US)  # in

    # X20 price floor (scrape.ts:735-747): predicted floors drop by
    # 200/400 only at n_bots >= 2. The X19 families above already sit at
    # EXACTLY 2 bots (9201) and EXACTLY 1 (9202) — the >= boundary's two
    # sides; 9207 adds the max(0, min - drop) clamp: 2 bots at min 100
    # clamp both predicted floors to 0.
    for s, price in enumerate([100, 200, 5000], start=1):
        row(9207, s, price)

    def bots(prices):
        mn, md = min(prices), sorted(prices)[len(prices) // 2]

        def is_bot(p):
            d = p - mn
            near = (0 <= d <= 100) or \
                (d >= 0 and (d / mn <= 0.0025 if mn > 0 else True))
            return near and md - mn <= 3000
        return sum(is_bot(p) for p in prices)
    assert bots([10000, 10100, 10200]) == 2   # 9201: AT the >= 2 bound
    assert bots([10000, 10101, 10200]) == 1   # 9202: one below
    assert bots([100, 200, 5000]) == 2        # 9207: clamp family

    # X21 stability (scrape.ts:749-754): score = (1 - min(1,
    # stddev/min)) * 100, half-up. Two-offer groups make stddev_pop =
    # (max - min)/2 IEEE-exact: ratio EXACTLY 1 (score 0 per the >= 1
    # rule), ratio 2 (the min() clamp: 0, not -100), ratio 0.5 (50).
    for sku, prices in [(9401, [1000, 3000]),   # stddev 1000 == min
                        (9402, [1000, 5000]),   # ratio 2: clamp side
                        (9403, [1000, 2000])]:  # ratio 0.5 -> 50
        for s, price in enumerate(prices, start=1):
            row(sku, s, price)

    def stddev_pop(ps):
        n = len(ps)
        sp, sp2 = sum(ps), sum(p * p for p in ps)
        return math.sqrt(sp2 / n - (sp / n) ** 2)
    assert stddev_pop([1000, 3000]) == 1000.0   # ratio exactly 1 in IEEE
    assert stddev_pop([1000, 5000]) == 2000.0
    assert stddev_pop([1000, 2000]) == 500.0

    # X2 reorder point (dashboard.py:8-10): ceil at an EXACTLY integral
    # argument. A part with zero in-window demand composes ceil(0.0) ->
    # 0 (a floor+1 slip yields 1); the tiny-demand neighbor lands just
    # past the integer -> 1. Both parts hold zero stock (p_size 0), so
    # need_reorder also sits at its <= equality.
    parts[9501] = (0, 10000.0)                # part-only: dd = 0.0
    row(9502, 95, 10000, size=0, qty=0.003)   # dd = round6(0.0001)
    assert math.ceil(0.0) == 0
    dd = math.floor(0.003 / 30.0 * 1e6 + 0.5) / 1e6
    assert dd == 0.0001
    assert math.ceil(dd * 14 + 1.65 * (dd * 0.2) * math.sqrt(14)) == 1

    # T5 cadence (PRICEBOT_SPEC_V2.md:93): q_repricer_stream's batch 2
    # fires EXACTLY interval_min after batch 0 (Repricer.StreamTimes).
    # sku 9601 has an offer in every mod-3 cohort: acts at t0, gated at
    # t0+30s, eligible again at EXACTLY t0+60s — the elapsed >= interval
    # equality. sku 9602 exists only in cohorts 1 and 2: first acts at
    # t0+30s, then 30s elapsed at batch 2 -> still gated. Prices far
    # above retail keep target != current at every batch; the cohort
    # split is l_orderkey % 3, residues pinned below.
    for _ in range(3):
        row(9601, 96, 20000)
    while okey[0] % 3 != 1:
        row(9601, 96, 20000)
    row(9602, 96, 20000)
    row(9602, 96, 20000)
    res1 = {r[0] % 3 for r in li if r[1] == 9601}
    res2 = {r[0] % 3 for r in li if r[1] == 9602}
    assert res1 == {0, 1, 2} and res2 == {1, 2}, (res1, res2)

    assert max(r[4] for r in li) == ANCHOR_US

    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
        "l_linenumber": pa.array([1] * len(li), pa.int32()),
        "l_quantity": pa.array([r[5] for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in li], pa.float64()),
        "l_discount": pa.array([0.0] * len(li), pa.float64()),
        "l_tax": pa.array([0.0] * len(li), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(li), pa.string()),
        "l_linestatus": pa.array(["O"] * len(li), pa.string()),
        "l_shipdate": pa.array([r[4] for r in li], pa.timestamp("us")),
    })
    pq.write_table(t, os.path.join(OUT, "lineitem.parquet"))
    skus = sorted(parts)
    p = pa.table({
        "p_partkey": pa.array(skus, pa.int64()),
        "p_name": pa.array([f"adv part {s}" for s in skus], pa.string()),
        "p_brand": pa.array(["ADV"] * len(skus), pa.string()),
        "p_type": pa.array(["BOUNDARY"] * len(skus), pa.string()),
        "p_size": pa.array([parts[s][0] for s in skus], pa.int32()),
        "p_retailprice": pa.array([parts[s][1] for s in skus],
                                  pa.float64()),
    })
    pq.write_table(p, os.path.join(OUT, "part.parquet"))
    return len(li), len(skus)


def main():
    os.makedirs(OUT, exist_ok=True)
    ne = build_events()
    nv, eq, below, above = build_embeddings()
    nd, banded = build_documents()
    nl, np_ = build_lineitem_part()
    print(f"events={ne} embeddings={nv} documents={nd} "
          f"lineitem={nl} part={np_}")
    print(f"cos boundary: eq={eq} below={below} above={above}")
    print(f"jaccard-at-threshold pairs band-colliding: {banded}/5")
    assert eq == NEAR_DUP_COS and below < NEAR_DUP_COS < above


if __name__ == "__main__":
    sys.exit(main())
