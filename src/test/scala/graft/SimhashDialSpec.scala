package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The simhash width dial, measured: widening the fingerprint from 32
  * to 60 bits widens each pigeonhole band's keyspace 2^8 → 2^15, so
  * band-bucket occupancy — and the candidate join quadratic in it —
  * must shrink on the same corpus. This is the scaling dial
  * TextOps.simhashNearDup's scaladoc derives; the wide variant carries
  * its own oracle row (q_simhash_neardup_wide), and this spec pins the
  * mechanism the row exists to prove.
  */
class SimhashDialSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def bandStats(bits: Int): (Long, Long) = {
    val bands = TextOps.simhashBandsAt(spark, SparkT.Sf0001, bits)
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("n"))
    val maxOcc = bands.agg(max(col("n"))).head().getLong(0)
    // candidate pairs the banded self-join would compare: Σ n·(n−1)/2
    val cands = bands
      .agg(sum((col("n") * (col("n") - 1) / 2).cast("long"))).head().getLong(0)
    (maxOcc, cands)
  }

  test("60-bit bands cut bucket occupancy and candidate pairs vs 32-bit") {
    val (occ32, cand32) = bandStats(TextOps.SimhashBits)
    val (occ60, cand60) = bandStats(TextOps.SimhashWideBits)
    assert(occ60 < occ32,
      s"wide bands must lower peak occupancy: $occ60 vs $occ32")
    // the cut is bounded below by the corpus's REAL near-dup density
    // (genuinely similar docs agree on wide bands too — that's recall);
    // ≥2x on this corpus, growing with corpus size as random collisions
    // dominate true ones
    assert(cand60 * 2 < cand32,
      s"wide bands must cut candidates ≥2x here: $cand60 vs $cand32")
  }

  test("width derivation: integer boundaries, floor and cap") {
    import TextOps.{derivedSimhashBandBits => bb}
    // floor: small corpora (incl. the sf0.01 driver corpus, 500 docs)
    // sit at bb=8 — the historical 32-bit dial, so the oracle row's
    // values are unchanged by the derivation landing
    assert(bb(1) === 8 && bb(500) === 8 && bb(1024) === 8)
    // exact power-of-two boundary: n = 4·2^8 stays, +1 advances
    assert(bb(4L << 8) === 8 && bb((4L << 8) + 1) === 9)
    // the measured corpora: sf0.1 → 11, sf1 → 14, sf10 → cap
    assert(bb(5000) === 11 && bb(50000) === 14 && bb(500000) === 15)
    // cap: arbitrarily large corpora clamp to the 60-bit sign-safe form
    assert(bb(Long.MaxValue / 8) === 15)
  }

  test("derived default equals the pinned 32-bit form at the floor corpus") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val derived = TextOps.simhashNearDup(spark, SparkT.Sf0001)
        .collect().map(_.toSeq).sortBy(_.toString)
      val pinned = TextOps.simhashNearDupAt32(spark, SparkT.Sf0001)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(derived.nonEmpty && (derived.toSeq == pinned.toSeq))
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("wide pairs are exact at their threshold: every pair within Hamming 3 on 60 bits") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val rows = TextOps.simhashNearDupWide(spark, SparkT.Sf0001).collect()
      assert(rows.nonEmpty, "planted corpus must yield some wide pairs")
      rows.foreach { r =>
        assert(r.getAs[Int]("hamming") <= TextOps.SimhashMaxHamming)
        assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      }
    } finally spark.conf.set("graft.sort.results", "true")
  }
}
