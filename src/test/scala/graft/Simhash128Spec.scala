package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Laws of the two-long 120-bit simhash form (the production dial past
  * the single-long derivation cap):
  *   - fp_hi is built from the SAME md5 prefix as the 60-bit
  *     fingerprint, so hamming_120 = hamming_60 + bit_count(xor fp_lo)
  *     ≥ hamming_60 — the 120-bit pair set is a SUBSET of the 60-bit
  *     one at the same threshold;
  *   - every emitted pair is exact at the threshold (hamming ≤ 3,
  *     ordered ids) and exact clones survive at hamming 0;
  *   - the 30-bit bands cut peak bucket occupancy vs the 15-bit form
  *     (the keyspace headroom the dial exists for).
  */
class Simhash128Spec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("120-bit pairs are a subset of 60-bit pairs, with hamming additivity") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val p128 = TextOps.simhashNearDup128(spark, SparkT.Sf0001)
      val rows = p128.collect()
      assert(rows.nonEmpty, "planted corpus must yield 120-bit pairs")
      rows.foreach { r =>
        assert(r.getAs[Int]("hamming") <= TextOps.SimhashMaxHamming)
        assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      }
      val wide = pairSet(TextOps.simhashNearDupWide(spark, SparkT.Sf0001))
      val narrow128 = pairSet(p128)
      assert(narrow128.subsetOf(wide),
        s"120-bit pairs must be a subset of 60-bit pairs: extra ${narrow128 -- wide}")
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("an exact textual clone pair survives at hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_sh128").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("graft.sort.results", "false")
    try {
      val rows = TextOps.simhashNearDup128(spark, dir).collect()
      assert(rows.exists(r => r.getAs[Long]("doc_a") == 1L &&
        r.getAs[Long]("doc_b") == 2L && r.getAs[Int]("hamming") == 0 &&
        r.getAs[Long]("n_shared_bands") == 4L))
      assert(!rows.exists(r => r.getAs[Long]("doc_b") == 3L))
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("30-bit bands cut peak occupancy vs 15-bit bands") {
    def occ(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("band_idx", "band_val").agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
    val o128 = occ(TextOps.simhash128Bands(spark, SparkT.Sf0001))
    val o60 = occ(TextOps.simhashBandsAt(spark, SparkT.Sf0001,
      TextOps.SimhashWideBits))
    assert(o128 <= o60, s"wider bands must not raise occupancy: $o128 vs $o60")
  }
}
