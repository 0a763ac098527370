package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The LSH scaling dial measured: more hyperplanes = more buckets =
  * fewer bucket-matched candidates per corpus row (the mitigation for
  * the fixed-bucket-space quadratic growth BENCH_sf1.json surfaced on
  * q_embed_neardup), with precision exact at every plane count — the
  * dial trades only recall for candidate volume.
  */
class LshDialSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def pairSet(nPlanes: Int): Set[(Long, Long)] =
    VectorOps.embedNearDupCandidates(spark, SparkT.Sf0001, nPlanes)
      .filter(col("cos_sim") >= VectorOps.NearDupCosine)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("more planes shrink the candidate join; precision stays exact") {
    val c4 = VectorOps.embedNearDupCandidates(spark, SparkT.Sf0001, 4).count()
    val c6 = VectorOps.embedNearDupCandidates(spark, SparkT.Sf0001, 6).count()
    val c8 = VectorOps.embedNearDupCandidates(spark, SparkT.Sf0001, 8).count()
    assert(c6 < c4, s"6 planes must generate fewer candidates than 4 ($c6 vs $c4)")
    assert(c8 < c6, s"8 planes must generate fewer candidates than 6 ($c8 vs $c6)")

    // ground truth: all-pairs exact cosine (fine at sf0.001)
    val e = Tables.load(spark, SparkT.Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val truth = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        graft.functions.F.roundHalfUp(
          graft.functions.VectorDot(spark, col("x.embedding"), col("y.embedding")),
          6).as("cos"))
      .filter(col("cos") >= VectorOps.NearDupCosine)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val (p4, p8) = (pairSet(4), pairSet(8))
    assert(p4.nonEmpty && p4.subsetOf(truth), "4-plane pairs must all be true near-dups")
    // the 8-plane sign pattern extends the 4-plane one, so Hamming<=1
    // over 8 bits implies Hamming<=1 over the first 4: recall shrinks
    // monotonically along the dial, never sideways
    assert(p8.subsetOf(p4), "8-plane pairs must refine the 4-plane set")
  }

  test("derivedPlanes keeps occupancy at or under the target, floors at " +
    "NPlanes and caps at MaxPlanes") {
    import VectorOps.{derivedPlanes, MaxPlanes, NPlanes, TargetOccupancy}
    // the shipped testdata sits at the floor through sf0.1 and derives
    // the measured-fast 8-plane setting at sf1's 20k vectors
    assert(derivedPlanes(500L) == NPlanes)
    assert(derivedPlanes(2000L) == NPlanes)
    assert(derivedPlanes(20000L) == 8)
    for (n <- Seq(1L, 4096L, 99999L, 1000000L, 123456789L, 10000000000L)) {
      val p = derivedPlanes(n)
      assert(p >= NPlanes && p <= MaxPlanes)
      // occupancy bound holds whenever the cap is not binding
      if (p < MaxPlanes)
        assert(n <= (TargetOccupancy.toLong << p), s"n=$n p=$p")
      // minimality: one fewer plane would blow the occupancy target
      if (p > NPlanes)
        assert(n > (TargetOccupancy.toLong << (p - 1)), s"n=$n p=$p")
    }
    // exact power-of-two boundary: integer math, no float log2 edge
    assert(derivedPlanes(TargetOccupancy.toLong << 5) == 5)
    assert(derivedPlanes((TargetOccupancy.toLong << 5) + 1) == 6)
  }
}
