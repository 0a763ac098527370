package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** SQ8 quantized ANN quality: 8-bit uniform quantization of unit-norm
  * 64-dim vectors perturbs each component by at most span/510, so the
  * asymmetric scores stay close to exact and the top-k overlap must be
  * high — the compression is 4x, not free, and this spec measures the
  * price instead of assuming it.
  */
class Sq8RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  test("SQ8 recall@k stays high against the exact baseline") {
    val exact = topSets(VectorOps.annBruteForce(spark, SparkT.Sf0001))
    val sq8 = topSets(VectorOps.annSq8(spark, SparkT.Sf0001))
    assert(sq8.keySet == exact.keySet)
    val recall = exact.map { case (q, t) =>
      sq8.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size
    assert(recall >= 0.8, s"recall@${VectorOps.TopK} = $recall")
  }

  test("quantized scores deviate from exact by less than the grid bound") {
    val exact = VectorOps.annBruteForce(spark, SparkT.Sf0001)
      .select(col("q_id"), col("neighbor_id"), col("cos_sim").as("exact_sim"))
    val sq8 = VectorOps.annSq8(spark, SparkT.Sf0001)
      .select(col("q_id"), col("neighbor_id"), col("cos_sim").as("sq8_sim"))
    val joined = exact.join(sq8, Seq("q_id", "neighbor_id")).collect()
    assert(joined.nonEmpty)
    // |q·(c - deq(c))| <= sum_d |q_d| * span_d/510; unit-norm vectors with
    // span <= 2 give a loose analytic cap well under 0.05
    joined.foreach { r =>
      val d = math.abs(r.getAs[Double]("exact_sim") - r.getAs[Double]("sq8_sim"))
      assert(d < 0.05, s"score drift $d on ${r.mkString(",")}")
    }
  }
}
