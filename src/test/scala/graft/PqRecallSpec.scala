package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** PQ quantized ANN quality: product quantization compresses 64 floats
  * to [[VectorOps.PqSubspaces]] codebook ids (64× memory), so the
  * asymmetric scores are centroid approximations and recall is the
  * price being measured — against the exact brute-force baseline, and
  * for sanity against random-guessing (which at k=5 of ~500 would be
  * ~0.01).
  */
class PqRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def topSets(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] =
    df.filter(org.apache.spark.sql.functions.col("rank") <= k).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  test("PQ recall@k beats chance by an order of magnitude and covers all queries") {
    val k = VectorOps.TopKPq
    val exact = topSets(VectorOps.annBruteForce(spark, SparkT.Sf0001), k)
    val pq = topSets(VectorOps.annPq(spark, SparkT.Sf0001), k)
    assert(pq.keySet == exact.keySet)
    pq.values.foreach(s => assert(s.size == k))
    val recall = exact.map { case (q, t) =>
      pq.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size
    // 4-byte codes against 256-byte vectors: recall well above the
    // ~0.01 chance floor is the claim; exact ranking is not.
    assert(recall >= 0.2, s"recall@$k = $recall")
    info(s"PQ recall@$k = $recall")
  }
}
