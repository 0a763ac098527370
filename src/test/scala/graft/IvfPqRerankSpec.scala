package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** IVF-PQ exact rerank (q_ann_ivfpq_rerank): pins the refine-stage laws
  * the hash gate can't state — the reranked list IS the exact-cosine
  * top-k of the approximate top-[[VectorOps.RerankDepth]] nominees, the
  * exact scores are true dot products, and reranking never degrades the
  * exact quality of the un-reranked IVF-PQ list.
  */
class IvfPqRerankSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private lazy val embs: Map[Long, Array[Float]] =
    spark.read.parquet(s"${SparkT.Sf0001}/embeddings.parquet")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray)
      .toMap

  private def exactSim(a: Long, b: Long): Double = {
    val (x, y) = (embs(a), embs(b))
    val d = x.indices.map(i => x(i).toDouble * y(i).toDouble).sum
    math.floor(d * 1e6 + 0.5) / 1e6
  }

  private lazy val reranked =
    VectorOps.annIvfPqRerank(spark, SparkT.Sf0001).collect()

  private lazy val nominees =
    VectorOps.ivfPqRanked(spark, SparkT.Sf0001, VectorOps.IvfPqBroadcastCeiling)
      .filter(org.apache.spark.sql.functions.col("rank") <= VectorOps.RerankDepth)
      .collect()

  test("ranks contiguous, cos_sim exact and non-increasing per query") {
    assert(reranked.nonEmpty)
    reranked.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to rs.length).toSeq)
      assert(rs.length <= VectorOps.TopKPq)
      val sims = byRank.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sorted.reverse)
      byRank.foreach { r =>
        assert(r.getAs[Double]("cos_sim") ===
          exactSim(q, r.getAs[Long]("neighbor_id")))
      }
    }
  }

  test("reranked list is the exact top-k of the approx nominees") {
    val nomByQ = nominees.groupBy(_.getAs[Long]("q_id"))
    reranked.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val nomIds = nomByQ(q).map(_.getAs[Long]("neighbor_id")).toSet
      // every reranked row was nominated
      rs.foreach(r => assert(nomIds.contains(r.getAs[Long]("neighbor_id"))))
      // and it is exactly the exact-sim top-k (sim desc, id asc) of them
      val expected = nomIds.toSeq
        .map(n => (n, exactSim(q, n)))
        .sortBy { case (n, s) => (-s, n) }
        .take(VectorOps.TopKPq)
        .map(_._1)
      val got = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      assert(got === expected)
    }
  }

  test("rerank never degrades the exact quality of the plain IVF-PQ list") {
    val plain = VectorOps.annIvfPq(spark, SparkT.Sf0001).collect()
      .groupBy(_.getAs[Long]("q_id"))
    reranked.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val rerankQuality =
        rs.map(r => exactSim(q, r.getAs[Long]("neighbor_id"))).sum
      val plainQuality =
        plain(q).map(r => exactSim(q, r.getAs[Long]("neighbor_id"))).sum
      assert(rerankQuality >= plainQuality - 1e-9)
    }
  }
}
