package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Approximate kNN graph (q_knn_graph): pins the graph laws the hash
  * gate can't state — rank contiguity, no self-edges, and that the
  * reciprocal flag is EXACTLY the mutual-membership predicate.
  */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private lazy val rows =
    VectorOps.knnGraph(spark, SparkT.Sf0001).collect()

  test("per-node ranks are contiguous, similarity non-increasing, no self-edges") {
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("vec_id") !== r.getAs[Long]("neighbor_id")))
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (_, es) =>
      val byRank = es.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to es.length).toSeq)
      assert(byRank.length <= VectorOps.KnnK)
      val sims = byRank.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("the reciprocal flag is exactly mutual top-k membership") {
    val edges = rows.map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
    rows.foreach { r =>
      val mutual = edges.contains(
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("vec_id")))
      assert(r.getAs[Boolean]("reciprocal") === mutual)
    }
    // and the graph is non-trivially mutual: some but not necessarily
    // all edges reciprocate (rank-1 pairs of a symmetric similarity
    // always produce at least one mutual pair in a nonempty graph)
    assert(rows.exists(_.getAs[Boolean]("reciprocal")))
  }
}
